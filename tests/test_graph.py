"""Connected components (operators/graph.py) — convergence, labeling,
and the loud-failure self-check.

The worst case for the large-star/small-star alternation is an induced
path with adversarially permuted vertex ids; simulation gives the
rounds-to-converge envelope (4 rounds for 16-vertex paths, 6 for 64,
10 for ~800).  These tests pin the Spark implementation to that
envelope and to a brute-force reference labeling.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.operators.graph import (
    connected_components,
    label_components,
)


def _ref_labels(edges):
    """Brute-force BFS component minima."""
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    lbl = {}
    for s in list(nbr):
        if s in lbl:
            continue
        comp = {s}
        frontier = [s]
        while frontier:
            nxt = []
            for v in frontier:
                for u in nbr[v]:
                    if u not in comp:
                        comp.add(u)
                        nxt.append(u)
            frontier = nxt
        m = min(comp)
        for v in comp:
            lbl[v] = m
    return lbl


def _edge_df(spark, edges):
    return spark.createDataFrame(edges, "a long, b long")


def test_cliques_and_chain_label_to_component_min(spark):
    # two cliques, one chain, ids deliberately interleaved
    edges = (
        [(10, 20), (10, 30), (20, 30)]  # clique {10,20,30}
        + [(7, 99), (99, 7)]  # duplicate + reversed edges
        + [(50, 41), (41, 62), (62, 53)]  # chain 50-41-62-53
    )
    got = {
        (r.v, r.cluster_id)
        for r in connected_components(_edge_df(spark, edges)).collect()
    }
    exp = set(_ref_labels(edges).items())
    assert got == exp


def test_permuted_path_converges_within_default_rounds(spark):
    # 200-vertex path with shuffled ids: simulation worst case is 7-8
    # alternations; the default 10 must converge it exactly
    rng = random.Random(1234)
    ids = list(range(200))
    rng.shuffle(ids)
    edges = [(ids[i], ids[i + 1]) for i in range(199)]
    got = {
        (r.v, r.cluster_id)
        for r in connected_components(_edge_df(spark, edges)).collect()
    }
    assert got == set(_ref_labels(edges).items())


def test_label_components_covers_singletons_and_reports_converged(spark):
    edges = [(1, 5), (5, 3)]
    vertices = spark.range(8).select(F.col("id").alias("doc_id"))
    labels, unmerged = label_components(vertices, _edge_df(spark, edges))
    got = {(r.doc_id, r.cluster_id) for r in labels.collect()}
    exp = {(0, 0), (1, 1), (2, 2), (3, 1), (4, 4), (5, 1), (6, 6), (7, 7)}
    assert got == exp
    assert unmerged.collect()[0].n_unmerged == 0


def test_under_provisioned_rounds_fail_loudly_not_silently(spark):
    # ascending 6-path needs >1 alternation (pinned by the module-level
    # simulation); with rounds=1 the unmerged-edge count must be
    # NONZERO — the self-validation contract dedup_cluster_cc's gate
    # row relies on
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    vertices = spark.range(6).select(F.col("id").alias("doc_id"))
    _, unmerged = label_components(vertices, _edge_df(spark, edges), rounds=1)
    assert unmerged.collect()[0].n_unmerged > 0
    # and with the default rounds the same graph converges
    labels, unmerged10 = label_components(vertices, _edge_df(spark, edges))
    assert unmerged10.collect()[0].n_unmerged == 0
    assert {(r.doc_id, r.cluster_id) for r in labels.collect()} == {
        (i, 0) for i in range(6)
    }


def test_auto_escalation_converges_from_rounds_one(spark):
    """VERDICT r5 #3: with auto_escalate, an adversarially-id'd induced
    path that rounds=1 cannot converge self-heals by doubling rounds —
    no hand-picked constant, exact labels, n_unmerged == 0."""
    rng = random.Random(99)
    ids = list(range(16))
    rng.shuffle(ids)
    edges = [(ids[i], ids[i + 1]) for i in range(15)]
    vertices = spark.range(16).select(F.col("id").alias("doc_id"))
    labels, unmerged = label_components(
        vertices, _edge_df(spark, edges), rounds=1, auto_escalate=3
    )
    assert unmerged.collect()[0].n_unmerged == 0
    exp = {(v, min(ids)) for v in ids}
    assert {(r.doc_id, r.cluster_id) for r in labels.collect()} == exp


def test_auto_escalation_exhausted_still_fails_loudly(spark):
    # one retry from rounds=1 reaches only rounds=2 — not enough for a
    # 64-vertex permuted path, so the loud-failure contract must hold
    rng = random.Random(7)
    ids = list(range(64))
    rng.shuffle(ids)
    edges = [(ids[i], ids[i + 1]) for i in range(63)]
    vertices = spark.range(64).select(F.col("id").alias("doc_id"))
    _, unmerged = label_components(
        vertices, _edge_df(spark, edges), rounds=1, auto_escalate=1
    )
    assert unmerged.collect()[0].n_unmerged > 0


def test_plan_is_lazy_no_jobs_at_build(spark):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    edges = _edge_df(spark, [(1, 2), (2, 3)])
    vertices = spark.range(4).select(F.col("id").alias("doc_id"))
    labels, unmerged = label_components(vertices, edges)
    _ = labels.schema, unmerged.schema  # analysis is fine, jobs are not
    after = tracker.getJobIdsForGroup(None)
    assert before == after, "building the CC plan must trigger no Spark job"


def test_pagerank_cycle_is_exact_fixed_point(spark):
    """A uniform directed cycle is an EXACT fixed point of the integer
    recurrence: (15*q) div 100 + (85*q) div 100 == q for q = 1e9, so
    every node stays at exactly 1e9 after any number of iterations."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_integer,
    )

    n = 50
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n).alias("dst"),
    )
    got = pagerank_integer(nodes, edges, iters=7).collect()
    assert len(got) == n
    assert all(r.pr_q == 1_000_000_000 for r in got)


def test_pagerank_matches_independent_python_replay(spark):
    """The distributed operator equals a plain-python replay of the
    same integer recurrence on a small irregular multigraph with a
    SINK (no out-edges: its mass leaks, the documented simple-variant
    semantics) and a multi-edge."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_integer,
    )

    n, q, d = 12, 1_000_000_000, 85
    el = [(u, (u * 5 + 1) % n) for u in range(n) if u != 7]  # 7 = sink
    el += [(u, (u * u + 2) % n) for u in range(n) if u % 3 == 0 and u != 7]
    el.append((4, (4 * 5 + 1) % n))  # duplicate edge -> multi-edge
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(el, "src long, dst long")
    got = {
        r.node: r.pr_q
        for r in pagerank_integer(nodes, edges, iters=10).collect()
    }

    deg = {}
    for u, _ in el:
        deg[u] = deg.get(u, 0) + 1
    pr = {v: q for v in range(n)}
    base = (100 - d) * q // 100
    for _ in range(10):
        s = {v: 0 for v in range(n)}
        for u, v in el:
            s[v] += pr[u] // deg[u]
        pr = {v: base + d * s[v] // 100 for v in range(n)}
    assert got == pr
    # the sink's in-rank still flows to it, but its own mass leaked:
    # total mass strictly below n * q
    assert sum(got.values()) < n * q


def _dangling_python_replay(n, el, iters, q=1_000_000_000, d=85):
    """Structurally independent replay of the redistribution
    recurrence: plain dicts, no floor-split trick (uses d*x//100
    directly — value-identical by the split identity, so it also
    cross-checks the engine's overflow-safe form)."""
    deg = {}
    for u, _ in el:
        deg[u] = deg.get(u, 0) + 1
    pr = {v: q for v in range(n)}
    base = (100 - d) * q // 100
    hist = [dict(pr)]
    for _ in range(iters):
        share = sum(pr[v] for v in range(n) if v not in deg) // n
        s = {v: 0 for v in range(n)}
        for u, v in el:
            s[v] += pr[u] // deg[u]
        pr = {v: base + d * (s[v] + share) // 100 for v in range(n)}
        hist.append(dict(pr))
    return pr, hist


def test_pagerank_dangling_matches_python_replay(spark):
    """pagerank_dangling_integer equals the plain-python replay on an
    irregular multigraph with TWO sinks, including the delta_q
    convergence column (max |Δpr| of the final round)."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_dangling_integer,
    )

    n = 12
    el = [(u, (u * 5 + 1) % n) for u in range(n) if u not in (7, 10)]
    el += [
        (u, (u * u + 2) % n)
        for u in range(n)
        if u % 3 == 0 and u not in (7, 10)
    ]
    el.append((4, (4 * 5 + 1) % n))  # multi-edge
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(el, "src long, dst long")
    rows = pagerank_dangling_integer(nodes, edges, iters=10).collect()
    got = {r.node: r.pr_q for r in rows}

    pr, hist = _dangling_python_replay(n, el, 10)
    assert got == pr
    want_delta = max(abs(hist[-1][v] - hist[-2][v]) for v in range(n))
    assert {r.delta_q for r in rows} == {want_delta}


def test_pagerank_dangling_mass_conservation_bound(spark):
    """Redistribution conserves mass up to floor losses ONLY — the
    exact integer bound 0 <= N*q - sum(pr_k) <= k*(E + 3*N) (each
    round drops < 1 unit per edge at pr div deg, < N units at the
    share floor, < ~2N at the damped floors; algebra in the operator
    docstring).  The leak variant on the same graph loses strictly
    more."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_dangling_integer,
        pagerank_integer,
    )

    n, q, iters = 40, 1_000_000_000, 8
    # every 4th node is a sink; others get 1-2 out-edges
    el = [(u, (u * 3 + 1) % n) for u in range(n) if u % 4 != 0]
    el += [(u, (u * 7 + 5) % n) for u in range(n) if u % 8 == 1]
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(el, "src long, dst long")

    t_redist = sum(
        r.pr_q
        for r in pagerank_dangling_integer(nodes, edges, iters=iters).collect()
    )
    t_leak = sum(
        r.pr_q for r in pagerank_integer(nodes, edges, iters=iters).collect()
    )
    lost = n * q - t_redist
    assert 0 <= lost <= iters * (len(el) + 3 * n), (lost, len(el), n)
    assert t_leak < t_redist  # sinks leaked real mass, not floor dust


def test_pagerank_dangling_no_sinks_equals_leak_variant(spark):
    """With no sinks the dangling share is 0 every round, so the two
    operators agree exactly (and a uniform cycle stays at the q fixed
    point with delta_q == 0)."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_dangling_integer,
        pagerank_integer,
    )

    n = 30
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    got = pagerank_dangling_integer(nodes, edges, iters=6).collect()
    leak = {
        r.node: r.pr_q
        for r in pagerank_integer(nodes, edges, iters=6).collect()
    }
    assert {r.node: r.pr_q for r in got} == leak
    assert all(r.pr_q == 1_000_000_000 and r.delta_q == 0 for r in got)


def test_pagerank_dangling_tol_stops_early_at_fixed_point(spark):
    """tol_q makes iters a ceiling: a uniform cycle is an exact fixed
    point after round 1 (delta 0), so the loop must stop there — and
    the early-stopped result equals the full unroll exactly."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_dangling_integer,
    )

    n = 20
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def _max_job():
        # job IDS are monotone; len() saturates at the UI's
        # retained-jobs cap deep into a long test session
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else 0

    before = _max_job()
    early = pagerank_dangling_integer(
        nodes, edges, iters=50, tol_q=0
    ).collect()
    mid = _max_job()
    early_jobs = mid - before
    full = pagerank_dangling_integer(nodes, edges, iters=50).collect()
    full_jobs = _max_job() - mid
    assert sorted(map(tuple, early)) == sorted(map(tuple, full))
    assert all(r.pr_q == 1_000_000_000 and r.delta_q == 0 for r in early)
    # 50 fixed rounds run ~50 checkpoint jobs; tol stops after ~2
    assert early_jobs < full_jobs / 3, (early_jobs, full_jobs)


def test_pagerank_plain_tol_matches_full_unroll(spark):
    """The plain variant shares the dangling variant's convergence
    ceiling contract: tol_q-early-stopped ranks equal the full fixed
    unroll at the fixed point, and on a non-trivial graph (a chain
    with a sink, where mass leaks) tol_q=0 stops exactly when two
    consecutive rounds agree — which by determinism of the update map
    pins every later round to the same value."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_integer,
    )

    # uniform cycle: exact fixed point at pr = q after round 1
    n = 20
    nodes = spark.range(n).select(F.col("id").alias("node"))
    cyc = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    early = pagerank_integer(nodes, cyc, iters=50, tol_q=0).collect()
    full = pagerank_integer(nodes, cyc, iters=50).collect()
    assert sorted(map(tuple, early)) == sorted(map(tuple, full))
    assert all(r.pr_q == 1_000_000_000 for r in early)

    # chain with a sink: leaky semantics converge to base_q everywhere
    # upstream of the head; early-stop must equal the 30-round unroll
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    e30 = {
        r.node: r.pr_q
        for r in pagerank_integer(nodes, chain, iters=30, tol_q=0).collect()
    }
    f30 = {
        r.node: r.pr_q
        for r in pagerank_integer(nodes, chain, iters=30).collect()
    }
    assert e30 == f30


def test_connected_components_assume_distinct_equivalence(spark):
    """The r17 assume_distinct fast path (skip the input-normalization
    distinct) must produce the identical component map as the default
    — including when the caller LIES and passes duplicate edges, since
    every star transform ends in its own distinct (the flag only
    removes the up-front pass, never changes convergence)."""
    from pyspark.sql import functions as F

    from wrf_to_geodataframe_spark.operators.graph import (
        connected_components,
    )

    # two components (0-1-2 path, 10-11 pair) with duplicate and
    # reversed edge rows
    rows = [(0, 1), (1, 2), (10, 11), (1, 0), (0, 1), (11, 10)]
    edges = spark.createDataFrame(rows, "a long, b long")
    base = sorted(
        map(tuple, connected_components(edges, rounds=4).collect())
    )
    fast = sorted(
        map(
            tuple,
            connected_components(
                edges, rounds=4, assume_distinct=True
            ).collect(),
        )
    )
    assert base == fast
    assert base == [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)]
