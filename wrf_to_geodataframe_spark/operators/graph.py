"""Distributed connected components (large-star / small-star).

The missing last step of every dedup pipeline: near-dup detectors emit
PAIRS, but acting on duplicates (keep one representative per group)
needs the transitive closure of those pairs — connected components over
the doc graph.  The reference has no graph operator at all; this is a
§2.8-gap extension sized for the 100 TB design point.

Algorithm: alternating large-star / small-star edge transformations
(Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
Components in MapReduce and Beyond", SoCC 2014).  The alternation
provably converges to one star per component (centered on the
component's minimum vertex id) in O(log^2 n) rounds, O(log n) observed:
a random-permuted 800-vertex path (adversarial id layout — naive
min-label propagation with pointer jumping needs ~n rounds on it)
converges in <= 9 alternations, and near-dup components are
near-cliques that converge in 1-2.

Plan-shape discipline (this is what makes the operator usable from a
``queries()`` builder):

- The round count is a FIXED unroll, not a driver-side convergence
  loop, so building the plan triggers no Spark job.  Convergence is
  still checked, not assumed: ``label_components`` exposes an exact
  unmerged-edge count callers surface as a self-validating output
  column (0 iff every edge's endpoints agree).
- Each star transform references its input edge set ONCE.  The naive
  formulation (symmetrize = union of two projections, per-vertex
  minima joined back) references it 4x per round, so the logical plan
  TREE grows 4^rounds and Catalyst analysis never finishes — and
  breaking that with localCheckpoint makes query construction eager
  under AQE (stage materialization at build).  Instead symmetrization
  is an explode (one scan) and the per-vertex minimum is an
  unbounded-frame window aggregate (one shuffle on the vertex id, no
  self-join), so the plan grows LINEARLY in the round count and the
  whole computation stays one lazy DAG.

Per-round cost: two shuffles per star (window min on the vertex id +
emitted-edge distinct) over a shrinking edge set; nothing touches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fixed alternation depth: covers near-clique dup clusters (1-2 rounds)
# with margin over the adversarial worst case observed on
# random-permuted paths of 800 vertices (9 rounds).  Raise for graphs
# with genuinely longer induced paths.
DEFAULT_CC_ROUNDS = 10


def _sym_with_min(edges: DataFrame) -> DataFrame:
    """(a, b, m): both directions of every edge, with
    m = min(N(a) ∪ {a}) attached — one explode + one window shuffle,
    referencing ``edges`` exactly once (see module docstring)."""
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return sym.withColumn(
        "m", F.least(F.min("b").over(Window.partitionBy("a")), F.col("a"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each vertex u: connect every STRICTLY LARGER neighbor to
    m = min(N(u) ∪ {u}).  Hangs heavy vertices below local minima."""
    s = _sym_with_min(edges)
    return (
        s.filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each vertex u: connect every neighbor <= u, and u itself, to
    m = min(N(u) ∪ {u}).  Flattens local chains into stars."""
    s = _sym_with_min(edges)
    emitted = s.select(
        F.explode(
            F.filter(
                F.array(
                    F.when(
                        F.col("b") <= F.col("a"),
                        F.struct(F.col("b").alias("a"), F.col("m").alias("b")),
                    ),
                    F.struct(F.col("a"), F.col("m").alias("b")),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return emitted.filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    edges: DataFrame,
    rounds: int = DEFAULT_CC_ROUNDS,
    assume_distinct: bool = False,
) -> DataFrame:
    """(v, cluster_id) for every vertex incident to an edge, where
    cluster_id is the minimum vertex id of v's component.

    ``edges`` must have two LONG columns ``a`` and ``b``; direction and
    duplicates don't matter, self-loops are ignored.

    If the fixed round count is insufficient for the graph's structure,
    the result UNDER-merges (one true component surfaces as several)
    with no error from this function — callers that need the guarantee
    should use :func:`label_components`, whose ``unmerged`` output is
    an exact and complete convergence check (over-merge is structurally
    impossible; see its docstring).

    ``assume_distinct=True`` skips the input-normalization
    ``distinct()`` (one full edge-set shuffle) for callers whose edge
    set is duplicate-free by construction — the near-dup detectors
    emit pairs through a final GROUP BY / DISTINCT, so re-deduping
    them here only re-shuffles what is already unique.  Semantics are
    unchanged either way: each star transform ends in its own
    ``distinct()``, so a caller passing duplicates under the flag
    still converges to the identical component map (duplicates wash
    out after round 1); the flag only removes the up-front pass.
    """
    e = (
        edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
        .filter(F.col("a") != F.col("b"))
    )
    if not assume_distinct:
        e = e.distinct()
    for _ in range(rounds):
        e = _small_star(_large_star(e))
    # converged edge set is a star per component: every edge joins a
    # member to its component min, so each vertex's label is its min
    # adjacent endpoint (centers label themselves)
    return (
        _sym_with_min(e)
        .select(F.col("a").alias("v"), F.col("m").alias("cluster_id"))
        .distinct()
    )


def _convergence_check(edges: DataFrame, comp: DataFrame) -> DataFrame:
    """1-row exact unmerged-edge count: edges whose endpoints received
    different labels (0 iff the round count sufficed)."""
    la, lb = comp.alias("la"), comp.alias("lb")
    return (
        edges.join(la, F.col("a") == F.col("la.v"))
        .join(lb, F.col("b") == F.col("lb.v"))
        .select(
            (F.col("la.cluster_id") != F.col("lb.cluster_id"))
            .cast("long")
            .alias("bad")
        )
        .agg(F.coalesce(F.sum("bad"), F.lit(0)).cast("long").alias("n_unmerged"))
    )


def label_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    rounds: int = DEFAULT_CC_ROUNDS,
    auto_escalate: int = 0,
    assume_distinct: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(labels, unmerged): every vertex labeled with its component min
    (singletons label themselves), plus a 1-row exact convergence
    check — the count of edges whose endpoints got different labels
    (0 iff the round count sufficed).  Surfacing ``unmerged`` as an
    output column makes the operator self-validating: an insufficient
    round count fails a value comparison loudly instead of silently
    under-merging.

    With ``auto_escalate=k > 0`` the operator is SELF-HEALING instead
    of merely loud: it executes the exact check after building the
    component map and, while edges remain unmerged and retries remain,
    doubles the round count and rebuilds (the under-converged map is
    unpersisted).  Worst-case total work over all attempts is
    ``rounds * (2^(k+1) - 1)`` star rounds — a constant factor (< 2x
    the final attempt alone) on a shrinking edge set, so the judgment
    call "how many rounds does this graph need" disappears with the
    same asymptotic cost.  The escalation is necessarily a driver-side
    loop (convergence is a property of the data, not the plan); callers
    that must stay lazy at build time keep ``auto_escalate=0``.

    UNDER-merge is the only possible failure mode, so the check is
    complete: both star transforms emit only edges (v, m) with m drawn
    from min(N(u) ∪ {u}) of some current neighbor u, so every created
    edge stays inside its vertex's original component — OVER-merge
    (two true components sharing a label) is structurally impossible,
    and a label is always a member of its own component.

    ``comp`` is persisted: it feeds the vertex labeling and both sides
    of the convergence check, and the subtrees are identical by
    construction (cache hit, not recompute) — the escalation path's
    executed check therefore also pre-materializes the cache the final
    collect reuses.
    """
    r = rounds
    for attempt in range(auto_escalate + 1):
        comp = connected_components(
            edges, r, assume_distinct=assume_distinct
        ).persist()
        unmerged = _convergence_check(edges, comp)
        if attempt == auto_escalate:
            break  # out of retries (or lazy mode): return the loud check
        if unmerged.first()["n_unmerged"] == 0:
            break
        comp.unpersist()
        r *= 2
    labels = (
        vertices.select(F.col(id_col))
        .join(comp, F.col(id_col) == F.col("v"), "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    return labels, unmerged


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    q: int = 1_000_000_000,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    tol_q: int | None = None,
) -> DataFrame:
    """PageRank as an INTEGER-EXACT fixed unroll — the link-graph
    quality signal crawl-curation pipelines weight documents by
    (Page/Brin/Motwani/Winograd 1999), in the suite's replayable
    arithmetic: ranks live on a 1/q lattice (BIGINT), each edge
    contributes ``pr(src) div outdeg(src)`` (integer floor division),
    and the update is ``pr'(v) = ((100 - damping) * q) div 100 +
    (damping * S(v)) div 100`` — every operation integral, so a SQL
    oracle replaying the same recurrence matches bit-for-bit, and a
    uniform cycle is an EXACT fixed point at pr = q (pinned in
    tests/test_graph.py).

    Shape per iteration: one equi join rank->edges (shuffle on src),
    one partial-aggregated groupBy on dst, one left join back onto the
    node set — the plan tree grows LINEARLY in ``iters`` (each rank
    frame is referenced exactly once), so the unroll stays a lazy
    single-lineage DAG; no driver-side collects, no persists needed.
    At 100 TB the per-iteration state is one BIGINT per node and the
    joins shuffle on uniform id keys.

    ``edges`` may contain duplicates (multi-edges count once per
    occurrence); out-degrees are taken from the edge table itself, and
    SINKS (nodes with no out-edges) simply leak their mass — the
    deliberate simple-variant semantics, stated here so the oracle and
    engine agree by construction (the standard Google-matrix
    redistribution semantics live in :func:`pagerank_dangling_integer`).

    OVERFLOW CONTRACT: the damped term is evaluated as
    ``d*(S div 100) + (d*(S mod 100)) div 100`` — value-identical to
    ``(d*S) div 100`` for S >= 0, but the largest intermediate is
    ``d*(S div 100) < S`` instead of ``d*S``.  S(v) is bounded by the
    total mass N*q, so ranks stay exact whenever ``N*q < 2**63``
    (~9.2e9 nodes at the default q=1e9); the naive form wrapped ~100x
    earlier, at N*q*damping_pct >= 2**63 (ADVICE r11).

    ``deg`` is persisted (tracked — see session.release_persisted):
    every unrolled iteration consumes the same out-degree table, and
    while Catalyst's ReuseExchange deduplicates the identical subplans
    inside one DAG today, the persist makes that cost contract
    explicit rather than optimizer-dependent.

    ``tol_q`` (lattice units) gives this variant the SAME convergence
    ceiling contract as :func:`pagerank_dangling_integer`: ``iters``
    becomes a ceiling, each round's rank frame is
    ``localCheckpoint(eager=True)``-ed (constant-size per-round plans),
    and the loop stops once max |Δpr| <= tol_q (a bounded 1-row
    collect per round).  Because the update map is deterministic and
    each round depends only on the previous ranks, the early-stopped
    result equals the k-round fixed unroll exactly (property-pinned
    in tests/test_graph.py).  None — the default, and what the oracle
    gate uses — keeps the pure lazy unroll with no jobs at build."""
    from wrf_to_geodataframe_spark.session import track_persist

    deg = track_persist(
        edges.groupBy(src_col).agg(
            F.count(F.lit(1)).cast("long").alias("_deg")
        )
    )
    # (r17 note: pre-joining deg onto edges and persisting both loop
    # invariants — the pagerank_dangling_integer r17 change — was
    # tried here too and measured a WASH: this variant is one lazy
    # DAG, so ReuseExchange already dedupes the identical per-round
    # edge subtrees, and the persist only added cache-fill overhead.)
    base_q = ((100 - damping_pct) * q) // 100
    pr = nodes.select(F.col(node_col).alias("node"),
                      F.lit(int(q)).cast("long").alias("pr_q"))
    if tol_q is not None:
        pr = pr.localCheckpoint()
    frames = [pr]
    for _ in range(iters):
        contrib = (
            pr.join(edges, pr["node"] == edges[src_col])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias("node"),
                F.expr("pr_q div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        pr = (
            nodes.select(F.col(node_col).alias("node"))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(base_q)).cast("long")
                    + _damped(damping_pct, "coalesce(_s, CAST(0 AS BIGINT))")
                ).alias("pr_q"),
            )
        )
        if tol_q is not None:
            pr = pr.localCheckpoint()
            frames.append(pr)
            d = (
                frames[-1].alias("a")
                .join(frames[-2].alias("b"), "node")
                .agg(
                    F.max(F.abs(F.col("a.pr_q") - F.col("b.pr_q")))
                    .alias("d")
                )
                .first()["d"]
            )
            if d is not None and d <= tol_q:
                break
    # Intermediate rounds' checkpoint blocks: DataFrame.unpersist only
    # clears cache-manager entries, NOT localCheckpoint RDD storage —
    # those blocks are reclaimed by Spark's ContextCleaner once the
    # frames are garbage-collected, which happens when ``frames`` goes
    # out of scope on return (no explicit cleanup call exists in the
    # public API).
    return pr


def _damped(damping_pct: int, s_expr: str):
    """``(damping_pct * S) div 100`` for non-negative BIGINT S, in the
    overflow-safe split form: ``d*(S div 100) + (d*(S mod 100)) div
    100``.  Exact for S >= 0 (write S = 100a + b: d*S div 100 =
    d*a + (d*b) div 100); the largest intermediate is < S."""
    d = f"CAST({int(damping_pct)} AS BIGINT)"
    return F.expr(
        f"{d} * (({s_expr}) div 100L)"
        f" + ({d} * (({s_expr}) % 100L)) div 100L"
    )


def pagerank_dangling_integer(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    q: int = 1_000_000_000,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    tol_q: int | None = None,
) -> DataFrame:
    """PageRank with DANGLING-MASS REDISTRIBUTION — the standard
    Google-matrix semantics (sinks spread their rank uniformly over
    all nodes) — in the same integer-exact idiom as
    :func:`pagerank_integer`:

        share_k = (sum of pr_k over sink nodes) div N
        pr_{k+1}(v) = (100-d)*q div 100
                      + (d * (S(v) + share_k)) div 100   [split form]

    Every operation is integral, so a SQL oracle replaying the
    recurrence matches bit-for-bit.  Mass is conserved up to the floor
    losses only: per iteration the divisions drop < 1 unit per edge
    (pr div deg), < N units (share floor) and < 100+1 units per node
    (the damped split), so ``N*q - sum(pr_k) <= k*(101*N + E + N)`` —
    an exact integer bound pinned in tests/test_graph.py.

    EAGER per iteration, deliberately — ONE job per round: each
    round's rank frame is ``localCheckpoint(eager=True)``-ed, making
    the previous ranks a LogicalRDD LEAF.  That buys two things at
    once: (a) the share aggregate can reference the rank frame on a
    second branch (contribution join + dangling sum) as a broadcast
    1-row crossJoin WITHOUT doubling the lineage per round — the
    2^iters analysis blowup the module docstring bans — so no driver
    collect is needed at all; (b) the plan analyzed each round is
    CONSTANT-size (without truncation the k-th round re-analyzes a
    k-deep tree and construction goes quadratic; measured 43 s ->
    ~4 s at sf0.01).  Checkpointed blocks live in executor storage
    like any persist.  The standard iterative-algorithm tradeoff
    applies: local checkpoints are not executor-loss recoverable — on
    a fault-sensitive production run, swap in
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``.
    Checkpoint blocks are reclaimed by ContextCleaner once the frame
    objects are garbage-collected (after the function's locals die),
    so peak executor storage is O(iters) two-BIGINT-per-node frames
    within one call — explicit per-round unpersist was measured a
    no-op here and removed (r14).

    Returns (node, pr_q, delta_q): ``delta_q`` = max |pr_iters -
    pr_{iters-1}| over all nodes — the self-validating convergence
    aggregate, same value on every row (the dedup_cluster_cc
    unmerged-count pattern).  Scale shape per iteration: the same
    three uniform-key shuffles as pagerank_integer plus one 1-row
    aggregate; nothing data-sized touches the driver.

    ``tol_q`` (lattice units) makes ``iters`` a CEILING instead of a
    fixed count: after each round the max |Δpr| (a bounded 1-row
    collect over the two checkpointed frames) is compared against
    tol_q and the loop stops early once converged — the production
    power-iteration contract.  The returned delta_q is then the final
    round's true delta either way.  None (the default, and what the
    oracle gate uses) keeps the exact fixed unroll."""
    from wrf_to_geodataframe_spark.session import track_persist

    if iters < 1:
        raise ValueError("pagerank_dangling_integer needs iters >= 1")
    deg = track_persist(
        edges.groupBy(src_col).agg(
            F.count(F.lit(1)).cast("long").alias("_deg")
        )
    )
    # Pre-join the out-degree onto the edge list ONCE and persist
    # (r17): every one of the ``iters`` rounds consumed the raw
    # ``edges`` lineage (for the suite gates that is a parquet scan +
    # union + broadcast-count per round) plus a per-round edges⋈deg
    # join.  Materializing (src, dst, _deg) up front turns each round
    # into a single pr⋈ed join — at 100 TB this is the standard
    # power-iteration shape (the edge table is the loop invariant;
    # GraphX caches exactly this), and per round it removes one join
    # and the whole edge-derivation subtree.  Same arithmetic, same
    # results.  ``nodes_sel`` likewise: the node column is re-read
    # every round for the left join.
    ed = track_persist(edges.join(deg, src_col))
    nodes_sel = track_persist(nodes.select(F.col(node_col).alias("node")))
    n_nodes = nodes.count()
    base_q = ((100 - damping_pct) * q) // 100
    pr = nodes_sel.select(
        "node",
        F.lit(int(q)).cast("long").alias("pr_q"),
    ).localCheckpoint()
    frames = [pr]
    for _ in range(iters):
        # 1-row dangling share, folded in as a broadcast — because pr
        # is a checkpointed LEAF, referencing it on two branches
        # (contribution join + this aggregate) costs two cache scans,
        # not a doubled lineage; one job per round, no driver collect
        share_f = (
            pr.join(deg, pr["node"] == deg[src_col], "left_anti")
            .agg(
                F.expr(
                    f"coalesce(sum(pr_q), 0L)"
                    f" div CAST({int(n_nodes)} AS BIGINT)"
                ).alias("_share")
            )
        )
        contrib = (
            pr.join(ed, pr["node"] == ed[src_col])
            .select(
                F.col(dst_col).alias("node"),
                F.expr("pr_q div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        pr = (
            nodes_sel
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(share_f))
            .select(
                "node",
                (
                    F.lit(int(base_q)).cast("long")
                    + _damped(
                        damping_pct,
                        "coalesce(_s, 0L) + _share",
                    )
                ).alias("pr_q"),
            )
            .localCheckpoint()
        )
        frames.append(pr)
        if tol_q is not None:
            d = (
                frames[-1].alias("a")
                .join(frames[-2].alias("b"), "node")
                .agg(
                    F.max(F.abs(F.col("a.pr_q") - F.col("b.pr_q")))
                    .alias("d")
                )
                .first()["d"]
            )
            if d is not None and d <= tol_q:
                break
    # Checkpoint blocks for rounds the delta no longer needs are
    # reclaimed by Spark's ContextCleaner once garbage-collected
    # (DataFrame.unpersist only clears cache-manager entries, not
    # localCheckpoint RDD storage); all but the last two frames die
    # with this function's scope.
    prev = frames[-2]
    delta = (
        pr.alias("a")
        .join(prev.alias("b"), "node")
        .agg(
            F.max(F.abs(F.col("a.pr_q") - F.col("b.pr_q")))
            .cast("long")
            .alias("delta_q")
        )
    )
    return pr.crossJoin(F.broadcast(delta))
