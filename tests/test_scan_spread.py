"""ensure_scan_parallelism (r17): conditional minimum scan
parallelism for CPU-heavy chains over byte-small inputs."""

from __future__ import annotations

import os

from wrf_to_geodataframe_spark.session import (
    ensure_scan_parallelism,
    load_table,
    sf_path,
)

SF_DIR = "/root/testdata/sf0.001"


def test_small_scan_is_spread(spark):
    """A byte-small table (far under one maxPartitionBytes split) gets
    an explicit hash repartition to defaultParallelism."""
    df = load_table(spark, SF_DIR, "documents")
    path = sf_path(SF_DIR, "documents")
    out = ensure_scan_parallelism(df, path, "doc_id")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "RepartitionByExpression" in plan
    # the spread must not change the rows
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
        r.doc_id for r in df.select("doc_id").collect()
    )


def test_large_scan_is_untouched(spark, monkeypatch):
    """When the driver-side estimate says the scan already yields at
    least defaultParallelism partitions (every archive-scale input),
    the helper is a strict no-op — no extra exchange at 100 TB."""
    import wrf_to_geodataframe_spark.session as S

    df = load_table(spark, SF_DIR, "documents")
    path = sf_path(SF_DIR, "documents")
    parallelism = spark.sparkContext.defaultParallelism
    big = parallelism * 128 * 1024 * 1024  # est >= defaultParallelism
    monkeypatch.setitem(S._SCAN_BYTES_CACHE, path, big)
    out = ensure_scan_parallelism(df, path, "doc_id")
    assert out is df


def test_estimate_is_driver_side(spark):
    """The byte estimate comes from os.stat, memoized — no Spark job
    (the construction-is-lazy contract)."""
    import wrf_to_geodataframe_spark.session as S

    path = sf_path(SF_DIR, "documents")
    S._SCAN_BYTES_CACHE.pop(path, None)
    store = spark.sparkContext._jsc.sc().statusStore()
    before = store.jobsList(None).size()
    n = S._dataset_bytes(path)
    assert n > 0
    assert os.path.exists(path)
    after = store.jobsList(None).size()
    assert after == before
