"""Salting primitives: exact equivalence with the unsalted plan, and
the partition-spread property that is their whole point."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed_fact(spark, n_hot=5000, n_cold=50):
    hot = spark.range(n_hot).select(
        F.lit(1).alias("k"), F.col("id").alias("fact_id"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    cold = spark.range(n_cold).select(
        (F.col("id") % 7 + 2).alias("k"), (F.col("id") + 1_000_000).alias("fact_id"),
        F.lit(1.0).alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark):
    from wrf_to_geodataframe_spark.operators.skew import salted_join

    fact = _skewed_fact(spark)
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 10)], "k long, name string"
    )
    plain = {(r.fact_id, r.name) for r in fact.join(dim, "k").collect()}
    salted = {
        (r.fact_id, r.name)
        for r in salted_join(fact, dim, "k", ["fact_id"], n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    from wrf_to_geodataframe_spark.operators.skew import deterministic_salt

    fact = _skewed_fact(spark)
    salts = (
        fact.filter(F.col("k") == 1)
        .select(deterministic_salt([F.col("fact_id")], 8).alias("s"))
        .groupBy("s").count().collect()
    )
    counts = {r.s: r["count"] for r in salts}
    assert len(counts) == 8  # every salt bucket used
    assert max(counts.values()) < 0.25 * 5000  # no bucket dominates


def test_salted_distinct_count_equals_exact(spark):
    from wrf_to_geodataframe_spark.operators.skew import salted_distinct_count

    fact = _skewed_fact(spark)
    exact = {
        r.k: r.n
        for r in fact.groupBy("k")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    got = {
        r.k: r.n_distinct
        for r in salted_distinct_count(fact, "k", "v", n_salts=8).collect()
    }
    assert got == exact


def test_salt_is_retry_stable(spark):
    """The salt must be a pure function of the row — two evaluations
    (e.g. a retried task) assign identical salts."""
    from wrf_to_geodataframe_spark.operators.skew import deterministic_salt

    fact = _skewed_fact(spark)
    a = {r.fact_id: r.s for r in fact.select(
        "fact_id", deterministic_salt([F.col("fact_id")], 8).alias("s")
    ).collect()}
    b = {r.fact_id: r.s for r in fact.repartition(13).select(
        "fact_id", deterministic_salt([F.col("fact_id")], 8).alias("s")
    ).collect()}
    assert a == b
