"""Deterministic fixed-iteration k-means for ANN codebooks (VERDICT r3
#9 polish; the trained counterpart of the stride-sampled IVF coarse
quantizer in ``suite/pipeline.py`` and the md5 PQ codebook).

Spark-first Lloyd iterations, the MLlib shape:

- **assign**: vectors x broadcast(centroids) — the broadcast side is
  k x d doubles (a few KB for any sane codebook), scored JVM-side with
  the quantized dot-product HOFs from ``functions/vectors.py``;
- **update**: ``posexplode`` the assigned vectors and partial-aggregate
  (cid, pos) sums map-side — one shuffle of k*d result rows per
  iteration, never a collect of the data;
- the k x d centroid table alone returns to the driver between
  iterations (exactly what MLlib's KMeans does per step).

Determinism: init is the k lowest-id vectors (stable under any
partitioning), assignment ties break on lowest centroid id, and the
update means are rounded to 1e-6 before re-broadcast so cross-partition
float-sum order cannot leak into the next iteration's assignments
beyond the quantum.  Same seed data -> same codebook, every run.

This is a training utility, not a gate query: the gate's IVF/PQ entries
stay on closed-form codebooks the DuckDB oracle can replay; recall of
trained-vs-stride codebooks is measured in pytest
(``tests/test_pipeline_suite.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from wrf_to_geodataframe_spark.functions.vectors import (
    cosine_from_q,
    dot_q,
    norm_q,
)


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 4,
) -> list[list[float]]:
    """Fit k centroids over ``df[vec_col]`` (array<double>) with
    ``iters`` Lloyd steps; returns the codebook as plain lists (small:
    k x d), ordered by centroid id.  Spherical variant: assignment by
    cosine, matching the ANN queries' similarity."""
    spark = df.sparkSession
    vec = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    vec = vec.withColumn("_nq", norm_q(F.col("_v"))).persist()
    try:
        init = (
            vec.orderBy("_id")
            .limit(k)
            .select("_v")
            .collect()
        )
        cents = [list(r._v) for r in init]
        for _ in range(iters):
            cent_df = spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)],
                "cid int, cv array<double>",
            ).withColumn("cnq", norm_q(F.col("cv")))
            assigned = (
                vec.crossJoin(F.broadcast(cent_df))
                .withColumn(
                    "_cos",
                    cosine_from_q(
                        dot_q(F.col("_v"), F.col("cv")),
                        F.col("_nq"),
                        F.col("cnq"),
                    ),
                )
                .withColumn(
                    "_r",
                    F.row_number().over(
                        Window.partitionBy("_id").orderBy(
                            F.col("_cos").desc(), F.col("cid")
                        )
                    ),
                )
                .filter(F.col("_r") == 1)
                .select("cid", "_v")
            )
            sums = (
                assigned.select(
                    "cid", F.posexplode(F.col("_v")).alias("pos", "val")
                )
                .groupBy("cid", "pos")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            )
            rows = (
                sums.groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "s", "n"))
                        ),
                        lambda t: F.round(t["s"] / t["n"], 6),
                    ).alias("cv")
                )
                .collect()
            )
            new = {r.cid: list(r.cv) for r in rows}
            # empty clusters keep their previous centroid
            cents = [new.get(i, cents[i]) for i in range(k)]
        return cents
    finally:
        vec.unpersist()


def _sub_slices(emb_qv: DataFrame, m: int, sub: int) -> DataFrame:
    """(vec_id, m, sv): the m-th ``sub``-dim slice of each quantized
    BIGINT vector — all subspaces in one frame so one pipeline trains
    every PQ codebook simultaneously."""
    spark = emb_qv.sparkSession
    ms = spark.range(m).select(F.col("id").cast("int").alias("m"))
    return emb_qv.crossJoin(F.broadcast(ms)).select(
        "vec_id",
        "m",
        F.expr(f"slice(qv, CAST(m * {sub} + 1 AS INT), {sub})").alias("sv"),
    )


_SUB_D2 = (
    "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), 0L, "
    "(acc, x) -> acc + x)"
)


def pq_kmeans_fit(
    emb_qv: DataFrame,
    m: int = 8,
    sub: int = 8,
    k: int = 16,
    iters: int = 3,
) -> list[tuple[int, int, list[int]]]:
    """Train all ``m`` PQ subspace codebooks at once with fixed-iteration
    Lloyd steps on the QUANTIZED representation (BIGINT components, so
    every distance is an exact integer and training is replayable):
    assignment by integer L2 with argmin tie-break on the lowest code
    (min over d2*k + c), update by per-(subspace, code, position) mean
    rounded back to the integer grid.  Returns [(m, code, codeword)].

    Scale: the shuffled update is m*k*sub rows per iteration; the
    codebook (m*k*sub ints) is all that visits the driver."""
    sliced = _sub_slices(emb_qv, m, sub).persist()
    spark = emb_qv.sparkSession
    try:
        init = (
            sliced.filter(F.col("vec_id") < k)
            .select("m", F.col("vec_id").cast("int").alias("c"), "sv")
            .collect()
        )
        cb = {(r.m, r.c): [int(v) for v in r.sv] for r in init}
        for _ in range(iters):
            cent_df = spark.createDataFrame(
                [(mm, c, v) for (mm, c), v in sorted(cb.items())],
                "m int, c int, cv array<bigint>",
            )
            assigned = (
                sliced.join(F.broadcast(cent_df), "m")
                .select(
                    "vec_id",
                    "m",
                    "sv",
                    (F.expr(_SUB_D2) * k + F.col("c")).alias("key"),
                )
                .groupBy("vec_id", "m")
                .agg(
                    F.min("key").alias("k"),
                    F.first("sv").alias("sv"),
                )
                .select("m", (F.col("k") % k).alias("c"), "sv")
            )
            rows = (
                assigned.select(
                    "m", "c", F.posexplode("sv").alias("pos", "val")
                )
                .groupBy("m", "c", "pos")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
                .groupBy("m", "c")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                        lambda t: F.round(t["s"] / t["n"]).cast("long"),
                    ).alias("cv")
                )
                .collect()
            )
            new = {(r.m, r.c): [int(v) for v in r.cv] for r in rows}
            cb = {key: new.get(key, old) for key, old in cb.items()}
        return [(mm, c, v) for (mm, c), v in sorted(cb.items())]
    finally:
        sliced.unpersist()


def pq_topk_trained(
    emb_qv: DataFrame,
    full: DataFrame,
    codebook: list[tuple[int, int, list[int]]],
    m: int = 8,
    sub: int = 8,
    k: int = 16,
    n_queries: int = 8,
    shortlist: int = 64,
    top_k: int = 3,
) -> DataFrame:
    """ADC shortlist + exact rerank against a TRAINED codebook —
    identical physical shape to ``suite.pipeline.sim_pq_topk`` (encode
    via broadcast codebook, query LUT, integer ADC sums, exact-cosine
    rerank of the shortlist)."""
    spark = emb_qv.sparkSession
    cent_df = spark.createDataFrame(
        codebook, "m int, c int, cv array<bigint>"
    )
    sliced = _sub_slices(emb_qv, m, sub)
    enc = (
        sliced.join(F.broadcast(cent_df), "m")
        .select(
            "vec_id", "m", (F.expr(_SUB_D2) * k + F.col("c")).alias("key")
        )
        .groupBy("vec_id", "m")
        .agg(F.min("key").alias("k"))
        .select("vec_id", "m", (F.col("k") % k).alias("c"))
    )
    lut = (
        sliced.filter(F.col("vec_id") < n_queries)
        .join(F.broadcast(cent_df), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "c",
            F.expr(_SUB_D2).alias("d2"),
        )
    )
    adc = (
        enc.join(F.broadcast(lut), ["m", "c"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d2").alias("d2_approx"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("d2_approx").asc(), F.col("neighbor_id")
    )
    cand = (
        adc.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    qe = full.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nq").alias("qnq"),
    )
    ne = full.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ne"),
        F.col("nq").alias("nnq"),
    )
    rer = (
        cand.join(qe, "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_q(
                dot_q(F.col("qe"), F.col("ne")), F.col("qnq"), F.col("nnq")
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return rer.withColumn(
        "rank", F.row_number().over(w2).cast("long")
    ).filter(F.col("rank") <= top_k)


def ivf_topk_trained(
    spark: SparkSession,
    emb: DataFrame,
    codebook: list[list[float]],
    n_queries: int,
    nprobe: int = 3,
    top_k: int = 3,
) -> DataFrame:
    """IVF probe + exact rerank against a TRAINED codebook: identical
    physical shape to ``suite.pipeline.sim_ivf_topk`` (broadcast
    centroid scoring, probe equi join on centroid id, rerank on
    candidates only) with the centroid table supplied instead of
    stride-derived."""
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(codebook)],
        "cent_id int, ce array<double>",
    ).withColumn("cnq", norm_q(F.col("ce")))
    emb = emb.select(
        F.col("vec_id"), F.col("e"), F.col("nq")
    )
    scored = emb.crossJoin(F.broadcast(cent_df)).select(
        "vec_id",
        "cent_id",
        cosine_from_q(
            dot_q(F.col("e"), F.col("ce")), F.col("nq"), F.col("cnq")
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    ranked = scored.withColumn("crank", F.row_number().over(w))
    assign = ranked.filter(F.col("crank") == 1).select("vec_id", "cent_id")
    probes = ranked.filter(
        (F.col("crank") <= nprobe) & (F.col("vec_id") < n_queries)
    ).select(F.col("vec_id").alias("query_id"), "cent_id")
    cand = (
        probes.join(assign, "cent_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .distinct()
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nq").alias("qnq"),
    )
    ne = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ne"),
        F.col("nq").alias("nnq"),
    )
    rer = (
        cand.join(qe, "query_id")
        .join(ne, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_q(
                dot_q(F.col("qe"), F.col("ne")), F.col("qnq"), F.col("nnq")
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return rer.withColumn(
        "rank", F.row_number().over(w2).cast("long")
    ).filter(F.col("rank") <= top_k)
