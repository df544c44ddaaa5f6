"""Streaming benchmark decontamination — the STREAM-STATIC JOIN form of
``suite/pipeline.decontam_ngram`` (§2.8 / brief north-star): documents
arrive as a stream and are checked against a STATIC held-out benchmark
shingle index.

This is the one core Structured Streaming join shape the rest of the
streaming suite didn't yet exercise: the static side is planned like a
batch relation and re-resolved per micro-batch (so a refreshed
benchmark index is picked up on restart), the stream side needs NO
state for the join itself — only the per-doc aggregation holds state,
and with ``availableNow`` drains it is bounded by the batch.

At 100 TB/day: the eval index is benchmark-sized (tiny — it broadcasts
under AQE), each micro-batch shuffles only its own shingles, and the
same ``_NGRAM_DF_CAP`` boilerplate guard bounds the join fan-out.

Streaming constraint honored: ``count(DISTINCT ...)`` is unsupported on
streams, so the aggregate uses ``size(collect_set(...))`` — identical
values, per-group state bounded by the df cap (a shingle joins at most
df_cap eval docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.functions.text import hash60, shingles_from_tokens, tokens


def read_docs_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a documents landing directory."""
    return spark.readStream.schema(schema).parquet(path)


def doc_shingles(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, hs) distinct-shingle rows — works on batch AND stream
    frames (pure projections + generator, no state)."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("toks"), k)).alias("s"),
    ).select("doc_id", hash60(F.col("s")).alias("hs"))


def static_eval_index(
    docs: DataFrame, k: int = 8, eval_mod: int = 7, df_cap: int = 128
) -> DataFrame:
    """The static benchmark side: capped shingle index of the eval split
    (same cap/split semantics as the batch operator).  Built from a
    BATCH frame; pass the result as the static side of the join."""
    from wrf_to_geodataframe_spark.suite.pipeline import _cap_index

    idx = _cap_index(doc_shingles(docs, k), df_cap)
    return idx.filter(F.col("doc_id") % eval_mod == 0).select(
        "hs", F.col("doc_id").alias("eval_id")
    )


def stream_decontam(
    doc_stream: DataFrame,
    eval_index: DataFrame,
    k: int = 8,
    eval_mod: int = 7,
) -> DataFrame:
    """Per streamed training doc, the contamination evidence row —
    stream-static inner equi join on the shingle hash, then a stateful
    per-doc aggregate (complete/update output).

    CONTRACT: drain-style triggers only (``availableNow`` / bounded
    backfills).  The per-doc aggregate carries no watermark, so while
    per-group state is bounded by the df cap, the NUMBER of groups
    grows with every contaminated doc ever seen — a continuous
    100 TB/day stream would accrete state without bound.  For
    continuous operation use :func:`stream_decontam_windowed`, which
    keys the aggregate on an event-time window + watermark so state is
    evicted once the watermark passes."""
    sh = doc_shingles(doc_stream, k).filter(F.col("doc_id") % eval_mod != 0)
    joined = sh.join(eval_index, "hs")
    return joined.groupBy("doc_id").agg(
        F.size(F.collect_set("hs")).cast("long").alias("n_shared_ngrams"),
        F.size(F.collect_set("eval_id")).cast("long").alias("n_eval_docs"),
        F.min("eval_id").alias("first_eval_id"),
    )


def stream_decontam_windowed(
    doc_stream: DataFrame,
    eval_index: DataFrame,
    ts_col: str = "ts",
    k: int = 8,
    eval_mod: int = 7,
    window_duration: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """The CONTINUOUS-operation form of :func:`stream_decontam`: the
    per-doc aggregate is keyed on an event-time window with a
    watermark, so closed windows EMIT (append output mode) and their
    state is evicted once the watermark passes — total state is
    bounded by (docs arriving inside one watermark horizon), not by
    stream lifetime.  Docs straddling a micro-batch boundary but
    inside the lateness allowance still merge into their window;
    docs later than the watermark are dropped by contract (standard
    Structured Streaming late-data semantics).  Output adds the
    window struct to the evidence row."""
    sh = (
        doc_stream.withWatermark(ts_col, watermark_delay)
        .select("doc_id", ts_col, tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            ts_col,
            F.explode(shingles_from_tokens(F.col("toks"), k)).alias("s"),
        )
        .select("doc_id", ts_col, hash60(F.col("s")).alias("hs"))
        .filter(F.col("doc_id") % eval_mod != 0)
    )
    joined = sh.join(eval_index, "hs")
    return joined.groupBy(
        F.window(F.col(ts_col), window_duration), "doc_id"
    ).agg(
        F.size(F.collect_set("hs")).cast("long").alias("n_shared_ngrams"),
        F.size(F.collect_set("eval_id")).cast("long").alias("n_eval_docs"),
        F.min("eval_id").alias("first_eval_id"),
    )
