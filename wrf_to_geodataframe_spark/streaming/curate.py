"""Streaming curation — the continuous-ingestion mirror of the batch
``suite/pipeline.curate_v2`` chain (VERDICT r6 item #4): documents
arrive as a stream and flow through quality gate -> repetition
thresholds -> PII scrub -> benchmark decontamination -> exact dedup,
emitting the curated-document stream a landing table ingests.

Streaming re-expression of each stage (same semantics, stream-legal
plan shapes):

- **quality / repetition**: both are PER-DOCUMENT functions, so the
  batch chain's only grouped part (top-word count via explode +
  groupBy) becomes a higher-order array expression per row
  (``array_max(transform(array_distinct(toks), w -> count))``) —
  stateless, JVM-side.  O(words x distinct-words) per doc, bounded by
  the quality gate's own length window; the batch form stays the right
  shape for offline reprocessing.
- **PII scrub**: stateless expressions, identical to batch.
- **decontamination**: the benchmark side is STATIC (the capped eval
  shingle-hash set, benchmark-sized by the same ``_NGRAM_DF_CAP``
  boilerplate guard), joined in as a broadcast 1-row array and tested
  per row with ``arrays_overlap`` — stateless.  Equivalent to the
  batch capped-index equi join because the eval set is already
  hot-shingle-free (doc ∩ ev_capped == doc_capped ∩ ev_capped).
- **exact dedup**: the chain's ONE stateful operator —
  ``dropDuplicates`` on the scrubbed-content key (exact, unbounded
  state) or ``dropDuplicatesWithinWatermark`` (event-time-bounded
  state, the 100 TB/day shape: the dedup horizon is a product decision
  exactly as in ``streaming/urls.py``).

The temperature-mixture/quota stage is deliberately NOT here: quotas
rank the full survivor population, which is a manifest-SEALING
decision — run the batch ``curate_v2`` mixture over the curated
landing table when a training snapshot is cut.  A streaming complete-
mode rank would hold corpus-sized state to re-answer a question only
asked once per snapshot.

Stream==batch equivalence (stage-for-stage against ``curate_v2``'s
pre-mixture survivors) is pinned in ``tests/test_streaming.py``,
including a late-data duplicate crossing a micro-batch boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.functions.text import (
    hash60,
    shingles_from_tokens,
    tokens,
)


def static_eval_shingle_set(docs: DataFrame) -> DataFrame:
    """The static benchmark side as ONE row ``(ev_hs array<long>)``:
    the df-capped eval-split shingle hashes, built BATCH-side from the
    reference corpus with the exact constants of the batch operator
    (so stream and batch classify identically).  Benchmark-sized by
    construction — the array broadcasts."""
    from wrf_to_geodataframe_spark.suite.pipeline import (
        _DECON_EVAL_MOD,
        _DECON_K,
        _NGRAM_DF_CAP,
        _cap_index,
    )
    from wrf_to_geodataframe_spark.functions.text import exploded_shingles

    raw = exploded_shingles(docs, _DECON_K).select(
        "doc_id", hash60(F.col("s")).alias("hs")
    )
    idx = _cap_index(raw, _NGRAM_DF_CAP)
    return (
        idx.filter(F.col("doc_id") % _DECON_EVAL_MOD == 0)
        .agg(F.collect_set("hs").alias("ev_hs"))
    )


def curated_doc_stream(
    stream: DataFrame, ev_set: DataFrame, keep_text: bool = False
) -> DataFrame:
    """Stages 1-4 (quality, repetition, scrub, decontam) over a
    ``(doc_id, lang, source, text[, ts])`` stream — fully STATELESS
    (pure projections/filters + a broadcast stream-static join), so it
    composes under any downstream stateful operator.  Emits the batch
    manifest columns plus any extra input columns (e.g. event time);
    ``keep_text=True`` also carries the SCRUBBED text (the content
    later stages consume, per the batch convention) for downstream
    transforms like the chunk fan-out."""
    from wrf_to_geodataframe_spark.suite.pipeline import (
        _CURATE2_MAX_DUP3_PPM,
        _CURATE2_MAX_TOPW_PPM,
        _DECON_EVAL_MOD,
        _DECON_K,
        _SCRUB_EMAIL_RE,
        _SCRUB_URL_RE,
    )

    extra = [c for c in stream.columns if c not in ("doc_id", "lang", "source", "text")]

    toks = tokens(F.col("text"))
    n_words = F.size(toks).cast("long")
    n_chars = F.length(F.col("text")).cast("long")
    avg_word_len = (n_chars - (n_words - 1)).cast("double") / n_words
    quality = stream.withColumn("n_tokens", n_words).filter(
        (n_words >= 50) & (avg_word_len >= 2.0) & (avg_word_len <= 12.0)
    )

    # repetition thresholds, per-row HOF form of the batch expressions
    toks_c = F.col("toks")
    t3 = F.greatest(F.size(toks_c) - 2, F.lit(0)).cast("long")
    d3 = F.size(shingles_from_tokens(toks_c, 3)).cast("long")
    top_c = F.array_max(
        F.transform(
            F.array_distinct(toks_c),
            lambda w: F.size(F.filter(toks_c, lambda t: t == w)),
        )
    ).cast("long")
    calm = (
        quality.withColumn("toks", toks)
        .withColumn("t3", t3)
        .withColumn("d3", d3)
        .withColumn("top_c", top_c)
        .filter(
            (
                F.expr(
                    "(t3 - d3) * CAST(1000000 AS BIGINT)"
                    " div greatest(t3, CAST(1 AS BIGINT))"
                )
                <= _CURATE2_MAX_DUP3_PPM
            )
            & (
                F.expr(
                    "top_c * CAST(1000000 AS BIGINT)"
                    " div greatest(n_tokens, CAST(1 AS BIGINT))"
                )
                <= _CURATE2_MAX_TOPW_PPM
            )
        )
    )

    # PII scrub (identical planted-PII + redaction expressions)
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" contact-"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" https://ex.com/doc/"), F.col("doc_id")),
        ).otherwise(F.lit("")),
    )
    t = F.col("t")
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, _SCRUB_EMAIL_RE, "[EMAIL]"), _SCRUB_URL_RE, "[URL]"
    )
    scrub = calm.withColumn("t", aug).select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        F.size(F.regexp_extract_all(t, F.lit(_SCRUB_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_SCRUB_URL_RE), 0))
        .cast("long")
        .alias("n_urls"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        *([scrubbed.alias("scrubbed_text")] if keep_text else []),
        "toks",
        *extra,
    )

    # decontamination: benchmark split out, contaminated docs out
    hs8 = F.transform(
        shingles_from_tokens(F.col("toks"), _DECON_K), lambda s: hash60(s)
    )
    clean = (
        scrub.filter(F.col("doc_id") % _DECON_EVAL_MOD != 0)
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(ev_set.withColumn("_k", F.lit(1))), "_k")
        .filter(~F.coalesce(F.arrays_overlap(hs8, F.col("ev_hs")), F.lit(False)))
        .drop("_k", "ev_hs", "toks")
    )
    return clean


def stream_curate(stream: DataFrame, ev_set: DataFrame) -> DataFrame:
    """Full chain with EXACT dedup (unbounded state) — right for
    bounded backfills and availableNow drains."""
    return curated_doc_stream(stream, ev_set).dropDuplicates(["scrubbed_md5"])


def stream_curate_to_chunks(
    stream: DataFrame, ev_set: DataFrame, w: int = 32, s: int = 24
) -> DataFrame:
    """The COMPOSED streaming ingestion spine (VERDICT r11 item 8):
    curate stages 1-4 -> exact dedup on the scrubbed key -> RAG chunk
    fan-out, all one streaming plan.  The chunker is the batch gate's
    own ``chunk_tokens`` applied to the SCRUBBED text (the same shared-
    helper discipline as streaming/chunk.py, so window/stride/tail
    semantics cannot drift from the batch ``chunk_documents`` gate),
    and it is stateless, so the chain's only state remains the dedup
    key set.  Emits (doc_id, chunk_start, n_tokens, chunk_text) in
    append mode.

    Stream==batch execution equivalence (the same composition applied
    to the static frame, plus a second availableNow pass over appended
    files) is pinned in tests/test_streaming.py."""
    from wrf_to_geodataframe_spark.suite.pipeline import chunk_tokens

    deduped = curated_doc_stream(
        stream, ev_set, keep_text=True
    ).dropDuplicates(["scrubbed_md5"])
    return chunk_tokens(
        deduped.select("doc_id", F.col("scrubbed_text").alias("text")),
        w=w, s=s,
    )


def stream_split_holdout(
    stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Train/val/test assignment AT INGEST — the streaming twin of the
    batch ``pipeline_split_holdout`` gate: the split is a pure
    CONTENT-hash bucket (``suite/pipeline.holdout_split``, the shared
    expression), so it is STATELESS — an arriving document gets the
    same split a batch pass would assign, byte-identical copies land
    in the same split whenever they arrive, and no corpus state is
    held.  (The near-dup-safe variant has NO streaming twin by design:
    cluster co-location needs the full MinHash connected-components
    closure — a manifest-sealing batch decision, like the quota
    mixture.)  Assign on the RAW text BEFORE any scrub stage — the
    batch gate buckets the original document text."""
    from wrf_to_geodataframe_spark.suite.pipeline import holdout_split

    return stream.withColumn("split", holdout_split(F.col(text_col)))


def stream_curate_with_split(
    stream: DataFrame, ev_set: DataFrame
) -> DataFrame:
    """The curation spine with the holdout split carried from ingest:
    split assigned on the raw text (stateless), then the stage-1-4
    chain + exact dedup — ``split`` rides through as an extra column,
    so the curated landing table is already partitionable by split
    when a training snapshot is cut."""
    return stream_curate(stream_split_holdout(stream), ev_set)


def stream_curate_within_watermark(
    stream: DataFrame,
    ev_set: DataFrame,
    ts_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Full chain with event-time-bounded dedup state — the continuous
    100 TB/day form; duplicates later than the horizon re-enter (a
    recrawl/refresh decision, as in ``streaming/urls.py``)."""
    return (
        curated_doc_stream(stream, ev_set)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["scrubbed_md5"])
    )
