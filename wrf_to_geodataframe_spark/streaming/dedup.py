"""Streaming deduplication (§2.8 / brief north-star: the streaming form
of the exact-dedup pipeline operator).

Two standard layouts, both built-in Structured Streaming:

- ``stream_dedup_exact``: ``dropDuplicates`` on a content key — state
  holds every key ever seen; exact, but state grows without bound.  The
  right tool for bounded key spaces (entity ids).
- ``stream_dedup_within_watermark``: ``dropDuplicatesWithinWatermark``
  on the content key — keeps a key's state only until the event-time
  watermark passes it, so state is O(keys per watermark horizon).  This
  is the 100 TB/day shape: exact within the horizon, bounded memory
  forever, the same trade a production log-dedup makes.

The batch equivalence test (tests/test_streaming.py) drains a bounded
source through both and compares against the batch ``dropDuplicates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Unbounded-state exact dedup: first event per key wins, all later
    duplicates are dropped in whichever micro-batch they arrive."""
    return stream.dropDuplicates(key_cols)


def stream_dedup_within_watermark(
    stream: DataFrame,
    ts_col: str,
    key_cols: list[str],
    delay: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded dedup: duplicates arriving within ``delay`` of
    the original (in event time) are dropped; state for older keys is
    evicted.  Exactly ``dropDuplicatesWithinWatermark`` — the engine
    guarantees no duplicate EMISSIONS for events inside the horizon."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def content_keyed(stream: DataFrame, text_col: str = "props") -> DataFrame:
    """Attach the md5 content key used by the batch exact-dedup operator
    (suite/pipeline.dedup_exact) so stream and batch dedup agree on
    identity."""
    return stream.withColumn("content_md5", F.md5(F.col(text_col)))


def bloom_words_static(old_keys: DataFrame, key_col: str = "key"):
    """Build the STATIC Bloom word table (widx, w) from the trained
    corpus's content keys — the batch artifact a streaming screen
    broadcasts.  Delegates to the ONE shared implementation
    (suite/pipeline.bloom_word_table), so the bit arithmetic cannot
    drift from the batch gate."""
    from wrf_to_geodataframe_spark.suite.pipeline import (
        bloom_word_table,
    )

    return bloom_word_table(old_keys, key_col)


def stream_bloom_screen(
    stream: DataFrame,
    words: DataFrame,
    key_col: str = "key",
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Streaming Bloom membership screen — the ingest-time mirror of
    ``dedup_bloom_incremental``'s probe side: each arriving document's
    k probe positions stream-static broadcast-join the fixed-size word
    table; ``bloom_hit`` marks keys POSSIBLY in the trained corpus
    (route to the exact verifier), everything else is definitively
    new.  Fully STATELESS per micro-batch (explode + broadcast join +
    per-doc aggregate), so it composes under any downstream stateful
    operator — the only state a full streaming dedup chain needs
    remains the exact stage's.

    Emits (id_cols..., key, bloom_hit) ONLY — the aggregate keys on
    the compact (id, key) pair, never the full row (payload columns
    would otherwise key the shuffle/aggregate state and byte-identical
    rows would silently merge); join payload back by id downstream.
    Delegates to the shared ``suite/pipeline.bloom_probe``.

    Streaming caveat: the per-doc aggregate makes this an UPDATE/
    COMPLETE-mode query on its own; compose it before a stateful sink
    or use foreachBatch for append semantics.  Equivalence with the
    batch probe is pinned in tests/test_streaming.py."""
    from wrf_to_geodataframe_spark.suite.pipeline import bloom_probe

    return bloom_probe(stream, words, key_col, tuple(id_cols))
