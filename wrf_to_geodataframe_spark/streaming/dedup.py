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
