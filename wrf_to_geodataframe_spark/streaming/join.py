"""Stream-stream interval join (§2.8): the streaming form of the
range join — pairs of a user's events within one hour, computed over
two unbounded streams.

Structured Streaming buffers both sides in state and needs two bounds
to keep that state finite:
- watermarks on both inputs (how late a row may arrive), and
- the join's time-range predicate (how far apart matching rows may be);
together they let the engine evict buffered rows once no future input
could match them — state is O(rate x (watermark + range)), not O(all
history).  Without the range condition a stream-stream inner join is
rejected outright for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_range_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "2 hours",
    range_sql: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """All ordered pairs (a, b) of same-user events with
    0 < b.ts - a.ts < range, over two streams.

    Output matches the batch ``j_range_join``: (da, db, delta_us)."""
    a = (
        left.select(
            F.col("user_id"),
            F.col("event_id").alias("da"),
            F.col("ts").alias("ts_a"),
        )
        .withWatermark("ts_a", watermark)
        .alias("a")
    )
    b = (
        right.select(
            F.col("user_id").alias("user_id_b"),
            F.col("event_id").alias("db"),
            F.col("ts").alias("ts_b"),
        )
        .withWatermark("ts_b", watermark)
        .alias("b")
    )
    joined = a.join(
        b,
        F.expr(
            "a.user_id = user_id_b AND ts_b > ts_a "
            f"AND ts_b < ts_a + {range_sql}"
        ),
    )
    return joined.select(
        "da",
        "db",
        (F.unix_micros("ts_b") - F.unix_micros("ts_a")).alias("delta_us"),
    )
