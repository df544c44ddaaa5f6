"""Streaming URL dedup: the crawl frontier's online form.

A crawler's fetch stream must drop URLs it has already fetched —
after canonicalization, because the same page arrives under
utm-decorated / fragment-bearing / case-scrambled spellings.  This is
the streaming twin of the batch ``url_dedup`` gate row and uses the
SAME ``functions/urls.canonical_url`` expression, so batch and stream
semantics cannot drift (the ``_cap_index`` discipline applied to
URLs).

Two layouts, mirroring ``streaming/dedup.py``:

- ``stream_url_dedup``: ``dropDuplicates`` on the canonical URL —
  exact forever, unbounded state; right for bounded frontiers.
- ``stream_url_dedup_within_watermark``: canonical-URL dedup with
  event-time-bounded state — the 100 TB/day crawl shape (a refetch
  horizon IS a product decision: pages older than the horizon are
  allowed to re-enter for recrawl).

Stream==batch equivalence is pinned in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from wrf_to_geodataframe_spark.functions.urls import canonical_url


def stream_url_dedup(stream: DataFrame, url_col: str) -> DataFrame:
    out = stream.withColumn("canon_url", canonical_url(stream[url_col]))
    return out.dropDuplicates(["canon_url"])


def stream_url_dedup_within_watermark(
    stream: DataFrame,
    url_col: str,
    ts_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    out = stream.withColumn("canon_url", canonical_url(stream[url_col]))
    return out.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["canon_url"]
    )
