"""Relational suite: projections, filters, joins, windows, set ops,
distinct, string/JSON — SURVEY.md §2.3/2.4/2.7 plus the §2.8 gap table.

Every query here is fully DuckDB-expressible; oracle SQL follows each
function.  Numeric discipline as in suite/__init__: quantize before any
multi-row float sum; min/max/count/pass-through floats stay raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wrf_to_geodataframe_spark.session import load_table
from wrf_to_geodataframe_spark.suite.core import GRID_W, Q, grid_cells, q6

# ---------------------------------------------------------------------------
# P1/P2 — projections


def p1_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column drop (SURVEY.md §2 P1, wrf_voronoi.py:117-118
    ``ds_t.drop(["x","y"])``): remove unwanted columns, keep every row."""
    return load_table(spark, sf_dir, "events").drop("props", "event_type")


_P1_SQL = "SELECT event_id, ts, user_id, value FROM events"


def p2_select_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select (SURVEY.md §2 P2, wrf_voronoi.py:160 ``[["Tmin"]]``):
    keep named columns only — Catalyst prunes the parquet scan to them."""
    return load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")


_P2_SQL = "SELECT event_id, user_id, value FROM events"


# ---------------------------------------------------------------------------
# P3 — positional time slice


def p3_time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional time slice (SURVEY.md §2 P3, haduk_voronoi.py:74 /
    delphine/regrid.py:208 ``isel(time=1)``): select the SECOND timestep.

    Spark has no positional indexing, so the ordinal is manufactured:
    dense_rank over the *distinct* time axis (bounded by #timesteps, not
    #rows — the global window runs on a table of days, never on events),
    broadcast-joined back onto the fact rows.
    """
    events = load_table(spark, sf_dir, "events")
    days = events.select(F.to_date("ts").alias("day")).distinct()
    idx = days.withColumn(
        "t_idx", F.dense_rank().over(Window.orderBy("day")) - 1
    )
    target = F.broadcast(idx.filter(F.col("t_idx") == 1).select("day"))
    return (
        events.withColumn("day", F.to_date("ts"))
        .join(target, "day")
        # DateType reaches pandas as object; timestamp compares cleanly
        .select("event_id", "user_id", F.col("day").cast("timestamp"), "value")
    )


_P3_SQL = """
WITH idx AS (
    SELECT day, dense_rank() OVER (ORDER BY day) - 1 AS t_idx
    FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
)
SELECT e.event_id, e.user_id, CAST(CAST(e.ts AS DATE) AS TIMESTAMP) AS day, e.value
FROM events e JOIN idx ON CAST(e.ts AS DATE) = idx.day
WHERE idx.t_idx = 1
"""


# ---------------------------------------------------------------------------
# P6/P7 — value mask + null fill


def p6_value_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value mask (SURVEY.md §2 P6, delphine/regrid.py:316 ``.where(x > 1)``):
    NULL-out values <= 1, keep the row (xarray ``where`` semantics)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.when(F.col("value") > 1.0, F.col("value")).alias("value_masked"),
    )


_P6_SQL = """
SELECT event_id, CASE WHEN value > 1.0 THEN value END AS value_masked
FROM events
"""


def p7_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null fill (SURVEY.md §2 P7, delphine/regrid.py:260 ``fillna(0)``)
    composed over the P6 mask — mask then fill, exactly the reference's
    prep step before the weighted transfer."""
    events = load_table(spark, sf_dir, "events")
    masked = F.when(F.col("value") > 1.0, F.col("value"))
    return events.select(
        "event_id", F.coalesce(masked, F.lit(0.0)).alias("value_filled")
    )


_P7_SQL = """
SELECT event_id,
       coalesce(CASE WHEN value > 1.0 THEN value END, 0.0) AS value_filled
FROM events
"""


# ---------------------------------------------------------------------------
# P8 — conditional sentinel expression


def p8_conditional_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional sentinel (SURVEY.md §2 P8, wrf_voronoi.py:130-137
    ``Polygon(...) if -1 not in region else Point(0, 0)``): per-row CASE
    mapping degenerate cells to the sentinel point.  Here "degenerate" =
    cells on the grid boundary (the cells whose Voronoi regions are
    unbounded before clipping)."""
    cells = grid_cells(spark, sf_dir)
    degenerate = (F.col("x_idx") == 0) | (F.col("y_idx") == 0)
    return cells.select(
        "user_id",
        F.when(degenerate, F.lit(0.0)).otherwise(F.col("x")).alias("px"),
        F.when(degenerate, F.lit(0.0)).otherwise(F.col("y")).alias("py"),
        degenerate.alias("is_sentinel"),
    )


_P8_SQL = f"""
WITH cells AS (
    SELECT DISTINCT user_id,
           user_id % {GRID_W} AS x_idx,
           CAST(floor(user_id / {GRID_W}.0) AS BIGINT) AS y_idx,
           CAST(user_id % {GRID_W} AS DOUBLE) AS x,
           floor(user_id / {GRID_W}.0) AS y
    FROM events
)
SELECT user_id,
       CASE WHEN x_idx = 0 OR y_idx = 0 THEN 0.0 ELSE x END AS px,
       CASE WHEN x_idx = 0 OR y_idx = 0 THEN 0.0 ELSE y END AS py,
       x_idx = 0 OR y_idx = 0 AS is_sentinel
FROM cells
"""


# ---------------------------------------------------------------------------
# C4 — cast


def c4_cast_float32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """float64 → float32 downcast (SURVEY.md §2 C4,
    delphine/regrid.py:311 ``.astype("float32")``).

    The cast is codegen-floor cheap and the gate COLLECTS every row, so
    the wall cost is the driver-side result fetch: coalesce the scan to
    the split count its bytes warrant (r18, guide §2.2 — strict no-op
    at archive scale; see coalesce_small_scan)."""
    from wrf_to_geodataframe_spark.session import (
        coalesce_small_scan,
        sf_path,
    )

    li = coalesce_small_scan(
        load_table(spark, sf_dir, "lineitem"), sf_path(sf_dir, "lineitem")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("float").alias("price_f32"),
    )


_C4_SQL = """
SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS REAL) AS price_f32
FROM lineitem
"""


# ---------------------------------------------------------------------------
# O1 — sort by composite key (observable via row_number position)


def o1_sort_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort by composite key (SURVEY.md §2 O1, delphine/regrid.py:139
    ``sortby([x, y])``).  The hash compare is order-insensitive, so the
    sort is made observable as a materialized position column — the
    global position under (y_idx, x_idx) order (unique per cell).

    SCALE-SAFE global ordering (VERDICT r11): a bare
    ``row_number().over(Window.orderBy(...))`` plans a SINGLE-PARTITION
    WindowExec — one task sorts the whole table.  Instead the position
    is assembled from (a) a per-y_idx local rank (window PARTITIONED
    by the leading sort key — parallel, each group one grid row) and
    (b) the cumulative count of cells in preceding y rows, a window
    over the per-y COUNTS frame only, broadcast back.  pos =
    offset(y) + local_rank(x within y) — identical to the global
    row_number, no single-task stage; the zipWithIndex shape.

    Boundedness contract for (b): the offsets frame is AXIS-sized
    (one row per distinct y), the same accepted class as
    p3_time_slice's days table and tessellate's axis values — real
    grids have ~1e3-1e4 rows per axis regardless of cell count.  If
    an ordering key's distinct count ever grows with the data instead
    (as a dense row-id would), the escalation path is the second
    bucketing level operators/shards.seeded_token_offsets uses:
    arithmetic div-bucketing of the key to a constant bucket count,
    cumsum over the bucket totals only."""
    cells = grid_cells(spark, sf_dir)
    per_y = cells.groupBy("y_idx").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("y_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = per_y.select(
        "y_idx",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("_off"),
    )
    w_loc = Window.partitionBy("y_idx").orderBy("x_idx")
    return (
        cells.join(F.broadcast(off), "y_idx")
        .select(
            "user_id", "y_idx", "x_idx",
            (F.col("_off") + F.row_number().over(w_loc))
            .cast("long")
            .alias("pos"),
        )
    )


_O1_SQL = f"""
WITH cells AS (
    SELECT DISTINCT user_id,
           user_id % {GRID_W} AS x_idx,
           CAST(floor(user_id / {GRID_W}.0) AS BIGINT) AS y_idx
    FROM events
)
SELECT user_id, y_idx, x_idx,
       CAST(row_number() OVER (ORDER BY y_idx, x_idx) AS BIGINT) AS pos
FROM cells
"""


# ---------------------------------------------------------------------------
# J1 — composite-key triple join (the reference's chained .join x3)


def j1_composite_triple_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi join ×3 (SURVEY.md §2 J1, wrf_voronoi.py:175-180:
    polygons .join(df_min).join(df_max).join(df_mean) on the 2-column grid
    key).  Each aggregate side is small → AQE broadcasts all three."""
    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        (F.col("user_id") % GRID_W).alias("x_idx"),
        F.floor(F.col("user_id") / GRID_W).alias("y_idx"),
        "value",
    )
    mins = keyed.groupBy("x_idx", "y_idx").agg(F.min("value").alias("v_min"))
    maxs = keyed.groupBy("x_idx", "y_idx").agg(F.max("value").alias("v_max"))
    counts = keyed.groupBy("x_idx", "y_idx").agg(F.count(F.lit(1)).alias("n"))
    cells = grid_cells(spark, sf_dir).select("user_id", "x_idx", "y_idx")
    key = ["x_idx", "y_idx"]
    return (
        cells.join(mins, key, "left")
        .join(maxs, key, "left")
        .join(counts, key, "left")
        .select("user_id", "x_idx", "y_idx", "v_min", "v_max", "n")
    )


_J1_SQL = f"""
WITH keyed AS (
    SELECT user_id % {GRID_W} AS x_idx,
           CAST(floor(user_id / {GRID_W}.0) AS BIGINT) AS y_idx,
           value
    FROM events
),
cells AS (SELECT DISTINCT user_id, x_idx, y_idx FROM (
    SELECT user_id, user_id % {GRID_W} AS x_idx,
           CAST(floor(user_id / {GRID_W}.0) AS BIGINT) AS y_idx
    FROM events)),
mins AS (SELECT x_idx, y_idx, min(value) AS v_min FROM keyed GROUP BY 1, 2),
maxs AS (SELECT x_idx, y_idx, max(value) AS v_max FROM keyed GROUP BY 1, 2),
counts AS (SELECT x_idx, y_idx, count(*) AS n FROM keyed GROUP BY 1, 2)
SELECT c.user_id, c.x_idx, c.y_idx, mn.v_min, mx.v_max, ct.n
FROM cells c
LEFT JOIN mins mn USING (x_idx, y_idx)
LEFT JOIN maxs mx USING (x_idx, y_idx)
LEFT JOIN counts ct USING (x_idx, y_idx)
"""


# ---------------------------------------------------------------------------
# J2 — attribute equi join (star-schema dimension chain)


def j2_attribute_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute equi join (SURVEY.md §2 J2, delphine/regrid.py:251-253):
    attach dimension attributes by integer key — the float-key hazard of
    the reference resolved by joining on surrogate integers.  Dimension
    tables are tiny → explicit broadcast."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(q6(F.col("c_acctbal"))).cast("double") / F.lit(float(Q))).alias(
                "total_acctbal"
            ),
        )
    )


_J2_SQL = f"""
SELECT r_name,
       count(*) AS n_customers,
       CAST(sum(CAST(floor(c_acctbal * {Q}.0) AS BIGINT)) AS DOUBLE) / {Q}.0
           AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# J6 — index-realign join (agg result re-attached to base rows)


def j6_realign_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-realign join (SURVEY.md §2 J6, delphine/regrid.py:285-289):
    attach a grouped-aggregate result back onto the base table by key —
    the reference does it by pandas index assignment; here an explicit
    equi join (agg side small → broadcast)."""
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("user_id").agg(
        (F.sum(q6(F.col("value"))).cast("double") / F.lit(float(Q))).alias("user_total")
    )
    return events.join(totals, "user_id").select(
        "event_id", "user_id", "value", "user_total"
    )


_J6_SQL = f"""
WITH totals AS (
    SELECT user_id,
           CAST(sum(CAST(floor(value * {Q}.0) AS BIGINT)) AS DOUBLE) / {Q}.0
               AS user_total
    FROM events GROUP BY 1
)
SELECT e.event_id, e.user_id, e.value, t.user_total
FROM events e JOIN totals t USING (user_id)
"""


# ---------------------------------------------------------------------------
# W — window functions (§2.8 gap table)


def w1_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (§2.8): latest event per user via row_number over a
    per-user time order (event_id as the unique tiebreak — deterministic
    under any partitioning)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )


_W1_SQL = """
SELECT user_id, event_id, value
FROM (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
"""


def w2_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window (§2.8): per-user inter-event gap via lag — exact
    integer microsecond arithmetic, no float drift possible."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


_W2_SQL = """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


def w3_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame window (§2.8): 3-row rolling mean per user.  Sums run over
    quantized BIGINTs; with ≤3 addends under 2^45 every addition order is
    exact, so Spark's sliding-sum and DuckDB's segment tree agree."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        (
            F.sum(q6(F.col("value"))).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
            / F.lit(float(Q))
        ).alias("rolling_mean"),
    )


_W3_SQL = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * {Q}.0) AS BIGINT))
                OVER w AS DOUBLE)
       / count(*) OVER w / {Q}.0 AS rolling_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# SET — set operations (§2.8 gap table)


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets (§2.8)."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click").select("user_id")
    b = events.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


_SET_UNION_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two key sets (§2.8)."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click").select("user_id")
    b = events.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


_SET_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) of two composite-key sets (§2.8):
    (user, event_type) incidence pairs minus the error pairs —
    ``subtract`` is Spark's EXCEPT DISTINCT."""
    events = load_table(spark, sf_dir, "events")
    a = events.select("user_id", "event_type")
    b = events.filter(F.col("event_type") == "error").select("user_id", "event_type")
    return a.subtract(b)


_SET_EXCEPT_SQL = """
SELECT user_id, event_type FROM events
EXCEPT
SELECT user_id, event_type FROM events WHERE event_type = 'error'
"""


def dist_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct over a column subset (§2.8): the (user, event_type)
    incidence set."""
    events = load_table(spark, sf_dir, "events")
    return events.select("user_id", "event_type").dropDuplicates()


_DIST_SQL = "SELECT DISTINCT user_id, event_type FROM events"


# ---------------------------------------------------------------------------
# STR/JSON — string + JSON functions (§2.8 gap table)


def str_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (§2.8) over ``events.props``: pull the integer
    property and aggregate it per event_type — exact BIGINT sums."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.count(k).alias("k_count"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


_STR_JSON_SQL = """
SELECT event_type,
       CAST(sum(k) AS BIGINT) AS k_sum,
       count(k) AS k_count, min(k) AS k_min, max(k) AS k_max
FROM (
    SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
GROUP BY event_type
"""


def str_text_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (§2.8) over ``documents``: case mapping, length,
    substring, trailing-trim, and an arithmetic word count (identical
    replace-based formula on both engines — no split() edge-case drift)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_spaces = F.length(text) - F.length(F.regexp_replace(text, " ", ""))
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.length(text).cast("long").alias("text_len"),
        F.substring(text, 1, 16).alias("prefix16"),
        (n_spaces + F.lit(1)).cast("long").alias("n_words"),
    )


_STR_TEXT_SQL = """
SELECT doc_id,
       upper(lang) AS lang_uc,
       length(text) AS text_len,
       substring(text, 1, 16) AS prefix16,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_words
FROM documents
"""


# ---------------------------------------------------------------------------
# R — rollup (grouping sets, §2.8 "not present in reference" extension)


def r1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (§2.5 extension): event counts by
    (event_type, day) with subtotals and a grand total."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.rollup("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("day").cast("timestamp"), "n")
    )


_R1_SQL = """
SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n
FROM events
GROUP BY ROLLUP (event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP))
"""


def w4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (§2.8 streaming row, batch form): per-user event
    sessions split at 12-hour inactivity gaps via the built-in
    ``session_window`` — the same operator Structured Streaming uses
    with a watermark.  The oracle states the gaps-and-islands form
    (lag + running sum), proving the window semantics rather than
    echoing them."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window(F.col("ts"), "12 hours").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


_W4_SQL = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts) >= 43200000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 12 HOUR AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# Semi/anti joins + distinct aggregates (§2.4 "not present in reference")


def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers that placed at least one order —
    existence check without duplicating the left side."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_J_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers that never placed an urgent order (the
    filter rides on the build side, so the anti join stays one hash
    lookup per probe row)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_J_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (§2.5 extension): distinct users and
    distinct days per event type."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


_AGG_CD_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Funnel analysis (sequential-pattern aggregation over the event stream)


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel timestamps per user: first view, first click
    AFTER that view, first purchase AFTER that click — the standard
    product-analytics sequential pattern, expressed as three
    filtered-min aggregations chained on user_id.

    Scale shape: each stage is a narrow shuffle on the same key (the
    event_type filters push into the scan), and stages after the first
    join against one-row-per-user frames that only shrink."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
    )


_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


# ---------------------------------------------------------------------------
# Statistical moments (§2.5 gap: second-order aggregates)


def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev / covariance / correlation per return flag.  Both
    engines use numerically-stable one-pass updates whose last bits
    differ; outputs are rounded (4dp for the scale-carrying moments, 6dp
    for the unit-free correlation) — verified stable at every SF."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "cov_qty_price"
        ),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
    )


_AGG_MOMENTS_SQL = """
SELECT l_returnflag, count(*) AS n,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Grouping sets: CUBE (r1_rollup's bigger sibling, §2.5 gap)


def r2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations
    in one Expand + one shuffle — the hypertable-rollup shape for
    pre-computing every marginal at once."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias(
            "qty_cents"
        ),
    )


_R2_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS qty_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# As-of join (point-in-time lookup; absent from the reference, standard
# in time-series engines — composed from union + window, no inequality
# join, one shuffle)


def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for every (user, day) probe point at local noon, the
    user's latest event STRICTLY before that instant.

    Spark has no asof primitive; the scale-safe composition is the
    union-and-window form: tag probes and events, sort each user's
    timeline once (ONE shuffle on user_id), and carry the last event
    struct forward with last(..., ignorenulls) over an
    unboundedPreceding..-1 frame.  Probes sort BEFORE events at equal
    timestamps (tag asc), so the frame excludes ties — strict '<'.  The
    oracle is DuckDB's native ASOF JOIN: independent semantics, not an
    expression echo.

    Tie-proofing: DuckDB's ASOF JOIN does not specify which of several
    events at the SAME (user_id, ts) it returns, so both sides first
    collapse events to one row per (user_id, ts) — highest event_id
    wins, carrying its value via max_by/arg_max.  The comparison is
    then deterministic on any dataset, duplicates or not."""
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("event_id"),
            F.max_by("value", "event_id").alias("value"),
        )
        .select("user_id", "ts", "event_id", "value")
    )
    probes = ev.select(
        "user_id",
        (F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 12 HOURS")).alias(
            "t"
        ),
    ).distinct()
    tagged_p = probes.select(
        "user_id", "t", F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    tagged_e = ev.select(
        "user_id", F.col("ts").alias("t"), F.lit(1).alias("tag"),
        "event_id", "value",
    )
    u = tagged_p.unionByName(tagged_e)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    le = F.last(
        F.when(F.col("tag") == 1, F.struct("t", "event_id", "value")),
        ignorenulls=True,
    ).over(w)
    return (
        u.withColumn("le", le)
        .filter((F.col("tag") == 0) & F.col("le").isNotNull())
        .select(
            "user_id",
            F.col("t").alias("probe_ts"),
            F.col("le.event_id").alias("asof_event_id"),
            F.col("le.t").alias("asof_ts"),
            F.col("le.value").alias("asof_value"),
        )
    )


_J_ASOF_SQL = """
WITH ev AS (
    SELECT user_id, ts, max(event_id) AS event_id,
           arg_max(value, event_id) AS value
    FROM events GROUP BY user_id, ts
),
probes AS (
    SELECT DISTINCT user_id,
           date_trunc('day', ts) + INTERVAL 12 HOUR AS probe_ts
    FROM ev
)
SELECT p.user_id, p.probe_ts,
       e.event_id AS asof_event_id, e.ts AS asof_ts, e.value AS asof_value
FROM probes p ASOF JOIN ev e
  ON p.user_id = e.user_id AND p.probe_ts > e.ts
"""


# ---------------------------------------------------------------------------
# Range (interval) join — banded bucket decomposition


def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN: all ordered pairs of a user's events strictly within
    one hour of each other (0 < t_b - t_a < 1h).

    Spark turns an inequality join into a cartesian unless banded: both
    sides get an hour-bucket key, the b-side replicates into its bucket
    and the one below (any qualifying pair spans at most one boundary),
    and the join becomes an EQUI join on (user, bucket) + exact
    post-filter.  Each qualifying pair is emitted exactly once — the
    join fixes bucket = a's bucket, and exactly one of b's two exploded
    rows matches it.  The oracle is the plain inequality join."""
    w_us = 3_600_000_000  # one hour in microseconds
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    )
    a = ev.select(
        "user_id",
        F.col("event_id").alias("da"),
        F.col("t").alias("ta"),
        F.floor(F.col("t") / w_us).alias("bkt"),
    )
    b = ev.select(
        "user_id",
        F.col("event_id").alias("db"),
        F.col("t").alias("tb"),
        F.explode(
            F.array(
                F.floor(F.col("t") / w_us), F.floor(F.col("t") / w_us) - 1
            )
        ).alias("bkt"),
    )
    return (
        a.join(b, ["user_id", "bkt"])
        .filter(
            (F.col("tb") > F.col("ta")) & (F.col("tb") < F.col("ta") + w_us)
        )
        .select("da", "db", (F.col("tb") - F.col("ta")).alias("delta_us"))
    )


_J_RANGE_SQL = """
SELECT a.event_id AS da, b.event_id AS db,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) < 3600000000
"""


# ---------------------------------------------------------------------------
# Exact percentiles (absent from reference; §2.5 gap)


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per event type
    (Spark ``percentile`` == DuckDB ``quantile_cont``, both the
    (n-1)*p linear-interpolation definition; outputs rounded at 1e-6 to
    absorb the engines' differing interpolation op order)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9D)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99"),
    )


_AGG_PCT_SQL = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Deterministic hash sampling (pipeline primitive: reproducible sample
# independent of partitioning/row order — TABLESAMPLE is neither)


def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% deterministic sample of lineitem by md5 of the composite key,
    then per-flag totals with the quantization discipline.  The sample
    membership is a pure function of the key — stable under any
    partitioning, shuffle, or engine, unlike TABLESAMPLE/rand()."""
    from wrf_to_geodataframe_spark.functions.text import hash60

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
    )
    sampled = li.filter(hash60(key) % 20 == 0)
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )


_SAMPLE_SQL = """
SELECT l_returnflag, count(*) AS n_sampled,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS price_cents
FROM lineitem
WHERE CAST(('0x' || substr(md5(l_orderkey || '_' || l_linenumber), 1, 15))
           AS BIGINT) % 20 = 0
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Approximate distinct (HLL) — self-validating against the exact count


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count.
    Sketches differ across engines, so the HASH-CHECKED outputs are the
    exact count and a boolean asserting Spark's estimate landed within
    10% — the oracle emits the exact count and TRUE, so an out-of-bounds
    sketch fails the gate.  At 100 TB the approx path is the one that
    avoids the count-distinct shuffle entirely (partial-merge sketches)."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact"),
        F.approx_count_distinct("o_custkey").alias("n_approx"),
    )
    ok = (
        F.abs(F.col("n_approx") - F.col("n_exact"))
        <= 0.1 * F.col("n_exact")
    )
    return g.select("o_orderpriority", "n_exact", ok.alias("approx_within_10pct"))


_AGG_APPROX_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_exact,
       TRUE AS approx_within_10pct
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Unpivot / melt (wide -> long; inverse of C3's pivot)


def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: per-user event stats computed wide (n/min/max) and
    melted to (user_id, metric, metric_value) long form — the inverse of
    the C3 pivot, Spark's ``DataFrame.unpivot`` (codegen'd Expand, one
    pass, no join).  Oracle states it as the portable UNION ALL."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )
    return wide.unpivot(
        ["user_id"], ["n_events", "v_min", "v_max"], "metric", "metric_value"
    )


_UNPIVOT_SQL = """
WITH wide AS (
    SELECT user_id, CAST(count(*) AS DOUBLE) AS n_events,
           min(value) AS v_min, max(value) AS v_max
    FROM events GROUP BY user_id
)
SELECT user_id, 'n_events' AS metric, n_events AS metric_value FROM wide
UNION ALL
SELECT user_id, 'v_min', v_min FROM wide
UNION ALL
SELECT user_id, 'v_max', v_max FROM wide
"""


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE COUNTING per vertex — the graph-analytics companion to
    the connected-components operator (operators/graph.py): an edge
    list derived from lineitem's order/part incidence is closed into
    oriented wedges and matched against the third edge with two
    shuffled EQUI joins (the standard distributed algorithm: orient
    every edge small->large so each triangle is found exactly once,
    as (u < v < w)), then each triangle credits its three corners.

    Scale notes: edge orientation bounds the join fan-out by the
    SMALLER endpoint's degree (the classic heavy-hitter mitigation —
    a star's hub never appears as a join source), and both joins are
    plain equi joins AQE can re-plan; no cartesian anywhere.  The
    oracle states the same closure declaratively."""
    li = load_table(spark, sf_dir, "lineitem")
    u = F.pmod("l_orderkey", F.lit(120)).cast("bigint")
    v = F.pmod("l_partkey", F.lit(120)).cast("bigint")
    edges = (
        li.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u"))
            & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


_TRIANGLES_SQL = """
WITH edges AS (
  SELECT DISTINCT LEAST(l_orderkey % 120, l_partkey % 120) AS u,
                  GREATEST(l_orderkey % 120, l_partkey % 120) AS v
  FROM lineitem
  WHERE l_orderkey % 120 <> l_partkey % 120
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v
), corners AS (
  SELECT a AS vertex FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT vertex, COUNT(*) AS n_triangles
FROM corners GROUP BY 1
"""


_MERGE_CUT = "2024-02-01"


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / UPSERT semantics (the Delta/Iceberg ``MERGE INTO``
    statement as a plain plan): a TARGET snapshot (latest value per
    user before a cutoff) receives an UPDATES batch (latest value per
    user after it) — matched keys update, unmatched insert, untouched
    rows carry through, each row labeled with its merge action.
    Expressed as two dedup-to-latest windows + ONE full outer join on
    the key; deterministic latest via the (ts, event_id) total order.

    Scale shape: both sides shuffle once on the merge key and the
    outer join reuses that partitioning; at warehouse scale this is
    exactly the shuffle MERGE INTO plans to — no driver state, no
    row-at-a-time apply."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )

    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "value")
        )

    cut = F.lit(_MERGE_CUT).cast("timestamp")
    target = latest(ev.filter(F.col("ts") < cut))
    updates = latest(ev.filter(F.col("ts") >= cut))
    t = target.alias("t")
    u = updates.alias("u")
    return t.join(u, "user_id", "full_outer").select(
        "user_id",
        F.coalesce(F.col("u.value"), F.col("t.value")).alias("value"),
        F.when(
            F.col("u.value").isNotNull() & F.col("t.value").isNotNull(),
            F.lit("update"),
        )
        .when(F.col("u.value").isNotNull(), F.lit("insert"))
        .otherwise(F.lit("carry"))
        .alias("action"),
    )


_MERGE_SQL = f"""
WITH ranked AS (
  SELECT user_id, value, ts,
         ROW_NUMBER() OVER (
           PARTITION BY user_id,
                        (ts >= TIMESTAMP '{_MERGE_CUT} 00:00:00')
           ORDER BY ts DESC, event_id DESC
         ) AS rn,
         ts >= TIMESTAMP '{_MERGE_CUT} 00:00:00' AS is_update
  FROM events
), target AS (
  SELECT user_id, value FROM ranked WHERE rn = 1 AND NOT is_update
), updates AS (
  SELECT user_id, value FROM ranked WHERE rn = 1 AND is_update
)
SELECT COALESCE(t.user_id, u.user_id) AS user_id,
       COALESCE(u.value, t.value) AS value,
       CASE WHEN u.user_id IS NOT NULL AND t.user_id IS NOT NULL
                 THEN 'update'
            WHEN u.user_id IS NOT NULL THEN 'insert'
            ELSE 'carry' END AS action
FROM target t FULL OUTER JOIN updates u USING (user_id)
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLOWLY-CHANGING-DIMENSION TYPE 2: per-entity attribute history
    as validity intervals — every run of consecutive events with the
    same ``event_type`` collapses to one row with
    ``[valid_from, valid_to)`` micros and a version number (open
    current version: NULL valid_to).  Change detection is one lag
    comparison; interval close is one lead over the CHANGE rows only —
    two windows on the same (user) partitioning, one shuffle total,
    no self-join.  Timestamps travel as epoch-micros BIGINTs so both
    engines compare integers, not calendar dtypes."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(
            F.col("prev").isNull()
            | (F.col("prev") != F.col("event_type"))
        )
        .select("user_id", "event_type", F.col("tus").alias("valid_from"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )


_SCD2_SQL = """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev
  FROM events
), changes AS (
  SELECT user_id, event_type, tus AS valid_from
  FROM seq WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (
         PARTITION BY user_id ORDER BY valid_from
       ) AS valid_to,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id ORDER BY valid_from
       ) AS BIGINT) AS version
FROM changes
"""


# One ANSI-dialect query string executed VERBATIM by both engines —
# the spark.sql() surface under the gate with zero translation layer
# (every construct here is shared: CTE, join, CASE, FLOOR, HAVING).
_SQL_SHARED = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev_q,
         COUNT(*) AS n_lines
  FROM lineitem
  WHERE l_quantity > 24
  GROUP BY l_orderkey
  HAVING COUNT(*) >= 2
)
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(b.rev_q) AS BIGINT) AS rev_q_total,
       MAX(b.n_lines) AS max_lines,
       CASE WHEN MAX(b.n_lines) > 4 THEN 'wide' ELSE 'narrow' END
           AS shape
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
GROUP BY o.o_orderpriority
"""


def sql_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL SURFACE itself as an operator: ``spark.sql`` runs the
    *identical* query text the DuckDB oracle runs (no DataFrame
    translation, no dialect shim) over temp views of the same tables —
    a user of the reference who writes ANSI SQL ports with zero
    changes.  Catalyst still gets full pushdown/codegen: SQL and
    DataFrame plans meet in the same optimizer."""
    for t in ("lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_SHARED)



def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGERANK over a deterministic document link graph (the crawl
    quality signal curation pipelines weight documents by): every doc
    u links to (7u+3) mod N and (13u+5) mod N — an expander-ish
    2-out-regular multigraph — and ranks run 10 iterations of the
    INTEGER-EXACT recurrence in operators/graph.pagerank_integer
    (ranks on a 1e-9 lattice, per-edge contribution pr div outdeg,
    update (15*q) div 100 + (85*S) div 100; every op integral).  The
    oracle UNROLLS the identical recurrence as a SQL CTE chain, so the
    gate is bit-exact; a uniform cycle being an exact fixed point is
    pinned separately in tests/test_graph.py.

    Scale shape: per iteration one equi join onto the edge list
    (shuffle on src), one partial-aggregated groupBy on dst, one left
    join onto the node set — linear plan growth in iterations, one
    BIGINT of state per node.

    Oracle-independence class C (suite/__init__ taxonomy): the oracle
    replays the recurrence; the structurally different cross-checks
    are the pure-python replay, the exact uniform-cycle fixed point,
    and the sink-leak property in tests/test_graph.py."""
    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_integer,
    )

    docs = load_table(spark, sf_dir, "documents")
    nodes = docs.select(F.col("doc_id").alias("node"))
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    base = docs.select("doc_id").crossJoin(F.broadcast(nn))
    edges = (
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 3) % F.col("nn")).alias("dst"),
        )
        .unionByName(
            base.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 13 + 5) % F.col("nn")).alias("dst"),
            )
        )
    )
    return pagerank_integer(nodes, edges, iters=10)


def graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGERANK WITH DANGLING-MASS REDISTRIBUTION (the standard
    Google-matrix semantics) over a link graph with real sinks: docs
    with doc_id % 5 == 0 emit NO edges, every other doc links to
    (7u+3) mod N and (13u+5) mod N.  Each iteration redistributes the
    sinks' pooled rank uniformly (share = sum_sink pr div N) before
    damping — see operators/graph.pagerank_dangling_integer for the
    exact integer recurrence and the eager-per-round rationale.

    Output (node, pr_q, delta_q): delta_q is the max |Δpr| of the
    final iteration — the self-validating convergence aggregate.

    Oracle-independence class: the SQL oracle REPLAYS the same
    recurrence (materialized CTE chain), like graph_pagerank; the
    structurally independent checks are the pure-python replay, the
    exact mass-conservation floor bound, and the no-sink equivalence
    against pagerank_integer in tests/test_graph.py."""
    from wrf_to_geodataframe_spark.operators.graph import (
        pagerank_dangling_integer,
    )

    docs = load_table(spark, sf_dir, "documents")
    nodes = docs.select(F.col("doc_id").alias("node"))
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    base = (
        docs.select("doc_id")
        .filter(F.col("doc_id") % 5 != 0)
        .crossJoin(F.broadcast(nn))
    )
    edges = (
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 3) % F.col("nn")).alias("dst"),
        )
        .unionByName(
            base.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 13 + 5) % F.col("nn")).alias("dst"),
            )
        )
    )
    return pagerank_dangling_integer(nodes, edges, iters=10)


def _pagerank_dangling_sql(iters: int = 10) -> str:
    """Oracle mirror of pagerank_dangling_integer: the identical
    integer recurrence as a MATERIALIZED CTE chain (each iteration is
    referenced twice — contribution join + dangling sum — so the
    CTEs must not be inlined), with the per-iteration share as a
    scalar subquery and the overflow-safe damped split replayed
    verbatim."""
    its = []
    prev = "it0"
    for k in range(1, iters + 1):
        its.append(f"""it{k} AS MATERIALIZED (
    SELECT nd.node,
           CAST(150000000
           + 85 * ((COALESCE(s.s, 0) + sh.share) // 100)
           + (85 * ((COALESCE(s.s, 0) + sh.share) % 100)) // 100
           AS BIGINT) AS pr_q
    FROM nodes nd
    LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM(p.pr_q // d.deg) AS BIGINT) AS s
        FROM {prev} p
        JOIN edges e ON p.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ) s USING (node)
    CROSS JOIN (
        SELECT CAST(COALESCE(SUM(p.pr_q), 0) AS BIGINT)
               // (SELECT n FROM nn) AS share
        FROM {prev} p
        LEFT JOIN deg d ON p.node = d.src
        WHERE d.src IS NULL
    ) sh
)""")
        prev = f"it{k}"
    joined = ",\n".join(its)
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS MATERIALIZED (
    SELECT doc_id AS src, (doc_id * 7 + 3) % n AS dst
    FROM documents, nn WHERE doc_id % 5 <> 0
    UNION ALL
    SELECT doc_id, (doc_id * 13 + 5) % n
    FROM documents, nn WHERE doc_id % 5 <> 0
),
deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY src),
it0 AS MATERIALIZED (
    SELECT node, CAST(1000000000 AS BIGINT) AS pr_q FROM nodes),
{joined}
SELECT f.node, f.pr_q, dl.delta_q
FROM {prev} f
CROSS JOIN (
    SELECT CAST(MAX(ABS(a.pr_q - b.pr_q)) AS BIGINT) AS delta_q
    FROM {prev} a JOIN it{iters - 1} b USING (node)
) dl
"""


_PAGERANK_DANGLING_SQL = _pagerank_dangling_sql()


def _pagerank_sql(iters: int = 10) -> str:
    """Oracle mirror: the identical integer recurrence unrolled as a
    CTE chain (SUMs cast back to BIGINT — DuckDB widens to HUGEINT)."""
    its = []
    prev = "it0"
    for k in range(1, iters + 1):
        its.append(f"""it{k} AS (
    SELECT nd.node,
           CAST(150000000 AS BIGINT)
           + CAST(85 AS BIGINT) * COALESCE(s.s, CAST(0 AS BIGINT))
             // CAST(100 AS BIGINT) AS pr_q
    FROM nodes nd LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM(p.pr_q // d.deg) AS BIGINT) AS s
        FROM {prev} p
        JOIN edges e ON p.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ) s USING (node)
)""")
        prev = f"it{k}"
    joined = ",\n".join(its)
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
    SELECT doc_id AS src, (doc_id * 7 + 3) % n AS dst
    FROM documents, nn
    UNION ALL
    SELECT doc_id, (doc_id * 13 + 5) % n FROM documents, nn
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY src),
it0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr_q FROM nodes),
{joined}
SELECT node, pr_q FROM {prev}
"""


_PAGERANK_SQL = _pagerank_sql()


QUERIES = {
    "p1_drop_columns": p1_drop_columns,
    "graph_triangles": graph_triangles,
    "graph_pagerank": graph_pagerank,
    "graph_pagerank_dangling": graph_pagerank_dangling,
    "sql_shared_dialect": sql_shared_dialect,
    "merge_upsert": merge_upsert,
    "scd2_history": scd2_history,
    "p2_select_columns": p2_select_columns,
    "p3_time_slice": p3_time_slice,
    "p6_value_mask": p6_value_mask,
    "p7_null_fill": p7_null_fill,
    "p8_conditional_sentinel": p8_conditional_sentinel,
    "c4_cast_float32": c4_cast_float32,
    "o1_sort_composite": o1_sort_composite,
    "j1_composite_triple_join": j1_composite_triple_join,
    "j2_attribute_join": j2_attribute_join,
    "j6_realign_join": j6_realign_join,
    "w1_window_rank": w1_window_rank,
    "w2_window_lag": w2_window_lag,
    "w3_rolling_mean": w3_rolling_mean,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "dist_dropduplicates": dist_dropduplicates,
    "str_json_extract": str_json_extract,
    "str_text_funcs": str_text_funcs,
    "r1_rollup": r1_rollup,
    "j_semi_join": j_semi_join,
    "j_anti_join": j_anti_join,
    "agg_count_distinct": agg_count_distinct,
    "w4_session_window": w4_session_window,
    "agg_stats_moments": agg_stats_moments,
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "r2_cube": r2_cube,
    "j_asof_join": j_asof_join,
    "j_range_join": j_range_join,
    "agg_percentiles": agg_percentiles,
    "sample_hash": sample_hash,
    "agg_approx_distinct": agg_approx_distinct,
    "unpivot_long": unpivot_long,
}

ORACLE = {
    "graph_triangles": _TRIANGLES_SQL,
    "graph_pagerank": _PAGERANK_SQL,
    "graph_pagerank_dangling": _PAGERANK_DANGLING_SQL,
    "sql_shared_dialect": _SQL_SHARED,
    "merge_upsert": _MERGE_SQL,
    "scd2_history": _SCD2_SQL,
    "p1_drop_columns": _P1_SQL,
    "p2_select_columns": _P2_SQL,
    "p3_time_slice": _P3_SQL,
    "p6_value_mask": _P6_SQL,
    "p7_null_fill": _P7_SQL,
    "p8_conditional_sentinel": _P8_SQL,
    "c4_cast_float32": _C4_SQL,
    "o1_sort_composite": _O1_SQL,
    "j1_composite_triple_join": _J1_SQL,
    "j2_attribute_join": _J2_SQL,
    "j6_realign_join": _J6_SQL,
    "w1_window_rank": _W1_SQL,
    "w2_window_lag": _W2_SQL,
    "w3_rolling_mean": _W3_SQL,
    "set_union": _SET_UNION_SQL,
    "set_intersect": _SET_INTERSECT_SQL,
    "set_except": _SET_EXCEPT_SQL,
    "dist_dropduplicates": _DIST_SQL,
    "str_json_extract": _STR_JSON_SQL,
    "str_text_funcs": _STR_TEXT_SQL,
    "r1_rollup": _R1_SQL,
    "j_semi_join": _J_SEMI_SQL,
    "j_anti_join": _J_ANTI_SQL,
    "agg_count_distinct": _AGG_CD_SQL,
    "w4_session_window": _W4_SQL,
    "agg_stats_moments": _AGG_MOMENTS_SQL,
    "funnel_view_click_purchase": _FUNNEL_SQL,
    "r2_cube": _R2_SQL,
    "j_asof_join": _J_ASOF_SQL,
    "j_range_join": _J_RANGE_SQL,
    "agg_percentiles": _AGG_PCT_SQL,
    "sample_hash": _SAMPLE_SQL,
    "agg_approx_distinct": _AGG_APPROX_SQL,
    "unpivot_long": _UNPIVOT_SQL,
}
