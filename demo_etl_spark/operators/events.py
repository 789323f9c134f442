"""Event-stream windowing over the ``events`` table (SURVEY.md §2.9
north-star extension; batch-first per SURVEY §7 Phase 5).

Batch expressions of the three canonical stream window shapes using the
same ``F.window`` / ``F.session_window`` operators Structured Streaming
uses — the streaming module (demo_etl_spark.streaming) reuses these
builders verbatim on a ``readStream`` source with a watermark.

* tumbling — 1 h fixed windows per event_type
* sliding — 1 h windows every 30 min (each event in exactly 2 windows)
* session — per-user sessions with a 30 min inactivity gap; window end is
  last-event + gap (Spark session semantics; the DuckDB oracle rebuilds
  sessions with the classic lag/gaps-and-islands construction)

``value`` sums use the fixed-point discipline (exact at 1e-4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div, round_div_expr
from demo_etl_spark.functions.scalars import money_fixed
from demo_etl_spark.io import (
    EVENTS_CLEAN_SQL,
    gjo_int_oracle,
    load_star,
    timed_events,
    vget_int_oracle,
)

SESSION_GAP = "30 minutes"


def tumbling_window(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    win = F.window("ts", "1 hour")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("unique_users"),
            F.sum(money_fixed(F.col("value"))).alias("_val_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "unique_users",
            round_div("_val_c", "10000", 2).alias("total_value"),
        )
    )


def sliding_window(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money_fixed(F.col("value"))).alias("_val_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            round_div("_val_c", "10000", 2).alias("total_value"),
        )
    )


def session_window(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    win = F.session_window("ts", SESSION_GAP)
    return (
        events.groupBy("user_id", win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money_fixed(F.col("value"))).alias("_val_c"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            round_div("_val_c", "10000", 2).alias("total_value"),
        )
    )


#: the closed set of event types in the corpus — an EXPLICIT pivot value
#: list. Omitting it would make Spark run a distinct-collect job on the
#: driver to discover values AND make the output schema data-dependent;
#: with the list the pivot is a single pass and the schema is stable.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def daily_type_pivot(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Wide daily matrix: one row per day, one count column per event
    type (the §2.7-adjacent reshaping operator — ``pivot`` compiles to a
    single partial+final aggregate with no extra shuffle vs the long
    groupBy; the type dimension is bounded so the row explosion is
    bounded too)."""
    piv = (
        events.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_events")
            for t in EVENT_TYPES
        ],
    )


def build_pivot(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return daily_type_pivot(load_star(spark, sf_dir)["events"], ctx)


def build_tumbling(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return tumbling_window(timed_events(load_star(spark, sf_dir)["events"]), ctx)


def build_sliding(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return sliding_window(timed_events(load_star(spark, sf_dir)["events"]), ctx)


def build_session(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return session_window(timed_events(load_star(spark, sf_dir)["events"]), ctx)


def _rd(n: str, d: str, s: int) -> str:
    return round_div_expr(n, d, s, "duckdb")


_VAL_C = "TRY_CAST(ROUND(value * 10000, 0) AS BIGINT)"

ORACLE_SQL_TUMBLING = f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS unique_users,
       {_rd(f"CAST(SUM({_VAL_C}) AS BIGINT)", "10000", 2)} AS total_value
FROM {EVENTS_CLEAN_SQL}
GROUP BY 1, 2, 3
"""

# each event belongs to exactly two 1h/30min sliding windows: the one
# starting at its 30-min bucket and the one 30 min earlier
ORACLE_SQL_SLIDING = f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS window_start, * FROM {EVENTS_CLEAN_SQL}
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES, * FROM {EVENTS_CLEAN_SQL}
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {_rd(f"CAST(SUM({_VAL_C}) AS BIGINT)", "10000", 2)} AS total_value
FROM assigned
GROUP BY 1, 2, 3
"""

# gaps-and-islands reconstruction of Spark's session_window semantics:
# a new session starts only when the gap from the previous event is
# STRICTLY greater than 30 min — an event landing exactly on the open
# session's end merges into it (session_window windows are [start,
# last+gap] for merging purposes; fuzz-pinned empirically: events at
# 10:00 and 10:30 form ONE session ending 11:00, an event at
# 11:00.000001 starts a new one); session_end = last event + gap
ORACLE_SQL_SESSION = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 30 MINUTES THEN 0 ELSE 1 END AS new_session
  FROM {EVENTS_CLEAN_SQL}
),
numbered AS (
  SELECT *, SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTES AS session_end,
       COUNT(*) AS n_events,
       {_rd(f"CAST(SUM({_VAL_C}) AS BIGINT)", "10000", 2)} AS total_value
FROM numbered
GROUP BY user_id, session_id
"""


# conditional-sum pivot twin: CASE-per-type is the engine-portable
# spelling of the same single-pass aggregate
ORACLE_SQL_PIVOT = f"""
SELECT CAST(ts AS DATE) AS day,
       {", ".join(
           f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
           f" AS {t}_events"
           for t in EVENT_TYPES
       )}
FROM events
GROUP BY 1
"""


def daily_type_unpivot(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Melt the wide daily matrix back to long form — the inverse
    reshaping operator (``DataFrame.unpivot``, Spark's native melt; a
    narrow per-row expansion with NO shuffle of its own, so the plan
    cost is exactly the pivot's aggregate). Wide→long is the standard
    prep step before per-series operators (windowing, forecasting) that
    expect long format. Zero-count cells are kept — melt must be
    lossless (round-trip property: unpivot(pivot(x)) ⊇ x's groups)."""
    wide = daily_type_pivot(events, ctx)
    return wide.unpivot(
        ids=["day"],
        values=[f"{t}_events" for t in EVENT_TYPES],
        variableColumnName="_col",
        valueColumnName="n_events",
    ).select(
        "day",
        F.expr("replace(_col, '_events', '')").alias("event_type"),
        "n_events",
    )


def build_unpivot(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return daily_type_unpivot(load_star(spark, sf_dir)["events"], ctx)


# the melt twin: per-type conditional counts unioned back to long rows
ORACLE_SQL_UNPIVOT = f"""
WITH wide AS ({ORACLE_SQL_PIVOT})
SELECT day, event_type, n_events FROM (
  {" UNION ALL ".join(
      f"SELECT day, '{t}' AS event_type, {t}_events AS n_events FROM wide"
      for t in EVENT_TYPES
  )}
)
"""


def daily_funnel(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Ordered conversion funnel per day: view → click → purchase, where
    each step must happen AT OR AFTER the user's first completion of the
    previous step that day (a true ordered funnel, not co-occurrence).

    Three staged aggregate-then-join passes on (user_id, day) — each a
    key-partitioned equi-join, no windows over raw events and no
    cross-day state, so the shape shards cleanly by day at 100 TB (and
    the per-day independence means the whole history backfills
    embarrassingly parallel). Conversion rates are exact integer-space
    rounding with a zero-denominator guard.
    """
    ev = events.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        "ts",
    )
    # r14: checkpoint the two staged (user, day) tables — v feeds three
    # consumers (c's join, p's chain through c, the per-day count) and
    # c two, so the static planner re-ran their full events
    # aggregations once per consumer; each checkpoint is one narrow row
    # per active (user, day), far smaller than the events pass it saves
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("_tv"))
        .localCheckpoint(eager=True)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, ["user_id", "day"])
        .filter(F.col("ts") >= F.col("_tv"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("_tc"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, ["user_id", "day"])
        .filter(F.col("ts") >= F.col("_tc"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("_tp"))
    )
    agg = (
        v.groupBy("day").agg(F.count(F.lit(1)).alias("n_view_users"))
        .join(
            c.groupBy("day").agg(F.count(F.lit(1)).alias("n_click_users")),
            "day",
            "left",
        )
        .join(
            p.groupBy("day").agg(F.count(F.lit(1)).alias("n_purchase_users")),
            "day",
            "left",
        )
        .withColumns(
            {
                "n_click_users": F.coalesce("n_click_users", F.lit(0)),
                "n_purchase_users": F.coalesce("n_purchase_users", F.lit(0)),
            }
        )
    )
    return agg.select(
        "day",
        "n_view_users",
        "n_click_users",
        "n_purchase_users",
        round_div("n_click_users", "n_view_users", 4).alias("click_rate"),
        F.when(
            F.col("n_click_users") > 0,
            round_div("n_purchase_users", "n_click_users", 4),
        ).alias("purchase_rate"),
    )


def build_funnel(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return daily_funnel(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_FUNNEL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts FROM events
),
v AS (
  SELECT user_id, day, MIN(ts) AS tv FROM ev
  WHERE event_type = 'view' GROUP BY 1, 2
),
c AS (
  SELECT e.user_id, e.day, MIN(e.ts) AS tc
  FROM ev e JOIN v ON v.user_id = e.user_id AND v.day = e.day
  WHERE e.event_type = 'click' AND e.ts >= v.tv GROUP BY 1, 2
),
p AS (
  SELECT e.user_id, e.day, MIN(e.ts) AS tp
  FROM ev e JOIN c ON c.user_id = e.user_id AND c.day = e.day
  WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY 1, 2
),
agg AS (
  SELECT v.day,
         COUNT(*) AS n_view_users,
         CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_click_users,
         CAST(SUM(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchase_users
  FROM v
  LEFT JOIN c ON c.user_id = v.user_id AND c.day = v.day
  LEFT JOIN p ON p.user_id = v.user_id AND p.day = v.day
  GROUP BY v.day
)
SELECT day, n_view_users, n_click_users, n_purchase_users,
       {_rd("n_click_users", "n_view_users", 4)} AS click_rate,
       CASE WHEN n_click_users > 0
            THEN {_rd("n_purchase_users", "n_click_users", 4)} END AS purchase_rate
FROM agg
"""


# ------------------------------------------ hierarchical rollup -------
def hourly_partials(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Hour-grain partial aggregates — the materialized first tier of a
    hypertable-style continuous aggregate. Everything kept here is
    re-aggregatable (counts and exact fixed-point sums, no averages),
    so coarser grains roll up from THIS table instead of re-scanning
    raw events. At 100 TB this tier is what you persist (partitioned by
    day): the daily/monthly queries then read ~1/3600th of the data.
    """
    win = F.window("ts", "1 hour")
    return events.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(money_fixed(F.col("value"))).alias("val_fx"),
    ).select(
        F.col("w.start").alias("hour_start"), "event_type", "n_events", "val_fx"
    )


def daily_rollup_from_hourly(
    hourly: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Second tier: day grain re-aggregated from the hourly partials.

    Correctness contract (the whole point of the rollup): because the
    partials are exact integers, sum-of-sums equals the direct
    aggregation of raw events bit-for-bit — which is exactly what the
    DuckDB oracle checks by aggregating raw events directly.
    """
    return (
        hourly.groupBy(
            F.to_date("hour_start").alias("day"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_hours_active"),
            F.sum("val_fx").alias("_val_fx"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            "n_hours_active",
            round_div("_val_fx", "10000", 2).alias("total_value"),
            round_div("CAST(n_events AS BIGINT)", "n_hours_active", 2).alias(
                "avg_events_per_active_hour"
            ),
        )
    )


def build_daily_rollup(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return daily_rollup_from_hourly(
        hourly_partials(timed_events(load_star(spark, sf_dir)["events"]), ctx),
        ctx,
    )


# oracle aggregates RAW events straight to day grain — hash-equality
# proves the two-tier rollup loses nothing vs a direct aggregation
ORACLE_SQL_DAILY_ROLLUP = f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours_active,
       {_rd("CAST(SUM(TRY_CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT)", "10000", 2)} AS total_value,
       {_rd("COUNT(*)", "COUNT(DISTINCT date_trunc('hour', ts))", 2)} AS avg_events_per_active_hour
FROM {EVENTS_CLEAN_SQL}
GROUP BY 1, 2
"""


# ------------------------------------------ JSON props breakdown ------
def props_breakdown(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Semi-structured payload analytics: extract a field from the JSON
    ``props`` column and aggregate by event type × value decile.

    The JSON path scalar family (§2.8 widened): ``get_json_object`` is a
    JVM expression — the payload never deserializes into Python, and at
    100 TB the extraction runs inside the scan's codegen stage. (For a
    FIXED payload schema, ``from_json`` + a struct column is the
    schema-checked variant; get_json_object is the schema-on-read one.)
    """
    # try_cast, not cast: a wrong-TYPED payload value ('{"k": "str"}')
    # must degrade to NULL like the oracle's TRY_CAST — ANSI cast
    # crashes the whole scan on one bad payload (hostile-corpus find)
    k = F.get_json_object("props", "$.k").try_cast("int")
    # FLOOR-division decile: both Spark's `div` and DuckDB's `//`
    # truncate toward zero, which puts a negative payload (k = -15) in
    # decile -1 — overlapping decile 0's range. Floor is the right bin
    # semantics (lo ≤ k < hi). Spelled via the remainder correction
    # (trunc + 1-step-down when the remainder is negative) rather than
    # magnitude negation: ``-(-_k + 9)`` overflows at k = INT_MIN and
    # under ANSI aborts the whole scan on one hostile payload (r12
    # ADVICE fix, hostile-pinned). Both engines' `%` takes the
    # dividend's sign, so the correction is engine-identical and
    # overflow-free for every representable input.
    d = events.withColumn("_k", k).withColumn(
        "k_decile",
        F.expr(
            "CAST(_k div 10 + "
            "(CASE WHEN _k % 10 < 0 THEN -1 ELSE 0 END) AS INT)"
        ),
    )
    return (
        d.groupBy("event_type", "k_decile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("_k").cast("long")).alias("_k_sum"),
            F.sum(money_fixed(F.col("value"))).alias("_val_fx"),
        )
        .select(
            "event_type",
            "k_decile",
            "n_events",
            round_div("_k_sum", "n_events", 2).alias("avg_k"),
            round_div("_val_fx", "10000", 2).alias("total_value"),
        )
    )


def build_props_breakdown(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return props_breakdown(load_star(spark, sf_dir)["events"], ctx)


# FLOOR decile on both engines (DuckDB integer `//` truncates like
# Spark's `div` — see ORACLE_SQL_VALUE_HISTOGRAM's note); remainder
# correction instead of magnitude negation so k = INT_MIN can't
# overflow (r12 ADVICE fix, mirrors the Spark expr above)
_K_DECILE_SQL = (
    "CAST(k // 10 + "
    "(CASE WHEN k % 10 < 0 THEN -1 ELSE 0 END) AS INT)"
)

ORACLE_SQL_PROPS = f"""
WITH extracted AS (
  SELECT event_type,
         {gjo_int_oracle("props")} AS k,
         TRY_CAST(ROUND(value * 10000, 0) AS BIGINT) AS val_fx
  FROM events
)
SELECT event_type,
       {_K_DECILE_SQL} AS k_decile,
       COUNT(*) AS n_events,
       {_rd("CAST(SUM(CAST(k AS BIGINT)) AS BIGINT)", "COUNT(*)", 2)} AS avg_k,
       {_rd("CAST(SUM(val_fx) AS BIGINT)", "10000", 2)} AS total_value
FROM extracted
GROUP BY event_type, {_K_DECILE_SQL}
"""


def merge_rollup_increment(store: DataFrame, increment: DataFrame) -> DataFrame:
    """Additive merge of late-arriving partials into the rollup store.

    Hour buckets touched by late events get their counts/sums ADDED (the
    partials are exact integers, so merge order can't change any result);
    untouched buckets pass through. This is the rollup-store twin of a
    MERGE ... WHEN MATCHED THEN UPDATE: expressed as union + re-aggregate
    so it stays one shuffle on the rollup key and works on plain parquet.
    At 100 TB the union's store side prunes to the partitions the
    increment touches (partition the store by day).
    """
    return (
        store.unionByName(increment)
        .groupBy("hour_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("val_fx").alias("val_fx"),
        )
    )

def build_incremental_rollup(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Incremental maintenance under the hard signal: build the rollup
    store from one half of the events (even event_id), merge the other
    half through ``merge_rollup_increment`` as a late-arriving batch,
    re-aggregate to daily — the result must equal the one-shot daily
    oracle BIT-FOR-BIT (exact integer partials make additive merge
    order-free; the split is deliberately arbitrary to show ANY
    partitioning of arrivals converges to the same store).

    The split must be a PARTITION of the cleaned events: ``% 2 == 1``
    misses negative-odd ids (Java remainder gives −1) and a NULL
    comparison matches neither branch, so the store branch takes
    ``== 0`` and the increment takes its NULL-inclusive complement
    (r10 review; EVENTS_CLEAN_SQL does not quarantine event_id)."""
    ev = timed_events(load_star(spark, sf_dir)["events"])
    is_even = F.col("event_id") % 2 == 0
    store = hourly_partials(ev.filter(is_even), ctx)
    increment = hourly_partials(
        ev.filter(is_even.isNull() | ~is_even), ctx
    )
    return daily_rollup_from_hourly(merge_rollup_increment(store, increment), ctx)

ANOMALY_K = 3  # flag hours beyond k trailing standard deviations
ANOMALY_MIN_HISTORY = 12  # trailing observed hours required to judge


def hourly_anomaly(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Monitoring-surface operator: flag hours whose event count sits
    beyond ``k`` standard deviations of the trailing 24 OBSERVED hours
    (per event type). The entire test runs in exact integer space —
    with trailing sum s1, sum-of-squares s2 over c hours,

        (n − s1/c)² > k²·var  ⟺  (c·n − s1)² > k²·(c·s2 − s1²)

    so the flag is bit-identical across engines (no float variance).
    One shuffle (the hourly agg); the window partitions by event_type
    and slides over its own aggregate rows — thousands per month, not
    raw events — so the shape is scale-free. Overflow: c ≤ 24,
    n ≤ ~1e9/hour ⇒ c·s2 ≤ 24·24·1e18... bound instead by n ≤ 6e8
    per hour-type for BIGINT safety — far beyond any real feed; shard
    the hour key if you ever exceed it.
    """
    k2 = ANOMALY_K * ANOMALY_K
    hourly = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-24, -1)
    )
    d = hourly.withColumns(
        {
            "_s1": F.sum("n_events").over(w),
            "_s2": F.sum(F.col("n_events") * F.col("n_events")).over(w),
            "_c": F.count(F.lit(1)).over(w),
        }
    ).filter(F.col("_c") >= ANOMALY_MIN_HISTORY)
    dev2 = "(_c * n_events - _s1) * (_c * n_events - _s1)"
    var_scaled = "(_c * _s2 - _s1 * _s1)"
    return d.select(
        "hour_start",
        "event_type",
        "n_events",
        round_div("_s1", "_c", 2).alias("trailing_mean"),
        F.expr(f"{dev2} > {k2} * {var_scaled}").alias("is_anomaly"),
    )


def build_hourly_anomaly(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return hourly_anomaly(timed_events(load_star(spark, sf_dir)["events"]), ctx)


ORACLE_SQL_HOURLY_ANOMALY = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_start, event_type,
         COUNT(*) AS n_events
  FROM {EVENTS_CLEAN_SQL} GROUP BY 1, 2
),
trail AS (
  SELECT hour_start, event_type, n_events,
         SUM(n_events) OVER w AS s1,
         SUM(n_events * n_events) OVER w AS s2,
         COUNT(*) OVER w AS c
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hour_start, event_type, n_events,
       {_rd("CAST(s1 AS BIGINT)", "CAST(c AS BIGINT)", 2)} AS trailing_mean,
       (c * n_events - s1) * (c * n_events - s1)
         > {ANOMALY_K * ANOMALY_K} * (c * s2 - s1 * s1) AS is_anomaly
FROM trail WHERE c >= {ANOMALY_MIN_HISTORY}
"""



# ------------------------------------------------------ active users ----
WAU_DAYS = 7  # trailing window (inclusive of the report day)


def active_users(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Daily engagement: DAU and trailing-7-day WAU per calendar day,
    plus stickiness (DAU/WAU, exact HALF_UP 4dp).

    COUNT(DISTINCT) over a RANGE window is not supported by any engine,
    so WAU uses the bounded-replication construction: each distinct
    (day, user) pair EXPLODES into exactly its 7 covered report days
    (``explode(sequence(0, 6))`` — a fixed ×7 map-side fanout, NOT
    data-dependent), then a distinct count per report day; the final
    equi-join with DAU restricts output to days that actually occur.
    Zero non-equi joins — the first spelling (range-join against a
    broadcast calendar) planned as BroadcastNestedLoopJoin, the one
    red-flag operator in the audit; this explode spelling is pure
    explode + aggregate. At 100 TB the distinct pre-aggregation shrinks
    the fact by the events-per-user-day factor BEFORE the ×7 fanout.
    """
    # NULL user_id carries no engagement identity: COUNT(DISTINCT)
    # ignores it on both engines, so the plain-count aggregates below
    # must not see the (day, NULL) row either — screen it before the
    # distinct (also saves the ×7 fanout on identity-less rows)
    du = (
        events.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        # r14: du feeds BOTH the WAU fanout and the DAU count — the
        # checkpoint (2 narrow cols, one row per active user-day) stops
        # the events distinct from running once per consumer
        .localCheckpoint(eager=True)
    )
    wau = (
        du.select(
            F.expr(f"explode(sequence(0, {WAU_DAYS - 1}))").alias("_k"),
            "day",
            "user_id",
        )
        .select(F.expr("date_add(day, _k)").alias("report_day"), "user_id")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    # du is already distinct on (day, user_id), so a plain count per day
    # IS the distinct-user count — no second dedup/Expand pass (the wau
    # aggregate above is the only one that genuinely needs distinct,
    # because the ×7 fanout duplicates users across report days)
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, dau["day"] == wau["report_day"])
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            round_div("dau", "wau", 4).alias("stickiness"),
        )
    )


def build_active_users(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return active_users(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_ACTIVE_USERS = f"""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
            WHERE user_id IS NOT NULL),
d AS (SELECT DISTINCT day AS report_day FROM du),
wau AS (
  SELECT report_day, COUNT(DISTINCT user_id) AS wau
  FROM d JOIN du
    ON du.day <= d.report_day
   AND du.day > d.report_day - INTERVAL {WAU_DAYS} DAY
  GROUP BY report_day
),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day)
SELECT dau.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       {{}} AS stickiness
FROM dau JOIN wau ON dau.day = wau.report_day
""".format(_rd("CAST(dau AS BIGINT)", "CAST(wau AS BIGINT)", 4))


# ------------------------------------------------ session attribution ---
_GAP_US = 1_800_000_000  # 30 min in µs — matches ORACLE_SQL_SESSION's gap


def session_attribution(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """First-touch attribution: rebuild 30-min-gap sessions
    (gaps-and-islands — the same construction the session-window oracle
    uses), tag each session with its FIRST event's type (the acquisition
    channel), and report per-channel session volume and purchase
    conversion. The ad-tech complement of events_funnel (which tracks
    step ordering within days, not channel credit).

    One shuffle on user_id drives all three window passes (lag → running
    sum → per-session row_number share the sort); the channel rollup is
    a tiny final aggregate. Gap math is integer µs so the session split
    is bit-identical cross-engine.

    event_id ties sort NULLS LAST explicitly (r12 review, same class as
    event_transitions): cleaned events keep NULL event_id, and on an
    exact (user_id, ts) tie at a session HEAD, Spark's ASC default
    (NULLS FIRST) would crown a different first_touch than DuckDB's
    (NULLS LAST). Hostile-pinned by the user-931 session-head tie."""
    w = Window.partitionBy("user_id").orderBy(
        "ts", F.asc_nulls_last("event_id")
    )
    flagged = events.withColumn(
        "_new",
        F.expr(
            # <= : a gap of EXACTLY 30 min merges, matching
            # session_window / ORACLE_SQL_SESSION's boundary (r10
            # review — '<' split such a session in two here while
            # events_session kept it whole)
            f"CASE WHEN unix_micros(ts) - unix_micros(lag(ts) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id NULLS LAST)) "
            f"<= {_GAP_US} THEN 0 ELSE 1 END"
        ),
    )
    numbered = flagged.withColumn(
        "_sid",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "_sid").orderBy(
        "ts", F.asc_nulls_last("event_id")
    )
    sess = (
        numbered.withColumn("_rn", F.row_number().over(w2))
        .groupBy("user_id", "_sid")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("event_type"))).alias(
                "first_touch"
            ),
            # when/otherwise, NOT a bare boolean cast: (NULL ==
            # 'purchase') is NULL and would poison max/sum, while the
            # oracle's CASE maps it to 0 (r7 NULL-hostile repro)
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("_converted"),
        )
    )
    return (
        sess.groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("_converted").cast("long").alias("converted_sessions"),
        )
        .withColumn(
            "conversion_rate",
            round_div("converted_sessions", "n_sessions", 4),
        )
    )


def build_session_attribution(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return session_attribution(
        timed_events(load_star(spark, sf_dir)["events"]), ctx
    )


ORACLE_SQL_ATTRIBUTION = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) <= {_GAP_US}
              THEN 0 ELSE 1 END AS new_session
  FROM {EVENTS_CLEAN_SQL}
),
numbered AS (
  SELECT *, SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
  FROM numbered
),
sess AS (
  SELECT user_id, sid,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS first_touch,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM ranked GROUP BY user_id, sid
)
SELECT first_touch,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS converted_sessions,
       {{}} AS conversion_rate
FROM sess GROUP BY first_touch
""".format(_rd("CAST(SUM(converted) AS BIGINT)", "CAST(COUNT(*) AS BIGINT)", 4))


# ------------------------------------------------- cohort retention -----
def cohort_retention(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Weekly cohort retention matrix: users cohorted by the ISO week of
    their FIRST activity; each later week of activity increments the
    cohort's (cohort_week, offset_weeks) cell. The product-analytics
    complement of customer_retention's set-op split — this is the full
    triangle a growth dashboard plots.

    Two aggregates over the distinct (user, week) grid (which at 100 TB
    is the crucial pre-shrink: |users|×|weeks|, independent of event
    volume) plus one equi-join back on user_id. Week arithmetic is
    integer day-diff DIV 7 — engine-exact."""
    du = (
        events.select(
            "user_id",
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"),
        )
        .distinct()
    )
    first = du.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = du.join(first, "user_id").withColumn(
        "offset_weeks", F.expr("datediff(week, cohort_week) div 7")
    )
    # joined is unique per (user_id, week) — hence per (cohort_week,
    # offset_weeks, user_id) — so a plain count is the distinct count
    active = joined.groupBy("cohort_week", "offset_weeks").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        active.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "offset_weeks",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            round_div("n_active", "cohort_size", 4).alias("retention_rate"),
        )
    )


def build_cohort_retention(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return cohort_retention(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_COHORT_RETENTION = f"""
WITH du AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM du GROUP BY user_id
),
joined AS (
  SELECT du.user_id, first.cohort_week,
         date_diff('day', first.cohort_week, du.week) // 7 AS offset_weeks
  FROM du JOIN first USING (user_id)
),
active AS (
  SELECT cohort_week, offset_weeks, COUNT(DISTINCT user_id) AS n_active
  FROM joined GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM first GROUP BY 1
)
SELECT cohort_week, offset_weeks,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       {{}} AS retention_rate
FROM active JOIN sizes USING (cohort_week)
""".format(_rd("CAST(n_active AS BIGINT)", "CAST(cohort_size AS BIGINT)", 4))


# ---------------------------------------------------- value histogram ---
HIST_BIN_WIDTH = 50  # money units per bin
_BIN_FIXED = HIST_BIN_WIDTH * 10_000


def value_histogram(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Fixed-width histogram of event values (bin width 50): the
    distribution-monitoring twin of order_value_distribution's
    percentiles — a histogram pre-aggregates in one map-side pass and
    MERGES across partitions/days (percentiles don't), which is why
    monitoring pipelines ship histograms. Binning happens on the exact
    fixed-point integer with FLOOR division — both Spark's `div` and
    DuckDB's `//` truncate toward zero, which would fold a negative
    value (a refund) into a bin that overlaps bin 0's range; the
    remainder-correction spelling floors exactly on both engines and,
    unlike the magnitude-negation spelling, cannot overflow at
    v = LONG_MIN (r12 ADVICE-class hardening — same crash mode as the
    props decile). The share uses a window total over the ~10 bin rows
    (trivially single-partition)."""
    b = events.select(
        F.expr(
            f"TRY_CAST(ROUND(value * 10000, 0) AS BIGINT) div {_BIN_FIXED} "
            f"+ (CASE WHEN TRY_CAST(ROUND(value * 10000, 0) AS BIGINT) "
            f"% {_BIN_FIXED} < 0 THEN -1 ELSE 0 END)"
        ).alias("bin")
    )
    counts = b.groupBy("bin").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        counts.withColumn(
            "_total", F.sum("n_events").over(Window.partitionBy())
        )
        .select(
            "bin",
            F.expr(f"CAST(bin * {HIST_BIN_WIDTH} AS DOUBLE)").alias("bin_lo"),
            "n_events",
            round_div("n_events", "_total", 4).alias("share"),
        )
    )


def build_value_histogram(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return value_histogram(load_star(spark, sf_dir)["events"], ctx)


# NOTE: DuckDB's integer `//` TRUNCATES toward zero exactly like
# Spark's `div` (empirically: -3 // 2 = -1), so FLOOR binning needs the
# same remainder-correction spelling on both engines (overflow-free at
# v = LONG_MIN, unlike magnitude negation)
ORACLE_SQL_VALUE_HISTOGRAM = f"""
WITH fx AS (
  SELECT TRY_CAST(ROUND(value * 10000, 0) AS BIGINT) AS v FROM events
),
b AS (
  SELECT v // {_BIN_FIXED}
         + (CASE WHEN v % {_BIN_FIXED} < 0 THEN -1 ELSE 0 END) AS bin
  FROM fx
),
c AS (SELECT bin, COUNT(*) AS n_events FROM b GROUP BY 1)
SELECT bin,
       CAST(bin * {HIST_BIN_WIDTH} AS DOUBLE) AS bin_lo,
       CAST(n_events AS BIGINT) AS n_events,
       {{}} AS share
FROM c
""".format(
    _rd("CAST(n_events AS BIGINT)", "CAST(SUM(n_events) OVER () AS BIGINT)", 4)
)


# ------------------------------------------- time to conversion ---------
def signup_to_purchase(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Time-to-event funnel timing: per weekly signup cohort — signup
    volume, share converting to a purchase, and the exact interpolated
    median delay (seconds, integer µs math ÷ rounded at 2dp). The
    timing complement of events_funnel (step ordering) and
    events_cohort_retention (activity persistence).

    Per-user endpoints reduce the fact to |users| rows in ONE
    aggregate (min over conditional timestamps — no self-join); the
    cohort rollup is tiny. Median delay via functions/distrank
    ``exact_percentiles_grouped`` (per-cohort rank window + exact
    integer bracket interpolation — no per-group value buffer at any
    cohort size); NULL delays (non-converters) are filtered before
    ranking, mirrored in the oracle, so a convert-free cohort emits a
    NULL median through the left join exactly as percentile() did."""
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("signup_ts"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase_ts"),
        )
        .filter(F.col("signup_ts").isNotNull())
        .withColumn(
            "delay_s",
            F.expr(
                "CASE WHEN first_purchase_ts >= signup_ts THEN "
                "(unix_micros(first_purchase_ts) - unix_micros(signup_ts)) "
                "div 1000000 END"
            ),
        )
    )
    from demo_etl_spark.functions.distrank import exact_percentiles_grouped

    # |users| narrow rows, consumed by the cohort totals plus the
    # grouped-percentile's rank + count branches — checkpoint so the
    # events aggregation runs ONCE instead of 3x (r14; no static
    # exchange reuse across the branches)
    pu = per_user.withColumn(
        "cohort_week",
        F.to_date(F.date_trunc("week", F.col("signup_ts"))),
    ).localCheckpoint(eager=True)
    tot = pu.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.count("delay_s").cast("long").alias("n_converted"),
    )
    pct = exact_percentiles_grouped(
        pu.filter(F.col("delay_s").isNotNull()),
        ["cohort_week"], "delay_s", [50], ["p50_delay_s"],
    )
    return (
        tot.join(F.broadcast(pct), "cohort_week", "left")
        .withColumn(
            "conversion_rate", round_div("n_converted", "n_signups", 4)
        )
        .select(
            "cohort_week", "n_signups", "n_converted", "p50_delay_s",
            "conversion_rate",
        )
    )


def build_signup_to_purchase(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return signup_to_purchase(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_SIGNUP_TO_PURCHASE = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase_ts
  FROM events GROUP BY user_id
),
d AS (
  SELECT CAST(date_trunc('week', signup_ts) AS DATE) AS cohort_week,
         CASE WHEN first_purchase_ts >= signup_ts THEN
           (epoch_us(first_purchase_ts) - epoch_us(signup_ts)) // 1000000
         END AS delay_s
  FROM per_user WHERE signup_ts IS NOT NULL
)
,
tot AS (
  SELECT cohort_week,
         CAST(COUNT(*) AS BIGINT) AS n_signups,
         CAST(COUNT(delay_s) AS BIGINT) AS n_converted
  FROM d GROUP BY cohort_week
),
pct AS ({{PCT}})
SELECT cohort_week, n_signups, n_converted, p50_delay_s,
       {_rd("n_converted", "n_signups", 4)} AS conversion_rate
FROM tot LEFT JOIN pct USING (cohort_week)
"""


def _signup_pct_sql() -> str:
    from demo_etl_spark.functions.distrank import percentile_select_sql

    return percentile_select_sql(
        "(SELECT cohort_week, delay_s FROM d WHERE delay_s IS NOT NULL)",
        ["cohort_week"], "delay_s", [50], ["p50_delay_s"],
    )


ORACLE_SQL_SIGNUP_TO_PURCHASE = ORACLE_SQL_SIGNUP_TO_PURCHASE.replace(
    "{PCT}", _signup_pct_sql()
)


# ------------------------------------------------- rate anomaly/bots ----
BOT_EVENTS_PER_ACTIVE_MIN_X100 = 500  # flag above 5.00 events/active-min


def user_rate_audit(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-user activity-rate audit: event volume, active span, and
    events per active minute (exact 2dp), with a bot flag above the
    threshold — the abuse/automation screen that runs before
    engagement metrics are trusted. Rate compares in cross-multiplied
    integer space (events·60·10⁶·100 vs τ·span_µs), so the flag never
    touches a float; single-event users (span 0) are flagged only if
    volume alone exceeds the per-minute threshold (they compare
    against a 1-minute floor)."""
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.unix_micros(F.col("ts"))).alias("_first_us"),
        F.max(F.unix_micros(F.col("ts"))).alias("_last_us"),
    )
    span = "GREATEST(_last_us - _first_us, 60000000)"  # ≥ 1-minute floor
    return per_user.select(
        "user_id",
        "n_events",
        F.expr(f"CAST(({span}) div 1000000 AS BIGINT)").alias("active_span_s"),
        round_div("n_events * 60000000", span, 2).alias("events_per_min"),
        F.expr(
            f"n_events * 6000000000 > {BOT_EVENTS_PER_ACTIVE_MIN_X100}"
            f" * ({span})"
        ).alias("is_bot_suspect"),
    )


def build_user_rate_audit(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return user_rate_audit(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_USER_RATE = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(epoch_us(ts)) AS first_us,
         MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY 1
)
SELECT user_id, n_events,
       CAST(GREATEST(last_us - first_us, 60000000) // 1000000 AS BIGINT)
         AS active_span_s,
       {{RD}} AS events_per_min,
       n_events * 6000000000 > {BOT_EVENTS_PER_ACTIVE_MIN_X100}
         * GREATEST(last_us - first_us, 60000000) AS is_bot_suspect
FROM per_user
"""
ORACLE_SQL_USER_RATE = ORACLE_SQL_USER_RATE.replace(
    "{RD}",
    _rd("n_events * 60000000", "GREATEST(last_us - first_us, 60000000)", 2),
)


# ------------------------------------------- schema-applied JSON --------
PROPS_SCHEMA = "k INT, _corrupt STRING"


def props_typed_audit(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """The schema-CHECKED JSON path (from_json + explicit schema) as a
    parse audit per event type: how many payloads parse, how many lack
    the field, and the field's range/total — the ingest gate that runs
    before props_breakdown's schema-on-read analytics can be trusted.
    ``from_json`` is a JVM expression (codegen, no Python). PERMISSIVE
    mode yields an ALL-NULL-FIELDS struct for malformed payloads (not a
    NULL struct), so parse failure is detected the supported way: a
    corrupt-record column in the schema, populated only on failure
    (pytest pins this on a malformed payload; the oracle's json_valid
    is the same predicate)."""
    parsed = events.withColumn(
        "_p",
        F.from_json(
            F.col("props"),
            PROPS_SCHEMA,
            {"columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            # a NULL payload is absent, not parsed: from_json(NULL) has a
            # NULL corrupt column too, so guard on presence explicitly
            # (matches the oracle's json_valid(NULL) → NULL)
            F.count(
                F.when(
                    F.col("props").isNotNull()
                    & F.col("_p._corrupt").isNull(),
                    1,
                )
            )
            .cast("long")
            .alias("n_parsed"),
            F.count(F.col("_p.k")).cast("long").alias("n_with_k"),
            F.min(F.col("_p.k")).alias("min_k"),
            F.max(F.col("_p.k")).alias("max_k"),
            F.sum(F.col("_p.k").cast("long")).alias("sum_k"),
        )
        .withColumn("parse_rate", round_div("n_parsed", "n_events", 4))
    )


def build_props_typed_audit(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return props_typed_audit(load_star(spark, sf_dir)["events"], ctx)


# "parsed" must mirror PERMISSIVE from_json's RECORD-level conformance,
# not mere json_valid: a wrong-typed k-as-string / non-integer k /
# bare JSON-null payload all mark the record corrupt in
# Spark (k NULL, nothing parsed) while remaining VALID JSON — pinned on
# the hostile corpus's props-pathology rows. DuckDB twin: valid JSON
# that is an OBJECT whose $.k is absent, JSON null, or integer-typed
# WITHIN int32 (r9: an overflowing integer k marks the record corrupt
# in Spark too — empirically pinned, so the in-range TRY_CAST is part
# of the conformance predicate, and a JSON-null k parses).
ORACLE_SQL_PROPS_TYPED = f"""
WITH p AS (
  SELECT event_type,
         CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT' THEN
           CASE WHEN json_type(props, '$.k') IS NULL
                  OR json_type(props, '$.k') = 'NULL'
                THEN 1
                WHEN json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
                  AND TRY_CAST(json_extract_string(props, '$.k')
                               AS INTEGER) IS NOT NULL
                THEN 1
           END
         END AS parsed,
         CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT'
                AND json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
         END AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       {{RD}} AS parse_rate
FROM p GROUP BY 1
"""
ORACLE_SQL_PROPS_TYPED = ORACLE_SQL_PROPS_TYPED.replace(
    "{RD}", _rd("CAST(COUNT(parsed) AS BIGINT)", "CAST(COUNT(*) AS BIGINT)", 4)
)


# ---------------------------------------------- gap-fill + LOCF --------
def gapfill_hourly(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Hypertable-style regular resampling: a dense (event_type × hour)
    grid over the corpus's time range, zero-filled counts, and
    last-observation-carried-forward values for the gap hours — the
    time_bucket_gapfill + locf() operator of a metrics store.

    Plan shape: one grouped agg to hourly partials, a 1-row min/max
    scalar (broadcast cross — intended), a ``sequence()`` explode that
    generates the grid IN the engine (rows = types × hours, bounded and
    tiny relative to events), one left join grid←partials, and one
    ordered window per type for the carry-forward. At 100 TB the grid
    is still types × hours (thousands of rows per year) — the operator
    scales with TIME RANGE, not event volume; only the first agg sees
    the events.
    """
    hourly = (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(money_fixed(F.col("value"))).alias("_val_fx"),
        )
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("_lo"),
        F.date_trunc("hour", F.max("ts")).alias("_hi"),
    )
    types = F.array(*[F.lit(t) for t in EVENT_TYPES])
    grid = (
        bounds.select(
            F.explode(
                F.sequence("_lo", "_hi", F.expr("interval 1 hour"))
            ).alias("hour")
        )
        .crossJoin(F.broadcast(
            events.sparkSession.range(1).select(
                F.explode(types).alias("event_type")
            )
        ))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        grid.join(hourly, ["event_type", "hour"], "left")
        .withColumn("is_gap", F.col("_n").isNull())
        .withColumn("n_events", F.coalesce(F.col("_n"), F.lit(0)).cast("long"))
        .withColumn(
            "_locf_fx", F.last("_val_fx", ignorenulls=True).over(w)
        )
    )
    return filled.select(
        "event_type",
        "hour",
        "n_events",
        F.col("is_gap").cast("boolean").alias("is_gap"),
        F.when(F.col("_val_fx").isNotNull(), round_div("_val_fx", "10000", 2))
        .otherwise(F.lit(None).cast("double"))
        .alias("hour_value"),
        F.when(F.col("_locf_fx").isNotNull(), round_div("_locf_fx", "10000", 2))
        .otherwise(F.lit(0.0))
        .alias("locf_value"),
    )


def build_gapfill(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return gapfill_hourly(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_GAPFILL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n, CAST(SUM({_VAL_C}) AS BIGINT) AS val_fx
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT unnest({list(EVENT_TYPES)}) AS event_type) t,
       bounds,
       unnest(generate_series(bounds.lo, bounds.hi, INTERVAL 1 HOUR))
         AS g(hour)
),
filled AS (
  SELECT g.event_type, g.hour,
         COALESCE(h.n, 0) AS n_events,
         h.n IS NULL AS is_gap,
         h.val_fx AS val_fx,
         last_value(h.val_fx IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.hour
           ROWS UNBOUNDED PRECEDING) AS locf_fx
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.hour = h.hour
)
SELECT event_type, hour, CAST(n_events AS BIGINT) AS n_events, is_gap,
       CASE WHEN val_fx IS NOT NULL
            THEN {round_div_expr("val_fx", "10000", 2, "duckdb")} END
         AS hour_value,
       CASE WHEN locf_fx IS NOT NULL
            THEN {round_div_expr("locf_fx", "10000", 2, "duckdb")}
            ELSE 0.0 END AS locf_value
FROM filled
"""


def gapfill_interp_hourly(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """LINEAR-interpolation gapfill — the ``interpolate()`` companion
    of ``gapfill_hourly``'s locf(): every gap hour between two observed
    hours gets the time-weighted line between them,
    v = v_p + (v_n − v_p)·(h − p)/(n − p), evaluated as ONE exact
    rational — cross-multiplied integer numerator
    v_p·(n − p) + (v_n − v_p)·(h − p) over (n − p) hours, HALF_UP at
    2dp via the sign-safe ``round_div`` (values may be negative).
    Arithmetic runs on truncated CENTS (``div 100``, identical
    truncation both engines — same declared unit as revenue_cusum) so
    the hour-span product keeps 100× overflow headroom (1e11 cents ×
    1e5 hours = 1e16 ≪ 2^63 at 100 TB).

    Bracketing: an hour with events but an all-NULL value column is
    NOT an observation (the carried (hour, value) pair comes from the
    same ``WHEN value IS NOT NULL`` rows on both engines); rows before
    the first / after the last observation of a type interpolate to
    NULL. Observed hours report their own value. Same plan scaling as
    gapfill_hourly: the grid is types × hours — time range, not event
    volume; two ordered windows per type (prev-carry, next-carry) over
    the grid."""
    hourly = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.sum(money_fixed(F.col("value"))).alias("_val_fx"))
        .withColumn("_val_cc", F.expr("CAST(_val_fx div 100 AS BIGINT)"))
        .drop("_val_fx")
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("_lo"),
        F.date_trunc("hour", F.max("ts")).alias("_hi"),
    )
    types = F.array(*[F.lit(t) for t in EVENT_TYPES])
    grid = bounds.select(
        F.explode(F.sequence("_lo", "_hi", F.expr("interval 1 hour"))).alias(
            "hour"
        )
    ).crossJoin(
        F.broadcast(
            events.sparkSession.range(1).select(
                F.explode(types).alias("event_type")
            )
        )
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next observation" via the REVERSED ordering with an unbounded-
    # PRECEDING frame: Spark's UnboundedPreceding frame keeps O(1)
    # running state per row, while first(ignorenulls) over
    # (currentRow, unboundedFollowing) RE-SCANS forward per row —
    # O(rows²) per partition, measured MINUTES on the hostile grid's
    # 483k-hour gap-heavy partitions vs seconds for this spelling
    w_next = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_h = F.when(F.col("_val_cc").isNotNull(), F.expr("unix_seconds(hour) div 3600"))
    filled = (
        grid.join(hourly, ["event_type", "hour"], "left")
        .withColumn("_h", F.expr("unix_seconds(hour) div 3600"))
        .withColumn("_pv", F.last("_val_cc", ignorenulls=True).over(w_prev))
        .withColumn("_ph", F.last(obs_h, ignorenulls=True).over(w_prev))
        .withColumn("_nv", F.last("_val_cc", ignorenulls=True).over(w_next))
        .withColumn("_nh", F.last(obs_h, ignorenulls=True).over(w_next))
    )
    # at an observed hour _ph == _nh == _h and the formula degenerates
    # to the observed value with denominator 0 — select it directly
    interp = F.when(F.col("_val_cc").isNotNull(), round_div("_val_cc", "100", 2)).otherwise(
        F.when(
            F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
            round_div(
                "_pv * (_nh - _ph) + (_nv - _pv) * (_h - _ph)",
                "(_nh - _ph) * 100",
                2,
            ),
        )
    )
    return filled.select(
        "event_type",
        "hour",
        F.col("_val_cc").isNull().alias("is_gap"),
        F.when(
            F.col("_val_cc").isNotNull(), round_div("_val_cc", "100", 2)
        ).alias("hour_value"),
        interp.alias("interp_value"),
    )


def build_gapfill_interp(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return gapfill_interp_hourly(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_GAPFILL_INTERP = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(SUM({_VAL_C}) AS BIGINT) // 100 AS val_cc
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT unnest({list(EVENT_TYPES)}) AS event_type) t,
       bounds,
       unnest(generate_series(bounds.lo, bounds.hi, INTERVAL 1 HOUR))
         AS g(hour)
),
filled AS (
  SELECT g.event_type, g.hour, h.val_cc,
         CAST(epoch(g.hour) AS BIGINT) // 3600 AS hn,
         last_value(h.val_cc IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN h.val_cc IS NOT NULL
                    THEN CAST(epoch(g.hour) AS BIGINT) // 3600 END
                    IGNORE NULLS) OVER wp AS ph,
         last_value(h.val_cc IGNORE NULLS) OVER wn AS nv,
         last_value(CASE WHEN h.val_cc IS NOT NULL
                    THEN CAST(epoch(g.hour) AS BIGINT) // 3600 END
                    IGNORE NULLS) OVER wn AS nh
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.hour = h.hour
  WINDOW
    wp AS (PARTITION BY g.event_type ORDER BY g.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wn AS (PARTITION BY g.event_type ORDER BY g.hour DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, hour,
       val_cc IS NULL AS is_gap,
       CASE WHEN val_cc IS NOT NULL
            THEN {round_div_expr("val_cc", "100", 2, "duckdb")} END
         AS hour_value,
       CASE WHEN val_cc IS NOT NULL
            THEN {round_div_expr("val_cc", "100", 2, "duckdb")}
            WHEN pv IS NOT NULL AND nv IS NOT NULL
            THEN {round_div_expr("pv * (nh - ph) + (nv - pv) * (hn - ph)",
                                 "(nh - ph) * 100", 2, "duckdb")}
       END AS interp_value
FROM filled
"""


# ------------------------------------------ watermark design audit -----
#: lateness histogram fence-posts (seconds); ∞ bucket catches the rest
LATENESS_BUCKETS = (0, 60, 300, 3600, 86400)


def lateness_audit(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Watermark design from data: how late do events actually arrive?

    ``event_id`` is the arrival sequence; an event's lateness is the
    running maximum event-time seen at its arrival minus its own
    event-time. The histogram over standard fences (on-time / ≤1 min /
    ≤5 min / ≤1 h / ≤1 d / later) with cumulative share IS the
    watermark decision: pick the delay that keeps your target fraction.
    The streaming shapes in streaming/event_streams.py take their
    ``withWatermark`` delays from exactly this distribution.

    Plan: the running maximum over arrival order is computed WITHOUT a
    single-task global window (the same two-stage decomposition as
    shard_manifest's export rank): bucket arrival order into contiguous
    event_id ranges → per-bucket running max (window PARTITIONED by
    bucket — parallel) → fold in each bucket's carry-in, the max
    event-time of all earlier buckets, from a tiny lazy triangular
    self-join. Exact because buckets are contiguous in arrival order:
    prefix-max = max(bucket-local prefix-max, carry-in).

    The bucket id is ARITHMETIC — ((event_id − min)·32) div (span) from
    a broadcast 1-row bounds aggregate — NOT ``repartitionByRange``:
    range-partitioner boundaries come from sampling seeded by the RDD
    id, so the two physical instantiations of the same frame on either
    side of the broadcast join can disagree on partition membership
    (caught by the oracle gate: 354/100k events mis-ranked). Cumulative
    share is exact fixed-point over integer counts.

    An event with a NULL event_id has NO arrival position: Spark's
    window ORDER BY would place it first, DuckDB's last, and its
    running-max prefix (hence its lateness bucket) would differ per
    engine — dead-lettered on both sides (r10 review-pinned hostile
    row; same identity discipline as io.timed_events, which does not
    screen event_id).
    """
    events = events.filter(F.col("event_id").isNotNull())
    bounds = events.agg(
        F.min("event_id").alias("_lo"), F.max("event_id").alias("_hi")
    )
    ranged = (
        events.join(F.broadcast(bounds))
        .withColumn(
            "_pid",
            F.expr("((event_id - _lo) * 32) div (_hi - _lo + 1)"),
        )
        .drop("_lo", "_hi")
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # r14: checkpoint the 32-row per-bucket max (the agg scans every
    # event) and fold the carry-in with a running max over the TINY
    # bucket table instead of the former triangular self-join — the
    # join referenced pmax twice, so the static planner re-ran the
    # full-corpus agg once per side. The single-task window is bounded
    # by the CONSTANT bucket count (32), never by data volume.
    # carry_i = max over earlier buckets = running max shifted one row;
    # the frame ending at -1 PRECEDING yields NULL for bucket 0 exactly
    # like the old left join's empty match set.
    pmax = (
        ranged.groupBy("_pid")
        .agg(F.max("ts").alias("_pmax"))
        .localCheckpoint(eager=True)
    )
    wcarry = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = pmax.select(
        "_pid", F.max("_pmax").over(wcarry).alias("_carry")
    )
    lat = (
        ranged.withColumn("_locmax", F.max("ts").over(wloc))
        .join(F.broadcast(carry), "_pid")
        .select(
            (
                # greatest() skips NULLs: partition 0 has no carry-in
                F.unix_timestamp(F.greatest("_locmax", "_carry"))
                - F.unix_timestamp("ts")
            ).alias("late_s")
        )
    )
    fences = list(LATENESS_BUCKETS)
    bucket = F.when(F.col("late_s") <= fences[0], F.lit(0))
    for i, f in enumerate(fences[1:], start=1):
        bucket = bucket.when(F.col("late_s") <= f, F.lit(i))
    bucket = bucket.otherwise(F.lit(len(fences)))
    # r14: the histogram (≤ 6 rows) feeds BOTH the total aggregate and
    # the final select — un-checkpointed, the static planner re-ran the
    # entire per-event window pipeline once per consumer
    hist = (
        lat.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    total = hist.agg(F.sum("n_events").alias("_t"))
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    labels = [f"<= {s}s" for s in fences] + [f"> {fences[-1]}s"]
    label = F.element_at(
        F.array(*[F.lit(x) for x in labels]), F.col("bucket") + 1
    )
    return (
        hist.join(F.broadcast(total))
        .withColumn("cum_events", F.sum("n_events").over(wc))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            label.alias("lateness"),
            F.col("n_events").cast("long").alias("n_events"),
            round_div("n_events", "_t", 4).alias("share"),
            round_div("cum_events", "_t", 4).alias("cum_share"),
        )
    )


def build_lateness_audit(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return lateness_audit(load_star(spark, sf_dir)["events"], ctx)


def _lateness_oracle() -> str:
    fences = list(LATENESS_BUCKETS)
    conds = " ".join(
        f"WHEN late_s <= {f} THEN {i}" for i, f in enumerate(fences)
    )
    labels = [f"<= {s}s" for s in fences] + [f"> {fences[-1]}s"]
    label_arr = "[" + ", ".join(f"'{x}'" for x in labels) + "]"
    return f"""
WITH lat AS (
  -- epoch_us // 1000000 TRUNCATES like Spark's unix_timestamp;
  -- CAST(epoch() AS BIGINT) would ROUND a fractional-second ts and
  -- shift late_s by ±1 s across a histogram fence (r10 review)
  SELECT epoch_us(MAX(ts) OVER (ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING)) // 1000000
         - epoch_us(ts) // 1000000 AS late_s
  FROM events WHERE event_id IS NOT NULL
),
hist AS (
  SELECT CASE {conds} ELSE {len(fences)} END AS bucket,
         COUNT(*) AS n_events
  FROM lat GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t FROM hist)
SELECT CAST(bucket AS INTEGER) AS bucket,
       {label_arr}[bucket + 1] AS lateness,
       CAST(n_events AS BIGINT) AS n_events,
       {round_div_expr("n_events", "t", 4, "duckdb")} AS share,
       {round_div_expr(
           "SUM(n_events) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)",
           "t", 4, "duckdb")} AS cum_share
FROM hist, tot
"""


ORACLE_SQL_LATENESS = _lateness_oracle()


# ---------------------------------------------- VARIANT props audit -----
def props_variant_audit(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """``props_typed_audit``'s semi-structured twin on Spark 4's VARIANT
    type: ``try_parse_json`` shreds each payload into a binary variant
    once, ``try_variant_get`` path-extracts with a target type — the
    schema-ON-DEMAND path for payloads whose shape drifts (a fixed
    ``from_json`` schema must be rewritten per drift; variant_get paths
    don't). Cross-engine edge parity is exact and pinned: a JSON
    ``null`` payload parses (non-null variant ↔ DuckDB json_valid
    true), a malformed payload yields a NULL variant (↔ json_valid
    false), SQL NULL stays NULL, and a missing path is NULL under both
    extractors. All-JVM expressions — no Python in the row path; one
    groupBy shuffle with map-side partial aggregation.
    """
    v = F.expr("try_parse_json(props)")
    k = F.expr("try_variant_get(try_parse_json(props), '$.k', 'int')")
    return (
        events.select("event_type", v.alias("_v"), k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("_v").cast("long").alias("n_parsed"),
            F.count("_k").cast("long").alias("n_with_k"),
            F.sum("_k").cast("long").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
        )
    )


def build_props_variant_audit(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return props_variant_audit(load_star(spark, sf_dir)["events"], ctx)


# CAST discipline (r8): SUM(INTEGER) is HUGEINT in DuckDB — fetch-fragile.
# r9 (ADVICE): the k extraction is TYPE-BRANCHED on json_type so it
# mirrors try_variant_get's type-directed cast on every payload shape
# (bool→1/0, double→truncate, string→integral-text only) — a bare
# TRY_CAST agreed with Spark only on the integer-typed payloads.
ORACLE_SQL_PROPS_VARIANT = f"""
WITH p AS (
  SELECT event_type,
         CASE WHEN json_valid(props) THEN 1 END AS parsed,
         {vget_int_oracle("props")} AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS INTEGER) AS min_k,
       CAST(MAX(k) AS INTEGER) AS max_k
FROM p
GROUP BY event_type
"""
