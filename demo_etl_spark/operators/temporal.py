"""Temporal joins over the events stream: as-of and range (north-star
extension; the "custom operator Spark lacks" family from the build brief).

Spark has no ASOF JOIN or banded range-join operator; both are
re-expressed here as shuffle-bounded compositions of built-ins:

* **As-of join** (``asof_last_purchase``) — every non-purchase event is
  decorated with the same user's most recent *purchase* event at or
  before its timestamp. Implementation is the classic union-merge: tag
  anchor rows, union both sides, one window per user ordered by
  (time, anchor-first), ``last(payload, ignorenulls)`` carries the
  latest anchor forward, then keep only left rows. One shuffle on
  user_id, zero row amplification, no range explosion — the canonical
  distributed as-of shape (merge_asof semantics without pandas).
  DuckDB's native ``ASOF LEFT JOIN`` is the oracle twin.
* **Range join** (``purchase_followups``) — (purchase, follow-up event
  within 1 hour, same user) pairs. A naive inequality join plans as a
  broadcast-nested-loop (quadratic); instead both sides are bucketed by
  hour — each anchor covers exactly 2 buckets (its own + the next), the
  join becomes an equi-join on (user_id, bucket) with the exact range
  predicate as a post-filter. Each qualifying pair matches exactly once
  (the event's bucket picks one of the anchor's two exploded rows), so
  no dedup pass is needed. Fanout is a constant ×2 on the anchor side —
  survives any scale; the oracle is the plain inequality join.

Both outputs carry the JSON ``props`` column through ``get_json_object``
(§1.2's JSON-string surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.io import (
    EVENTS_CLEAN_SQL,
    gjo_int_oracle,
    load_star,
    timed_events,
)

ANCHOR_TYPE = "purchase"
FOLLOW_WINDOW_SECONDS = 3600


def asof_last_purchase(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """As-of join: each non-purchase event ← most recent purchase ≤ ts.

    Anchor rows are first reduced to one per (user_id, ts) — max event_id
    wins, arg-max carries its value — so the as-of target is unique and
    both engines agree on ties. Events with no prior purchase keep NULLs
    (LEFT semantics).
    """
    anchors = (
        events.filter(F.col("event_type") == ANCHOR_TYPE)
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    left = events.filter(F.col("event_type") != ANCHOR_TYPE)

    l_tag = left.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_anchor"),
        "event_id",
        "event_type",
        "value",
        "props",
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("long").alias("p_event_id"),
        F.lit(None).cast("double").alias("p_value"),
    )
    r_tag = anchors.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_anchor"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
        F.col("ts").alias("p_ts"),
        "p_event_id",
        "p_value",
    )
    # anchor-first at equal t ⇒ "at or before" (>=) semantics; the frame
    # ends at the current row so later anchors are invisible
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_anchor").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumns(
        {
            "last_purchase_ts": F.last("p_ts", ignorenulls=True).over(w),
            "last_purchase_event_id": F.last("p_event_id", ignorenulls=True).over(w),
            "last_purchase_value": F.last("p_value", ignorenulls=True).over(w),
        }
    )
    return merged.filter(F.col("is_anchor") == 0).select(
        "event_id",
        "user_id",
        F.col("t").alias("ts"),
        "event_type",
        "value",
        # try_cast: wrong-typed payload values degrade to NULL like the
        # oracle's TRY_CAST instead of crashing the scan (ANSI cast)
        F.get_json_object("props", "$.k").try_cast("int").alias("props_k"),
        "last_purchase_ts",
        "last_purchase_event_id",
        "last_purchase_value",
        F.expr(
            "(unix_micros(t) - unix_micros(last_purchase_ts)) div 1000000"
        ).alias("secs_since_purchase"),
    )


def purchase_followups(
    events: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    window_seconds: int = FOLLOW_WINDOW_SECONDS,
) -> DataFrame:
    """Range join: (purchase, same-user non-purchase event in the next
    ``window_seconds``] pairs, bucketized to an equi-join (module doc)."""

    def bucket(col_name: str):
        # integer hour-bucket of the epoch; anchors cover [b, b+1]
        return F.expr(f"unix_micros({col_name}) div 1000000 div {window_seconds}")

    anchors = events.filter(F.col("event_type") == ANCHOR_TYPE).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.explode(F.array(bucket("ts"), bucket("ts") + 1)).alias("bucket"),
    )
    follows = events.filter(F.col("event_type") != ANCHOR_TYPE).select(
        F.col("event_id").alias("follow_event_id"),
        "user_id",
        F.col("ts").alias("follow_ts"),
        F.col("event_type").alias("follow_type"),
        F.col("value").alias("follow_value"),
        bucket("ts").alias("bucket"),
    )
    joined = anchors.join(follows, ["user_id", "bucket"]).filter(
        (F.col("follow_ts") >= F.col("purchase_ts"))
        & (
            F.unix_micros("follow_ts")
            <= F.unix_micros("purchase_ts") + window_seconds * 1_000_000
        )
    )
    return joined.select(
        "user_id",
        "purchase_event_id",
        "purchase_ts",
        "follow_event_id",
        "follow_ts",
        "follow_type",
        "follow_value",
        F.expr(
            "(unix_micros(follow_ts) - unix_micros(purchase_ts)) div 1000000"
        ).alias("secs_after"),
    )


def event_transitions(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-user event-type transition matrix (lag/lead window family).

    ``lag(event_type)`` over each user's timeline gives (prev → curr)
    pairs; the rollup counts transitions and their share of each source
    state's outgoing edges — the first-order Markov view of the event
    stream. Ordering ties on identical timestamps break on event_id —
    spelled NULLS LAST explicitly (r12 review): cleaned events keep NULL
    event_id, and on an exact (user_id, ts) tie Spark's ASC default
    (NULLS FIRST) would chain lag() opposite to DuckDB's (NULLS LAST),
    flipping which (prev → curr) pairs exist. Hostile-pinned by the
    900036 tie row.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.asc_nulls_last("event_id")
    )
    pairs = events.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("curr_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "curr_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_src = Window.partitionBy("prev_type")
    from demo_etl_spark.functions.fixedpoint import round_div

    return (
        counts.withColumn("_src_total", F.sum("n_transitions").over(w_src))
        .select(
            "prev_type",
            "curr_type",
            "n_transitions",
            round_div("n_transitions", "_src_total", 6).alias("share_of_source"),
        )
    )


def build_asof(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return asof_last_purchase(timed_events(load_star(spark, sf_dir)["events"]), ctx)


def build_followups(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return purchase_followups(load_star(spark, sf_dir)["events"], ctx)


def build_transitions(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return event_transitions(timed_events(load_star(spark, sf_dir)["events"]), ctx)


from demo_etl_spark.functions.fixedpoint import round_div_expr as _rde

#: shared HALF_UP fixed-point division for the transitions oracle — the
#: hand-rolled inline spelling (r10 review) bypassed the helper's
#: BIGINT-promotion guard and could silently desynchronize from the
#: Spark-side functions/fixedpoint.round_div
_SHARE_RD = _rde(
    "CAST(n_transitions AS BIGINT)",
    "SUM(n_transitions) OVER (PARTITION BY prev_type)",
    6,
    "duckdb",
)

ORACLE_SQL_TRANSITIONS = f"""
WITH pairs AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev_type,
         event_type AS curr_type
  FROM {EVENTS_CLEAN_SQL}
),
counts AS (
  SELECT prev_type, curr_type, COUNT(*) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, curr_type
)
SELECT prev_type, curr_type, n_transitions,
       {_SHARE_RD} AS share_of_source
FROM counts
"""


ORACLE_SQL_ASOF = f"""
WITH anchors AS (
  SELECT user_id, ts AS p_ts,
         MAX(event_id) AS p_event_id,
         arg_max(value, event_id) AS p_value
  FROM {EVENTS_CLEAN_SQL} WHERE event_type = '{ANCHOR_TYPE}'
  GROUP BY user_id, ts
),
lhs AS (SELECT * FROM {EVENTS_CLEAN_SQL} WHERE event_type <> '{ANCHOR_TYPE}')
SELECT l.event_id, l.user_id, l.ts, l.event_type, l.value,
       {gjo_int_oracle("l.props")} AS props_k,
       a.p_ts AS last_purchase_ts,
       a.p_event_id AS last_purchase_event_id,
       a.p_value AS last_purchase_value,
       (epoch_us(l.ts) - epoch_us(a.p_ts)) // 1000000 AS secs_since_purchase
FROM lhs l ASOF LEFT JOIN anchors a
  ON l.user_id = a.user_id AND l.ts >= a.p_ts
"""

ORACLE_SQL_FOLLOWUPS = f"""
SELECT f.user_id,
       p.event_id AS purchase_event_id,
       p.ts AS purchase_ts,
       f.event_id AS follow_event_id,
       f.ts AS follow_ts,
       f.event_type AS follow_type,
       f.value AS follow_value,
       (epoch_us(f.ts) - epoch_us(p.ts)) // 1000000 AS secs_after
FROM events p
JOIN events f
  ON f.user_id = p.user_id
 AND f.ts >= p.ts
 AND epoch_us(f.ts) <= epoch_us(p.ts) + CAST({FOLLOW_WINDOW_SECONDS} AS BIGINT) * 1000000
WHERE p.event_type = '{ANCHOR_TYPE}' AND f.event_type <> '{ANCHOR_TYPE}'
"""
