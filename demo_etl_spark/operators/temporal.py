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


# ------------------------------------------ token-bucket rate limiter ----
#: burst capacity (tokens) / refill rate (µtokens per day) / cost per
#: event (µtokens). 1 token = 1_000_000 µtokens keeps the whole
#: recurrence in exact integer space: refill for a gap Δµs is
#: (min(Δµs, RL_GAP_FULL_US) · RL_REFILL_MTOK_PER_DAY) div DAY_US —
#: truncating division agrees across Python, Spark and DuckDB because
#: every operand is non-negative, and the gap clamp (the gap past which
#: the bucket is full anyway) bounds the product far below 2^63 even
#: for hostile far-future timestamps.
RL_CAPACITY_TOKENS = 3
RL_COST_MTOK = 1_000_000
RL_CAP_MTOK = RL_CAPACITY_TOKENS * 1_000_000
RL_REFILL_MTOK_PER_DAY = 1_000_000  # 1 token/day sustained
DAY_US = 86_400_000_000
RL_GAP_FULL_US = RL_CAP_MTOK * DAY_US // RL_REFILL_MTOK_PER_DAY


def rate_limit_events(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-user TOKEN-BUCKET admission over the event stream — the
    ingest-side abuse/rate-policy screen (burst ``RL_CAPACITY_TOKENS``,
    sustained ``RL_REFILL_MTOK_PER_DAY``): each event consumes one
    token if available; the bucket refills linearly with elapsed time
    and clamps at capacity. Emits EVERY cleaned event with its
    ``admitted`` flag and the post-decision bucket level — the audit
    view a drop-filter consumes.

    The recurrence b_k = min(CAP, b_{k-1} + refill(Δt_k)) − admit_k·COST
    is prefix-dependent with a clamp — NOT expressible as a window
    function (no running-min/max closed form survives the conditional
    consume), so this is the custom-stateful-operator class: an
    Arrow-batched ``applyInPandas`` kernel per user, O(events-per-user)
    per group with plain-Python integer arithmetic (exact, no int64
    overflow on hostile timestamps). The DuckDB twin is a recursive CTE
    marching rn → rn+1 — genuinely SQL-expressible, so the seat keeps a
    full oracle.

    Ordering contract (io.py quarantine note): events order per user by
    (ts ASC, event_id ASC NULLS LAST) — the repo-wide chain convention.
    Keyless ties at one instant stay hash-deterministic here even
    beyond that contract: tied rows see Δt = 0, so the multiset of
    (identity, admitted, bucket) tuples is order-invariant within the
    tie group.

    At 100 TB: ONE shuffle on user_id total — the ordering window and
    the grouped kernel share the partitioning, and the event identity
    rides THROUGH the kernel instead of joining back afterwards (r14:
    the former reattach equi-join on (user_id, rn) cost two more
    exchanges plus a persist of the whole window output). Exactness of
    the pass-through columns: ``ts`` travels as its own unix_micros
    long (bijective with the µs-precision TimestampType on both ends),
    and ``event_id`` as a decimal STRING — a nullable int64 column
    would round-trip through a float64 pandas block and silently lose
    precision past 2^53 on hostile ids; string→long is exact for every
    long and preserves NULL. Kernel state is one integer per user,
    groups are per-user event counts — bounded."""
    import pandas as pd

    base = (
        events.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("_ts_us"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    # _ts_us orders identically to ts (unix_micros is
                    # strictly monotone); tie-break on the NUMERIC id
                    F.col("_ts_us").asc(), F.asc_nulls_last("event_id")
                )
            ),
        )
        .select(
            "user_id",
            "_ts_us",
            F.col("event_id").cast("string").alias("_eid"),
            "_rn",
        )
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn", kind="mergesort")
        bucket = RL_CAP_MTOK
        prev_us: int | None = None
        admitted: list[bool] = []
        levels: list[int] = []
        for us in pdf["_ts_us"]:
            us = int(us)  # Python int: exact past 2^53, no overflow
            if prev_us is not None:
                gap = min(us - prev_us, RL_GAP_FULL_US)
                bucket = min(
                    RL_CAP_MTOK,
                    bucket + (gap * RL_REFILL_MTOK_PER_DAY) // DAY_US,
                )
            ok = bucket >= RL_COST_MTOK
            if ok:
                bucket -= RL_COST_MTOK
            admitted.append(ok)
            levels.append(bucket)
            prev_us = us
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "_ts_us": pdf["_ts_us"],
                "_eid": pdf["_eid"],
                "admitted": admitted,
                "bucket_mtok": levels,
            }
        )

    decided = base.groupBy("user_id").applyInPandas(
        _kernel,
        "user_id long, _ts_us long, _eid string, admitted boolean, "
        "bucket_mtok long",
    )
    return decided.select(
        "user_id",
        F.timestamp_micros(F.col("_ts_us")).alias("ts"),
        F.col("_eid").cast("long").alias("event_id"),
        "admitted",
        "bucket_mtok",
    )


def build_rate_limit(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return rate_limit_events(timed_events(load_star(spark, sf_dir)["events"]), ctx)


ORACLE_SQL_RATE_LIMIT = f"""
WITH RECURSIVE ordered AS (
  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
         CAST(row_number() OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC NULLS LAST) AS INTEGER) AS rn
  FROM {EVENTS_CLEAN_SQL}
),
rl AS (
  SELECT user_id, us, rn,
         {RL_CAP_MTOK} >= {RL_COST_MTOK} AS admitted,
         CAST({RL_CAP_MTOK} - CASE WHEN {RL_CAP_MTOK} >= {RL_COST_MTOK}
              THEN {RL_COST_MTOK} ELSE 0 END AS BIGINT) AS bucket_mtok
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT user_id, us, rn,
         nb >= {RL_COST_MTOK} AS admitted,
         nb - CASE WHEN nb >= {RL_COST_MTOK} THEN {RL_COST_MTOK} ELSE 0 END
           AS bucket_mtok
  FROM (
    SELECT o.user_id, o.us, o.rn,
           LEAST({RL_CAP_MTOK},
                 r.bucket_mtok
                 + (LEAST(o.us - r.us, {RL_GAP_FULL_US})
                    * {RL_REFILL_MTOK_PER_DAY}) // {DAY_US}) AS nb
    FROM rl r JOIN ordered o
      ON o.user_id = r.user_id AND o.rn = r.rn + 1
  )
)
SELECT o.user_id, o.ts, o.event_id, r.admitted, r.bucket_mtok
FROM rl r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn
"""
