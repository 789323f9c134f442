"""Change-data-capture / mutable-table maintenance operators.

The reference pipeline is append-only (generate-asset.scala writes full
snapshots; run-all.sh re-runs from scratch), but a production lake keeps
mutable entities current without full rewrites. This module supplies the
three standard shapes:

  * ``latest_state``     — CDC log → current-state compaction
                           (latest record wins per key);
  * ``scd2_history``     — slowly-changing-dimension type 2: change-
                           compressed validity intervals per key;
  * ``merge_latest_wins``— MERGE INTO semantics (update-else-insert)
                           expressed as union + keyed latest-wins.

Relationship to demo_etl_spark.maintenance: that module applies merges
TO DISK (maintenance.merge_upsert rewrites a parquet dataset via
anti-join + union; maintenance.scd2_upsert closes/extends versions on a
stored dimension). This module is the PLAN-level family — the same
semantics as pure DataFrames under the DuckDB oracle gate, including
deriving a full SCD2 history from an event log (which the disk-side
incremental upsert can then maintain).

All three are window/anti-join shapes over the key — one shuffle on the
key each, no row amplification, so they scale linearly with input and
survive skew via AQE (the key is the natural partitioning for the
downstream table as well). ``row_number`` ties are broken on a unique id
so results are deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div, round_div_expr
from demo_etl_spark.io import EVENTS_CLEAN_SQL, load_star, timed_events


# --------------------------------------------------------------- CDC ----
def latest_state(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Compact a CDC-style event log to current state: one row per
    user_id carrying the latest event (by ts, tie-broken on the unique
    event_id so the result is deterministic) plus the version count.

    Plan: a single shuffle on user_id feeding two window functions over
    the same partitioning (Catalyst computes both in one WindowExec).
    At 100 TB this is the standard log-compaction job; the output
    partitioning (user_id) is exactly what the serving table wants.

    Determinism (r12 review): (ts, event_id) is not a total order when
    two keyless versions share a timestamp — both engines would pick a
    partition-order-arbitrary winner. The sort therefore extends through
    the OUTPUT payload columns (event_type, value), making the selected
    row engine-identical for every input; DESC defaults NULLS LAST on
    both engines, spelled explicitly anyway. Pinned by a hand-built
    frame in tests/test_cdc_fingerprint.py.
    """
    w_latest = Window.partitionBy("user_id").orderBy(
        F.desc_nulls_last("ts"),
        F.desc_nulls_last("event_id"),
        F.desc_nulls_last("event_type"),
        F.desc_nulls_last("value"),
    )
    w_all = Window.partitionBy("user_id")
    return (
        events.withColumn("rn", F.row_number().over(w_latest))
        .withColumn("n_versions", F.count(F.lit(1)).over(w_all))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("n_versions").cast("long").alias("n_versions"),
        )
    )


def build_latest_state(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return latest_state(load_star(spark, sf_dir)["events"], ctx)


ORACLE_SQL_LATEST_STATE = """
SELECT user_id,
       ts AS last_ts,
       event_type AS last_event_type,
       value AS last_value,
       CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_versions
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id
  ORDER BY ts DESC, event_id DESC, event_type DESC, value DESC) = 1
"""


# -------------------------------------------------------------- SCD2 ----
def scd2_history(events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Slowly-changing-dimension type 2 over the per-user event_type
    attribute: collapse consecutive same-value runs, then stamp each
    change with a validity interval [valid_from, valid_to) — valid_to
    NULL (and is_current true) on the open current version.

    Two chained windows over the SAME (user_id, ts, event_id) sort:
    lag() detects changes, lead()/row_number() number the surviving
    versions — one shuffle total, and the run-length compression
    happens before the second window, so state is bounded by the
    number of CHANGES, not events (the point of SCD2 at scale).

    event_id sorts NULLS LAST explicitly (r12 review): the cleaned
    events keep NULL event_id rows, and on a (user_id, ts) tie Spark's
    ASC default (NULLS FIRST) and DuckDB's (NULLS LAST) would chain
    lag()/lead() through the tie in opposite orders — divergent change
    detection while both engines look internally consistent.
    """
    w = Window.partitionBy("user_id").orderBy(
        "ts", F.asc_nulls_last("event_id")
    )
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy(
        "valid_from", F.asc_nulls_last("event_id")
    )
    return (
        changes.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version_no", F.row_number().over(w2).cast("long"))
        .select(
            "user_id",
            "event_type",
            "valid_from",
            "valid_to",
            "version_no",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def build_scd2_history(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return scd2_history(timed_events(load_star(spark, sf_dir)["events"]), ctx)


ORACLE_SQL_SCD2 = f"""
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM {EVENTS_CLEAN_SQL}
),
changes AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM flagged
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
       CAST(row_number() OVER (
         PARTITION BY user_id ORDER BY valid_from, event_id) AS BIGINT)
         AS version_no,
       (lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL)
         AS is_current
FROM changes
"""


# ------------------------------------------------------------- MERGE ----
def merge_latest_wins(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE INTO semantics (matched → update, not-matched → insert)
    as a pure DataFrame plan: union both sides with a source priority
    and keep the highest-priority row per key. Columns must align
    (unionByName). One shuffle on the key — the same cost as the
    anti-join + union spelling maintenance.merge_upsert uses on disk,
    but a single window pass makes the latest-wins rule explicit and
    extends to multi-version updates; Spark 4's WindowGroupLimit pushes
    a partial top-1-per-key below the shuffle (plan-pinned in
    tests/test_cdc_fingerprint.py), so the exchange moves ≤ 1 row per
    (key, side).

    Contract (r12 review, mirrors maintenance.merge_upsert): keys
    should be non-NULL and updates carry at most one row per key. Two
    failure modes of dirty inputs are handled defensively rather than
    silently: (1) NULL keys — SQL window PARTITION BY groups every NULL
    key together, so two DISTINCT keyless rows would collapse into one;
    the caller should quarantine NULL-key rows around the merge (see
    build_merge_upsert). (2) duplicate BASE keys (a dup-PK quality
    violation) tie on ``_pri`` — pass ``tiebreak_cols`` to make the
    surviving row deterministic and engine-identical (ascending, NULLS
    LAST, matching DuckDB's default); without it the pick is
    partition-order arbitrary.
    """
    tagged = base.withColumn("_pri", F.lit(0)).unionByName(
        updates.withColumn("_pri", F.lit(1))
    )
    order = [F.col("_pri").desc()] + [
        F.asc_nulls_last(c) for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_pri", "_rn")
    )


#: the deterministic "repricing feed": open orders get a 10% uplift,
#: rounded HALF_UP to cents in integer space (engine-exact).
_UPLIFT_NUM = "TRY_CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT) * 11"
_UPLIFT_DEN = "100000"


_MERGE_TIEBREAK = [
    "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
    "o_orderpriority",
]


def build_merge_upsert(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Registered MERGE exercise: apply a repriced-open-orders update
    feed onto the orders table. Update rows (o_orderstatus = 'O') carry
    o_totalprice × 1.1 rounded to cents; all other orders pass through
    unchanged. The oracle replays the same merge with QUALIFY.

    Dirty-input policy (r12 review, hostile-pinned): NULL-key orders
    route AROUND the merge unchanged — a MERGE cannot address a row
    without a key, and the window spelling would collapse distinct
    keyless rows into one (same class as streaming_dedup's NULL-key
    quarantine). Duplicate base keys (dup-PK violation, surfaced by
    data_quality_audit) survive deterministically via the full payload
    tiebreak — both engines keep the same row."""
    merged, keyless = _merge_upsert_parts(spark, sf_dir)
    return merged.unionByName(keyless)


def _merge_upsert_parts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(keyed merge result, quarantined keyless rows) — split out so
    consumers that provably drop the keyless rows anyway (snapshot_diff's
    NULL-rejecting key filter) can take the merged side alone: the union
    node above the latest-wins window otherwise erases the window's
    o_orderkey hash-partitioning and costs the downstream full-outer
    join a whole re-exchange of the snapshot (r14, guide §2.1)."""
    orders = load_star(spark, sf_dir)["orders"]
    keyed = orders.filter(F.col("o_orderkey").isNotNull())
    keyless = orders.filter(F.col("o_orderkey").isNull())
    updates = keyed.filter(F.col("o_orderstatus") == "O").withColumn(
        "o_totalprice", round_div(_UPLIFT_NUM, _UPLIFT_DEN, 2)
    )
    merged = merge_latest_wins(
        keyed, updates, ["o_orderkey"], tiebreak_cols=_MERGE_TIEBREAK
    )
    return merged, keyless


# tiebreak columns ascending NULLS LAST (DuckDB's default) mirror the
# Spark-side _MERGE_TIEBREAK exactly; keyless rows bypass the window
ORACLE_SQL_MERGE_UPSERT = f"""
WITH keyed AS (
  SELECT * FROM orders WHERE o_orderkey IS NOT NULL
),
updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         {round_div_expr(_UPLIFT_NUM, _UPLIFT_DEN, 2, "duckdb")} AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM keyed WHERE o_orderstatus = 'O'
),
tagged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority, 0 AS _pri FROM keyed
  UNION ALL
  SELECT *, 1 AS _pri FROM updates
),
merged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority
  FROM tagged
  QUALIFY row_number() OVER (
    PARTITION BY o_orderkey
    ORDER BY _pri DESC, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority) = 1
)
SELECT * FROM merged
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders WHERE o_orderkey IS NULL
"""


# ---------------------------------------------------- snapshot diff ----
def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two table snapshots: ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` per key, plus how many compared columns
    differ and both versions of every compared column (``old_*`` /
    ``new_*``).

    The audit a lake needs after any MERGE/backfill/migration: what did
    the new snapshot actually do? One full-outer join on the key — the
    same single shuffle a keyed merge costs, no amplification, skew
    handled by AQE. Presence is tracked with explicit flags (a row whose
    compared columns are all NULL is still 'present'), and value
    comparison is null-safe (``<=>``), so NULL→value and value→NULL both
    count as changes.

    Reference: extends the reference's count-only write verification
    (generate-asset.scala:333-338) to a per-row, per-column contract.
    """
    o = old.select(
        *key_cols,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, list(key_cols), "full_outer")
    n_changed = sum(
        (~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))).cast("int")
        for c in compare_cols
    )
    matched = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    n_changed = F.when(matched, n_changed).otherwise(F.lit(0))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *key_cols,
        status.alias("diff_status"),
        n_changed.cast("int").alias("n_changed_cols"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


#: deterministic snapshot divergence for the registered exercise:
#: the old snapshot is missing keys ≡0 (mod 23) (late-arriving rows →
#: 'added'), the new snapshot drops keys ≡0 (mod 29) (archived rows →
#: 'removed'), and open orders carry the repriced o_totalprice
#: ('changed'); everything else is 'unchanged'.
_DIFF_OLD_MOD = 23
_DIFF_NEW_MOD = 29


def build_snapshot_diff(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    orders = load_star(spark, sf_dir)["orders"]
    old = orders.filter(F.col("o_orderkey") % _DIFF_OLD_MOD != 0)
    # The keyed merge WITHOUT the keyless union (_merge_upsert_parts):
    # the % filter is NULL-rejecting, so (merged ∪ keyless).filter(...)
    # ≡ merged.filter(...) — identical rows, and the full-outer join
    # below inherits the latest-wins window's key partitioning instead
    # of re-exchanging the whole snapshot above the union.
    merged, _keyless = _merge_upsert_parts(spark, sf_dir)
    new = merged.filter(F.col("o_orderkey") % _DIFF_NEW_MOD != 0)
    d = snapshot_diff(
        old,
        new,
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
         "o_orderpriority"],
    )
    return d.select(
        "o_orderkey",
        "diff_status",
        "n_changed_cols",
        "old_o_totalprice",
        "new_o_totalprice",
    )


ORACLE_SQL_SNAPSHOT_DIFF = f"""
WITH merged AS ({ORACLE_SQL_MERGE_UPSERT}),
o AS (
  SELECT * FROM orders WHERE o_orderkey % {_DIFF_OLD_MOD} <> 0
),
n AS (
  SELECT * FROM merged WHERE o_orderkey % {_DIFF_NEW_MOD} <> 0
),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         o.o_custkey AS old_custkey, n.o_custkey AS new_custkey,
         o.o_orderstatus AS old_status, n.o_orderstatus AS new_status,
         o.o_totalprice AS old_price, n.o_totalprice AS new_price,
         o.o_orderdate AS old_date, n.o_orderdate AS new_date,
         o.o_orderpriority AS old_prio, n.o_orderpriority AS new_prio
  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
),
scored AS (
  SELECT *,
         CASE WHEN in_old AND in_new THEN
              CAST(old_custkey IS DISTINCT FROM new_custkey AS INTEGER)
            + CAST(old_status IS DISTINCT FROM new_status AS INTEGER)
            + CAST(old_price IS DISTINCT FROM new_price AS INTEGER)
            + CAST(old_date IS DISTINCT FROM new_date AS INTEGER)
            + CAST(old_prio IS DISTINCT FROM new_prio AS INTEGER)
         ELSE 0 END AS n_changed_cols
  FROM j
)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN n_changed_cols > 0 THEN 'changed'
            ELSE 'unchanged' END AS diff_status,
       n_changed_cols,
       old_price AS old_o_totalprice,
       new_price AS new_o_totalprice
FROM scored
"""
