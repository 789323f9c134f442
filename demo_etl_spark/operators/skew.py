"""Skew mitigation: salted joins (SURVEY.md §7 Phase 6; build-brief
"salting for skew").

AQE's skew-join splitting (on in session.py) handles most runtime skew by
splitting oversized partitions of a sort-merge join. Salting is the
*plan-level* complement for the pathological case AQE can't fix: one join
key so hot that even a split partition re-concentrates on the same
executor (e.g. a null-like sentinel key, a "default user" id). The big
side spreads each key over ``n_salts`` sub-keys with a deterministic
per-row hash; the small side is replicated ×n_salts. The join then runs
on (key, salt) — the hot key's rows land on n_salts different reducers.

Cost model: small side grows ×n_salts (must still broadcast/shuffle
cheaply); big side is unchanged. Use ONLY on demonstrated skew — on
uniform keys it is pure overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_etl_spark.functions.fixedpoint import fixed_ratio

DEFAULT_SALTS = 16


#: join types where the replicated small side cannot leak duplicates:
#: unmatched SMALL rows never appear in the output for these.
_SALT_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi",
                  "leftsemi", "left_anti", "leftanti"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with key salting.

    The salt is a deterministic hash of the big side's whole row
    (xxhash64 over all columns), so repeated runs produce identical
    physical distributions. Result equals the plain join exactly — the
    salt participates only in routing, never in the output.

    Only big-side-preserving join types are supported: under right/full
    outer joins every unmatched replicated copy of a small row would
    survive, duplicating output ``n_salts``-fold. Put the skewed relation
    on the ``big`` side (that is what salting is for) or de-salt first.
    """
    if how not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_HOW)} joins; "
            f"'{how}' would duplicate unmatched small-side rows ×{n_salts}"
        )
    salt_b = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt_b)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")


def key_skew_profile(
    orders: DataFrame, key: str = "o_custkey", top_n: int = 10
) -> DataFrame:
    """The diagnostic that decides WHEN to salt: per-key frequency
    profile of a join key, returning the ``top_n`` heaviest keys with
    the global context attached — share of total rows in basis points
    and the skew multiple (freq ÷ mean non-null-key freq, ×100).

    Reads the RAW table (audits bypass the ingest quarantine by design):
    a NULL join key is often exactly the hot sentinel this profiler
    exists to catch, so the NULL group competes for a top-N seat like
    any other key. All ratio columns are integer fixed-point (exact
    HALF_UP), hash-stable across engines.

    100 TB shape: one groupBy(key) shuffle (map-side partial counts),
    TakeOrderedAndProject for the top-N, and a 1-row global-totals
    broadcast attach — the same documented scalar-attach pattern as the
    other audits. Nothing scales with the number of distinct keys
    except the groupBy itself.
    """
    # totals derive from freq, not a second pass over orders (r14,
    # guide §2.1): COUNT(*) = Σ freq, COUNT(key) = Σ freq over non-NULL
    # key groups, COUNT(DISTINCT key) = number of non-NULL key groups —
    # exact by the groupBy's own definition, and the countDistinct
    # expand disappears. freq (key-cardinality rows) is eagerly
    # checkpointed because it now feeds both the top-N and the totals.
    freq = (
        orders.groupBy(F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )
    keyed = F.col("key").isNotNull()
    totals = freq.agg(
        F.sum("freq").alias("total_rows"),
        F.sum(F.when(keyed, F.col("freq"))).alias("_nonnull_rows"),
        F.count(F.when(keyed, F.lit(1))).alias("n_keys"),
    )
    top = (
        freq.orderBy(F.desc("freq"), F.asc_nulls_last("key"))
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
    )
    return top.select(
        "key",
        "freq",
        "total_rows",
        "n_keys",
        fixed_ratio("freq", "greatest(total_rows, 1)", 4).alias("freq_bp"),
        # skew multiple ×100 = freq / (nonnull_rows / n_keys) · 100
        fixed_ratio(
            "freq * greatest(n_keys, 1)", "greatest(_nonnull_rows, 1)", 2
        ).alias("skew_x100"),
    ).orderBy(F.desc("freq"), F.asc_nulls_last("key"))


def build_key_skew_profile(spark, sf_dir, ctx=None) -> DataFrame:
    from demo_etl_spark.io import load_star

    return key_skew_profile(load_star(spark, sf_dir)["orders"])


ORACLE_SQL_KEY_SKEW = """
WITH freq AS (
  SELECT o_custkey AS key, COUNT(*) AS freq
  FROM orders GROUP BY o_custkey
), totals AS (
  SELECT COUNT(*) AS total_rows,
         COUNT(o_custkey) AS nonnull_rows,
         COUNT(DISTINCT o_custkey) AS n_keys
  FROM orders
), top AS (
  SELECT key, freq FROM freq
  ORDER BY freq DESC, key ASC NULLS LAST
  LIMIT 10
)
SELECT key, freq, total_rows, n_keys,
       CAST((freq * 10000 * 2 + GREATEST(total_rows, 1))
            // (2 * GREATEST(total_rows, 1)) AS BIGINT) AS freq_bp,
       CAST((freq * GREATEST(n_keys, 1) * 100 * 2 + GREATEST(nonnull_rows, 1))
            // (2 * GREATEST(nonnull_rows, 1)) AS BIGINT) AS skew_x100
FROM top, totals
ORDER BY freq DESC, key ASC NULLS LAST
"""


def build_salted_order_join(spark, sf_dir, ctx=None) -> DataFrame:
    """Registered skew-path variant of the lineitem ⋈ orders priority
    aggregate: the join runs salted on (orderkey, salt) — the routing
    rewrite a pipeline switches to when one orderkey goes pathological —
    and the result must hash-match the plain-join oracle exactly (the
    salt never reaches the output). Same output contract as
    operators.bucketed.build_bucketed_join, so they share an oracle."""
    from demo_etl_spark.functions.fixedpoint import round_div
    from demo_etl_spark.io import load_star

    t = load_star(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("orderkey"),
        "l_extendedprice", "l_discount", "l_quantity",
    )
    od = t["orders"].select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    j = salted_join(li, od, "orderkey", n_salts=8)
    rev_fx = "TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.expr(rev_fx)).alias("_rev_fx"),
            F.sum(F.col("l_quantity").cast("double")).alias("total_qty"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            round_div("_rev_fx", "10000", 2).alias("revenue"),
            "total_qty",
        )
    )
