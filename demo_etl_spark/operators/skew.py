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
