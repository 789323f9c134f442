"""Data-quality audit — the constraint-check pass of a production lake.

The reference verifies its outputs only by row count and `_SUCCESS`
markers (generate-asset.scala:333-338, run-all.sh:129-139); a warehouse
at 100 TB needs semantic checks: referential integrity between facts and
dims, key uniqueness, domain constraints. This operator runs the whole
battery as ONE DataFrame (a union of small aggregates over the shared
scan cache) so a scheduler can gate downstream jobs on a single result
table — and every check is an exact count, so the audit itself sits
under the DuckDB correctness gate.

Plan shape at scale: each check is either a broadcast/shuffle anti join
on a key (referential checks) or a map-side filter-count (domain
checks); the union is evaluation-parallel — Spark runs the branches
concurrently under one action.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div, round_div_expr
from demo_etl_spark.io import load_star


def _check(name: str, df: DataFrame) -> DataFrame:
    return df.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
        F.lit(name).alias("check"), "n_violations"
    )


def _checks(df: DataFrame, **named_conds) -> DataFrame:
    """Several conditional counts over ONE pass of ``df``, unpivoted to
    the same (check, n_violations) rows ``_check`` emits one by one.
    count(when(cond, 1)) counts exactly the rows a filter(cond) keeps
    (NULL conditions count as false), so each row is bit-identical to
    its standalone-branch spelling — the fact table is scanned once
    instead of once per check (guide §2.1: remove whole passes)."""
    agg = df.agg(
        *[
            F.count(F.when(cond, F.lit(1))).cast("long").alias(name)
            for name, cond in named_conds.items()
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"), F.col(name).alias("n_violations")
            )
            for name in named_conds
        ]
    )
    return agg.select(F.inline(rows))


def data_quality_audit(
    t: dict[str, DataFrame], ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """(check, n_violations) — one row per constraint. A REPORT, not an
    assert: e.g. on the driver testdata every referential/key/domain
    check is clean but ``lineitem_ship_before_order`` fires (the
    generator draws ship and order dates independently) — exactly the
    kind of fact an audit exists to surface, and the oracle confirms
    the counts rather than assuming zeros."""
    orders, lineitem, customer = t["orders"], t["lineitem"], t["customer"]
    nation, supplier, part = t["nation"], t["supplier"], t["part"]
    # r14: checks over the SAME (joined) table are computed in one pass
    # each (_checks) instead of one branch per check — the before plan
    # scanned lineitem 5× and orders 6× (incl. broadcast sides) across
    # 12 branch aggregates; this shape scans lineitem 3× and orders 4×
    # for the identical 12 output rows. Equivalences, each exact:
    #   * left_anti count ≡ count(dim_key IS NULL) over the LEFT join —
    #     an unmatched fact row surfaces exactly once in a left join,
    #     and a matched row's equi-key is necessarily non-NULL;
    #   * inner-join filter count ≡ count(pred) over the same LEFT join —
    #     matched multiplicity is identical and an unmatched row's
    #     NULL-valued predicate counts as false;
    #   * filter counts over one table fuse into conditional counts in
    #     one aggregate (count(when(cond,1)) ≡ filter(cond).count()).
    # NOT fused: the dup-pk checks (they group, not filter) and checks
    # on different join shapes — fusing e.g. orders_null_pk into the
    # orders⋈customer pass would multiply counts under duplicate dim
    # keys, exactly the class the audit exists to catch.
    lo = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left"
    )
    lp = lineitem.join(
        part, lineitem["l_partkey"] == part["p_partkey"], "left"
    )
    checks = [
        # referential integrity + fact-vs-dim domain checks, one pass
        # per join shape
        _checks(
            lo,
            lineitem_orphan_orderkey=F.col("o_orderkey").isNull(),
            lineitem_ship_before_order=F.col("l_shipdate") < F.col("o_orderdate"),
        ),
        _checks(
            orders.join(
                customer, orders["o_custkey"] == customer["c_custkey"], "left"
            ),
            orders_orphan_custkey=F.col("c_custkey").isNull(),
        ),
        _checks(
            customer.join(
                nation, customer["c_nationkey"] == nation["n_nationkey"], "left"
            ),
            customer_orphan_nationkey=F.col("n_nationkey").isNull(),
        ),
        _checks(
            supplier.join(
                nation, supplier["s_nationkey"] == nation["n_nationkey"], "left"
            ),
            supplier_orphan_nationkey=F.col("n_nationkey").isNull(),
        ),
        _checks(lp, lineitem_orphan_partkey=F.col("p_partkey").isNull()),
        # key integrity: primary keys non-null and unique
        _checks(
            orders,
            orders_null_pk=F.col("o_orderkey").isNull(),
            orders_negative_totalprice=F.col("o_totalprice") < 0,
        ),
        _check(
            "orders_dup_pk",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1),
        ),
        _check(
            "customer_dup_pk",
            customer.groupBy("c_custkey")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1),
        ),
        # domain constraints over the bare fact, one pass
        _checks(
            lineitem,
            lineitem_nonpositive_quantity=F.col("l_quantity") <= 0,
            lineitem_discount_out_of_range=(F.col("l_discount") < 0)
            | (F.col("l_discount") > 1),
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), checks)


def build_quality_audit(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return data_quality_audit(load_star(spark, sf_dir), ctx)


ORACLE_SQL_QUALITY_AUDIT = """
SELECT 'lineitem_orphan_orderkey' AS check, CAST(COUNT(*) AS BIGINT) AS n_violations
  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_orphan_custkey', CAST(COUNT(*) AS BIGINT)
  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer_orphan_nationkey', CAST(COUNT(*) AS BIGINT)
  FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'supplier_orphan_nationkey', CAST(COUNT(*) AS BIGINT)
  FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
UNION ALL
SELECT 'lineitem_orphan_partkey', CAST(COUNT(*) AS BIGINT)
  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'orders_null_pk', CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderkey IS NULL
UNION ALL
SELECT 'orders_dup_pk', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'customer_dup_pk', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'lineitem_nonpositive_quantity', CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_quantity <= 0
UNION ALL
SELECT 'lineitem_discount_out_of_range', CAST(COUNT(*) AS BIGINT)
  FROM lineitem WHERE l_discount < 0 OR l_discount > 1
UNION ALL
SELECT 'orders_negative_totalprice', CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_totalprice < 0
UNION ALL
SELECT 'lineitem_ship_before_order', CAST(COUNT(*) AS BIGINT)
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate < o.o_orderdate
"""


# ----------------------------- per-column table profile (ANALYZE) -------
#
# The statistics pass a warehouse runs before trusting or optimizing a
# table (ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS): per column,
# null count, exact distinct count, and a type-appropriate numeric
# min/max — numerics as-is, timestamps as epoch microseconds, strings
# by their length (cross-engine double-formatting of casted strings is
# NOT parity-safe, numeric surrogates are). One wide aggregate computes
# every statistic in a single pass over the table, then unpivots to the
# long (column, stat...) catalog shape.
#
# Scale: multiple exact COUNT(DISTINCT) in one aggregate plans as one
# Expand (rows × columns) + partial aggs — the standard exact path;
# the documented big-corpus swap is approx_count_distinct per column
# (same shape, one pass, no Expand), mirroring customer A5's opt-in.

_PROFILE_COLS = [
    # (column, kind) — kind picks the min/max surrogate
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def orders_profile(
    orders: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias("_rows")]
    for c, kind in _PROFILE_COLS:
        v = {
            "num": F.col(c),
            # parquet NTZ timestamps: session tz is pinned UTC
            # (session.py), so the cast is the UTC instant and
            # unix_micros equals DuckDB's naive epoch_us
            "ts": F.unix_micros(F.col(c).cast("timestamp")),
            "str": F.length(c),
        }[kind]
        aggs += [
            F.count(c).cast("long").alias(f"_nn_{c}"),
            F.countDistinct(c).cast("long").alias(f"_nd_{c}"),
            F.min(v).cast("double").alias(f"_mn_{c}"),
            F.max(v).cast("double").alias(f"_mx_{c}"),
        ]
    wide = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}"
        for c, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_non_null, n_distinct, min_v, max_v)",
        "_rows",
    ).select(
        "column_name",
        F.col("_rows").alias("n_rows"),
        (F.col("_rows") - F.col("n_non_null")).cast("long").alias("n_nulls"),
        "n_distinct",
        "min_v",
        "max_v",
    )


def build_orders_profile(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return orders_profile(load_star(spark, sf_dir)["orders"], ctx)


def _orders_profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        v = {
            "num": c,
            "ts": f"epoch_us({c})",
            "str": f"length({c})",
        }[kind]
        parts.append(f"""
SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({v}) AS DOUBLE) AS min_v,
       CAST(MAX({v}) AS DOUBLE) AS max_v
FROM orders""")
    return "\nUNION ALL\n".join(parts)


ORACLE_SQL_ORDERS_PROFILE = _orders_profile_oracle()

# ------------------------------------------- quarantine accounting -----
def quarantine_audit(
    t: dict[str, DataFrame], ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Dead-letter accounting for the ingest quarantine (io.timed_events
    / io.keyed_orders / similarity.valid_embeddings): one row per
    (table, rule) with the total row count, how many rows the rule
    flags, and the flagged share — the governance record a production
    pipeline publishes alongside every load so silent data loss is
    impossible. Each table costs one map-side conditional aggregate
    (no joins, no shuffle beyond the 1-row agg); the per-rule rows come
    from a stack() over that single row.

    The embeddings off-dimension rule uses the table's MODAL vector
    length (ties toward the smaller length), the same definition
    similarity.valid_embeddings enforces — computed by a tiny
    pre-aggregate on both engine sides."""
    def table_rules(df: DataFrame, name: str, rules: list[tuple[str, str]]) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
            F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"_r{i}")
            for i, (_, cond) in enumerate(rules)
        ]
        one = df.agg(*aggs)
        stack = ", ".join(f"'{rule}', _r{i}" for i, (rule, _) in enumerate(rules))
        return one.select(
            F.lit(name).alias("table_name"),
            F.col("_n").alias("n_rows"),
            F.expr(f"stack({len(rules)}, {stack}) as (rule, n_flagged)"),
        ).select(
            "table_name",
            "rule",
            "n_rows",
            "n_flagged",
            round_div("n_flagged * 10000", "greatest(n_rows, 1)", 0)
            .cast("long")
            .alias("flagged_bp"),
        )

    emb = t["embeddings"]
    row = (
        emb.filter(F.col("embedding").isNotNull())
        .groupBy(F.size("embedding").alias("d"))
        .count()
        .orderBy(F.desc("count"), F.asc("d"))
        .limit(1)
        .first()
    )
    modal = int(row["d"]) if row is not None else 0
    parts = [
        table_rules(t["events"], "events", [
            ("null_ts", "ts IS NULL"),
            ("null_user_id", "user_id IS NULL"),
            ("nonfinite_value",
             "value IS NOT NULL AND (isnan(value) "
             "OR abs(value) = CAST('Infinity' AS DOUBLE))"),
            ("quarantined",
             "ts IS NULL OR user_id IS NULL OR (value IS NOT NULL AND "
             "(isnan(value) OR abs(value) = CAST('Infinity' AS DOUBLE)))"),
        ]),
        table_rules(t["orders"], "orders", [
            ("null_orderkey", "o_orderkey IS NULL"),
            ("null_custkey", "o_custkey IS NULL"),
            ("null_orderdate", "o_orderdate IS NULL"),
            ("null_totalprice", "o_totalprice IS NULL"),
            ("nonfinite_totalprice",
             "o_totalprice IS NOT NULL AND (isnan(o_totalprice) "
             "OR abs(o_totalprice) = CAST('Infinity' AS DOUBLE))"),
            ("quarantined",
             "o_orderkey IS NULL OR o_custkey IS NULL OR "
             "o_orderdate IS NULL OR o_totalprice IS NULL "
             "OR isnan(o_totalprice) "
             "OR abs(o_totalprice) = CAST('Infinity' AS DOUBLE)"),
        ]),
        table_rules(t["documents"], "documents", [
            ("null_text", "text IS NULL"),
            ("null_doc_id", "doc_id IS NULL"),
        ]),
        table_rules(emb, "embeddings", [
            ("null_vec_id", "vec_id IS NULL"),
            ("null_embedding", "embedding IS NULL"),
            # mirrors similarity.valid_embeddings exactly, including the
            # r8 component-finiteness screen (one NaN/Inf component
            # crashes the fixed-point cast)
            ("quarantined",
             f"vec_id IS NULL OR embedding IS NULL "
             f"OR size(embedding) <> {modal} "
             f"OR NOT forall(embedding, x -> x IS NOT NULL "
             f"AND NOT isnan(x) AND abs(x) < CAST('Infinity' AS DOUBLE))"),
        ]),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def build_quarantine_audit(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return quarantine_audit(load_star(spark, sf_dir), ctx)


def _quarantine_audit_oracle() -> str:
    def tbl(name, rules):
        rows = []
        for rule, cond in rules:
            rows.append(
                f"SELECT '{name}' AS table_name, '{rule}' AS rule, "
                f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
                f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) "
                f"AS n_flagged FROM {name}"
            )
        return rows

    modal = ("(SELECT len(embedding) AS d FROM embeddings "
             "WHERE embedding IS NOT NULL "
             "GROUP BY 1 ORDER BY COUNT(*) DESC, d LIMIT 1)")
    selects = (
        tbl("events", [
            ("null_ts", "ts IS NULL"),
            ("null_user_id", "user_id IS NULL"),
            ("nonfinite_value",
             "value IS NOT NULL AND NOT isfinite(value)"),
            ("quarantined",
             "ts IS NULL OR user_id IS NULL "
             "OR (value IS NOT NULL AND NOT isfinite(value))"),
        ])
        + tbl("orders", [
            ("null_orderkey", "o_orderkey IS NULL"),
            ("null_custkey", "o_custkey IS NULL"),
            ("null_orderdate", "o_orderdate IS NULL"),
            ("null_totalprice", "o_totalprice IS NULL"),
            ("nonfinite_totalprice",
             "o_totalprice IS NOT NULL AND NOT isfinite(o_totalprice)"),
            ("quarantined",
             "o_orderkey IS NULL OR o_custkey IS NULL OR "
             "o_orderdate IS NULL OR o_totalprice IS NULL "
             "OR NOT isfinite(o_totalprice)"),
        ])
        + tbl("documents", [
            ("null_text", "text IS NULL"),
            ("null_doc_id", "doc_id IS NULL"),
        ])
        + tbl("embeddings", [
            ("null_vec_id", "vec_id IS NULL"),
            ("null_embedding", "embedding IS NULL"),
            ("quarantined",
             f"vec_id IS NULL OR embedding IS NULL "
             f"OR len(embedding) <> {modal} "
             f"OR NOT list_aggregate(list_transform(embedding, "
             f"x -> x IS NOT NULL AND isfinite(x)), 'bool_and')"),
        ])
    )
    share = round_div_expr("n_flagged * 10000", "greatest(n_rows, 1)", 0,
                           "duckdb")
    return (
        "SELECT table_name, rule, n_rows, n_flagged, "
        f"CAST({share} AS BIGINT) AS flagged_bp FROM (\n"
        + "\nUNION ALL\n".join(selects)
        + "\n)"
    )


ORACLE_SQL_QUARANTINE_AUDIT = _quarantine_audit_oracle()



# ------------------------------------------ Benford first-digit audit ----
#: HALF_UP basis points of log10(1 + 1/d) — the Benford expectation per
#: leading digit; the nine constants sum to exactly 10000 bp. Literals
#: (public mathematical constants), so no transcendental log runs in
#: either engine.
BENFORD_BP = {1: 3010, 2: 1761, 3: 1249, 4: 969, 5: 792,
              6: 669, 7: 580, 8: 512, 9: 458}


def orders_benford_audit(
    orders: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Benford's-law first-digit audit over order amounts — the classic
    fabricated-numbers screen (accounting forensics; Nigrini's test):
    naturally-grown multiplicative amounts follow P(d) = log10(1+1/d),
    while generated/fabricated/capped amounts (TPC-H's uniform prices
    very much included — the audit EXISTS to say so) deviate loudly.

    Exactness: the leading digit comes from the ten-thousandths BIGINT
    lift's decimal string (integer→string is identical across engines;
    no float repr is ever consulted), shares are exact-integer basis
    points (``fixed_ratio``), and the Benford expectations are HALF_UP
    bp literals summing to exactly 10000 — so deviation_bp is pure
    integer arithmetic under the hash gate. NULL / non-positive
    amounts are excluded from the digit population (a leading digit is
    undefined there) and surface in the excluded_rows count on the
    digit-1 row. One map-side pass + a 9-row grid join; nothing scales
    with anything but the scan."""
    from demo_etl_spark.functions.fixedpoint import fixed_ratio
    from demo_etl_spark.functions.scalars import money_fixed

    amt = money_fixed(F.col("o_totalprice"))
    pos = orders.select(amt.alias("_c")).filter(F.col("_c") > 0)
    digits = pos.select(
        F.expr("CAST(substr(CAST(_c AS STRING), 1, 1) AS INT)").alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_amounts")
    )
    spark = orders.sparkSession
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(d) for d in range(1, 10)])).alias("digit")
    )
    # COALESCE to 0: SUM over an EMPTY table is NULL in Spark while the
    # oracle's COUNT(*) FILTER is 0 (all-empty-corpus divergence)
    excluded = orders.select(
        F.coalesce(
            F.sum(
                F.when(amt.isNull() | (amt <= 0), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ),
            F.lit(0),
        ).cast("long").alias("_excluded")
    )
    benford = F.create_map(
        *[x for d, bp in BENFORD_BP.items() for x in (F.lit(d), F.lit(bp))]
    )
    w_all = F.expr("SUM(n_amounts) OVER ()")
    return (
        grid.join(counts, "digit", "left")
        .withColumn("n_amounts", F.coalesce("n_amounts", F.lit(0)).cast("long"))
        .withColumn("_total", w_all.cast("long"))
        .crossJoin(F.broadcast(excluded))
        .select(
            "digit",
            "n_amounts",
            F.when(
                F.col("_total") > 0,
                fixed_ratio("n_amounts", "_total", 4),
            ).alias("observed_bp"),
            benford[F.col("digit")].cast("long").alias("benford_bp"),
            F.when(
                F.col("_total") > 0,
                fixed_ratio("n_amounts", "_total", 4)
                - benford[F.col("digit")].cast("long"),
            ).alias("deviation_bp"),
            F.when(F.col("digit") == 1, F.col("_excluded"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("excluded_rows"),
        )
    )


def build_benford(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return orders_benford_audit(load_star(spark, sf_dir)["orders"], ctx)


def _benford_case_sql() -> str:
    return (
        "CASE digit "
        + " ".join(f"WHEN {d} THEN {bp}" for d, bp in BENFORD_BP.items())
        + " END"
    )


ORACLE_SQL_BENFORD = f"""
WITH amt AS (
  SELECT TRY_CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT) AS c
  FROM orders
),
counts AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_amounts
  FROM amt WHERE c > 0 GROUP BY 1
),
excluded AS (
  SELECT CAST(COUNT(*) FILTER (c IS NULL OR c <= 0) AS BIGINT) AS ex
  FROM amt
),
grid AS (SELECT unnest(range(1, 10)) AS digit),
g AS (
  SELECT grid.digit,
         CAST(COALESCE(counts.n_amounts, 0) AS BIGINT) AS n_amounts,
         CAST(SUM(COALESCE(counts.n_amounts, 0)) OVER () AS BIGINT) AS total
  FROM grid LEFT JOIN counts ON grid.digit = counts.digit
)
SELECT CAST(g.digit AS INTEGER) AS digit,
       g.n_amounts,
       CASE WHEN g.total > 0 THEN
         CAST((((g.n_amounts) * CAST(20000 AS BIGINT) + (g.total)) //
               (CAST(2 AS BIGINT) * (g.total))) AS BIGINT) END
         AS observed_bp,
       CAST({_benford_case_sql().replace("digit", "g.digit")} AS BIGINT)
         AS benford_bp,
       CASE WHEN g.total > 0 THEN
         CAST((((g.n_amounts) * CAST(20000 AS BIGINT) + (g.total)) //
               (CAST(2 AS BIGINT) * (g.total))) AS BIGINT)
         - CAST({_benford_case_sql().replace("digit", "g.digit")} AS BIGINT)
       END AS deviation_bp,
       CASE WHEN g.digit = 1 THEN excluded.ex ELSE CAST(0 AS BIGINT) END
         AS excluded_rows
FROM g, excluded
"""
