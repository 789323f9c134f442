"""SQL-string query surface (SURVEY.md §2.1 S10).

The reference mixes the DataFrame DSL with raw ``spark.sql`` strings
(generate-asset.scala:333,338). This module exposes the engine's SQL
entry point: tables register as temp views and queries run as ANSI SQL
through the same Catalyst pipeline. The showcase is a TPC-H-Q1-shaped
pricing summary — scan + filter + wide grouped aggregation, the classic
whole-stage-codegen benchmark shape — written once in dialect-portable
form (fixed-point rounding) so the DuckDB oracle is the same text modulo
the integer-division operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div_expr
from demo_etl_spark.io import read_star_table


def _pricing_summary_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    fx = "TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"
    fxc = ("TRY_CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0)"
           " AS BIGINT)")
    return f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
  {rd("SUM(TRY_CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))", "10000", 2)} AS sum_base_price,
  {rd(f"SUM({fx})", "10000", 2)} AS sum_disc_price,
  {rd(f"SUM({fxc})", "1000000", 2)} AS sum_charge,
  {rd("SUM(CAST(l_quantity AS BIGINT))", "COUNT(*)", 2)} AS avg_qty,
  {rd("SUM(TRY_CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))", "COUNT(*) * 10000", 2)} AS avg_price,
  {rd("SUM(TRY_CAST(ROUND(l_discount * 10000, 0) AS BIGINT))", "COUNT(*) * 10000", 6)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def pricing_summary(spark: SparkSession, lineitem: DataFrame) -> DataFrame:
    lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(_pricing_summary_sql("spark"))


def build(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return pricing_summary(spark, read_star_table(spark, sf_dir, "lineitem"))


# TPC-H-Q3-shaped: segment-filtered top-k revenue orders. The ORDER BY +
# LIMIT is made fully deterministic by sorting the exact fixed-point
# revenue with an orderkey tie-break — LIMIT results then agree across
# engines (an unordered LIMIT would not).
def _shipping_priority_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    fx = "TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"
    sum_fx = f"SUM({fx})"
    if dialect == "duckdb":
        sum_fx = f"CAST({sum_fx} AS BIGINT)"
    return f"""
SELECT l_orderkey,
       {rd(sum_fx, "10000", 2)} AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2001-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY {sum_fx} DESC, l_orderkey
LIMIT 10
"""


# TPC-H-Q4-shaped: order-priority counts for orders with at least one
# late-shipped line — a correlated EXISTS, planned by Catalyst as a
# left-semi join (the semi-join family the reference never uses).
def _late_order_priority_sql(dialect: str) -> str:
    return """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2001-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# TPC-H-Q6-shaped: narrow-band revenue scan — the pure pushdown shape
# (no join, no window): every predicate reaches the parquet scan and the
# aggregate is a single partial+final over the surviving rows.
# l_extendedprice and l_discount are exact multiples of 1e-2, so their
# product is an exact multiple of 1e-4 and ROUND(x*1e4) recovers the
# exact integer in both engines.
def _discount_revenue_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    fx = "TRY_CAST(ROUND(l_extendedprice * l_discount * 10000, 0) AS BIGINT)"
    sum_fx = f"SUM({fx})"
    if dialect == "duckdb":
        sum_fx = f"CAST({sum_fx} AS BIGINT)"
    return f"""
SELECT {rd(sum_fx, "10000", 2)} AS discount_revenue,
       COUNT(*) AS line_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# TPC-H-Q14-shaped: conditional-share aggregation over a fact-dim join
# (part is broadcast-size). promo_share is an exact HALF_UP fraction at
# scale 6: numerator headroom promo·2e6 stays under 2^63 through ~sf1;
# beyond that switch the share to a DECIMAL(38) path.
def _promo_revenue_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    fx = "TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"
    promo = f"SUM(CASE WHEN p_type = 'PROMO' THEN {fx} ELSE 0 END)"
    total = f"SUM({fx})"
    if dialect == "duckdb":
        promo = f"CAST({promo} AS BIGINT)"
        total = f"CAST({total} AS BIGINT)"
    return f"""
SELECT {rd(promo, total, 6)} AS promo_share,
       {rd(promo, "10000", 2)} AS promo_revenue,
       {rd(total, "10000", 2)} AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '2000-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '2000-10-01 00:00:00'
"""


# TPC-H-Q10-shaped: returned-revenue per customer, quarter-windowed,
# deterministic top-20 (fixed-point revenue sort + custkey tie-break).
def _returned_items_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    fx = "TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"
    sum_fx = f"SUM({fx})"
    if dialect == "duckdb":
        sum_fx = f"CAST({sum_fx} AS BIGINT)"
    return f"""
SELECT c_custkey, c_name, n_name,
       {rd(sum_fx, "10000", 2)} AS revenue,
       COUNT(*) AS line_count
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '2000-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY {sum_fx} DESC, c_custkey
LIMIT 20
"""


# TPC-H-Q18-shaped: large-volume orders via HAVING over a grouped sum.
# SUM(l_quantity) is an exact small-integer double (every value ≤ 50,
# group sums ≪ 2^53), so the HAVING threshold and the BIGINT cast are
# bit-identical across engines without fixed-point scaling.
def _large_orders_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    return f"""
SELECT o_orderkey, c_custkey, c_name,
       CAST(o_orderdate AS DATE) AS order_date,
       {rd("MAX(TRY_CAST(ROUND(o_totalprice * 10000, 0) AS BIGINT))", "10000", 2)} AS total_price,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, c_custkey, c_name, o_orderdate
HAVING SUM(l_quantity) > 180
"""


def _register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        read_star_table(spark, sf_dir, t).createOrReplaceTempView(t)


def build_shipping_priority(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    _register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_shipping_priority_sql("spark"))


def build_late_priority(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    _register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_late_order_priority_sql("spark"))


def build_discount_revenue(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    _register_views(spark, sf_dir, "lineitem")
    return spark.sql(_discount_revenue_sql("spark"))


def build_promo_revenue(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    _register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_promo_revenue_sql("spark"))


def build_returned_items(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    _register_views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_returned_items_sql("spark"))


def build_large_orders(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    _register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_large_orders_sql("spark"))


# DuckDB sums to HUGEINT — wrap in BIGINT casts for the shared fragments.
def _oracle() -> str:
    sql = _pricing_summary_sql("duckdb")
    return (
        sql.replace("SUM(TRY_CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))",
                    "CAST(SUM(TRY_CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT)) AS BIGINT)")
        .replace("SUM(TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT))",
                 "CAST(SUM(TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS BIGINT)")
        .replace("SUM(TRY_CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT))",
                 "CAST(SUM(TRY_CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT)) AS BIGINT)")
        .replace("SUM(CAST(l_quantity AS BIGINT))",
                 "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)")
        .replace("SUM(TRY_CAST(ROUND(l_discount * 10000, 0) AS BIGINT))",
                 "CAST(SUM(TRY_CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS BIGINT)")
    )


ORACLE_SQL = _oracle()
ORACLE_SQL_SHIPPING_PRIORITY = _shipping_priority_sql("duckdb")
ORACLE_SQL_LATE_PRIORITY = _late_order_priority_sql("duckdb")
ORACLE_SQL_DISCOUNT_REVENUE = _discount_revenue_sql("duckdb")
ORACLE_SQL_PROMO_REVENUE = _promo_revenue_sql("duckdb")
ORACLE_SQL_RETURNED_ITEMS = _returned_items_sql("duckdb")
ORACLE_SQL_LARGE_ORDERS = _large_orders_sql("duckdb")
