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
    fx = "CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"
    fxc = ("CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0)"
           " AS BIGINT)")
    return f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
  {rd("SUM(CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))", "10000", 2)} AS sum_base_price,
  {rd(f"SUM({fx})", "10000", 2)} AS sum_disc_price,
  {rd(f"SUM({fxc})", "1000000", 2)} AS sum_charge,
  {rd("SUM(CAST(l_quantity AS BIGINT))", "COUNT(*)", 2)} AS avg_qty,
  {rd("SUM(CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))", "COUNT(*) * 10000", 2)} AS avg_price,
  {rd("SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))", "COUNT(*) * 10000", 6)} AS avg_disc,
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
    fx = "CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"
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


# DuckDB sums to HUGEINT — wrap in BIGINT casts for the shared fragments.
def _oracle() -> str:
    sql = _pricing_summary_sql("duckdb")
    return (
        sql.replace("SUM(CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))",
                    "CAST(SUM(CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT)) AS BIGINT)")
        .replace("SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT))",
                 "CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) AS BIGINT)")
        .replace("SUM(CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT))",
                 "CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT)) AS BIGINT)")
        .replace("SUM(CAST(l_quantity AS BIGINT))",
                 "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)")
        .replace("SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))",
                 "CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS BIGINT)")
    )


ORACLE_SQL = _oracle()
ORACLE_SQL_SHIPPING_PRIORITY = _shipping_priority_sql("duckdb")
ORACLE_SQL_LATE_PRIORITY = _late_order_priority_sql("duckdb")
