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
