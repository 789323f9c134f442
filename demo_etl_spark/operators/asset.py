"""Unified sales-analytics asset (SURVEY.md §2.7 U1, §3.2 steps 5-7).

The reference's signature output: customer, product and time analytics
branches decorated with asset metadata (generate-asset.scala:191-212),
null-padded onto one 23-column schema (DDL generate-asset.scala:296-320)
and UNION ALL'd (generate-asset.scala:222-276). Branch semantics come from
operators.customer / operators.product / operators.timeseries; this module
adds the decoration, the trailing-365-day date-dimension restriction for
the time branch (the reference's 365-row dateDf, generate-asset.scala:176-188),
and the typed-null alignment (union_util).

Determinism: asset_created_date / asset_job_id come from RunContext, not
current_date()/UUID (SURVEY §0 Caveat C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions import tagged_id
from demo_etl_spark.io import load_star
from demo_etl_spark.operators import customer as _customer
from demo_etl_spark.operators import product as _product
from demo_etl_spark.operators import timeseries as _timeseries
from demo_etl_spark.operators.union_util import union_all_by_name
from demo_etl_spark.schemas import SALES_ANALYTICS_ASSET

TIME_BRANCH_DAYS = 365  # the reference's 365-row date dimension

# The reference stamps EVERY asset row with the same two lineage values:
# the external source-table location and the job id
# (generate-asset.scala:277-278). The star surface has no Hive external
# table, so the reference's path is kept as the logical source label.
SOURCE_LOCATION = "/user/hive/external/processed_sales"


def sales_asset_union(
    spark: SparkSession,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    cust_agg: DataFrame | None = None,
    prod_agg: DataFrame | None = None,
    daily: DataFrame | None = None,
) -> DataFrame:
    """The three branch aggregates are injectable (r14 verdict item 3):
    the registered build passes the session-memoized customer/product/
    daily frames, so one query no longer runs three independent fact
    passes — identical results (the branches select subsets of the same
    aggregates they formerly computed inline)."""
    meta = {
        "asset_created_date": F.lit(ctx.anchor_date),
        "asset_job_id": F.lit(ctx.job_id),
        "asset_lineage_source": F.lit(SOURCE_LOCATION),
        "asset_lineage_job": F.lit(ctx.job_id),
    }

    cust = _customer.customer_analytics(lineitem, orders, customer, ctx, agg=cust_agg)
    cust_branch = cust.withColumns(
        {
            "asset_type": F.lit("customer"),
            "asset_id": tagged_id("CUST_", F.col("customer_id")),
            "asset_name": F.col("customer_name"),
            **meta,
        }
    )

    prod = _product.product_ranking(lineitem, orders, part, ctx, agg=prod_agg)
    prod_branch = prod.withColumns(
        {
            "asset_type": F.lit("product"),
            "asset_id": tagged_id("PROD_", F.col("product_id")),
            "asset_name": F.col("product_name"),
            **meta,
        }
    )

    trend = _timeseries.revenue_trend(lineitem, orders, ctx, daily=daily)
    dim = _timeseries.date_dimension(
        spark,
        start=ctx.anchor_date.replace(year=ctx.anchor_date.year - 1),
        end=ctx.anchor_date,
    )
    # Time asset fidelity (generate-asset.scala:208-210,261): asset_name
    # is the bare yyyy-MM-dd date; order_count feeds the total_orders slot.
    time_branch = (
        trend.join(F.broadcast(dim), on=["date"], how="inner")
        .withColumns(
            {
                "asset_type": F.lit("time"),
                "asset_id": F.concat(
                    F.lit("DATE_"), F.date_format("date", "yyyyMMdd")
                ),
                "asset_name": F.date_format("date", "yyyy-MM-dd"),
                "total_orders": F.col("order_count"),
                **meta,
            }
        )
    )

    return union_all_by_name(
        [cust_branch, prod_branch, time_branch], SALES_ANALYTICS_ASSET
    )


def build(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    t = load_star(spark, sf_dir)
    return sales_asset_union(
        spark, t["lineitem"], t["orders"], t["customer"], t["part"], ctx,
        cust_agg=_customer._cached_customer_agg(spark, sf_dir),
        prod_agg=_product._cached_product_agg(spark, sf_dir),
        daily=_timeseries._cached_daily_agg(spark, sf_dir),
    )


def _oracle(ctx: RunContext = DEFAULT_CONTEXT) -> str:
    anchor = ctx.anchor_date.isoformat()
    year_ago = ctx.anchor_date.replace(year=ctx.anchor_date.year - 1).isoformat()
    meta_cols = f"""
      DATE '{anchor}' AS asset_created_date,
      '{ctx.job_id}' AS asset_job_id,
      '{ctx.job_id}' AS asset_lineage_job
    """
    return f"""
WITH cust AS ({_customer.ORACLE_SQL}),
prod AS ({_product.ORACLE_SQL_RANKING}),
trend AS ({_timeseries.ORACLE_SQL_TREND})
SELECT
  'customer' AS asset_type,
  'CUST_' || CAST(customer_id AS VARCHAR) AS asset_id,
  customer_name AS asset_name,
  {meta_cols},
  customer_id,
  total_orders,
  total_spent,
  customer_value_score,
  first_purchase_date,
  last_purchase_date,
  days_since_last_purchase,
  CAST(NULL AS VARCHAR) AS category,
  CAST(NULL AS INTEGER) AS revenue_rank_in_category,
  CAST(NULL AS DATE) AS date,
  CAST(NULL AS VARCHAR) AS day_of_week,
  CAST(NULL AS INTEGER) AS month_num,
  CAST(NULL AS VARCHAR) AS month_name,
  CAST(NULL AS INTEGER) AS year,
  CAST(NULL AS DOUBLE) AS total_revenue,
  CAST(NULL AS BOOLEAN) AS is_revenue_trending_up,
  '{SOURCE_LOCATION}' AS asset_lineage_source
FROM cust
UNION ALL
SELECT
  'product',
  'PROD_' || CAST(product_id AS VARCHAR),
  product_name,
  {meta_cols},
  CAST(NULL AS BIGINT),
  CAST(NULL AS BIGINT),
  CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE),
  CAST(NULL AS DATE),
  CAST(NULL AS DATE),
  CAST(NULL AS INTEGER),
  category,
  revenue_rank_in_category,
  CAST(NULL AS DATE),
  CAST(NULL AS VARCHAR),
  CAST(NULL AS INTEGER),
  CAST(NULL AS VARCHAR),
  CAST(NULL AS INTEGER),
  total_revenue,
  CAST(NULL AS BOOLEAN),
  '{SOURCE_LOCATION}'
FROM prod
UNION ALL
SELECT
  'time',
  'DATE_' || strftime(t.date, '%Y%m%d'),
  strftime(t.date, '%Y-%m-%d'),
  {meta_cols},
  CAST(NULL AS BIGINT),
  t.order_count,
  CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE),
  CAST(NULL AS DATE),
  CAST(NULL AS DATE),
  CAST(NULL AS INTEGER),
  CAST(NULL AS VARCHAR),
  CAST(NULL AS INTEGER),
  t.date,
  upper(dayname(t.date)),
  CAST(month(t.date) AS INTEGER),
  upper(monthname(t.date)),
  CAST(year(t.date) AS INTEGER),
  t.total_revenue,
  t.is_revenue_trending_up,
  '{SOURCE_LOCATION}'
FROM trend t
WHERE t.date >= DATE '{year_ago}' AND t.date < DATE '{anchor}'
"""


ORACLE_SQL = _oracle()
