"""Explicit schemas — the single source of truth (SURVEY.md §1.4).

The reference infers CSV schemas (`option("header","true")` only,
generate-test-data.scala:228); production paths here always pass an explicit
``StructType`` so type drift is impossible.

Two schema families:
  * STAR — the driver-provided TPC-H-ish star schema (/root/testdata).
  * REFERENCE — the reference's own sales schema (generate_test_data.sh:44,
    76,113) plus its derived tables (sales_data_external inferred per
    SURVEY §1.3; sales_analytics_asset DDL generate-asset.scala:296-320;
    data_lineage_registry generate-asset.scala:350).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# ---------------------------------------------------------------- STAR ----
REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))
NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)
CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)
SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)
PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)
ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)
LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)
EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)
DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)
EMBEDDINGS = _st(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

STAR_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ----------------------------------------------------------- REFERENCE ----
# Source tables (generate_test_data.sh:44-45,76-77,113-114).
REF_CUSTOMERS = _st(
    ("customer_id", IntegerType()),
    ("name", StringType()),
    ("email", StringType()),
    ("signup_date", DateType()),
    ("status", StringType()),
)
REF_PRODUCTS = _st(
    ("product_id", IntegerType()),
    ("name", StringType()),
    ("category", StringType()),
    ("price", DoubleType()),
    ("in_stock", BooleanType()),
)
REF_ORDERS = _st(
    ("order_id", IntegerType()),
    ("customer_id", IntegerType()),
    ("product_id", IntegerType()),
    ("quantity", IntegerType()),
    ("order_date", TimestampType()),
    ("total_amount", DoubleType()),
)

# Job-1 output / job-2 input (inferred 16-column wide union, SURVEY §1.3).
SALES_DATA_EXTERNAL = _st(
    ("customer_id", IntegerType()),
    ("customer_name", StringType()),
    ("order_id", IntegerType()),
    ("product_id", IntegerType()),
    ("product_name", StringType()),
    ("category", StringType()),
    ("quantity", IntegerType()),
    ("price", DoubleType()),
    ("extended_price", DoubleType()),
    ("discount_amount", DoubleType()),
    ("final_price", DoubleType()),
    ("order_date", TimestampType()),
    ("is_weekend", BooleanType()),
    ("day_of_week", StringType()),  # Java enum casing: MONDAY..SUNDAY
    ("month", StringType()),        # Java enum casing: JANUARY..DECEMBER
    ("year", IntegerType()),
)

# Final asset table — 23 columns, DDL at generate-asset.scala:296-320.
SALES_ANALYTICS_ASSET = _st(
    ("asset_type", StringType()),
    ("asset_id", StringType()),
    ("asset_name", StringType()),
    ("asset_created_date", DateType()),
    ("asset_job_id", StringType()),
    ("customer_id", LongType()),
    ("total_orders", LongType()),
    ("total_spent", DoubleType()),
    ("customer_value_score", DoubleType()),
    ("first_purchase_date", DateType()),
    ("last_purchase_date", DateType()),
    ("days_since_last_purchase", IntegerType()),
    ("category", StringType()),
    ("revenue_rank_in_category", IntegerType()),
    ("date", DateType()),
    ("day_of_week", StringType()),
    ("month_num", IntegerType()),
    ("month_name", StringType()),
    ("year", IntegerType()),
    ("total_revenue", DoubleType()),
    ("is_revenue_trending_up", BooleanType()),
    ("asset_lineage_source", StringType()),
    ("asset_lineage_job", StringType()),
)

# Lineage registry — generate-asset.scala:350; README.md:118-128.
DATA_LINEAGE_REGISTRY = _st(
    ("job_id", StringType()),
    ("job_timestamp", TimestampType()),
    ("source_path", StringType()),
    ("target_path", StringType()),
    ("transformation_count", IntegerType()),
    ("record_count", LongType()),
    ("source_files", StringType()),
    ("description", StringType()),
)
