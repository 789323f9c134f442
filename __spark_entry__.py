"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()[name](spark, sf_dir)`` must hash-match ``oracle_sql()[name]``
run by DuckDB on the same parquet tables (pre-registered views: region
nation customer supplier part orders lineitem events documents embeddings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from demo_etl_spark.operators import customer as _customer


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _customer.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "customer_analytics": _customer.build,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "customer_analytics": _customer.ORACLE_SQL,
    }
