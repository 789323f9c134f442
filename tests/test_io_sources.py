"""Source/sink coverage (SURVEY.md §2.1 S2, S4-S9, S11)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from demo_etl_spark import io, schemas


def test_csv_round_trip_with_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "Alice A", "a@x.com", None, "active")], schemas.REF_CUSTOMERS
    )
    path = str(tmp_path / "customers_csv")
    io.write_csv(df, path, single_file=True)
    back = io.read_csv(spark, path, schemas.REF_CUSTOMERS)
    assert back.schema == schemas.REF_CUSTOMERS
    assert back.count() == 1
    assert back.first()["name"] == "Alice A"


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    path = str(tmp_path / "part_parquet")
    io.write_parquet(df, path, partition_by=["bucket"])
    assert os.path.exists(os.path.join(path, "_SUCCESS"))  # S11
    back = spark.read.parquet(path).filter(F.col("bucket") == 2)
    # partition pruning: the physical plan carries a partition filter
    plan = back._jdf.queryExecution().executedPlan().treeString()
    assert "PartitionFilters: [isnotnull(bucket" in plan
    assert back.count() == 25
    assert io.verify_output(spark, path, min_rows=100) == 100


def test_table_ddl_and_append(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "n")
    io.drop_table(spark, "t_demo")
    io.save_table(df, "t_demo")  # S7-ish via saveAsTable
    io.append_table(df, "t_demo")  # S9
    assert spark.table("t_demo").count() == 10
    # S10: SQL scan with LIMIT (O2)
    assert len(spark.sql("SELECT * FROM t_demo LIMIT 3").collect()) == 3
    io.drop_table(spark, "t_demo")  # S6


def test_verify_output_raises_on_low_count(spark, tmp_path):
    path = str(tmp_path / "small")
    io.write_parquet(spark.range(2), path)
    with pytest.raises(RuntimeError, match="rows"):
        io.verify_output(spark, path, min_rows=10)
