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


def test_csv_infer_schema_opt_in(spark, tmp_path):
    """S2 fidelity: the reference reads its CSVs with header-plus-
    inference (generate-test-data.scala:228); the opt-in path must
    infer the SURVEY §1.1 types — ints as int, dates as date,
    timestamps as timestamp — and the explicit-schema contract must
    stay mutually exclusive with it."""
    import pytest

    path = str(tmp_path / "infer_csv")
    spark.createDataFrame(
        [("1", "Alice", "2024-03-01", "2024-03-02 10:30:00", "12.5")],
        "customer_id string, name string, signup_date string, "
        "order_ts string, total string",
    ).write.mode("overwrite").option("header", True).csv(path)
    inferred = io.read_csv(spark, path, infer_schema=True)
    types = dict(inferred.dtypes)
    assert types["customer_id"] == "int"
    assert types["signup_date"] == "date"
    assert types["order_ts"] == "timestamp"
    assert types["total"] == "double"
    assert inferred.count() == 1
    with pytest.raises(ValueError):
        io.read_csv(spark, path)
    with pytest.raises(ValueError):
        io.read_csv(spark, path, schemas.REF_CUSTOMERS, infer_schema=True)


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


def test_external_table_ddl_location(spark, tmp_path):
    """S7: CREATE ... LOCATION over already-written parquet; DROP must not
    delete the files (unmanaged-table semantics, generate-asset.scala:294-324)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    path = str(tmp_path / "ext_loc")
    io.write_parquet(df, path)
    io.drop_table(spark, "t_ext_demo")
    io.create_external_table(spark, "t_ext_demo", schema, path)
    assert spark.table("t_ext_demo").count() == 2
    # append through the table provider lands files in the LOCATION dir
    io.append_hive_table(df, "t_ext_demo")
    assert io.verify_table_sql(spark, "t_ext_demo", min_rows=4) == 4
    io.drop_table(spark, "t_ext_demo")
    assert spark.read.parquet(path).count() == 4  # data survived the DROP


def test_registry_create_if_not_exists_and_append(spark):
    """S8+S9: create-if-not-exists is idempotent; appends accumulate
    (generate-asset.scala:350,367-370)."""
    io.drop_table(spark, "t_registry_demo")
    io.create_table_if_not_exists(spark, "t_registry_demo", schemas.DATA_LINEAGE_REGISTRY)
    io.create_table_if_not_exists(spark, "t_registry_demo", schemas.DATA_LINEAGE_REGISTRY)
    # location-pinned: rows accumulate across create/drop cycles BY DESIGN
    # (the registry's append-across-runs semantics) — assert the delta
    before = spark.table("t_registry_demo").count()
    row = spark.createDataFrame(
        [("j1", None, "s", "t", 3, 10, "f", "d")], schemas.DATA_LINEAGE_REGISTRY
    )
    io.append_hive_table(row, "t_registry_demo")
    io.append_hive_table(row, "t_registry_demo")
    assert spark.table("t_registry_demo").count() == before + 2
    io.drop_table(spark, "t_registry_demo")


def test_bucketed_join_eliminates_shuffle(spark, tables):
    """Both fact sides bucketed+sorted by the join key: the sort-merge
    join plan must contain NO shuffle exchange (bucket co-location)."""
    io.drop_table(spark, "b_lineitem")
    io.drop_table(spark, "b_orders")
    io.write_bucketed_table(
        tables["lineitem"].select("l_orderkey", "l_quantity"),
        "b_lineitem", ["l_orderkey"], 4,
    )
    io.write_bucketed_table(
        tables["orders"].select("o_orderkey", "o_custkey"),
        "b_orders", ["o_orderkey"], 4,
    )
    li, od = spark.table("b_lineitem"), spark.table("b_orders")
    j = li.hint("merge").join(od, li["l_orderkey"] == od["o_orderkey"])
    plan = j._jdf.queryExecution().sparkPlan().treeString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaced the shuffle
    # un-bucketed control: same join DOES shuffle
    li0 = tables["lineitem"].select("l_orderkey", "l_quantity")
    od0 = tables["orders"].select("o_orderkey", "o_custkey")
    j0 = li0.hint("merge").join(od0, li0["l_orderkey"] == od0["o_orderkey"])
    assert "Exchange" in j0._jdf.queryExecution().sparkPlan().treeString()
    assert j.count() == j0.count()
    io.drop_table(spark, "b_lineitem")
    io.drop_table(spark, "b_orders")


def test_hive_metastore_end_to_end(tmp_path):
    """The hive_support=True branch (real metastore, STORED AS PARQUET,
    format('hive') append) — run in a subprocess because getOrCreate
    would otherwise join the non-Hive test session."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from demo_etl_spark.session import get_spark
        from demo_etl_spark import io, schemas
        spark = get_spark("hive-e2e", cpus=2, hive_support=True)
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        df = spark.createDataFrame(
            [("j1", None, "s", "t", 3, 10, "f", "d")], schemas.DATA_LINEAGE_REGISTRY
        )
        io.drop_table(spark, "t_hive_e2e")
        io.create_table_if_not_exists(spark, "t_hive_e2e", schemas.DATA_LINEAGE_REGISTRY)
        io.append_hive_table(df, "t_hive_e2e")
        assert spark.table("t_hive_e2e").count() == 1
        io.drop_table(spark, "t_hive_e2e")
        spark.stop()
        print("HIVE_E2E_OK")
        """
    )
    env = dict(os.environ, SPARK_WAREHOUSE_DIR=str(tmp_path / "wh"))
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert "HIVE_E2E_OK" in out.stdout, out.stderr[-2000:]


def test_observed_write_counts_without_reread(spark, tmp_path):
    from pyspark.sql import functions as F

    from demo_etl_spark import io

    df = spark.range(1234).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    path = str(tmp_path / "obs")
    got = io.observed_write_parquet(df, path, null_check_cols=["v"])
    # metrics came from the write pass itself...
    assert got["rows"] == 1234
    assert got["null_v"] == 124  # ids 0,10,...,1230
    # ...and agree with what actually landed on disk
    back = spark.read.parquet(path)
    assert back.count() == 1234
    assert back.filter(F.col("v").isNull()).count() == 124


def test_registered_bucketed_join_plan_has_no_exchange(spark, sf_dir):
    """The REGISTERED bucketed_order_join variant (operators.bucketed)
    must execute its fact join over the bucket layout with no shuffle."""
    from demo_etl_spark.operators import bucketed

    li_t, od_t = bucketed.ensure_bucketed_tables(spark, sf_dir)
    j = bucketed.bucketed_join(spark.table(li_t), spark.table(od_t))
    plan = j._jdf.queryExecution().sparkPlan().treeString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # and the full registered query (join + small agg) exchanges at most
    # once — for the groupBy, never for the fact join
    full = bucketed.build_bucketed_join(spark, sf_dir)
    full_plan = full._jdf.queryExecution().sparkPlan().treeString()
    assert "SortMergeJoin" in full_plan
    assert full_plan.count("Exchange") <= 1


def test_orc_roundtrip_with_pushdown(spark, tables, tmp_path):
    """ORC sink/source round-trip preserves values, and filters reach the
    ORC scan (same pushdown contract as parquet)."""
    path = str(tmp_path / "orders_orc")
    src = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    io.write_orc(src, path)
    back = io.read_orc(spark, path)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    plan = (
        back.filter(F.col("o_orderkey") == 7)
        ._jdf.queryExecution().executedPlan().treeString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)" in plan
