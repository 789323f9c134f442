"""Physical-plan regression tests (the 100 TB design contract).

Correctness is the oracle harness's job; these tests pin the *plan-level*
facts that make the operators survive scale — pushdown reaching the
parquet scan, column pruning, dimension broadcast, partial aggregation,
whole-stage codegen. A refactor that silently de-optimizes a plan fails
here even though results stay correct. Scans are read with cache=False:
the shared scan cache replaces FileScans with InMemoryTableScans, which
would hide the scan-level facts being asserted.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from demo_etl_spark.io import clear_scan_cache, read_star_table

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(autouse=True, scope="module")
def _cold_scans():
    # cache=False alone is not enough: Spark's CacheManager substitutes a
    # persisted plan for ANY matching logical scan, so a suite-warmed scan
    # cache turns these FileScans into InMemoryTableScans and hides the
    # pushdown/pruning facts. Drop every tracked persist first; later
    # tests re-warm lazily.
    clear_scan_cache()
    yield


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().treeString()


def _spark_plan(df) -> str:  # pre-AQE physical plan (Exchange visible)
    return df._jdf.queryExecution().sparkPlan().treeString()


def test_filter_pushdown_and_column_pruning(spark):
    li = read_star_table(spark, SF, "lineitem", cache=False)
    q = li.filter(F.col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10" in plan
    # ReadSchema pruned to exactly the consumed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_dimension_join_broadcasts(spark):
    from demo_etl_spark.operators.timeseries import date_dim_join

    li = read_star_table(spark, SF, "lineitem", cache=False)
    od = read_star_table(spark, SF, "orders", cache=False)
    plan = _plan(date_dim_join(spark, li, od))
    assert "BroadcastHashJoin" in plan  # 2556-row dim never shuffles the fact


def test_aggregation_is_partial_plus_final(spark):
    li = read_star_table(spark, SF, "lineitem", cache=False)
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _spark_plan(q)
    # map-side partial agg before the shuffle, final after
    assert plan.count("HashAggregate") == 2
    assert "partial_sum" in plan


def test_text_stats_all_jvm_single_pass(spark):
    from demo_etl_spark.operators.text import text_stats

    docs = read_star_table(spark, SF, "documents", cache=False)
    plan = _spark_plan(text_stats(docs))
    # JVM expression evaluation only (higher-order functions are
    # interpreted JVM exprs — still zero Python workers in the hot path)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # map-only: no shuffle beyond the scan-parallelism repartition
    assert plan.count("Exchange") <= 1
    assert "FileScan parquet" in plan


def test_asof_join_single_key_shuffle_no_nested_loop(spark):
    from demo_etl_spark.operators.temporal import asof_last_purchase

    ev = read_star_table(spark, SF, "events", cache=False)
    plan = _spark_plan(asof_last_purchase(ev))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan
    # the merge is one window over user_id — not a join at all
    assert "SortMergeJoin" not in plan


def test_dynamic_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Date-partitioned fact + filtered dim join: the fact scan must carry
    a dynamic pruning subquery (only matching partitions are read)."""
    from demo_etl_spark import io

    fact = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("part_year")
    )
    path = str(tmp_path / "fact_part")
    io.write_parquet(fact, path, partition_by=["part_year"])
    dim = spark.range(5).select(
        F.col("id").alias("part_year"), F.lit("x").alias("tag")
    ).filter(F.col("part_year") == 3)
    back = spark.read.parquet(path)
    j = back.join(dim, "part_year")
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower()
    assert j.count() == 200


def test_salted_join_equals_plain_join(spark):
    """Salting changes routing only — results must equal the plain join,
    including a pathologically hot key."""
    from demo_etl_spark.operators.skew import salted_join

    big = spark.range(10_000).select(
        # 90% of rows share key 0 — the AQE-resistant hot-key shape
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    salted = salted_join(big, small, "k", n_salts=8)
    plain = big.join(small, "k")
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b
    # the join really runs on (k, _salt)
    plan = _spark_plan(salted_join(big, small, "k", n_salts=8))
    assert "_salt" in plan


def test_exists_subquery_plans_as_semi_join(spark):
    from demo_etl_spark.operators.sql_interface import build_late_priority

    plan = _spark_plan(build_late_priority(spark, SF))
    assert "LeftSemi" in plan  # correlated EXISTS → semi join, not a filter


def _register_uncached(spark, *tables):
    # the shared scan cache would swap FileScan → InMemoryTableScan and
    # hide the pushdown facts being asserted — and Spark's CacheManager
    # substitutes ANY matching plan, so a cache=False re-read is not
    # enough once another test has persisted the table: drop the cache
    from demo_etl_spark.io import clear_scan_cache

    clear_scan_cache()
    for t in tables:
        read_star_table(spark, SF, t, cache=False).createOrReplaceTempView(t)


def test_discount_revenue_pushdown_and_pruning(spark):
    from demo_etl_spark.operators.sql_interface import _discount_revenue_sql

    _register_uncached(spark, "lineitem")
    plan = _plan(spark.sql(_discount_revenue_sql("spark")))
    # every predicate reaches the parquet scan
    assert "PushedFilters:" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters:")[1].split("]")[0], col
    # scan reads only the 4 consumed columns of 11
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in schema and "l_extendedprice" in schema


def test_promo_revenue_broadcasts_part(spark):
    from demo_etl_spark.operators.sql_interface import _promo_revenue_sql

    _register_uncached(spark, "lineitem", "part")
    plan = _plan(spark.sql(_promo_revenue_sql("spark")))
    # part is dimension-sized: the fact side must never shuffle
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_returned_items_no_nested_loop(spark):
    from demo_etl_spark.operators.sql_interface import _returned_items_sql

    _register_uncached(spark, "customer", "orders", "lineitem", "nation")
    plan = _spark_plan(spark.sql(_returned_items_sql("spark")))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # top-20 runs as TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_vocab_topk_avoids_global_sort(spark):
    from demo_etl_spark.operators.text import vocab_topk

    docs = read_star_table(spark, SF, "documents", cache=False)
    plan = _spark_plan(vocab_topk(docs))
    # top-k = per-partition heaps + driver merge of k rows, never a
    # full sort of the vocabulary
    assert "TakeOrderedAndProject" in plan


def test_contamination_screen_broadcasts_eval_side(spark):
    from demo_etl_spark.operators.dedup import contamination_screen

    docs = read_star_table(spark, SF, "documents", cache=False)
    plan = _spark_plan(contamination_screen(docs))
    # the tiny eval shingle set broadcasts; the train side never shuffles
    # for the join
    assert "BroadcastHashJoin" in plan


def test_range_join_is_equi_join(spark):
    from demo_etl_spark.operators.temporal import purchase_followups

    ev = read_star_table(spark, SF, "events", cache=False)
    plan = _spark_plan(purchase_followups(ev))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # bucket equality keys make it a hash-joinable equi join
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_waiting_suppliers_semi_and_anti_are_equi_joins(spark):
    from demo_etl_spark.operators.sql_suite import _waiting_suppliers_sql

    _register_uncached(spark, "supplier", "lineitem", "orders")
    plan = _spark_plan(spark.sql(_waiting_suppliers_sql("spark")))
    # EXISTS → semi, NOT EXISTS → anti, both keyed on l_orderkey so
    # neither degenerates into a nested-loop over the fact
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_idle_customers_anti_join_and_scalar_subquery(spark):
    from demo_etl_spark.operators.sql_suite import _idle_customers_sql

    _register_uncached(spark, "customer", "orders")
    plan = _spark_plan(spark.sql(_idle_customers_sql("spark")))
    assert "LeftAnti" in plan  # NOT EXISTS → anti join
    assert "scalar-subquery" in plan  # avg threshold stays a one-row scalar


def test_last_shipment_correlated_max_rewrites_to_aggregate_join(spark):
    from demo_etl_spark.operators.sql_suite import _last_shipment_sql

    _register_uncached(spark, "lineitem")
    plan = _spark_plan(spark.sql(_last_shipment_sql("spark")))
    # Catalyst de-correlates: per-key MAX aggregate + equi join, never a
    # per-row re-scan of lineitem
    assert "max(" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_disjunctive_predicate_stays_single_scan(spark):
    from demo_etl_spark.operators.sql_suite import _disjunctive_revenue_sql

    _register_uncached(spark, "lineitem", "part")
    plan = _plan(spark.sql(_disjunctive_revenue_sql("spark")))
    # the OR-of-conjuncts must not expand into a union of scans, and the
    # common join key still hash/broadcast-joins
    assert plan.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_regional_supplier_volume_broadcasts_dims(spark):
    from demo_etl_spark.operators.sql_suite import _regional_supplier_volume_sql

    _register_uncached(
        spark, "customer", "orders", "lineitem", "supplier", "nation", "region")
    plan = _plan(spark.sql(_regional_supplier_volume_sql("spark")))
    # nation+region (and supplier at this SF) broadcast; the r_name
    # filter is pushed into the region scan, not evaluated post-join
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan  # inside the region scan's PushedFilters


def test_not_in_subquery_plans_null_aware_anti_join(spark):
    from demo_etl_spark.operators.sql_suite import _part_supplier_variety_sql

    _register_uncached(spark, "lineitem", "part", "supplier")
    plan = _spark_plan(spark.sql(_part_supplier_variety_sql("spark")))
    # NOT IN (subquery) is the null-aware anti-join family, not a filter
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_join_pruning(spark):
    """Selective build side ⇒ Catalyst injects a runtime Bloom filter on
    the probe side (rows that can't match die before the shuffle — the
    100 TB lever for selective fact-fact joins)."""
    restore = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(100_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("p"))
        small = spark.range(10_000).select(
            F.col("id").alias("k")).filter("k % 100 = 7")
        j = big.join(small, "k")
        plan = _spark_plan(j)
        assert "bloom" in plan.lower()
        assert j.count() == 100  # filter prunes, never drops matches
    finally:
        for k, v in restore.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime complement of the plan-level salted join (operators.skew):
    on a hot-key join, AQE's OptimizeSkewedJoin must split the skewed
    shuffle partition at runtime — final adaptive plan shows
    SortMergeJoin(skew=true) over an 'AQEShuffleRead … skewed' reader.
    Thresholds are lowered so the synthetic 1M-row hot key qualifies;
    forceOptimizeSkewedJoin permits the extra shuffle the downstream
    stage would otherwise veto. This is the default 100 TB answer to
    moderate skew — salting remains for the AQE-resistant cases (hot
    key inside one partition of a broadcast-ineligible join)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100k",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(1_000_000).select(
            (F.col("id") * 0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(9_900).select(
                (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.lit("x").alias("p")
        )
        j = left.join(right, "k")
        j.foreach(lambda r: None)  # execute THIS DataFrame's QueryExecution
        plan = j._jdf.queryExecution().executedPlan().treeString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan
    assert "skewed" in plan  # the AQEShuffleRead split reader
