"""Bucketed-layout join path (the 100 TB co-location lever, executed).

``io.write_bucketed_table`` is the layout primitive; this module registers
a query that actually RUNS over the bucketed layout: lineitem ⋈ orders on
orderkey as a bucket-co-located sort-merge join — the per-query shuffle of
BOTH fact sides disappears (plan-pinned by
tests/test_io_sources.py::test_bucketed_join_eliminates_shuffle and
test_plans.py's registered-variant check). The post-join priority agg
still exchanges its own small grouped rows; the lever removes the
dominant fact-×-fact shuffle, which at 100 TB is the job.

Bucketing is a physical layout change only, so the DuckDB oracle runs the
identical join/agg over the raw parquet and hash-matches.

Reference parity: the reference writes its joined asset flat
(generate-asset.scala:327-330) and re-shuffles per run; this is the
Spark-native amortization of that cost across every downstream join.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div, round_div_expr
from demo_etl_spark.io import load_star, write_bucketed_table

N_BUCKETS = 8  # test-scale; size to ~(fact bytes / 1 GB) at the target SF

_REV_FX = "TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"


def _tag(sf_dir: str) -> str:
    return hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """The in-memory catalog forgets tables between processes while the
    warehouse directory survives; a fresh session then hits
    LOCATION_ALREADY_EXISTS on the managed-table create. The location is
    ours by construction (tag-derived name under the warehouse), so an
    orphaned one is safe to remove."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    loc = os.path.join(warehouse, table)
    if warehouse and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Idempotently materialize the bucketed+sorted fact copies for this
    dataset (session-catalog tables under the warehouse dir, tagged by
    source path). One write per session amortizes across every bucketed
    query — exactly the production pattern, where the bucketed table IS
    the stored fact table, written once at ingest."""
    tag = _tag(sf_dir)
    li_t, od_t = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    t = load_star(spark, sf_dir)
    if not spark.catalog.tableExists(li_t):
        _clear_stale_location(spark, li_t)
        write_bucketed_table(
            t["lineitem"].select(
                "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
            ),
            li_t,
            ["l_orderkey"],
            N_BUCKETS,
        )
    if not spark.catalog.tableExists(od_t):
        _clear_stale_location(spark, od_t)
        write_bucketed_table(
            t["orders"].select("o_orderkey", "o_orderpriority"),
            od_t,
            ["o_orderkey"],
            N_BUCKETS,
        )
    return li_t, od_t


def bucketed_join(li: DataFrame, od: DataFrame) -> DataFrame:
    """The co-located SMJ itself, exposed for the plan test: merge-hinted
    equi-join on the bucket key — over bucketed inputs its physical plan
    must contain no Exchange."""
    return li.hint("merge").join(od, li["l_orderkey"] == od["o_orderkey"])


def build_bucketed_join(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    li_t, od_t = ensure_bucketed_tables(spark, sf_dir)
    j = bucketed_join(spark.table(li_t), spark.table(od_t))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.expr(_REV_FX)).alias("_rev_fx"),
            F.sum(F.col("l_quantity").cast("double")).alias("total_qty"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            round_div("_rev_fx", "10000", 2).alias("revenue"),
            "total_qty",
        )
    )


def _oracle() -> str:
    sum_fx = f"CAST(SUM({_REV_FX}) AS BIGINT)"
    return f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       {round_div_expr(sum_fx, "10000", 2, "duckdb")} AS revenue,
       SUM(CAST(l_quantity AS DOUBLE)) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


ORACLE_SQL_BUCKETED_JOIN = _oracle()
