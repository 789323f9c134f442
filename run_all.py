"""Workflow-driver CLI — the run-all.sh equivalent.

The reference orchestrates generate → job 1 → job 2 as separate
spark-shell processes with per-stage verification between them
(run-all.sh:51-164: script existence checks, HDFS output checks, external
table non-emptiness, lineage-log scraping). This driver keeps the same
stage boundaries and verifications in one SparkSession: stage isolation
in the reference is an operational artifact (fresh JVM per spark-shell),
not a semantic requirement — the only state shared between stages is
still materialized files + the catalog.

    python run_all.py [--work-dir DIR] [--anchor YYYY-MM-DD]
                      [--job-id ID] [--sf  customers,products,orders sizes]

Stages (each verified before the next starts, run-all.sh:64-88,129-139,
172-182):
  1. generate  — seeded reference-shaped CSVs (customers/products/orders)
  2. job1      — filter → star join → derived cols → detail+summary union
                 → sales_data_external parquet (+ _SUCCESS / count check)
  3. job2      — analytics branches → 23-col asset → external table DDL →
                 SQL write-back verify → lineage registry append → DOT
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _stage(n: int, msg: str) -> None:
    print(f"\n=== Stage {n}: {msg} ===", flush=True)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", default="/tmp/demo_etl_spark_run")
    ap.add_argument("--anchor", default="2002-01-01")
    ap.add_argument("--job-id", default=None,
                    help="deterministic job id (default: random UUID, like the reference)")
    ap.add_argument("--customers", type=int, default=200)
    ap.add_argument("--products", type=int, default=50)
    ap.add_argument("--orders", type=int, default=2000)
    ap.add_argument("--hive", action="store_true",
                    help="back the catalog with a Hive metastore "
                         "(STORED AS PARQUET / format('hive') DDL paths)")
    args = ap.parse_args(argv)

    from demo_etl_spark import io, schemas
    from demo_etl_spark.context import RunContext
    from demo_etl_spark.fixtures import FixtureConfig, generate_fixtures
    from demo_etl_spark.lineage import LineageTracker
    from demo_etl_spark.plans.reference_pipeline import job1_sales_data, job2_asset
    from demo_etl_spark.session import get_spark

    anchor = dt.date.fromisoformat(args.anchor)
    # WORKFLOW_ID=$(uuidgen) — run-all.sh:12; overridable for reproducibility
    job_id = args.job_id or str(uuid.uuid4())
    ctx = RunContext(job_id=job_id, anchor_date=anchor,
                     job_timestamp=dt.datetime.now())
    work = args.work_dir.rstrip("/")
    spark = get_spark(f"run-all-{job_id[:8]}", hive_support=args.hive)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = LineageTracker(ctx)
    print(f"workflow id: {job_id}\nwork dir:    {work}")

    # ---- Stage 1: generate test data (run-all.sh:51-88) ----------------
    _stage(1, "generate reference-shaped source CSVs")
    fx = generate_fixtures(
        spark,
        FixtureConfig(n_customers=args.customers, n_products=args.products,
                      n_orders=args.orders, anchor=anchor),
    )
    csv_paths = {}
    for name in ("customers", "products", "orders"):
        path = f"{work}/source/{name}"
        io.write_csv(fx[name], path, single_file=True)
        csv_paths[name] = path
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise RuntimeError(f"stage 1: missing _SUCCESS for {name}")
        print(f"  wrote {name}: {path}")

    # ---- Stage 2: job 1 (run-all.sh:113-139) ---------------------------
    _stage(2, "job 1 — sales_data_external")
    customers = io.read_csv(spark, csv_paths["customers"], schemas.REF_CUSTOMERS)
    products = io.read_csv(spark, csv_paths["products"], schemas.REF_PRODUCTS)
    orders = io.read_csv(spark, csv_paths["orders"], schemas.REF_ORDERS)
    sales = job1_sales_data(customers, products, orders, ctx, tracker)
    sales_path = f"{work}/sales_data_external"
    sales.write.mode("overwrite").parquet(sales_path)
    n_sales = io.verify_output(spark, sales_path)  # non-empty check, RA:129-139
    print(f"  sales_data_external: {n_sales} rows at {sales_path}")

    # ---- Stage 3: job 2 (run-all.sh:155-182) ---------------------------
    _stage(3, "job 2 — sales_analytics_asset + lineage registry")
    asset = job2_asset(spark, spark.read.parquet(sales_path), ctx, tracker)
    asset_path = f"{work}/sales_analytics_asset"
    asset.write.mode("overwrite").parquet(asset_path)
    io.drop_table(spark, "sales_analytics_asset")
    io.create_external_table(
        spark, "sales_analytics_asset", schemas.SALES_ANALYTICS_ASSET, asset_path
    )
    n_asset = io.verify_table_sql(spark, "sales_analytics_asset")
    print(f"  sales_analytics_asset: {n_asset} rows at {asset_path}")

    registry = tracker.to_registry_df(
        spark, source_path=sales_path, target_path=asset_path,
        record_count=n_asset,
        source_files=list(csv_paths.values()),
        description="sales analytics asset generation",
    )
    io.create_table_if_not_exists(
        spark, "data_lineage_registry", schemas.DATA_LINEAGE_REGISTRY
    )
    io.append_hive_table(registry, "data_lineage_registry")
    registry.write.mode("append").parquet(f"{work}/data_lineage_registry")
    dot_path = tracker.write_dot(f"{work}/lineage_graph_{job_id}.dot")

    # lineage summary — replaces run-all.sh's log scraping (RA:143,186)
    print(f"\nlineage events ({len(tracker.events)}):")
    for ev in tracker.events:
        print(f"  LINEAGE: {ev.description}: {', '.join(ev.inputs)} -> {ev.output}")
    print(f"\nDOT graph: {dot_path}")
    print(f"render: dot -Tpng -o lineage_graph.png {dot_path}")
    print(f"\nworkflow {job_id} complete: asset={n_asset} rows, "
          f"registry row appended")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
