"""SparkSession factory.

Local-mode builder used by tests and bench; in production the session is
provided by the cluster submit. AQE is always on (runtime shuffle-partition
coalescing + skew-join splitting matter at 100 TB; they are free locally).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "demo-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    hive_support: bool = False,
) -> SparkSession:
    """Build (or join) the local session.

    ``hive_support=True`` backs the catalog with a real Hive metastore
    (embedded Derby under the warehouse dir locally) — the reference's
    S7-S9 DDL surface (``STORED AS PARQUET LOCATION``, ``format("hive")``
    appends) then runs verbatim. Note: ``getOrCreate`` joins an existing
    session as-is, so the flag only takes effect on a fresh JVM/session.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core is the sweet spot at
        # test scale; on a real cluster this is sized to data volume and
        # AQE coalesces down from a higher initial value.
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Keep AQE from coalescing small shuffles below core count: inputs
        # here are tiny but operators amplify (explode/expand/join) — a
        # 2 MB shuffle input can fan out to 100M join rows, and with the
        # default 1 MB minPartitionSize those rows land on 1-2 tasks.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: driver == executor; size the heap for all cores'
        # concurrent task buffers or full GCs serialize the whole session
        # (observed: 8g/32 threads → queries degrade 14s → 474s)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # UI off by default (bench noise); tools/scaling_slope.py --measure
        # flips it on via env to read per-stage shuffle/spill bytes from
        # the REST API. retainedStages sized so a full measured sweep
        # never evicts a stage out of the cumulative counters.
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.ui.retainedStages", "20000")
        # stdout hygiene: console progress bars write to the driver's
        # stdout and can interleave with (and truncate) the single JSON
        # line bench.py's consumer parses
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_WAREHOUSE_DIR", "/tmp/demo_etl_spark_warehouse"))
    )
    if hive_support:
        warehouse = os.environ.get(
            "SPARK_WAREHOUSE_DIR", "/tmp/demo_etl_spark_warehouse"
        )
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={warehouse}/derby",
        ).enableHiveSupport()
    return builder.getOrCreate()
