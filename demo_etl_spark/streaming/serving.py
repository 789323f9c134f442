"""Streaming → serving-table maintenance (foreachBatch CDC compaction).

The missing piece between the streaming shapes (event_streams) and the
lake maintenance ops (maintenance.py): a continuously-maintained
CURRENT-STATE serving table. Each micro-batch is compacted to its
latest-per-key slice and merged into a parquet target with the same
latest-wins discipline as operators.cdc — the standard foreachBatch
upsert pattern (the sink side Structured Streaming does not provide for
plain parquet).

Correctness under at-least-once delivery: the merge key order is
(last_ts, last_event_id), so redelivered or reordered events can only
re-assert the same winner — the table converges to the batch
``latest_state`` answer regardless of batch boundaries (parity-tested
with forced multi-batch redelivery). ``n_versions_seen`` counts every
DELIVERED version (2× delivery ⇒ 2× count) — it is a delivery audit,
not a distinct-version count.

Scale: each micro-batch shuffles once on the key (WindowGroupLimit
top-1), and the merge joins batch-latest (small) against the serving
table on the same key — at 100 TB the serving table would live in a
keyed layout (bucketed/Iceberg) so the merge stays co-located; here it
is a plain parquet rewrite with the checkpoint-sever discipline of
maintenance.merge_upsert.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.streaming.event_streams import (
    ephemeral_checkpoint_dir,
    read_events_stream,
)


def _compact_batch(batch: DataFrame) -> DataFrame:
    """Latest-per-user slice of one micro-batch, carrying the tiebreak
    id and the delivered-version count."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_versions_seen", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("n_versions_seen").cast("long").alias("n_versions_seen"),
        )
    )


def _merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two latest-state slices: per user, the (last_ts,
    last_event_id)-max row wins; delivered counts add."""
    key = F.struct("last_ts", "last_event_id")
    return (
        a.unionByName(b)
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(
                    "last_ts", "last_event_id", "last_event_type", "last_value"
                ),
                key,
            ).alias("_w"),
            F.sum("n_versions_seen").alias("n_versions_seen"),
        )
        .select(
            "user_id",
            F.col("_w.last_ts").alias("last_ts"),
            F.col("_w.last_event_id").alias("last_event_id"),
            F.col("_w.last_event_type").alias("last_event_type"),
            F.col("_w.last_value").alias("last_value"),
            "n_versions_seen",
        )
    )


def stream_compact_to_serving(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    copies: int = 1,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 180,
) -> DataFrame:
    """Drain the events stream with availableNow, maintaining the
    latest-state serving table at ``target_path`` one micro-batch at a
    time; returns the final table. ``max_files_per_trigger`` forces
    multi-batch drains (tests); ``copies`` stages redelivery."""
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger is not None
        else None
    )
    ev = read_events_stream(spark, sf_dir, copies=copies, source_options=opts)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        latest = _compact_batch(batch)
        if os.path.isdir(target_path):
            base = spark.read.parquet(target_path)
            merged = _merge_states(base, latest).localCheckpoint(eager=True)
        else:
            merged = latest
        merged.write.mode("overwrite").parquet(target_path)

    # Same ephemeral-checkpoint discipline as run_available_now: the
    # drain's offset/commit logs are throwaway (the serving TABLE at
    # target_path is the durable artifact), so they go on the RAM-backed
    # dir instead of charging fsyncs to disk.
    ckpt = ephemeral_checkpoint_dir()
    try:
        q = (
            ev.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(target_path)
