"""Dataset maintenance for plain-parquet warehouses (100 TB operations).

Vanilla parquet has no transaction log, so the engine ships the three
maintenance primitives a production lake needs, each as a deterministic
read→transform→rewrite (the idiom the reference's job-handoff pattern
already uses — write to a new location, verify, then swap):

* ``merge_upsert`` — MERGE semantics (update matching keys, insert new
  ones) via a left-anti union: target rows whose key appears in the
  updates are replaced, everything else is kept. One shuffle on the key.
* ``compact_parquet`` — the small-files problem: rewrite a directory to
  ~``target_mb``-sized files (coalesce — no shuffle — when shrinking the
  file count; repartition when growing it).
* ``clustered_write`` — range-partition + sort by the cluster columns so
  parquet row-group min/max stats become selective and scans can skip
  (the poor-man's Z-order; single-column clustering is optimal, and
  multi-column gets lexicographic locality).

None of these are in the reference (it has no maintenance story); all
are required for "a user could run their warehouse on this" parity.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    out_path: str | None = None,
) -> DataFrame:
    """MERGE updates into the parquet dataset at ``target_path``.

    Row with matching ``key`` → replaced by the update row; new key →
    inserted; untouched keys → kept. Writes to ``out_path`` (default:
    rewrite target in place via an overwrite) and returns the merged
    frame re-read from disk.
    """
    target = spark.read.parquet(target_path)
    kept = target.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates)
    dest = out_path or target_path
    # resolve aliases (trailing slash, relative form, symlink): writing
    # over the input with an uncheckpointed plan deletes files the plan
    # still reads
    same_target = os.path.realpath(dest) == os.path.realpath(target_path)
    if same_target:
        # sever the plan from the files first (localCheckpoint
        # materializes on executors — nothing is collected to the driver)
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)


def dataset_bytes(path: str) -> int:
    # un-memoized on purpose: compaction re-measures after rewriting
    from demo_etl_spark.io import walk_bytes

    return walk_bytes(path, suffix=".parquet")


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 256
) -> int:
    """Rewrite ``path`` to ~target_mb files; returns the new file count.

    At 100 TB this runs per-partition-directory (compact only partitions
    whose file count is pathological) — here the whole dataset is one
    unit for simplicity.
    """
    n_files = max(1, math.ceil(dataset_bytes(path) / (target_mb << 20)))
    df = spark.read.parquet(path)
    current = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files < current else df.repartition(n_files)
    out = out.localCheckpoint(eager=True)  # sever lineage from the input files
    out.write.mode("overwrite").parquet(path)
    return n_files


def clustered_write(
    df: DataFrame, path: str, cluster_by: list[str], n_files: int | None = None
) -> None:
    """Write ``df`` range-partitioned and sorted by ``cluster_by`` so each
    file covers a narrow key range (selective row-group stats → scan
    skipping on those columns)."""
    cols = [F.col(c) for c in cluster_by]
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)
