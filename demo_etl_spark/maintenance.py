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

    Contract (r12 review): ``updates`` must carry at most one row per
    key and non-NULL keys — duplicate update keys all insert (standard
    MERGE engines raise instead), and a NULL update key can never match
    a target row (SQL equality), so it always lands as an insert.
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


def scd2_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    effective_date: str,
    out_path: str | None = None,
    end_of_time: str = "9999-12-31",
) -> DataFrame:
    """Type-2 slowly-changing-dimension MERGE over a plain-parquet dim.

    History-preserving upsert: instead of replacing a matched row
    (``merge_upsert``), the current version is CLOSED (``valid_to`` set
    to the update's effective date, ``is_current`` false) and the update
    is appended as the new open version (``valid_to`` = end-of-time).
    Unmatched keys insert as open versions; closed history rows pass
    through untouched. First-time targets (no SCD columns yet) are
    bootstrapped as all-current.

    Implementation is two branches of ONE shuffle on the key — a
    broadcast-able updates side joins the current slice; history unions
    back untouched — then the same checkpoint-before-overwrite discipline
    as merge_upsert. ``updates`` must carry ``key``, ``effective_date``
    and the payload columns of the target — and, like ``merge_upsert``,
    at most one row per key per call (two same-key updates would close
    the current version twice at different dates; apply multi-version
    feeds in effective-date order, one call per batch).
    """
    target = spark.read.parquet(target_path)
    if "valid_from" not in target.columns:
        target = (
            target.withColumn("valid_from", F.to_date(F.lit("1900-01-01")))
            .withColumn("valid_to", F.to_date(F.lit(end_of_time)))
            .withColumn("is_current", F.lit(True))
        )
    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current"))

    upd_keys = updates.select(key, F.col(effective_date).alias("_new_from"))
    # current rows whose key is updated → close them at the new version's
    # effective date
    closed = (
        current.join(upd_keys, key, "inner")
        .withColumn("valid_to", F.to_date(F.col("_new_from")))
        .withColumn("is_current", F.lit(False))
        .drop("_new_from")
    )
    untouched = current.join(upd_keys.select(key), key, "left_anti")
    fresh = (
        updates.withColumn("valid_from", F.to_date(F.col(effective_date)))
        .withColumn("valid_to", F.to_date(F.lit(end_of_time)))
        .withColumn("is_current", F.lit(True))
        .drop(effective_date)
    )
    merged = history.unionByName(untouched).unionByName(closed).unionByName(
        fresh, allowMissingColumns=False
    )
    dest = out_path or target_path
    if os.path.realpath(dest) == os.path.realpath(target_path):
        merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)


def zorder_value(cols: list[str], bits: int = 16) -> F.Column:
    """Morton (Z-order) key: bit-interleave ``bits`` top bits of each
    normalized column expression. Callers pass expressions already
    scaled to [0, 2^bits) — see ``zorder_write`` for the min-max
    normalization pass. Pure integer expression (shift/or), codegen'd;
    no UDF."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            # bit b of column i lands at interleaved position b*n + i
            terms.append(
                f"(shiftleft((shiftright(CAST({c} AS BIGINT), {b}) & 1), {b * n + i}))"
            )
    return F.expr(" | ".join(terms))


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    bits: int = 16,
) -> None:
    """Write ``df`` Z-ORDERED on ``cluster_by`` — the multi-column
    upgrade of ``clustered_write``: a lexicographic range+sort makes
    per-file ranges narrow on the FIRST column only, while the Morton
    curve keeps every clustered column's per-file min/max narrow, so
    parquet row-group stats prune scans filtered on ANY of them (the
    public Delta/Iceberg OPTIMIZE ZORDER technique, expressed as plain
    Spark: two passes — one tiny agg for min/max, then
    repartitionByRange + sort on the interleaved key).

    Normalization is min-max to [0, 2^bits); timestamps/dates should be
    pre-cast to their epoch integers by the caller."""
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cluster_by],
        *[F.max(c).alias(f"_max_{c}") for c in cluster_by],
    ).first()
    norm = []
    top = (1 << bits) - 1
    for c in cluster_by:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        if lo is None or hi is None:
            # empty input or an all-NULL cluster column: there is no
            # range to normalize — surface a clear contract error
            # instead of int(None)'s TypeError (r12 review)
            raise ValueError(
                f"zorder_write: cluster column {c!r} has no non-NULL "
                "values (empty input?) — nothing to Z-order on"
            )
        span = max(int(hi) - int(lo), 1)
        norm.append(
            f"CAST(((CAST({c} AS BIGINT) - {int(lo)}) * {top}) DIV {span} AS BIGINT)"
        )
    keyed = df.withColumn("_z", zorder_value(norm, bits))
    out = (
        keyed.repartitionByRange(n_files, "_z")
        if n_files
        else keyed.repartitionByRange("_z")
    )
    out.sortWithinPartitions("_z").drop("_z").write.mode("overwrite").parquet(path)


def evolve_append(df: DataFrame, path: str) -> None:
    """Append a batch whose schema may have EVOLVED (new columns added)
    onto an existing parquet dataset. Plain parquet allows per-file
    schemas; appending wider files is safe as long as readers merge
    footers (``read_evolved``). Removing or retyping columns is NOT
    supported here — that's a rewrite (``merge_upsert``/compact), the
    same rule Delta/Iceberg enforce for non-additive changes.
    """
    df.write.mode("append").parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a dataset written across schema versions: ``mergeSchema``
    unions all file footers, so pre-evolution files surface NULL for
    later-added columns. Spark skips footer merging by default (one
    footer read per dataset, not per file — the right default at 100 TB);
    this reader opts in, paying one footer read per file ONCE — writers
    that evolve schemas should compact afterwards so steady-state reads
    go back to the fast path.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


# ----------------------------- manifest-based versioning (time travel) --
#
# The transaction-log discipline modern lakehouse formats provide,
# reduced to its core for a plain-parquet warehouse: data files are
# immutable and land exactly once; what changes per commit is a tiny
# JSON manifest listing the files visible at that version. Readers pin
# a manifest (snapshot isolation — concurrent rewrites never tear a
# scan); vacuum deletes only files no retained version references.
# Commit atomicity is a POSIX rename of the manifest; a real deployment
# swaps that single step for its catalog's atomic-publish call. Single
# writer by design (documented), exactly like the reference's
# write-verify-swap job handoff.

_VERSIONS_DIR = "_versions"
_DATA_DIR = "data"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _VERSIONS_DIR, f"v{version:09d}.json")


def table_versions(path: str) -> list[int]:
    """Committed versions, ascending (empty for a fresh location)."""
    vdir = os.path.join(path, _VERSIONS_DIR)
    if not os.path.isdir(vdir):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(vdir)
        if f.startswith("v") and f.endswith(".json")
    )


def versioned_write(
    spark: SparkSession, df: DataFrame, path: str, mode: str = "append"
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    ``append`` keeps the previous version's files and adds the new
    ones; ``overwrite`` starts the file list fresh. Either way no
    existing data file is touched — old versions stay readable until
    vacuumed."""
    import json
    import uuid

    assert mode in ("append", "overwrite"), mode
    commit_dir = os.path.join(path, _DATA_DIR, f"commit-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(commit_dir)
    new_files = sorted(
        os.path.join(commit_dir, f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet")
    )
    versions = table_versions(path)
    prev_files: list[str] = []
    if versions and mode == "append":
        with open(_manifest_path(path, versions[-1])) as fh:
            prev_files = json.load(fh)["files"]
    version = (versions[-1] + 1) if versions else 1
    os.makedirs(os.path.join(path, _VERSIONS_DIR), exist_ok=True)
    manifest = {
        "version": version,
        "mode": mode,
        "files": prev_files + new_files,
    }
    tmp = _manifest_path(path, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.rename(tmp, _manifest_path(path, version))  # the atomic commit
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the file set of ``version`` (default: latest)."""
    import json

    versions = table_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    with open(_manifest_path(path, v)) as fh:
        files = json.load(fh)["files"]
    if not files:
        raise FileNotFoundError(f"version {v} at {path} lists no files")
    return spark.read.parquet(*files)


def vacuum_versions(path: str, keep_last: int = 1) -> tuple[int, int]:
    """Drop all but the last ``keep_last`` versions and delete every
    data file only the dropped versions referenced. Returns
    (versions_dropped, files_deleted)."""
    import json
    import shutil

    versions = table_versions(path)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    live: set[str] = set()
    for v in keep:
        with open(_manifest_path(path, v)) as fh:
            live |= set(json.load(fh)["files"])
    dropped = 0
    deleted = 0
    for v in versions:
        if v in keep:
            continue
        with open(_manifest_path(path, v)) as fh:
            for f in json.load(fh)["files"]:
                if f not in live and os.path.exists(f):
                    os.remove(f)
                    deleted += 1
        os.remove(_manifest_path(path, v))
        dropped += 1
    # clear out commit dirs that lost all their files
    ddir = os.path.join(path, _DATA_DIR)
    if os.path.isdir(ddir):
        for c in os.listdir(ddir):
            cdir = os.path.join(ddir, c)
            if os.path.isdir(cdir) and not any(
                f.endswith(".parquet") for f in os.listdir(cdir)
            ):
                shutil.rmtree(cdir)
    return dropped, deleted
