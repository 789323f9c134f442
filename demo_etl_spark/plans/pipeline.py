"""Stage/Pipeline framework (SURVEY.md §3.1).

The reference's workflow driver (run-all.sh) runs each job in a separate
spark-shell JVM; the only state shared between stages is files + the
metastore. Process isolation is not a semantic requirement — what matters
is the *materialization boundary*: each stage reads declared inputs,
writes its output as parquet, and is verified (``_SUCCESS`` + row count,
L5, run-all.sh:129-139) before the next stage starts. This framework keeps
those boundaries inside one SparkSession and records lineage per stage.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.lineage import LineageTracker


@dataclass
class Stage:
    name: str
    description: str
    #: (spark, inputs: name → DataFrame) → output DataFrame
    transform: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    #: input stage names (or source names registered on the pipeline)
    inputs: list[str] = field(default_factory=list)
    #: partition columns for the materialized output (scale: date keys)
    partition_by: list[str] | None = None
    min_rows: int = 1


@dataclass
class StageResult:
    name: str
    path: str
    rows: int


class Pipeline:
    def __init__(
        self,
        work_dir: str,
        ctx: RunContext = DEFAULT_CONTEXT,
        tracker: LineageTracker | None = None,
    ) -> None:
        self.work_dir = work_dir
        self.ctx = ctx
        self.tracker = tracker or LineageTracker(ctx)
        self.sources: dict[str, Callable[[SparkSession], DataFrame]] = {}
        self.stages: list[Stage] = []

    def add_source(self, name: str, loader: Callable[[SparkSession], DataFrame]) -> None:
        self.sources[name] = loader

    def add_stage(self, stage: Stage) -> None:
        self.stages.append(stage)

    def _stage_path(self, name: str) -> str:
        return os.path.join(self.work_dir, name)

    def run(self, spark: SparkSession) -> dict[str, StageResult]:
        results: dict[str, StageResult] = {}
        for stage in self.stages:
            inputs: dict[str, DataFrame] = {}
            for dep in stage.inputs:
                if dep in results:
                    inputs[dep] = spark.read.parquet(results[dep].path)
                elif dep in self.sources:
                    inputs[dep] = self.sources[dep](spark)
                else:
                    raise KeyError(f"stage {stage.name}: unknown input {dep!r}")
            out = stage.transform(spark, inputs)
            path = self._stage_path(stage.name)
            writer = out.write.mode("overwrite")
            if stage.partition_by:
                writer = writer.partitionBy(*stage.partition_by)
            writer.parquet(path)
            # L5 verification: committer _SUCCESS marker + non-emptiness
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                raise RuntimeError(f"stage {stage.name}: missing _SUCCESS at {path}")
            rows = spark.read.parquet(path).count()
            if rows < stage.min_rows:
                raise RuntimeError(
                    f"stage {stage.name}: {rows} rows < min {stage.min_rows}"
                )
            self.tracker.log(
                stage.description,
                inputs=[
                    results[d].path if d in results else f"source:{d}"
                    for d in stage.inputs
                ],
                output=path,
                record_count=rows,
            )
            results[stage.name] = StageResult(stage.name, path, rows)
        return results
