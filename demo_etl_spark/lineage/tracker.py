"""Lineage capture (SURVEY.md §2.11 — the reference's signature feature).

The reference logs structured ``LINEAGE:`` lines per transformation step
(generate-asset.scala:13-19, 8 call sites), appends one row per run to a
Hive registry table (generate-asset.scala:350-370; README.md:118-128), and
documents a DOT lineage graph contract (README.md:87-92). This module is
the idiomatic replacement:

* ``LineageTracker.log`` — structured in-memory events + Python logging
  (replaces log-scraping, run-all.sh:143);
* plan-derived inputs — ``DataFrame.inputFiles()`` resolves the *actual*
  files a frame reads (table-level lineage from the optimized plan, free);
* ``to_registry_df`` — exact registry schema (8 columns);
* ``to_dot`` — Graphviz digraph per the README contract.

Identity/time come from RunContext (no UUID.randomUUID / wall clock in
the data path — SURVEY §0 Caveat C).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.schemas import DATA_LINEAGE_REGISTRY

logger = logging.getLogger("demo_etl_spark.lineage")


def _dot_quote(s: str) -> str:
    """Quoted DOT node id / label: a path or description carrying ``"``
    or a trailing backslash would otherwise break the emitted graph
    (r12 review — the old emitters interpolated raw strings between
    double quotes)."""
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


@dataclass
class LineageEvent:
    step: int
    description: str
    inputs: tuple[str, ...]
    output: str
    record_count: int | None = None


@dataclass
class LineageTracker:
    ctx: RunContext = field(default_factory=lambda: DEFAULT_CONTEXT)
    events: list[LineageEvent] = field(default_factory=list)

    def log(
        self,
        description: str,
        inputs: list[str],
        output: str,
        record_count: int | None = None,
    ) -> LineageEvent:
        ev = LineageEvent(
            step=len(self.events) + 1,
            description=description,
            inputs=tuple(inputs),
            output=output,
            record_count=record_count,
        )
        self.events.append(ev)
        logger.info(
            "LINEAGE: job=%s step=%d %s | inputs=%s -> output=%s",
            self.ctx.job_id, ev.step, description, list(inputs), output,
        )
        return ev

    def log_frame(
        self, df: DataFrame, description: str, output: str
    ) -> LineageEvent:
        """Plan-derived lineage: inputs resolved from the frame's scan set.

        Caveat: ``inputFiles()`` reads the optimized plan, so a frame whose
        scan was replaced by a cached InMemoryRelation reports no files —
        the listener variant (:func:`attach_query_listener`) reads the
        analyzed plan and sees through cache substitution."""
        dirs = sorted({os.path.dirname(f) for f in df.inputFiles()})
        return self.log(description, dirs, output)

    # -- registry (generate-asset.scala:350-370) --------------------------
    def to_registry_df(
        self,
        spark: SparkSession,
        source_path: str,
        target_path: str,
        record_count: int,
        source_files: list[str] | None = None,
        description: str = "pipeline run",
    ) -> DataFrame:
        row = (
            self.ctx.job_id,
            self.ctx.job_timestamp,
            source_path,
            target_path,
            len(self.events),
            record_count,
            ",".join(source_files or []),
            description,
        )
        return spark.createDataFrame([row], DATA_LINEAGE_REGISTRY)

    def append_registry(
        self,
        spark: SparkSession,
        source_path: str,
        target_path: str,
        record_count: int,
        source_files: list[str] | None = None,
        description: str = "pipeline run",
        table: str = "data_lineage_registry",
    ) -> None:
        df = self.to_registry_df(
            spark, source_path, target_path, record_count, source_files, description
        )
        df.write.mode("append").format("parquet").saveAsTable(table)

    # -- DOT graph (README.md:87-92 contract) ----------------------------
    def to_dot(self) -> str:
        lines = [f'digraph lineage_{self.ctx.job_id.replace("-", "_")} {{']
        lines.append('  rankdir=LR;')
        for ev in self.events:
            step = f"step_{ev.step}"
            label = _dot_quote(f"{ev.step}: {ev.description}")
            lines.append(f'  {step} [shape=box, label={label}];')
            for src in ev.inputs:
                lines.append(f'  {_dot_quote(src)} -> {step};')
            lines.append(f'  {step} -> {_dot_quote(ev.output)};')
        lines.append("}")
        return "\n".join(lines)

    def write_dot(self, path: str) -> str:
        dot = self.to_dot()
        with open(path, "w") as fh:
            fh.write(dot)
        return path


# -- column-level lineage (SURVEY §7 Phase 4 stretch) ----------------------
def column_lineage(df: DataFrame) -> dict[str, list[str]]:
    """Map each output column to the source ``table.column`` set it derives
    from, by a bottom-up walk of the ANALYZED logical plan.

    Leaves (file relations) seed each attribute with its source name
    (derived from the scanned file path); every named expression above
    unions the provenance of the attributes it references, keyed by
    Catalyst exprId — so aliases, aggregates, window functions and join
    pass-throughs all resolve without per-node-type code. Runs entirely
    on the driver over plan metadata (no job is triggered).
    """

    def seq_list(seq):
        return [seq.apply(i) for i in range(seq.size())]

    def resolve_expr(e, env: dict[int, set[str]]) -> None:
        try:
            eid = e.exprId().id()
        except Exception:
            eid = None
        if eid is not None and eid in env:
            return  # a bare attribute reference — provenance already known
        refs: set[str] = set()
        it = e.references().iterator()
        while it.hasNext():
            a = it.next()
            refs |= env.get(a.exprId().id(), set())
        if eid is not None:
            env[eid] = refs

    def walk(node, env: dict[int, set[str]]) -> None:
        for c in seq_list(node.children()):
            walk(c, env)
        cls = node.getClass().getSimpleName()
        if cls in ("LogicalRelation", "LocalRelation", "Range"):
            src = "<in-memory>"
            if cls == "LogicalRelation":
                try:
                    files = node.relation().inputFiles()
                    if len(files):
                        parts = files[0].rsplit("/", 2)
                        fname, parent = parts[-1], parts[-2]
                        # dataset dir name for part-files, else the file name
                        name = parent if fname.startswith("part-") else fname
                        src = name.split(".")[0]
                except Exception:
                    src = "<relation>"
            for a in seq_list(node.output()):
                env[a.exprId().id()] = {f"{src}.{a.name()}"}
            return
        if cls == "Union":
            # Union's output reuses the FIRST child's exprIds — merge the
            # provenance of every child's corresponding (positional) column
            # or the later branches' contributions are silently dropped
            outs = seq_list(node.output())
            kids = seq_list(node.children())
            for i, a in enumerate(outs):
                merged: set[str] = set()
                for k in kids:
                    ka = k.output().apply(i)
                    merged |= env.get(ka.exprId().id(), set())
                env[a.exprId().id()] = merged
            return
        if cls == "Generate":
            # explode/posexplode: generator outputs derive from the
            # generator expression's references
            gen_refs: set[str] = set()
            it = node.generator().references().iterator()
            while it.hasNext():
                gen_refs |= env.get(it.next().exprId().id(), set())
            for a in seq_list(node.generatorOutput()):
                env[a.exprId().id()] = gen_refs
            return
        if cls == "Expand":
            # cube/rollup/grouping-sets: output position i takes the union
            # of every projection's expression at position i
            outs = seq_list(node.output())
            projs = [seq_list(p) for p in seq_list(node.projections())]
            for i, a in enumerate(outs):
                merged = set()
                for p in projs:
                    it = p[i].references().iterator()
                    while it.hasNext():
                        merged |= env.get(it.next().exprId().id(), set())
                eid = a.exprId().id()
                env[eid] = env.get(eid) or merged
            return
        for e in seq_list(node.expressions()):
            resolve_expr(e, env)
        # safety net: any output attribute this node introduces that no
        # branch above bound (an unmodeled node type) over-approximates to
        # the union of its children's provenance — table-level rather than
        # empty, so lineage never silently reports "no sources"
        child_all: set[str] = set()
        for c in seq_list(node.children()):
            for a in seq_list(c.output()):
                child_all |= env.get(a.exprId().id(), set())
        for a in seq_list(node.output()):
            eid = a.exprId().id()
            if eid not in env:
                env[eid] = child_all

    plan = df._jdf.queryExecution().analyzed()
    env: dict[int, set[str]] = {}
    walk(plan, env)
    return {
        a.name(): sorted(env.get(a.exprId().id(), set()))
        for a in [plan.output().apply(i) for i in range(plan.output().size())]
    }


# -- automatic plan-derived lineage (SURVEY §7 Phase 4 idiomatic upgrade) --
class _QueryExecutionLineageListener:
    """Python proxy for ``org.apache.spark.sql.util.QueryExecutionListener``.

    Fires on every successful action; walks the analyzed plan's leaves and
    records the file-source inputs — the same table-level lineage
    ``log_frame`` derives, but captured automatically instead of per-call.
    Events arrive asynchronously on the listener bus (poll before
    asserting in tests). Uses the py4j callback server, the mechanism
    ``foreachBatch`` relies on — no Scala helper jar needed.
    """

    def __init__(self, tracker: "LineageTracker"):
        self.tracker = tracker

    def onSuccess(self, funcName, qe, durationNs):  # noqa: N802 (Java iface)
        try:
            files: list[str] = []
            leaves = qe.analyzed().collectLeaves()
            for i in range(leaves.size()):
                leaf = leaves.apply(i)
                if leaf.getClass().getSimpleName() == "LogicalRelation":
                    files.extend(leaf.relation().inputFiles())
            dirs = sorted({os.path.dirname(f) for f in files})
            self.tracker.log(f"action:{funcName}", dirs, f"<{funcName} result>")
        except Exception:  # never let lineage capture break the query
            logger.exception("lineage listener failed for %s", funcName)

    def onFailure(self, funcName, qe, exception):  # noqa: N802
        pass

    class Java:
        implements = ["org.apache.spark.sql.util.QueryExecutionListener"]


def attach_query_listener(
    spark: SparkSession, tracker: LineageTracker
) -> _QueryExecutionLineageListener:
    """Register automatic lineage capture on the session's listener bus.

    Opt-in (the pipeline's explicit ``log``/``log_frame`` calls stay the
    deterministic record — listener events are async, so registry
    transformation counts should not depend on them). Detach with
    :func:`detach_query_listener`.
    """
    from pyspark.java_gateway import ensure_callback_server_started

    ensure_callback_server_started(spark.sparkContext._gateway)
    listener = _QueryExecutionLineageListener(tracker)
    spark._jsparkSession.listenerManager().register(listener)
    return listener


def detach_query_listener(
    spark: SparkSession, listener: _QueryExecutionLineageListener
) -> None:
    spark._jsparkSession.listenerManager().unregister(listener)


def column_lineage_dot(df: DataFrame, name: str = "columns") -> str:
    """DOT rendering of ``column_lineage(df)``: ellipse nodes for source
    ``table.column`` leaves, box nodes for output columns, one edge per
    provenance fact. The column-granular upgrade of the reference's DOT
    lineage contract (README.md:87-92 documents only a table/step-level
    graph) — `dot -Tpng` renders it the same way."""
    lin = column_lineage(df)
    safe = "".join(ch if ch.isalnum() else "_" for ch in name)
    lines = [f"digraph column_lineage_{safe} {{", "  rankdir=LR;"]
    for src in sorted({s for ss in lin.values() for s in ss}):
        lines.append(f"  {_dot_quote(src)} [shape=ellipse];")
    for out, srcs in lin.items():  # insertion order == output schema order
        lines.append(f"  {_dot_quote('out.' + out)} [shape=box];")
        for src in sorted(srcs):
            lines.append(f"  {_dot_quote(src)} -> {_dot_quote('out.' + out)};")
    lines.append("}")
    return "\n".join(lines)
