"""Exact distributed global ranks — no single-task sort, no sampling.

A global ``row_number().over(Window.orderBy(...))`` funnels the whole
frame through one task; ``repartitionByRange`` + local ranks is the
classic fix but its boundaries come from sampling seeded by the RDD id,
so two physical instantiations of the same frame (e.g. either side of a
broadcast join) can disagree on partition membership — silently wrong
ranks (caught by this repo's oracle gate on events_lateness_audit).

This helper makes the decomposition deterministic end to end:

1. bucket id = arithmetic range split of the leading sort key from a
   broadcast 1-row (min, max, count) aggregate — a pure function of the
   row, identical in every instantiation;
2. per-bucket ``row_number`` (window PARTITIONED by bucket — parallel);
3. global rank = local rank + prefix count of earlier buckets from a
   lazy triangular self-join over the ≤``n_buckets``-row count table.

Value-skewed frames (many rows sharing one key value) degrade to fewer
effective buckets — parallelism, never correctness. ``ntile_sql`` turns
an exact rank into the standard SQL NTILE bucket (first ``n % b``
buckets one row larger), matching Spark's and DuckDB's native ntile
bit-for-bit so decomposed plans stay oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIV = {"spark": "div", "duckdb": "//"}


def ntile_sql(rank: str, total: str, buckets: int, dialect: str) -> str:
    """SQL text for standard NTILE(buckets) given an exact 1-based rank
    and the partition row count — ``size = total div b`` with the first
    ``total % b`` buckets holding one extra row. For ``total < b`` every
    row gets its own bucket (size 0 path), as native ntile does."""
    d = _DIV[dialect]
    size = f"(({total}) {d} {buckets})"
    rem = f"(({total}) % {buckets})"
    return (
        f"(CASE WHEN ({rank}) <= {rem} * ({size} + 1) "
        f"THEN (({rank}) + {size}) {d} ({size} + 1) "
        f"ELSE {rem} + (({rank}) - {rem} * ({size} + 1) + {size} - 1) "
        f"{d} {size} END)"
    )


def exact_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak: list[str],
    ascending: bool = True,
    n_buckets: int = 32,
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Append an exact global ``row_number`` over
    (value_col asc|desc, *tiebreak asc) as ``rank_col`` (BIGINT, 1-based);
    optionally also the frame's row count as ``total_col``.

    ``value_col`` must be an integral column (the bucket arithmetic is
    exact integer division); the full sort key must be unique per row
    for a deterministic rank (same contract as any rank window).
    """
    bounds = df.agg(
        F.min(value_col).alias("_egr_lo"),
        F.max(value_col).alias("_egr_hi"),
        F.count(F.lit(1)).cast("long").alias("_egr_n"),
    )
    if ascending:
        pid = (
            f"(({value_col} - _egr_lo) * {n_buckets})"
            f" div (_egr_hi - _egr_lo + 1)"
        )
        order = [F.asc(value_col)]
    else:
        pid = (
            f"((_egr_hi - {value_col}) * {n_buckets})"
            f" div (_egr_hi - _egr_lo + 1)"
        )
        order = [F.desc(value_col)]
    order += [F.asc(c) for c in tiebreak]
    b = df.join(F.broadcast(bounds)).withColumn("_egr_pid", F.expr(pid))
    cnt = b.groupBy("_egr_pid").agg(F.count(F.lit(1)).alias("_egr_cnt"))
    off = (
        cnt.alias("a")
        .join(
            cnt.alias("b"),
            F.col("b._egr_pid") < F.col("a._egr_pid"),
            "left",
        )
        .groupBy(F.col("a._egr_pid").alias("_egr_pid"))
        .agg(
            F.coalesce(F.sum("b._egr_cnt"), F.lit(0))
            .cast("long")
            .alias("_egr_off")
        )
    )
    w = Window.partitionBy("_egr_pid").orderBy(*order)
    out = b.join(F.broadcast(off), "_egr_pid").withColumn(
        rank_col, (F.col("_egr_off") + F.row_number().over(w)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_egr_n"))
    return out.drop("_egr_pid", "_egr_off", "_egr_lo", "_egr_hi", "_egr_n")
