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

    Overflow headroom (r12 review): the bucket id computes
    ``(value − lo) · n_buckets``, so the value SPAN must satisfy
    ``(hi − lo + 1) · n_buckets < 2^63`` — with the default 32 buckets
    that is a span below ~2.9e17, far above every current consumer
    (fixed-point money ≤ ~9.2e14, day counts, row ids) but NOT the full
    BIGINT domain. Callers ranking raw unbounded longs should pre-clamp
    or raise ``n_buckets`` awareness accordingly; a span overflow under
    ANSI raises rather than mis-bucketing.
    """
    bounds = df.agg(
        F.min(value_col).alias("_egr_lo"),
        F.max(value_col).alias("_egr_hi"),
        F.count(F.lit(1)).cast("long").alias("_egr_n"),
    )
    # NULLS LAST throughout: Spark's asc default is NULLS FIRST while
    # every DuckDB oracle's row_number ORDER BY defaults NULLS LAST —
    # a single NULL tiebreak value (e.g. a NULL doc_id in the driver's
    # regenerated corpus) silently shifts every rank in one engine only
    # (proven on shard_manifest, r7 hostile-corpus repro). desc already
    # defaults NULLS LAST in both engines; made explicit anyway.
    # NULL value_col rows: the bucket arithmetic yields a NULL pid, and
    # an un-coalesced pid would silently DROP those rows at the inner
    # offset join while _egr_n still counts them (ADVICE r7). Coalesce
    # to bucket ``n_buckets`` — past every value bucket — so NULL-value
    # rows rank LAST, consistent with the NULLS LAST ordering contract
    # and with exact_grouped_rank, which already does this.
    if ascending:
        pid = (
            f"coalesce((({value_col} - _egr_lo) * {n_buckets})"
            f" div (_egr_hi - _egr_lo + 1), {n_buckets})"
        )
        order = [F.asc_nulls_last(value_col)]
    else:
        pid = (
            f"coalesce(((_egr_hi - {value_col}) * {n_buckets})"
            f" div (_egr_hi - _egr_lo + 1), {n_buckets})"
        )
        order = [F.desc_nulls_last(value_col)]
    order += [F.asc_nulls_last(c) for c in tiebreak]
    b = df.join(F.broadcast(bounds)).withColumn("_egr_pid", F.expr(pid))
    # r14: checkpoint the ≤(n_buckets+1)-row bucket counts — the former
    # triangular self-join referenced cnt twice, so the static planner
    # re-ran the FULL input scan + aggregation once per side — and fold
    # the carry-in as a running sum over the tiny table (frame ending
    # at -1 PRECEDING ⇒ 0-coalesced for the first bucket, exactly the
    # old left join's empty match set). Single-task, but bounded by the
    # CONSTANT bucket count, never by data volume.
    cnt = (
        b.groupBy("_egr_pid")
        .agg(F.count(F.lit(1)).alias("_egr_cnt"))
        .localCheckpoint(eager=True)
    )
    w_off = Window.orderBy("_egr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = cnt.select(
        "_egr_pid",
        F.coalesce(F.sum("_egr_cnt").over(w_off), F.lit(0))
        .cast("long")
        .alias("_egr_off"),
    )
    w = Window.partitionBy("_egr_pid").orderBy(*order)
    out = b.join(F.broadcast(off), "_egr_pid").withColumn(
        rank_col, (F.col("_egr_off") + F.row_number().over(w)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_egr_n"))
    return out.drop("_egr_pid", "_egr_off", "_egr_lo", "_egr_hi", "_egr_n")


def exact_global_prefix_sum(
    df: DataFrame,
    value_col: str,
    tiebreak: list[str],
    sum_col: str | None = None,
    ascending: bool = True,
    n_buckets: int = 32,
    prefix_col: str = "prefix_sum",
    total_col: str | None = None,
) -> DataFrame:
    """Append an exact global RUNNING SUM of ``sum_col`` over
    (value_col asc|desc NULLS LAST, *tiebreak asc NULLS LAST) as
    ``prefix_col`` — the distributed prefix-sum sibling of
    ``exact_global_rank`` (same arithmetic bucketing of the leading
    key, per-bucket window cumsum in parallel, earlier-bucket totals
    from the triangular self-join over the ≤n_buckets-row totals table
    — no single-task global window at any row count). ``sum_col``
    defaults to ``value_col``; NULL addends contribute nothing on both
    engines (SUM skips NULLs); optionally also emits the grand total
    as ``total_col``. Same integral-value and span-overflow contract
    as exact_global_rank; the PREFIX itself must also fit BIGINT —
    callers summing money pre-scale to cents for headroom."""
    sum_col = sum_col or value_col
    bounds = df.agg(
        F.min(value_col).alias("_egr_lo"),
        F.max(value_col).alias("_egr_hi"),
        F.sum(sum_col).cast("long").alias("_egr_t"),
    )
    if ascending:
        pid = (
            f"coalesce((({value_col} - _egr_lo) * {n_buckets})"
            f" div (_egr_hi - _egr_lo + 1), {n_buckets})"
        )
        order = [F.asc_nulls_last(value_col)]
    else:
        pid = (
            f"coalesce(((_egr_hi - {value_col}) * {n_buckets})"
            f" div (_egr_hi - _egr_lo + 1), {n_buckets})"
        )
        order = [F.desc_nulls_last(value_col)]
    order += [F.asc_nulls_last(c) for c in tiebreak]
    b = df.join(F.broadcast(bounds)).withColumn("_egr_pid", F.expr(pid))
    # r14: same carry rewrite as exact_global_rank (see the note there)
    tot = (
        b.groupBy("_egr_pid")
        .agg(F.sum(sum_col).cast("long").alias("_egr_s"))
        .localCheckpoint(eager=True)
    )
    w_off = Window.orderBy("_egr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = tot.select(
        "_egr_pid",
        F.coalesce(F.sum("_egr_s").over(w_off), F.lit(0))
        .cast("long")
        .alias("_egr_off"),
    )
    w = (
        Window.partitionBy("_egr_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = b.join(F.broadcast(off), "_egr_pid").withColumn(
        prefix_col,
        (F.col("_egr_off") + F.coalesce(F.sum(sum_col).over(w), F.lit(0)))
        .cast("long"),
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_egr_t"))
    return out.drop("_egr_pid", "_egr_off", "_egr_lo", "_egr_hi", "_egr_t")


def exact_grouped_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak: list[str],
    n_buckets: int = 32,
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """``exact_global_rank`` restarted per group: an exact 1-based
    ``row_number`` over (value_col asc NULLS LAST, *tiebreak asc NULLS
    LAST) WITHIN each ``group_col`` partition — same arithmetic-bucket
    decomposition, so no single task ever holds a whole group. The
    bounds frame is one row per group (broadcast — callers keep group
    cardinality small: metric names, shard ids). Descending ranks:
    negate the value column (ties and NULL placement are unchanged).

    Built for melted multi-metric ranking (e.g. RFM's three quintiles):
    rank ONE (group, value, key) frame in a single pipeline instead of
    one full rank plan per metric — same answers, one-third the
    shuffles."""
    bounds = df.groupBy(group_col).agg(
        F.min(value_col).alias("_egr_lo"),
        F.max(value_col).alias("_egr_hi"),
        F.count(F.lit(1)).cast("long").alias("_egr_n"),
    )
    pid = (
        f"coalesce((({value_col} - _egr_lo) * {n_buckets})"
        f" div (_egr_hi - _egr_lo + 1), {n_buckets})"
    )
    order = [F.asc_nulls_last(value_col)] + [
        F.asc_nulls_last(c) for c in tiebreak
    ]
    b = df.join(F.broadcast(bounds), group_col).withColumn(
        "_egr_pid", F.expr(pid)
    )
    # r14: same carry rewrite as exact_global_rank — checkpoint the
    # (groups × ≤n_buckets+1)-row count table (the triangular join
    # referenced it twice ⇒ two full input scans) and fold the carry-in
    # as a per-group running sum over the tiny table; the window is
    # partitioned by group, each partition bounded by the CONSTANT
    # bucket count.
    cnt = (
        b.groupBy(group_col, "_egr_pid")
        .agg(F.count(F.lit(1)).alias("_egr_cnt"))
        .localCheckpoint(eager=True)
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_egr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = cnt.select(
        group_col,
        "_egr_pid",
        F.coalesce(F.sum("_egr_cnt").over(w_off), F.lit(0))
        .cast("long")
        .alias("_egr_off"),
    )
    w = Window.partitionBy(group_col, "_egr_pid").orderBy(*order)
    out = b.join(F.broadcast(off), [group_col, "_egr_pid"]).withColumn(
        rank_col, (F.col("_egr_off") + F.row_number().over(w)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_egr_n"))
    return out.drop("_egr_pid", "_egr_off", "_egr_lo", "_egr_hi", "_egr_n")


def _bracket(r: DataFrame, percents: list[int], names: list[str],
             group_cols: list[str]) -> DataFrame:
    """Shared tail of the exact-percentile computation: given rows
    carrying (_v, _rk, _n), keep only each quantile's two bracketing
    rows and interpolate in exact integer space — v_lo·(100−rem) +
    v_hi·rem, an integer — dividing once by 100.0 at the end, so both
    engines divide the same integer by the same double."""
    need = F.lit(False)
    for p in percents:
        r = (
            r.withColumn(f"_lo{p}", F.expr(f"1 + ({p} * (_n - 1)) div 100"))
            .withColumn(f"_rem{p}", F.expr(f"({p} * (_n - 1)) % 100"))
        )
        r = r.withColumn(
            f"_hi{p}",
            F.col(f"_lo{p}") + F.when(F.col(f"_rem{p}") > 0, 1).otherwise(0),
        )
        need = need | (F.col("_rk") == F.col(f"_lo{p}")) | (
            F.col("_rk") == F.col(f"_hi{p}")
        )
    aggs = []
    for p, nm in zip(percents, names):
        scaled = F.max(
            F.when(F.col("_rk") == F.col(f"_lo{p}"), F.col("_v"))
        ) * (100 - F.max(f"_rem{p}")) + F.coalesce(
            F.max(F.when(F.col("_rk") == F.col(f"_hi{p}"), F.col("_v"))),
            F.lit(0),
        ) * F.max(f"_rem{p}")
        aggs.append((scaled / 100.0).alias(nm))
    return (
        r.filter(need)
        .groupBy(*group_cols)
        .agg(*aggs)
        .select(*group_cols, *names)
    )


def exact_percentiles_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percents: list[int],
    names: list[str],
) -> DataFrame:
    """One row per group with exact linear-interpolated percentiles of
    an integral column — ``percentile``/``quantile_cont`` semantics
    (pos = 1 + q·(n−1)) WITHOUT the per-group value buffer that breaks
    large groups: a rank window partitioned by the group (parallel,
    streaming sort) + bracket-row interpolation. ``percents`` are
    integer hundredths (e.g. [10, 50, 90])."""
    ranked = df.select(
        *group_cols, F.col(value_col).cast("long").alias("_v")
    ).withColumn(
        "_rk",
        F.row_number()
        .over(Window.partitionBy(*group_cols).orderBy(F.asc_nulls_last("_v")))
        .cast("long"),
    )
    cnt = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    r = ranked.join(F.broadcast(cnt), list(group_cols))
    return _bracket(r, percents, names, list(group_cols))


def exact_percentiles_global(
    df: DataFrame,
    value_col: str,
    percents: list[int],
    names: list[str],
    n_buckets: int = 32,
) -> DataFrame:
    """1-row DataFrame of exact corpus-wide percentiles of an integral
    column — same definition as ``exact_percentiles_grouped`` but the
    rank comes from ``exact_global_rank`` (arithmetic value buckets),
    so no single task ever sees the whole frame. Ties make the rank
    among equal values arbitrary, but the VALUE at every rank of the
    sorted multiset is unique — the interpolation only reads values, so
    the output is deterministic."""
    base = df.select(F.col(value_col).cast("long").alias("_v"))
    ranked = exact_global_rank(
        base, "_v", [], ascending=True, n_buckets=n_buckets,
        rank_col="_rk", total_col="_n",
    )
    return _bracket(ranked, percents, names, [])


def percentile_select_sql(
    src: str,
    group_cols: list[str],
    value: str,
    percents: list[int],
    names: list[str],
) -> str:
    """DuckDB SELECT mirroring the helpers above: exact rank-bracket
    percentiles of integral ``value`` from relation ``src``, one row
    per group (single row when ``group_cols`` is empty). Embedding this
    in an oracle pins the exact-integer definition in SQL instead of
    trusting quantile_cont's float interpolation to match."""
    gb = ", ".join(group_cols)
    part = f"PARTITION BY {gb} " if group_cols else ""
    qcols, scols = [], []
    for p, nm in zip(percents, names):
        qcols.append(
            f"1 + ({p} * (n_ - 1)) // 100 AS lo{p}, "
            f"({p} * (n_ - 1)) % 100 AS rem{p}, "
            f"1 + ({p} * (n_ - 1)) // 100 + CASE WHEN "
            f"({p} * (n_ - 1)) % 100 > 0 THEN 1 ELSE 0 END AS hi{p}"
        )
        scols.append(
            f"(MAX(CASE WHEN rk_ = lo{p} THEN v_ END) * (100 - MAX(rem{p}))"
            f" + COALESCE(MAX(CASE WHEN rk_ = hi{p} THEN v_ END), 0)"
            f" * MAX(rem{p})) / 100.0 AS {nm}"
        )
    conds = " OR ".join(f"rk_ = lo{p} OR rk_ = hi{p}" for p in percents)
    sel_g = (gb + ", ") if gb else ""
    grp = f"GROUP BY {gb}" if gb else ""
    return f"""
SELECT {sel_g}{', '.join(scols)}
FROM (
  SELECT r_.*, {', '.join(qcols)}
  FROM (
    SELECT {sel_g}CAST(({value}) AS BIGINT) AS v_,
           row_number() OVER ({part}ORDER BY ({value}) NULLS LAST) AS rk_,
           COUNT(*) OVER ({part.rstrip()}) AS n_
    FROM {src}
  ) r_
) WHERE {conds}
{grp}
"""
