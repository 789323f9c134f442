"""Sketch summaries (probabilistic data structures — §2.4 A5's family).

count-min sketch over the token stream: a fixed-size frequency summary
built with Spark's native ``count_min_sketch`` aggregate (one pass,
map-side partial merge — sketches are commutative monoids, so the merge
tree is exactly a partial aggregation). The sketch is the ONE operator
family where collect-to-driver is the design: its whole point is that a
bounded-size (w×d counters) summary of an unbounded stream travels to
the driver/serving layer while the data does not.

Cross-engine note: the sketch binary is Spark-specific, so this surface
is pytest-verified against its (ε, δ) guarantees rather than
DuckDB-oracled — the one deliberate exception to the oracle-twin rule
(every estimate is still deterministic given the seed).

``kmv_distinct`` is the deterministic counterpart: a K-minimum-values
(bottom-K, Bar-Yossef et al. 2002) cardinality sketch whose md5 hashing
is identical in both engines, so unlike CMS/HLL the estimator ITSELF is
under the DuckDB oracle gate — hash every distinct value into the
M=2^52 space, keep the K smallest per group, estimate (K-1)·M/h_K.
Output carries the exact count and the error in basis points, so the
~1/√K accuracy contract (12.5 % at K=64) is continuously measured.
100 TB shape: h_K comes from a two-level bottom-K merge (no per-source
global sort — see kmv_distinct); the remaining corpus-sized stage is
the exact-audit distinct shuffle, which an estimate-only pipeline
drops by merging per-partition bottom-Ks directly (bounded state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext

from demo_etl_spark.functions.fixedpoint import fixed_ratio
from demo_etl_spark.io import load_star

#: defaults: ε=0.1% over-estimate bound (of total count) at 99% confidence
CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42


def token_cms(
    documents: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
) -> DataFrame:
    """One-row DataFrame: (sketch BINARY, n_tokens) over all tokens."""
    toks = documents.select(F.explode(F.split("text", " ")).alias("token"))
    return toks.agg(
        F.expr(
            f"count_min_sketch(token, {eps}d, {confidence}d, {seed})"
        ).alias("sketch"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def cms_estimate(spark: SparkSession, sketch: bytes, items: list[str]) -> dict[str, int]:
    """Query a collected sketch for item frequencies (driver/serving side)."""
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sketch))
    )
    return {item: cms.estimateCount(item) for item in items}


# ------------------------------------------------------ HLL sketches ----
#: log2 of HLL registers: 12 → 4096 registers, ~1.6% relative standard
#: error, 2-4 KB per sketch — the classic size/accuracy point
HLL_LGK = 12


def daily_user_sketches(
    events: DataFrame, ctx: RunContext = DEFAULT_CONTEXT, lgk: int = HLL_LGK
) -> DataFrame:
    """One mergeable HLL sketch of distinct users per day (Apache
    DataSketches via Spark's native ``hll_sketch_agg``), with its
    estimate. THE scale story for distinct counts: exact
    ``countDistinct`` needs a full shuffle of the distinct grid every
    time a new rollup granularity is asked for, while kilobyte sketches
    are stored once per day and re-aggregate to ANY coarser period with
    ``hll_union_agg`` — no second pass over the events (see
    ``merged_user_estimate``). Same mergeable-monoid contract as the
    count-min sketch above; pytest-verified (sketch binaries are
    engine-specific — the family's declared oracle exception)."""
    return (
        events.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .agg(
            F.hll_sketch_agg(F.col("user_id"), F.lit(lgk)).alias("user_hll"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(lgk))
            ).alias("est_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def merged_user_estimate(daily: DataFrame) -> DataFrame:
    """Fold the per-day sketches into one overall distinct-user estimate
    WITHOUT touching the raw events again — the re-aggregation path a
    rollup store serves (week/month/all-time from daily sketches)."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_hll")).alias("est_total"),
        F.sum("n_events").alias("n_events"),
    )


KMV_K = 64
_HEX = 13
_M = 16**_HEX  # 2^52

#: level-1 buckets of the bottom-K merge — sizes the parallelism of the
#: per-source scan; any value ≥1 yields the identical h_K (the global
#: bottom-K is the bottom-K of bucket bottom-Ks). A cluster run sets
#: this to its per-source parallelism target.
KMV_BUCKETS = 32


def kmv_distinct(
    documents: DataFrame, k: int = KMV_K, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-source distinct token-BIGRAM cardinality: exact count, KMV
    estimate from the k smallest 52-bit bigram hashes, and |error| in
    basis points. Bigrams (not unigrams) are the sketched value so the
    estimator path actually runs on the synthetic corpus — its unigram
    vocabulary (~31/source) sits below K=64 where KMV is exact by
    construction, while the 2-gram space (~700/source at sf0.01) puts
    the (K-1)·M/h_K estimate itself under the cross-engine gate.

    Hostile-corpus rules: NULL text is coalesced to '' before split;
    bigrams touching an empty token (whitespace runs / empty docs) are
    dropped on both engine sides; the (h, token) ordering keeps 52-bit
    hash collisions deterministic.

    h_K is found WITHOUT a per-source global sort (the r7-ADVICE shape:
    ``row_number over (PARTITION BY source)`` funnels each source's full
    distinct-bigram set through one task): a two-level bottom-K merge —
    level 1 keeps the K smallest (h, token) per (source, h mod B) bucket
    in parallel, level 2 merges B arrays of ≤K values per source
    (bounded state: B·K structs) and reads the K-th. Identical result to
    the oracle's row_number spec by construction: the global bottom-K is
    the bottom-K of the buckets' bottom-Ks.
    """
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.when(
            (a != "") & (b != ""), F.concat(a, F.lit(" "), b)
        ),
    )
    dt = (
        documents.select(
            "source", F.explode(bigrams).alias("token")
        )
        .where(F.col("token").isNotNull())
        .distinct()
        .withColumn(
            "h",
            F.conv(F.substring(F.md5("token"), 1, _HEX), 16, 10).cast("long"),
        )
    )
    # level 1 as a row_number window, not collect_list+slice: a grouped
    # collect_list materializes the WHOLE (source, bucket) distinct set
    # in one non-spillable agg buffer before slicing (O(distinct/B) per
    # group — r8 ADVICE); the window path runs on Spark's external
    # (spillable) sort, the per-bucket count shares the same exchange,
    # and only the K survivors reach the level-2 collect (≤ K structs
    # per bucket, B·K per source — bounded at BOTH levels now).
    wb = Window.partitionBy("source", "_b")
    lvl1 = (
        dt.withColumn("_b", F.pmod(F.col("h"), F.lit(KMV_BUCKETS)))
        .withColumn("_rn", F.row_number().over(wb.orderBy("h", "token")))
        .withColumn("_bn", F.count(F.lit(1)).over(wb))
        .where(F.col("_rn") <= k)
        .groupBy("source", "_b")
        .agg(
            F.max("_bn").alias("_n"),
            F.array_sort(F.collect_list(F.struct("h", "token"))).alias(
                "_bot"
            ),
        )
    )
    stats = lvl1.groupBy("source").agg(
        F.sum("_n").cast("long").alias("n_distinct_exact"),
        # K-th smallest hash across the merged bucket minima; F.get is
        # NULL past the end (sources with < K distinct bigrams), which
        # routes the estimate to the exact count below — element_at
        # would ERROR there under ANSI mode
        F.get(F.array_sort(F.flatten(F.collect_list("_bot"))), k - 1)
        .getField("h")
        .alias("_h_k"),
    )
    est = F.when(F.col("_h_k").isNull(), F.col("n_distinct_exact")).otherwise(
        F.expr(f"CAST({k - 1} AS BIGINT) * {_M} div greatest(_h_k, 1)")
    )
    return (
        stats.withColumn("kmv_estimate", est.cast("long"))
        .select(
            "source",
            "n_distinct_exact",
            F.lit(k).cast("int").alias("kmv_k"),
            "kmv_estimate",
            fixed_ratio(
                "ABS(kmv_estimate - n_distinct_exact)",
                "greatest(n_distinct_exact, 1)",
                4,
            ).alias("err_bp"),
        )
    )


def build_kmv_distinct(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return kmv_distinct(load_star(spark, sf_dir)["documents"], KMV_K, ctx)


ORACLE_SQL_KMV = f"""
WITH doc AS (
  SELECT source, string_split(COALESCE(text, ''), ' ') AS ts FROM documents
), toks AS (
  SELECT source, ts[i] || ' ' || ts[i + 1] AS token
  FROM doc, unnest(range(1, len(ts))) AS u(i)
  WHERE ts[i] <> '' AND ts[i + 1] <> ''
), dt AS (
  SELECT DISTINCT source, token FROM toks
), h AS (
  SELECT source, token,
         CAST('0x' || substr(md5(token), 1, {_HEX}) AS BIGINT) AS h
  FROM dt
), r AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h, token) AS rn
  FROM h
), s AS (
  SELECT source,
         COUNT(*) AS n_distinct_exact,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h_k
  FROM r GROUP BY source
)
SELECT source,
       n_distinct_exact,
       CAST({KMV_K} AS INTEGER) AS kmv_k,
       CAST(CASE WHEN h_k IS NULL THEN n_distinct_exact
                 ELSE CAST({KMV_K - 1} AS BIGINT) * {_M} // GREATEST(h_k, 1)
            END AS BIGINT) AS kmv_estimate,
       CAST((ABS((CASE WHEN h_k IS NULL THEN n_distinct_exact
                       ELSE CAST({KMV_K - 1} AS BIGINT) * {_M} // GREATEST(h_k, 1)
                  END) - n_distinct_exact) * 10000 * 2
             + GREATEST(n_distinct_exact, 1))
            // (2 * GREATEST(n_distinct_exact, 1)) AS BIGINT) AS err_bp
FROM s
"""
