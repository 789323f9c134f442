"""Deterministic cardinality sketches (build-brief "novel sketch" slot).

``kmv_distinct`` estimates the distinct-token count per source with a
K-minimum-values sketch — the classic bottom-k estimator (Bar-Yossef et
al. 2002): hash every distinct value into a uniform M-sized integer
space, keep the K smallest hashes per group, and estimate

    distinct ≈ (K - 1) · M / h_K        (h_K = K-th smallest hash)

Unlike HLL (Spark's ``approx_count_distinct``), KMV is *deterministic
given the hash function*, so the identical md5-prefix hash on both
engines makes the estimate oracle-checkable bit-for-bit — the estimator
itself is under the cross-engine gate, not just smoke-tested. The
output also carries the exact distinct count and the error in basis
points, so the sketch's accuracy contract (~1/√K ≈ 12.5 % at K=64) is
continuously measured by the driver.

100 TB shape: the plan is distinct(source, token) → per-group top-K by
hash. The distinct is the dominant (and unavoidable for the *exact*
audit column) shuffle; the sketch side adds only a window rank over the
already-distinct rows. A production pipeline that wants ONLY the
estimate drops the exact column and replaces the window with a
per-partition bottom-K (mapPartitions keep-K-smallest) merged by a
K-way min — bounded state per partition, no distinct shuffle; the
registered form keeps exact+estimate together because the gate derives
its value from comparing them.

Hash space: 13 hex chars of md5 → M = 16^13 = 2^52, so
(K-1)·M ≈ 2.8e17 stays far below the 2^63 signed headroom in the
integer-division estimator on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import fixed_ratio
from demo_etl_spark.io import load_star

KMV_K = 64
_HEX = 13
_M = 16**_HEX  # 2^52


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
    dropped on both engine sides; the row_number tie-break includes the
    bigram itself so 52-bit hash collisions stay deterministic.
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
    w = Window.partitionBy("source").orderBy(
        F.asc("h"), F.asc("token")
    )
    ranked = dt.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_distinct_exact"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("_h_k"),
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
