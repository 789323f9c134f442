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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext

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
