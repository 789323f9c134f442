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
