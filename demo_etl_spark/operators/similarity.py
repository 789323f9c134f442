"""Similarity search over embeddings (north-star extension; BASELINE.json).

Approximate-nearest-neighbor surface over the ``embeddings`` table
(``array<float>`` 64-dim):

* ``cosine_topk`` — brute-force cosine top-k: query vectors (a keyed
  subset) broadcast against all candidates; dot products via
  ``zip_with``/``aggregate`` higher-order functions (JVM-side, codegen —
  no Python). O(Q×N) — the exact baseline every ANN variant is measured
  against. Results are rank-deterministic: candidates order by the
  1e6-scaled integer cosine with id tie-break.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane (SimHash-style)
  signs computed from deterministic md5-derived pseudo-weights bucket the
  vectors; top-k is computed only within the query's bucket. Recall<1 by
  construction; rows-only check (bucketing is engine-specific).

At 100 TB: broadcast the query set (it is the small side by definition),
partition candidates evenly (no key skew — round-robin on vec_id), and
compute per-partition local top-k before the global k-way merge — exactly
what Spark's window-over-partition + filter plan does here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.io import load_star

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    emb = embeddings.select(
        "vec_id", "embedding", F.sqrt(_dot("embedding", "embedding")).alias("_norm")
    )
    q = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qe"),
        F.col("_norm").alias("_qn"),
    ).filter(F.col("query_id") < n_queries)
    c = emb.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("embedding").alias("_ce"),
        F.col("_norm").alias("_cn"),
    )
    pairs = c.join(F.broadcast(q), F.col("candidate_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "_cos_e6",
        F.round(_dot("_qe", "_ce") / (F.col("_qn") * F.col("_cn")) * 1_000_000)
        .cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos_e6"), F.asc("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "candidate_id",
            "rank",
            F.expr("CAST(_cos_e6 / 1000000 AS DOUBLE)").alias("cosine"),
        )
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_planes: int = 8,
) -> DataFrame:
    """SimHash-bucketed ANN: deterministic pseudo-random hyperplanes.

    Plane weights come from md5(plane|dim) mapped to [-0.5, 0.5); the
    bucket is the sign pattern. Same-bucket candidates only → recall < 1
    (rows-only correctness check), shuffle O(N), compare O(N·Q/2^planes).
    """
    dims = F.sequence(F.lit(0), F.size("embedding") - 1)

    def plane_sign(p: int):
        # deterministic pseudo-weight per (plane, dim): first 8 hex chars
        # of md5 → uint32 → [-0.5, 0.5)
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                dims,
                lambda x, i: x.cast("double")
                * (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"{p}|"), i.cast("string"))), 1, 8),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(4294967296.0)
                    - F.lit(0.5)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) >= 0

    bucket = F.concat(*[plane_sign(p).cast("int").cast("string") for p in range(n_planes)])
    emb = embeddings.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        F.sqrt(_dot("embedding", "embedding")).alias("_norm"),
    )
    q = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qe"),
        F.col("_norm").alias("_qn"),
        "bucket",
    ).filter(F.col("query_id") < n_queries)
    pairs = emb.join(F.broadcast(q), on="bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "_cos_e6",
        F.round(_dot("_qe", "embedding") / (F.col("_qn") * F.col("_norm")) * 1_000_000)
        .cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("candidate_id"),
            "bucket",
            "rank",
            F.expr("CAST(_cos_e6 / 1000000 AS DOUBLE)").alias("cosine"),
        )
    )


def build_topk(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return cosine_topk(load_star(spark, sf_dir)["embeddings"], ctx)


def build_lsh(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return lsh_bucket_topk(load_star(spark, sf_dir)["embeddings"], ctx)


ORACLE_SQL_TOPK = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
         CAST(ROUND(
           list_sum(list_transform(range(1, len(q.embedding) + 1),
                i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
           / (q.nrm * c.nrm) * 1000000, 0) AS BIGINT) AS cos_e6
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_e6 DESC, candidate_id ASC) AS INTEGER) AS rank
  FROM pairs
)
SELECT query_id, candidate_id, rank,
       CAST(cos_e6 / 1000000 AS DOUBLE) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


# ------------------------------------------------- embedding near-dup ----
NEAR_DUP_THRESHOLD = 0.45  # cosine; data max is ~0.51 (random vectors)


def embedding_near_dup(
    embeddings: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    threshold: float = NEAR_DUP_THRESHOLD,
) -> DataFrame:
    """Semantic near-dup pairs: cosine ≥ τ over all vector pairs.

    Brute-force O(n²/2) — the exact baseline; the bucketed variant
    (lsh_bucket_topk's plane-sign buckets) is the 100 TB path. The
    a<b predicate makes this a broadcast nested-loop join: correct here
    because one side always fits in memory per partition; at cluster
    scale block-partition the pair space instead.
    """
    emb = embeddings.select(
        "vec_id", "embedding", F.sqrt(_dot("embedding", "embedding")).alias("_norm")
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("_ea"),
        F.col("_norm").alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("_eb"),
        F.col("_norm").alias("_nb"),
    )
    t_e6 = int(round(threshold * 1_000_000))
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    scored = pairs.withColumn(
        "_cos_e6",
        F.round(_dot("_ea", "_eb") / (F.col("_na") * F.col("_nb")) * 1_000_000)
        .cast("long"),
    )
    return (
        scored.filter(F.col("_cos_e6") >= t_e6)
        .select(
            "vec_a",
            "vec_b",
            F.expr("CAST(_cos_e6 / 1000000 AS DOUBLE)").alias("cosine"),
        )
    )


def build_near_dup(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return embedding_near_dup(load_star(spark, sf_dir)["embeddings"], ctx)


ORACLE_SQL_NEAR_DUP = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(ROUND(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           / (a.nrm * b.nrm) * 1000000, 0) AS BIGINT) AS cos_e6
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, CAST(cos_e6 / 1000000 AS DOUBLE) AS cosine
FROM pairs WHERE cos_e6 >= {int(round(NEAR_DUP_THRESHOLD * 1_000_000))}
"""
