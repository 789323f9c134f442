"""Document deduplication (north-star extension; BASELINE.json).

Three scale-designed strategies over the ``documents`` table:

* **Exact** — hash-groupBy on md5(text): one shuffle on a 32-byte key,
  map-side partial agg. At 100 TB this is the canonical first pass.
* **Exact n-gram Jaccard** — all pairs with 3-shingle Jaccard ≥ τ via an
  inverted shingle index (explode → self-join on shingle → count common →
  |A∪B| from per-doc set sizes). No O(n²) pair enumeration: only docs
  sharing ≥1 shingle meet. Still quadratic in the worst case (a shingle
  shared by k docs yields k² join rows) — the LSH variant below is the
  100 TB path.
* **MinHash LSH** — k=32 minhashes (min over md5(seed|shingle)), banded
  8×4; docs sharing a band bucket become candidates; candidates are
  verified with the exact Jaccard. Shuffle volume is O(docs × bands), not
  O(pairs). Deterministic md5 hashing makes even this oracle-checkable in
  SQL — both engines compute identical signatures.

All variants are pure built-in expression pipelines (split / transform /
explode / groupBy) — no Python UDFs, whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div, round_div_expr
from demo_etl_spark.io import load_star

SHINGLE_WORDS = 3
JACCARD_THRESHOLD = 0.8
NUM_HASHES = 32
NUM_BANDS = 8  # 4 rows/band


def exact_dedup(documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """One row per distinct text: canonical (min) doc_id + copy count."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
        .select("text_hash", "doc_id", "n_copies", "n_chars")
    )


def _shingles(documents: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct — 3-word shingles from whitespace tokens."""
    tokens = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - SHINGLE_WORDS),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, SHINGLE_WORDS)),
    )
    # Guard: Spark's sequence(0, n-3) DESCENDS when n < 3 (DuckDB's range
    # is empty) — drop too-short docs before exploding.
    return (
        documents.filter(F.size(tokens) >= SHINGLE_WORDS)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact near-dup pairs: 3-shingle Jaccard ≥ threshold.

    Jaccard is compared in exact integer space:
    common / (|A|+|B|−common) ≥ τ  ⟺  common·100 ≥ τ·100·(|A|+|B|−common).
    """
    # the shingle set feeds three consumers (sizes, join-left, join-right):
    # persist so the split/explode runs once (C1 discipline, the reference's
    # fan-out persist — generate-asset.scala:47)
    sh = _shingles(documents).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # singleton shingles (document frequency 1) cannot contribute a pair —
    # prune them before the self-join; results are identical, join input
    # shrinks by the unique-shingle mass (most of it, on real corpora)
    shared = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("shingle")
    )
    sh_shared = sh.join(shared, "shingle")
    a = sh_shared.alias("a")
    b = sh_shared.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    t100 = int(round(threshold * 100))
    return (
        common.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_shingles": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_shingles": "nb"}), "doc_b")
        .filter(F.expr(f"common * 100 >= {t100} * (na + nb - common)"))
        .select(
            "doc_a",
            "doc_b",
            "common",
            (F.col("na") + F.col("nb") - F.col("common")).alias("union_size"),
            round_div("common", "na + nb - common", 6).alias("jaccard"),
        )
    )


def _minhash_signatures(sh: DataFrame) -> DataFrame:
    """32 md5-minhashes per doc in one grouped pass."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"s{s}")
        for s in range(NUM_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """LSH candidates (8 bands × 4 rows) verified with exact Jaccard."""
    sh = _shingles(documents).persist()  # consumed by sig, sizes, verify-join ×2
    sig = _minhash_signatures(sh)
    rows_per_band = NUM_HASHES // NUM_BANDS
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            )
            for b in range(NUM_BANDS)
        ]
    )
    buckets = sig.select(
        "doc_id", F.posexplode(bands).alias("band", "bucket")
    )
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # verify candidates with the exact Jaccard (shingle intersection count)
    common = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    t100 = int(round(threshold * 100))
    return (
        common.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_shingles": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_shingles": "nb"}), "doc_b")
        .filter(F.expr(f"common * 100 >= {t100} * (na + nb - common)"))
        .select(
            "doc_a",
            "doc_b",
            round_div("common", "na + nb - common", 6).alias("jaccard"),
        )
    )


def build_exact(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return exact_dedup(load_star(spark, sf_dir)["documents"], ctx)


def build_ngram(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return ngram_jaccard_pairs(load_star(spark, sf_dir)["documents"], ctx)


def build_minhash(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return minhash_lsh_pairs(load_star(spark, sf_dir)["documents"], ctx)


# --------------------------------------------------------------- oracles --
ORACLE_SQL_EXACT = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS doc_id,
       COUNT(*) AS n_copies,
       MIN(n_chars) AS n_chars
FROM documents
GROUP BY md5(text)
"""

_SHINGLE_SQL = f"""
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, len(string_split(text, ' ')) - {SHINGLE_WORDS - 2}),
           i -> array_to_string(string_split(text, ' ')[i:i+{SHINGLE_WORDS - 1}], ' ')
         )) AS shingle
  FROM documents
"""

_T100 = int(round(JACCARD_THRESHOLD * 100))

ORACLE_SQL_NGRAM = f"""
WITH sh AS ({_SHINGLE_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, common,
       sa.n + sb.n - common AS union_size,
       {round_div_expr("common", "sa.n + sb.n - common", 6, "duckdb")} AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE common * 100 >= {_T100} * (sa.n + sb.n - common)
"""


def _sig_cols_sql() -> str:
    return ",\n         ".join(
        f"MIN(md5('{s}|' || shingle)) AS s{s}" for s in range(NUM_HASHES)
    )


def _band_exprs_sql() -> list[str]:
    rpb = NUM_HASHES // NUM_BANDS
    return [
        "md5(" + " || '|' || ".join(f"s{b * rpb + r}" for r in range(rpb)) + ")"
        for b in range(NUM_BANDS)
    ]


_BANDS_SQL = ", ".join(
    f"({b}, {e})" for b, e in enumerate(_band_exprs_sql())
)

ORACLE_SQL_MINHASH = f"""
WITH sh AS ({_SHINGLE_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
sig AS (
  SELECT doc_id,
         {_sig_cols_sql()}
  FROM sh GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, b.band, b.bucket
  FROM sig, LATERAL (VALUES {_BANDS_SQL}) AS b(band, bucket)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       {round_div_expr("common", "sa.n + sb.n - common", 6, "duckdb")} AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE common * 100 >= {_T100} * (sa.n + sb.n - common)
"""


# ------------------------------------------------------------- SimHash ----
# 32-bit SimHash with 4×8-bit band LSH + exact Hamming verification.
# Token hashes are md5-derived (deterministic), so the DuckDB oracle
# reproduces signatures bit-for-bit.
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8 bits per band
HAMMING_MAX = 3


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash): per-doc 32-bit SimHash over tokens.

    Tokens are NOT deduplicated — bit votes are weighted by term
    frequency, which is what separates documents drawn from a small
    shared vocabulary (distinct-token SimHash collapses them)."""
    tokens = F.split(F.col("text"), " ")
    hashes = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    d = documents.select("doc_id", hashes.alias("_hashes"))

    def bit_vote(i: int):
        mask = 1 << i
        return F.aggregate(
            F.col("_hashes"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )

    sim = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sim = sim + F.when(bit_vote(i) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return d.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    documents: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    hamming_max: int = HAMMING_MAX,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ k via band-LSH candidates."""
    sig = simhash_signatures(documents)
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255))
            for b in range(SIMHASH_BANDS)
        ]
    )
    buckets = sig.select("doc_id", "simhash", F.posexplode(bands).alias("band", "val"))
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= hamming_max)
        .select("doc_a", "doc_b", "sim_a", "sim_b", "hamming")
    )


def build_simhash(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return simhash_pairs(load_star(spark, sf_dir)["documents"], ctx)


def _simhash_sql() -> str:
    votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hashes, h -> CASE WHEN (h >> {i}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) >= 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    bands = ", ".join(
        f"({b}, (simhash >> {8 * b}) & 255)" for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hashes
  FROM documents
),
sig AS (SELECT doc_id, {votes} AS simhash FROM d),
buckets AS (
  SELECT doc_id, simhash, b.band, b.val
  FROM sig, LATERAL (VALUES {bands}) AS b(band, val)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS sim_a, y.simhash AS sim_b
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, sim_a, sim_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= {HAMMING_MAX}
"""


ORACLE_SQL_SIMHASH = _simhash_sql()
