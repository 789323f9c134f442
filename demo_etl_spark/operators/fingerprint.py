"""Document fingerprinting — winnowing over rolling k-gram hashes.

Schleimer/Wilkerson/Aiken winnowing (SIGMOD'03, public algorithm): hash
every k-gram of a document, slide a window of W consecutive hashes, and
keep the minimum of each window. The selected set is a position-robust
fingerprint: any shared substring of length ≥ k + W − 1 between two
documents is guaranteed to contribute at least one common fingerprint,
at a ~2/(W+1) sampling density — the standard building block for
plagiarism / near-copy detection over a large corpus.

Spark shape: the ENTIRE computation is per-row array math inside
whole-stage codegen — tokenize → k-gram hashes (``transform`` over a
``sequence``) → window minima (``transform`` + ``array_min``/``slice``)
→ ``array_distinct`` — then one ``explode``. No shuffle at all for the
fingerprint extraction, so it scales embarrassingly at 100 TB (and the
downstream fingerprint⋈fingerprint candidate join, when wanted, reuses
the dedup family's df-capped inverted-index discipline).

Hashes are the engine-portable 40-bit md5 prefix used across the dedup
family (dedup.py HASH_HEX), so DuckDB reproduces the exact selection.
We take min-VALUE per window and dedupe (set semantics); ties across
overlapping windows collapse in the distinct, keeping both engines'
results identical without the rightmost-tie positional rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div, round_div_expr
from demo_etl_spark.io import load_star

FP_GRAM_WORDS = 4  # k: words per k-gram
WINNOW_WINDOW = 4  # W: consecutive k-gram hashes per winnow window
HASH_HEX = 10  # 40-bit md5-prefix hash (shared with dedup.HASH_HEX)

#: a doc needs ≥ k + W − 1 words to fill one winnow window
_MIN_WORDS = FP_GRAM_WORDS + WINNOW_WINDOW - 1


def _hashed_grams(documents: DataFrame) -> DataFrame:
    """(doc_id, _h): the rolling k-gram hash array, MATERIALIZED as its
    own projection. The winnow pass references ``_h`` several times
    (sequence bound + every window slice); were the hash chain left as
    one inline expression, Spark would recompute the whole md5 array
    per window position — O(n²) digests per doc (observed in the plan:
    the md5 lambda chain appeared once per referencing site). Behind an
    attribute boundary CollapseProject keeps the expensive alias
    un-inlined, so each doc hashes each k-gram exactly once.
    """
    tokens = F.split(F.col("text"), " ")
    # greatest() keeps the bound ≥ 0: Spark's sequence(0, n) DESCENDS for
    # n < 0 and the descending positions would crash slice(start=0). The
    # clamp never binds for rows that survive the ≥ _MIN_WORDS filter —
    # it exists so the expression is TOTAL even when the optimizer
    # evaluates it on not-yet-filtered rows (codegen subexpression
    # elimination runs hoisted exprs before the short-circuit AND).
    hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tokens) - FP_GRAM_WORDS, F.lit(0))),
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(tokens, i + 1, FP_GRAM_WORDS))),
                1,
                HASH_HEX,
            ),
            16,
            10,
        ).cast("long"),
    )
    return documents.filter(F.size(tokens) >= _MIN_WORDS).select(
        "doc_id", hashes.alias("_h")
    )


def _fps_of(h: Column) -> Column:
    """Distinct winnowed window-minima of a materialized hash array."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(h) - WINNOW_WINDOW, F.lit(0))),
            lambda p: F.array_min(F.slice(h, p + 1, WINNOW_WINDOW)),
        )
    )


def winnow_fingerprints(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """(doc_id, fp) — the distinct winnowed fingerprint set per doc.

    Docs shorter than k + W − 1 words have no full window and emit no
    rows (both engines filter identically before the sequence guard —
    Spark's ``sequence(0, n)`` DESCENDS for n < 0, DuckDB's ``range``
    is empty, so the filter is what keeps them aligned).
    """
    # explode_outer: plain explode makes InferFiltersFromGenerate push a
    # size(_fps) > 0 predicate below the projections, re-inlining the
    # whole hash pipeline into the Filter — the fps are then computed
    # TWICE per row (filter + project). The outer variant skips the
    # inference; post-filter docs always have ≥ 1 fingerprint, so the
    # results are identical.
    return (
        _hashed_grams(documents)
        .select("doc_id", _fps_of(F.col("_h")).alias("_fps"))
        .select("doc_id", F.explode_outer("_fps").alias("fp"))
    )


def fingerprint_profile(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-doc fingerprint summary — no explode, pure map-side:
    window count, selected-set size, and selection density
    (n_fps / n_windows, exact HALF_UP 4dp). The corpus-health view a
    curation pipeline monitors (density far above 2/(W+1) ⇒ highly
    repetitive hash landscape, e.g. boilerplate)."""
    return (
        _hashed_grams(documents)
        .select(
            "doc_id",
            (F.size("_h") - F.lit(WINNOW_WINDOW - 1)).cast("long").alias(
                "n_windows"
            ),
            F.size(_fps_of(F.col("_h"))).cast("long").alias("n_fps"),
        )
        .withColumn("density", round_div("n_fps", "n_windows", 4))
    )


def build_fingerprints(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return winnow_fingerprints(load_star(spark, sf_dir)["documents"], ctx)


def build_fingerprint_profile(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return fingerprint_profile(load_star(spark, sf_dir)["documents"], ctx)


# k-gram slice t[i : i+k-1] is 1-based inclusive in DuckDB; range() is
# exclusive-upper, mirroring Spark's sequence bound after the length
# filter. ``h`` is the rolling k-gram hash array, ``fps`` the distinct
# winnowed minima — the exact twins of _fp_array's two transforms.
_HASHES_SQL = f"""
  SELECT doc_id,
         list_transform(
           range(1, len(t) - {FP_GRAM_WORDS - 2}),
           i -> CAST('0x' || substr(
                  md5(array_to_string(t[i:i+{FP_GRAM_WORDS - 1}], ' ')),
                  1, {HASH_HEX}) AS BIGINT)
         ) AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= {_MIN_WORDS}
"""

_FPS_EXPR = (
    f"list_distinct(list_transform("
    f"range(1, len(h) - {WINNOW_WINDOW - 2}), "
    f"p -> list_min(h[p:p+{WINNOW_WINDOW - 1}])))"
)

ORACLE_SQL_FINGERPRINTS = f"""
SELECT doc_id, unnest({_FPS_EXPR}) AS fp
FROM ({_HASHES_SQL})
"""

ORACLE_SQL_FP_PROFILE = f"""
SELECT doc_id,
       CAST(len(h) - {WINNOW_WINDOW - 1} AS BIGINT) AS n_windows,
       CAST(len({_FPS_EXPR}) AS BIGINT) AS n_fps,
       {round_div_expr(f"len({_FPS_EXPR})", f"len(h) - {WINNOW_WINDOW - 1}", 4, "duckdb")} AS density
FROM ({_HASHES_SQL})
"""
