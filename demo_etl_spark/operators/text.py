"""Text analysis (north-star extension; BASELINE.json).

Per-document statistics, quality scoring, language ID and fingerprinting
over the ``documents`` table — all as built-in column expressions (split /
higher-order array functions / md5), no Python UDFs, so the hot path stays
in whole-stage codegen and the semantics are oracle-checkable in SQL.

* ``text_stats`` — token counting (whitespace tokenization + a BPE-ish
  subword regex), unique-token ratio, average token length, stopword
  ratio, a rolling-hash fingerprint and an md5 fingerprint of the
  normalized text. (The composite keep/drop quality gate composes these
  in operators/curation.py.)
* ``lang_id`` — marker-lexicon n-gram heuristic: counts hits against small
  per-language stopword lexicons and predicts the argmax (deterministic
  tie-break by language code). On the synthetic corpus every language
  shares one vocabulary, so predictions exercise *engine parity*, not
  linguistic accuracy — the oracle checks the computation is identical.
* ``lang_profile`` — per-(lang, source) corpus rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import (
    fixed_ratio,
    fixed_ratio_expr,
    round_div,
    round_div_expr,
)
from demo_etl_spark.io import load_star

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: tiny marker lexicons for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en": ("the", "and", "is", "of", "to", "a", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "un"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ta1"),
}


def text_stats(documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    tokens = F.split(F.col("text"), " ")
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    d = documents.withColumn("_tokens", tokens).withColumns(
        {
            "_n_tokens": F.size(tokens),
            "_n_unique": F.size(F.array_distinct(tokens)),
            "_token_chars": F.aggregate(
                F.transform(tokens, F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ),
            "_n_stop": F.size(
                F.expr(f"filter(_tokens, t -> t IN ({stop_list}))")
            ),
            # BPE-ish subword count: alnum runs (a crude stand-in for a
            # subword vocab; the regex is identical in Java and RE2)
            "_n_subtokens": F.regexp_count(F.col("text"), F.lit("[a-z0-9]+")),
            # rolling polynomial fingerprint over token values, mod 1e9+7
            "_roll_vals": F.transform(
                tokens,
                lambda t: (F.length(t) * 31 + F.ascii(F.substring(t, 1, 1))).cast(
                    "long"
                ),
            ),
        }
    ).withColumn(
        "_rolling_fp",
        F.aggregate(
            F.col("_roll_vals"),
            F.lit(0).cast("long"),
            lambda acc, v: (acc * 131 + v) % 1_000_000_007,
        ),
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.col("_n_tokens").alias("n_tokens"),
        F.col("_n_unique").alias("n_unique_tokens"),
        round_div("CAST(_token_chars AS BIGINT)", "_n_tokens", 2).alias(
            "avg_token_len"
        ),
        round_div("CAST(_n_unique AS BIGINT)", "_n_tokens", 6).alias(
            "type_token_ratio"
        ),
        round_div("CAST(_n_stop AS BIGINT)", "_n_tokens", 6).alias(
            "stopword_ratio"
        ),
        F.col("_n_subtokens").cast("int").alias("n_subtokens"),
        F.col("_rolling_fp").alias("rolling_fp"),
        # ASCII-only case fold via translate(): full lower() diverges
        # across engines on Unicode case-folding traps (Java maps U+0130
        # 'İ' to 'i'+combining-dot, utf8proc simple-maps it to 'i'), so
        # the normalized fingerprint folds [A-Z] only — per-codepoint
        # translate() semantics are identical in Java and DuckDB.
        F.md5(
            F.trim(
                F.translate(
                    F.col("text"),
                    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                    "abcdefghijklmnopqrstuvwxyz",
                )
            )
        ).alias("fingerprint"),
    )


def lang_id(documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Argmax of marker-lexicon hit counts; ties break on language code."""
    tokens = F.split(F.col("text"), " ")
    d = documents.withColumn("_tokens", tokens)
    hits = {}
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        hits[f"_hits_{lang}"] = F.expr(f"size(filter(_tokens, t -> t IN ({lst})))")
    d = d.withColumns(hits)
    # argmax via greatest + chained when (deterministic: first lang code wins)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(F.col(f"_hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    return d.select(
        "doc_id",
        "lang",
        *[F.col(f"_hits_{lang}").alias(f"hits_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("is_correct"),
    )


def lang_profile(documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    tokens = F.split(F.col("text"), " ")
    return (
        documents.withColumn("_n_tokens", F.size(tokens))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("_n_tokens").cast("long")).alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .withColumn(
            "avg_tokens_per_doc", round_div("total_tokens", "n_docs", 2)
        )
    )


def build_stats(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return text_stats(load_star(spark, sf_dir)["documents"], ctx)


def build_lang_id(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return lang_id(load_star(spark, sf_dir)["documents"], ctx)


def build_profile(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    return lang_profile(load_star(spark, sf_dir)["documents"], ctx)


# --------------------------------------------------------------- oracles --
_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

ORACLE_SQL_STATS = f"""
WITH d AS (
  SELECT doc_id, lang, source, n_chars, text,
         string_split(text, ' ') AS toks,
         md5(trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            'abcdefghijklmnopqrstuvwxyz'))) AS fingerprint
  FROM documents
), e AS (
  SELECT doc_id, lang, source, n_chars, fingerprint,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique_tokens,
         CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS token_chars,
         CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop,
         CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_subtokens,
         CASE WHEN text IS NULL THEN NULL ELSE list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(toks, t -> CAST(length(t) * 31 + ascii(substr(t, 1, 1)) AS BIGINT))),
           (acc, v) -> (acc * 131 + v) % 1000000007
         ) END AS rolling_fp
  FROM d
)
SELECT doc_id, lang, source, n_chars, n_tokens, n_unique_tokens,
       {round_div_expr("token_chars", "n_tokens", 2, "duckdb")} AS avg_token_len,
       {round_div_expr("CAST(n_unique_tokens AS BIGINT)", "n_tokens", 6, "duckdb")} AS type_token_ratio,
       {round_div_expr("n_stop", "n_tokens", 6, "duckdb")} AS stopword_ratio,
       n_subtokens,
       rolling_fp,
       fingerprint
FROM e
"""


def _lang_id_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    hit_cols = ",\n         ".join(
        "CAST(len(list_filter(toks, t -> t IN ({}))) AS INTEGER) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    greatest = "GREATEST(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    pred = "CASE "
    for lang in langs:
        pred += f"WHEN hits_{lang} = {greatest} THEN '{lang}' "
    pred += "END"
    return f"""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), h AS (
  SELECT doc_id, lang,
         {hit_cols}
  FROM d
)
SELECT doc_id, lang, {", ".join(f"hits_{lang}" for lang in langs)},
       {pred} AS predicted_lang,
       ({pred}) = lang AS is_correct
FROM h
"""


ORACLE_SQL_LANG_ID = _lang_id_oracle()

ORACLE_SQL_PROFILE = f"""
WITH d AS (
  SELECT lang, source, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       {round_div_expr("CAST(SUM(n_tokens) AS BIGINT)", "COUNT(*)", 2, "duckdb")} AS avg_tokens_per_doc
FROM d
GROUP BY lang, source
"""


# ------------------------------------------------- vocabulary top-k ----
VOCAB_TOP_K = 100


def vocab_topk(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT, k: int = VOCAB_TOP_K
) -> DataFrame:
    """Corpus-wide token frequencies, top-k — the vocabulary-building
    pass of a tokenizer pipeline. The heavy stage is the explode +
    count (one shuffle on the token); the top-k itself plans as
    ``TakeOrderedAndProject`` (per-partition heaps + driver merge of k
    rows, NOT a global sort — the plan that survives a 1e8-token
    vocabulary). The rank window runs over the k surviving rows only.
    Deterministic: count DESC with token tie-break."""
    from pyspark.sql import Window

    counts = (
        documents.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "token", "n"
    )


def build_vocab(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return vocab_topk(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_VOCAB = f"""
WITH counts AS (
  SELECT t.token, COUNT(*) AS n
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INTEGER) AS rank,
       token, n
FROM counts
ORDER BY n DESC, token
LIMIT {VOCAB_TOP_K}
"""


# -------------------------------------------- intra-doc repetition ----
#: flag threshold: >30% duplicated 3-gram mass (the classic repetition
#: quality gate for generated/boilerplate text)
REPETITION_PCT = 30
_REP_NGRAM = 3


def repetition_stats(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-document internal repetition — the quality signal that catches
    looping generations and boilerplate: the fraction of 3-gram
    occurrences that are duplicates of an earlier 3-gram in the SAME
    document. Computed entirely inside the row's token array (transform
    + array_distinct — no explode, no shuffle: a map-only pass that
    scales linearly and composes with the corpus-level dedup family,
    which only sees distinct shingles and is blind to this). The
    keep/drop flag compares in cross-multiplied integer space."""
    tokens = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - _REP_NGRAM),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, _REP_NGRAM)),
    )
    return (
        documents.filter(F.size(tokens) >= _REP_NGRAM)
        .select(
            "doc_id",
            "lang",
            F.size(sh).alias("n_shingles"),
            F.size(F.array_distinct(sh)).alias("n_unique"),
        )
        .select(
            "doc_id",
            "lang",
            "n_shingles",
            "n_unique",
            round_div("n_shingles - n_unique", "n_shingles", 6).alias("dup_ratio"),
            (
                (F.col("n_shingles") - F.col("n_unique")) * 100
                >= REPETITION_PCT * F.col("n_shingles")
            ).alias("is_repetitive"),
        )
    )


def build_repetition(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return repetition_stats(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_REPETITION = f"""
WITH sh AS (
  SELECT doc_id, lang,
         list_transform(
           range(1, len(string_split(text, ' ')) - {_REP_NGRAM - 2}),
           i -> array_to_string(string_split(text, ' ')[i:i+{_REP_NGRAM - 1}], ' ')
         ) AS shingles
  FROM documents
  WHERE len(string_split(text, ' ')) >= {_REP_NGRAM}
),
counted AS (
  SELECT doc_id, lang,
         CAST(len(shingles) AS INTEGER) AS n_shingles,
         CAST(len(list_distinct(shingles)) AS INTEGER) AS n_unique
  FROM sh
)
SELECT doc_id, lang, n_shingles, n_unique,
       {round_div_expr("n_shingles - n_unique", "n_shingles", 6, "duckdb")} AS dup_ratio,
       (n_shingles - n_unique) * 100 >= {REPETITION_PCT} * n_shingles AS is_repetitive
FROM counted
"""


# -------------------------------------------------- chunking ----------
#: overlapping token-window chunking — the pre-tokenization step of a
#: training-data pipeline: every document becomes fixed-size windows
#: with stride overlap so no span is lost at a boundary.
# ----------------------------------------- per-source corpus profile ----
def source_profile(documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Corpus health dashboard per source: volume, token totals, and
    EXACT interpolated length percentiles (p10/p50/p90) — the
    mixture-weighting input of a training-data pipeline (how much of
    each source, how long are its documents, where do the length
    filters bite). Percentiles via functions/distrank
    ``exact_percentiles_grouped`` — a per-source rank window + exact
    integer bracket interpolation instead of the ``percentile``
    aggregate, so no per-group value buffer exists to break when one
    source holds billions of docs; the oracle pins the identical
    rank-bracket formula in SQL."""
    from demo_etl_spark.functions.distrank import exact_percentiles_grouped

    n_tokens = F.size(F.split(F.col("text"), " "))
    # NOTE (r14): checkpointing this projection was tried and measured
    # SLOWER (1.01 s → 1.35 s) — the subtree below the fan-out is
    # map-only off the cached scan, so it fuses into each consumer's
    # first stage for free while the checkpoint pays a write barrier.
    base = documents.select(
        "source", n_tokens.cast("long").alias("_nt"), F.col("n_chars")
    )
    tot = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
    )
    # percentiles over KNOWN lengths only: a NULL-text doc has no length,
    # and a NULL rank value lands in different bracket rows per engine
    # (r7 hostile repro — scrambled p10/p90). The totals keep counting
    # every doc; the left join keeps a source even if all its texts are
    # NULL (percentiles NULL, volume still reported).
    pct = exact_percentiles_grouped(
        base.filter(F.col("_nt").isNotNull()), ["source"], "_nt",
        [10, 50, 90], ["p10_tokens", "p50_tokens", "p90_tokens"],
    )
    return tot.join(F.broadcast(pct), "source", "left").select(
        "source",
        "n_docs",
        "total_tokens",
        "total_chars",
        round_div("total_tokens", "n_docs", 2).alias("avg_tokens"),
        "p10_tokens",
        "p50_tokens",
        "p90_tokens",
    )


def build_source_profile(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return source_profile(load_star(spark, sf_dir)["documents"], ctx)


def source_profile_approx(
    documents: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    accuracy: int = 10_000,
) -> DataFrame:
    """``source_profile``'s documented 100 TB swap, made EXECUTABLE and
    registered (VERDICT r7 #6): length percentiles via Spark's
    ``percentile_approx`` (Greenwald-Khanna sketch, mergeable map-side
    partial state) instead of the exact rank-bracket plan — the whole
    profile collapses to ONE aggregation with no rank window at all.
    The sketch is deterministic given (data, accuracy) but its state is
    engine-specific, so the driver check is rows-only (the sketch
    family's declared oracle exception); tests/test_approx.py pins the
    estimate against the exact profile's interpolated percentiles."""
    n_tokens = F.size(F.split(F.col("text"), " "))
    base = documents.select(
        "source", n_tokens.cast("long").alias("_nt"), F.col("n_chars")
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        # percentile_approx skips NULLs — same known-lengths-only rule
        # as the exact profile's rank filter
        F.percentile_approx("_nt", [0.1, 0.5, 0.9], accuracy).alias("_p"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        "total_chars",
        round_div("total_tokens", "n_docs", 2).alias("avg_tokens"),
        F.get("_p", 0).alias("p10_tokens"),
        F.get("_p", 1).alias("p50_tokens"),
        F.get("_p", 2).alias("p90_tokens"),
    )


def build_source_profile_approx(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return source_profile_approx(load_star(spark, sf_dir)["documents"], ctx)


def _source_profile_oracle() -> str:
    from demo_etl_spark.functions.distrank import percentile_select_sql

    pct = percentile_select_sql(
        "(SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) "
        "AS nt FROM documents WHERE text IS NOT NULL)",
        ["source"], "nt", [10, 50, 90],
        ["p10_tokens", "p50_tokens", "p90_tokens"],
    )
    return f"""
WITH tot AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
),
pct AS ({pct})
SELECT source, n_docs, total_tokens, total_chars,
       {round_div_expr("total_tokens", "n_docs", 2, "duckdb")} AS avg_tokens,
       p10_tokens, p50_tokens, p90_tokens
FROM tot LEFT JOIN pct USING (source)
"""


ORACLE_SQL_SOURCE_PROFILE = _source_profile_oracle()


CHUNK_SIZE = 32
CHUNK_STRIDE = 24
CHUNK_MIN_TOKENS = 8
# the effective tail filter after the coverage clamp (see chunk_documents);
# the oracle interpolates THIS value so the two sides cannot silently
# diverge when the constants change (8 == 32−24 is a coincidence, not a law)
CHUNK_MIN_EFF = max(0, min(CHUNK_MIN_TOKENS, CHUNK_SIZE - CHUNK_STRIDE))


def chunk_documents(
    documents: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    min_tokens: int = CHUNK_MIN_TOKENS,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    All JVM-side: split → sequence of window starts → explode → slice.
    One narrow explode (≤ n_tokens/stride rows per doc, no shuffle at
    all until a downstream agg), so the op is embarrassingly parallel
    at 100 TB — exactly as many output rows as chunks, with no
    intermediate per-token blowup. Tail windows shorter than
    ``min_tokens`` are dropped unless they are the document's only
    chunk (a short doc is still one chunk).

    Coverage guarantee: every token appears in ≥1 kept chunk. A dropped
    tail's tokens are inside the previous window only when
    ``stride + min_tokens ≤ size``, so ``min_tokens`` is clamped to
    ``size − stride`` (hypothesis-found boundary: size=4, stride=2,
    min=4 silently lost the last token).
    """
    min_tokens = max(0, min(min_tokens, size - stride))
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    d = (
        documents.select(
            "doc_id", "lang", "source", toks.alias("_toks"),
            F.explode(starts).alias("start_token"),
        )
        .withColumn("_chunk", F.slice("_toks", F.col("start_token") + 1, size))
        .withColumn("chunk_n_tokens", F.size("_chunk"))
        .filter(
            (F.col("chunk_n_tokens") >= min_tokens)
            | (F.col("start_token") == 0)
        )
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        (F.col("start_token") / stride).cast("int").alias("chunk_index"),
        "start_token",
        F.col("chunk_n_tokens").cast("int").alias("chunk_n_tokens"),
        F.md5(F.array_join("_chunk", " ")).alias("chunk_hash"),
    )


def build_chunks(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return chunk_documents(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_CHUNKS = f"""
WITH toks AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS t
  FROM documents
),
windows AS (
  SELECT doc_id, lang, source, t,
         unnest(generate_series(0, greatest(len(t) - 1, 0),
                                {CHUNK_STRIDE})) AS start_token
  FROM toks
),
chunks AS (
  SELECT doc_id, lang, source, start_token,
         list_slice(t, start_token + 1,
                    start_token + {CHUNK_SIZE}) AS chunk
  FROM windows
)
SELECT doc_id, lang, source,
       CAST(start_token / {CHUNK_STRIDE} AS INT) AS chunk_index,
       start_token,
       CAST(len(chunk) AS INT) AS chunk_n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_hash
FROM chunks
WHERE len(chunk) >= {CHUNK_MIN_EFF} OR start_token = 0
"""

# --------------------------------------------- noise / PII scan ---------
#: patterns chosen for verified Java-regex ⇔ RE2 count parity (simple
#: classes and quantifiers only — no lookaround, no backrefs)
NOISE_PATTERNS = {
    # explicit whitespace class, NOT [^\s]: Java's \s includes vertical
    # tab \x0B, RE2's is [\t\n\f\r ] only — a URL containing \x0B would
    # end the match in Spark and continue in DuckDB (r10 review; the
    # hostile corpus pins the character)
    "n_urls": "https?://[^ \\t\\n\\x0B\\f\\r]+",
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_digit_runs": r"[0-9]+",
}


def noise_scan(documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Per-document noise/PII indicator counts (URLs, e-mail addresses,
    digit runs) plus the derived noise ratio — the redaction/filter
    trigger of a web-scraped corpus pipeline. Map-only JVM regex
    (``regexp_count``); the patterns are restricted to constructs whose
    match COUNTS are verified identical between Java regex and RE2, so
    even this scan sits under the cross-engine hash gate."""
    d = documents
    for col, pat in NOISE_PATTERNS.items():
        d = d.withColumn(col, F.regexp_count(F.col("text"), F.lit(pat)).cast("int"))
    n_tokens = F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        "lang",
        "source",
        *NOISE_PATTERNS.keys(),
        n_tokens.alias("n_tokens"),
        (
            (F.col("n_urls") + F.col("n_emails")) * 100 >= n_tokens
        ).alias("is_noisy"),  # ≥1 link/address per 100 tokens
    )


def build_noise_scan(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return noise_scan(load_star(spark, sf_dir)["documents"], ctx)


def _noise_oracle() -> str:
    # NOISE_PATTERNS backslashes embed RAW in DuckDB single-quoted
    # strings (escape-free) — do NOT add escaping here
    cols = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS {col}"
        for col, pat in NOISE_PATTERNS.items()
    )
    return f"""
SELECT doc_id, lang, source,
       {cols},
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       (len(regexp_extract_all(text, '{NOISE_PATTERNS["n_urls"]}'))
        + len(regexp_extract_all(text, '{NOISE_PATTERNS["n_emails"]}'))) * 100
         >= len(string_split(text, ' ')) AS is_noisy
FROM documents
"""


ORACLE_SQL_NOISE = _noise_oracle()



# ------------------------------------------------- keyword extraction ----
TOP_TERMS_K = 5


def doc_top_terms(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT, k: int = TOP_TERMS_K
) -> DataFrame:
    """Per-document distinctive terms — the keyword-extraction pass of a
    corpus indexing pipeline. Terms rank by (tf DESC, df ASC, token):
    the lexicographic integer surrogate of tf·idf — a higher tf always
    wins, corpus-rarer terms break tf ties — chosen over ln-idf scores
    so the ranking is EXACT integer math in both engines (a float idf
    product can flip ranks across engines in the last ulp; at scale the
    float tf·idf is a fine swap when scores, not audited ranks, are the
    product).

    Plan: explode → (doc, token) partial+final count, token-keyed join
    to document frequencies, then one shuffle on doc_id where Spark 4's
    WindowGroupLimit keeps only k rows per doc below the final sort."""
    from pyspark.sql import Window

    # tf feeds BOTH the join's left side and the document-frequency
    # aggregate — without the eager checkpoint the explode → (doc,
    # token) partial+final count pipeline (the expensive subtree: a
    # full corpus explode plus a shuffle) ran once per consumer (r14;
    # the shared subtree contains a shuffle+agg, the class where the
    # checkpoint barrier wins — see OPTIMIZATION_r14.md).
    tf = (
        documents.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(dfreq, "token")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tf", "df")
    )


def build_top_terms(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return doc_top_terms(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_TOP_TERMS = f"""
WITH tf AS (
  SELECT doc_id, t.token, COUNT(*) AS tf
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  GROUP BY 1, 2
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
SELECT doc_id,
       CAST(row_number() OVER w AS INTEGER) AS rank,
       token, tf, df
FROM tf JOIN dfreq USING (token)
WINDOW w AS (PARTITION BY doc_id ORDER BY tf DESC, df ASC, token)
QUALIFY row_number() OVER w <= {TOP_TERMS_K}
"""


# ---------------------------------------------- BPE pair statistics ----
BPE_TOP_K = 50


def bpe_pair_counts(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT, k: int = BPE_TOP_K
) -> DataFrame:
    """Corpus-weighted adjacent character-pair frequencies — the counting
    step of one BPE merge iteration (the merge rule picks the top pair;
    iterate re-counts after each merge). Shape matters at 100 TB: the
    corpus first collapses to its WORD VOCABULARY (one groupBy), and
    pairs explode from vocabulary entries weighted by word frequency —
    pair work scales with |vocab|, not corpus tokens. Top-k plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    from pyspark.sql import Window

    words = (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
    )
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair"),
        "wn",
    )
    counts = pairs.groupBy("pair").agg(F.sum("wn").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("pair")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w)).select("rank", "pair", "n")


def build_bpe_pairs(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return bpe_pair_counts(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_BPE_PAIRS = f"""
WITH words AS (
  SELECT t.w AS w, COUNT(*) AS wn
  FROM documents, unnest(string_split(text, ' ')) AS t(w)
  GROUP BY 1
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair,
         wn
  FROM words WHERE length(w) >= 2
),
counts AS (SELECT pair, CAST(SUM(wn) AS BIGINT) AS n FROM pairs GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER) AS rank,
       pair, n
FROM counts
ORDER BY n DESC, pair
LIMIT {BPE_TOP_K}
"""


# ------------------------------------------------ lang-ID confusion -----
def lang_confusion(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Confusion matrix of the lang-ID heuristic against the corpus's
    lang metadata — the in-engine accuracy audit (the classifier twin
    of similarity_ann_recall's recall audit): (actual, predicted,
    n_docs, share-of-actual). A drifting cell fails the correctness
    gate before the mislabeled data reaches training. Reuses lang_id's
    single-pass scoring; the rollup is a tiny aggregate."""
    from pyspark.sql import Window

    preds = lang_id(documents, ctx).select("lang", "predicted_lang")
    counts = preds.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return counts.withColumn(
        "_lang_total", F.sum("n_docs").over(w)
    ).select(
        "lang",
        "predicted_lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        round_div("n_docs", "_lang_total", 4).alias("share_of_actual"),
    )


def build_lang_confusion(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return lang_confusion(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_LANG_CONFUSION = f"""
WITH pred AS ({ORACLE_SQL_LANG_ID}),
c AS (
  SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT lang, predicted_lang, n_docs,
       {round_div_expr("n_docs", "CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)", 4, "duckdb")} AS share_of_actual
FROM c
"""


# ------------------------------------------- length outlier gate --------
IQR_K = 1.5  # Tukey fence multiplier


def length_outliers(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Tukey-fence length outlier gate: docs outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR] of the corpus token-length
    distribution are flagged (too-short fragments / concatenation
    blobs — the robust alternative to fixed min/max length cutoffs,
    self-calibrating per corpus). Corpus q1/q3 come from
    functions/distrank ``exact_percentiles_global`` — a distributed
    rank-bracket computation (the previous single-partition unbounded
    percentile window put the whole corpus through one task); the
    1-row fence frame broadcasts back, and the flag comparison happens
    on doubles both engines derive from the same exact integers. Emits
    EVERY doc with its flag — the audit view a gate filters on (and the
    oracle hash then pins all lengths, both fences and every flag, not
    just a possibly-empty outlier set — the generated corpus has
    none)."""
    from demo_etl_spark.functions.distrank import exact_percentiles_global

    n_tokens = F.size(F.split(F.col("text"), " "))
    # NOTE (r14): checkpointing this projection was tried and measured
    # neutral-to-slower (map-only subtree off the cached scan — fuses
    # into each consumer's first stage for free; see source_profile).
    d = documents.select(
        "doc_id", "source", n_tokens.cast("long").alias("n_tokens")
    )
    fences = exact_percentiles_global(d, "n_tokens", [25, 75], ["_q1", "_q3"])
    return (
        d.join(F.broadcast(fences))
        .withColumn("lo_fence", F.expr(f"_q1 - {IQR_K} * (_q3 - _q1)"))
        .withColumn("hi_fence", F.expr(f"_q3 + {IQR_K} * (_q3 - _q1)"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "lo_fence",
            "hi_fence",
            (
                (F.col("n_tokens") < F.col("lo_fence"))
                | (F.col("n_tokens") > F.col("hi_fence"))
            ).alias("is_outlier"),
        )
    )


def build_length_outliers(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return length_outliers(load_star(spark, sf_dir)["documents"], ctx)


def _length_outliers_fences_sql() -> str:
    from demo_etl_spark.functions.distrank import percentile_select_sql

    return percentile_select_sql("d", [], "n_tokens", [25, 75], ["q1", "q3"])


ORACLE_SQL_LENGTH_OUTLIERS = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
f AS ({_length_outliers_fences_sql()})
SELECT d.doc_id, d.source, d.n_tokens,
       f.q1 - {IQR_K} * (f.q3 - f.q1) AS lo_fence,
       f.q3 + {IQR_K} * (f.q3 - f.q1) AS hi_fence,
       (d.n_tokens < f.q1 - {IQR_K} * (f.q3 - f.q1)
        OR d.n_tokens > f.q3 + {IQR_K} * (f.q3 - f.q1)) AS is_outlier
FROM d, f
"""


# --------------------------------------------- PII redaction ------------
def redact_pii(documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    """Rewrite URLs and e-mail addresses to ``[URL]`` / ``[EMAIL]``
    placeholder tokens — the redaction pass that follows ``noise_scan``'s
    trigger in a web-corpus pipeline. URLs replace first (an address
    inside a URL's userinfo must not survive as a partial match);
    counts are taken pre-replacement. Map-only JVM ``regexp_replace``
    over the same parity-verified pattern set as the scan — replacement
    needs identical match SPANS across engines, which these patterns'
    simple greedy character-class shapes guarantee (no alternation, no
    lookaround), so the rewritten text itself sits under the hash gate.
    Digit runs are counted but NOT redacted: numerals are content, not
    PII, and destroying them would corrupt training text."""
    url_pat, email_pat = NOISE_PATTERNS["n_urls"], NOISE_PATTERNS["n_emails"]
    return documents.select(
        "doc_id",
        "lang",
        "source",
        F.regexp_count(F.col("text"), F.lit(url_pat)).cast("int").alias("n_urls"),
        F.regexp_count(F.col("text"), F.lit(email_pat)).cast("int").alias("n_emails"),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), url_pat, "[URL]"),
            email_pat,
            "[EMAIL]",
        ).alias("redacted_text"),
    )


def build_redacted(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return redact_pii(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_REDACTED = f"""
SELECT doc_id, lang, source,
       CAST(len(regexp_extract_all(text, '{NOISE_PATTERNS["n_urls"]}'))
            AS INTEGER) AS n_urls,
       CAST(len(regexp_extract_all(text, '{NOISE_PATTERNS["n_emails"]}'))
            AS INTEGER) AS n_emails,
       regexp_replace(
         regexp_replace(text, '{NOISE_PATTERNS["n_urls"]}', '[URL]', 'g'),
         '{NOISE_PATTERNS["n_emails"]}', '[EMAIL]', 'g') AS redacted_text
FROM documents
"""


# --------------------------------------------- PMI collocations --------
#: minimum bigram count for a collocation candidate (kills hapax noise)
PMI_MIN_SUPPORT = 3
#: manifest size of the phrase-vocabulary candidate list
PMI_TOPK = 50


def pmi_collocations(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Corpus-level collocation mining: top-``PMI_TOPK`` adjacent token
    pairs by pointwise-mutual-information *ratio* — the phrase-vocabulary
    builder of a tokenizer pipeline (word2vec-style phrase merging,
    "new york" → "new_york").

    PMI = log[ P(ab) / (P(a)·P(b)) ]; log is monotone, so ranking (and
    the emitted score) uses the ratio ``c_ab·Nt² / (Nb·c_a·c_b)`` in
    4dp fixed point, computed as ONE floor division in wide integers —
    Spark DECIMAL(38,0) vs DuckDB HUGEINT, both exact — because every
    BIGINT staging of the formula hits 2⁶³ long before a real corpus
    does (the single-formula numerator at Nt ≈ 5·10⁴; the previous
    two-stage split at Nt ≈ 3·10⁷, since s1 ≤ Nt·10⁴ makes s1·Nt ≈
    10⁴·Nt²). In 38-digit space the numerator ``c_ab·Nt²·10⁴`` stays
    exact to Nt ≈ 10¹⁰ tokens (c_ab ≤ Nt ⇒ ≤ 10⁴·Nt³ < 10³⁸), and the
    emitted quotient is ≤ Nt·10⁴ < 2⁶³, so the LONG it lands in cannot
    wrap. Spark's ``div`` and DuckDB's ``//`` floor identically on
    non-negative wide integers — bit-identical across engines. Unigram
    counts come from the token stream (Nt tokens), bigram counts from
    within-document adjacent pairs (Nb pairs, no cross-document pairs).

    Plan shape: two explode→groupBy count passes over the corpus (the
    vocab_topk shape), two broadcast-sized joins of the bigram candidates
    against the unigram counts, and a TakeOrderedAndProject top-k — no
    global sort. The wide-integer ratio is a per-candidate scalar over
    broadcast grand totals — no per-row cost change at 100 TB.
    """
    toks = F.split(F.col("text"), " ")
    d = documents.select(toks.alias("_toks"))
    uni = (
        d.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_tok"))
        # r14: vocab-sized and referenced by BOTH broadcast joins below —
        # the static planner re-ran the token explode+count pass once per
        # reference; the eager checkpoint bounds it to one pass
        .localCheckpoint(eager=True)
    )
    a_part = F.slice(F.col("_toks"), F.lit(1), F.size("_toks") - 1)
    b_part = F.slice(F.col("_toks"), F.lit(2), F.size("_toks") - 1)
    bg = (
        d.select(
            F.explode(
                F.zip_with(
                    a_part,
                    b_part,
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("token_a"), F.col("p.b").alias("token_b"))
    )
    bgc = (
        bg.groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_SUPPORT)
    )
    # r14: the grand totals are derivable from the token-array SIZES in
    # one row-level agg over the persisted scan — Nt = Σ size(_toks)
    # (explode emits one row per array element, NULL arrays emit none)
    # and Nb = Σ (size(_toks) − 1) (one adjacent pair per element after
    # the first; split() never yields an empty array, so size ≥ 1). The
    # former bg.count() × uni.sum() spelling re-ran BOTH explode+count
    # pipelines a second time just to read their row counts. Values are
    # identical on any non-degenerate corpus; on an all-NULL/empty one
    # the totals differ only as NULL-vs-0, where bgc is empty and the
    # output is empty either way.
    totals = d.agg(
        F.sum(
            F.when(F.col("_toks").isNull(), F.lit(0))
            .otherwise(F.size("_toks") - 1)
        ).alias("_nb"),
        F.sum(
            F.when(F.col("_toks").isNull(), F.lit(0))
            .otherwise(F.size("_toks"))
        ).alias("_nt"),
    )
    scored = (
        bgc.join(
            F.broadcast(uni.withColumnRenamed("c_tok", "c_a")),
            bgc.token_a == F.col("token"),
        )
        .drop("token")
        .join(
            F.broadcast(
                uni.select(
                    F.col("token").alias("_tb"), F.col("c_tok").alias("c_b")
                )
            ),
            F.col("token_b") == F.col("_tb"),
        )
        .drop("_tb")
        .join(F.broadcast(totals))
        .withColumn(
            "assoc",
            F.expr(
                "CAST((CAST(c_ab AS DECIMAL(38,0)) * _nt * _nt * 10000) div "
                "(CAST(c_a AS DECIMAL(38,0)) * c_b * _nb) AS DOUBLE) / 10000"
            ),
        )
    )
    return (
        scored.select("token_a", "token_b", "c_ab", "c_a", "c_b", "assoc")
        .orderBy(F.desc("assoc"), "token_a", "token_b")
        .limit(PMI_TOPK)
    )


def build_pmi_collocations(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return pmi_collocations(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_PMI = f"""
WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
uni AS (
  SELECT u.t AS token, COUNT(*) AS c_tok
  FROM toks, unnest(ts) AS u(t)
  GROUP BY 1
),
bg AS (
  SELECT ts[g.i - 1] AS token_a, ts[g.i] AS token_b
  FROM toks, unnest(generate_series(2, len(ts))) AS g(i)
),
bgc AS (
  SELECT token_a, token_b, COUNT(*) AS c_ab
  FROM bg GROUP BY token_a, token_b
  HAVING COUNT(*) >= {PMI_MIN_SUPPORT}
),
tot AS (
  SELECT (SELECT SUM(c_tok) FROM uni) AS nt,
         (SELECT COUNT(*) FROM bg) AS nb
)
SELECT token_a, token_b, c_ab, ua.c_tok AS c_a, ub.c_tok AS c_b,
       CAST(CAST((CAST(c_ab AS HUGEINT) * nt * nt * 10000)
                 // (CAST(ua.c_tok AS HUGEINT) * ub.c_tok * nb)
                 AS BIGINT) AS DOUBLE) / 10000 AS assoc
FROM bgc
JOIN uni ua ON bgc.token_a = ua.token
JOIN uni ub ON bgc.token_b = ub.token, tot
ORDER BY assoc DESC, token_a, token_b
LIMIT {PMI_TOPK}
"""


# ------------------------------------------------- doc typicality -------
def doc_typicality(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-document TYPICALITY: the mean corpus term-frequency of the
    doc's tokens, exact-integer (×100). The curation signal that
    separates boilerplate (every token common → high score) from OCR
    garbage / code / wrong-language text (rare tokens → low score)
    without a trained LM — the integer-exact stand-in for perplexity
    filtering (log-prob scores are transcendental floats and therefore
    hash-fragile cross-engine; a frequency mean is a ratio of exact
    BIGINTs).

    Plan shape at 100 TB: the term-frequency table is vocab-sized (≪
    corpus) and usually broadcastable — AQE picks BHJ at runtime;
    otherwise tokens⋈tf co-shuffles ON TOKEN once and the per-doc
    groupBy re-shuffles on doc_id with map-side combine. Nothing is
    quadratic and no window exists at all. NULL text is a 1-token ('')
    doc; duplicate doc_ids merge into one scored row — deterministic on
    both engines (grouping, not windows).
    """
    tok = documents.select(
        "doc_id",
        "source",
        F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("token"),
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return (
        tok.join(tf, "token")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("freq").cast("long").alias("sum_token_freq"),
            fixed_ratio("sum(freq)", "count(*)", 2).alias(
                "avg_token_freq_x100"
            ),
        )
    )


def build_doc_typicality(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return doc_typicality(load_star(spark, sf_dir)["documents"], ctx)


# CAST discipline (round 8): SUM over BIGINT freq is HUGEINT in DuckDB —
# fetch-fragile — so every aggregate output is explicitly cast.
ORACLE_SQL_DOC_TYPICALITY = f"""
WITH tok AS (
  SELECT doc_id, source, u.t AS token
  FROM documents, unnest(string_split(COALESCE(text, ''), ' ')) AS u(t)
),
tf AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token)
SELECT t.doc_id, t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(f.freq) AS BIGINT) AS sum_token_freq,
       {fixed_ratio_expr("SUM(f.freq)", "COUNT(*)", 2, "duckdb")}
         AS avg_token_freq_x100
FROM tok t JOIN tf f ON t.token = f.token
GROUP BY t.doc_id, t.source
"""


def doc_surprisal_bits(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-document SURPRISAL in whole bits — the log-domain quality
    twin of ``doc_typicality``: Σ over the doc's token occurrences of
    (⌊log₂ N⌋ − ⌊log₂ tf⌋), N the corpus token-occurrence total and tf
    the token's corpus count. Rare tokens dominate (each contributes up
    to ~⌊log₂ N⌋ bits) — the shape of a unigram-LM negative
    log-likelihood, which is exactly what perplexity filters rank by,
    while typicality's linear-domain mean is boilerplate-dominated.
    The integer trick making it hash-exact: ⌊log₂ x⌋ =
    ``length(bin(x)) − 1`` on BIGINT in BOTH engines (no transcendental
    float ln anywhere — the reason true log-prob scoring was declared
    hash-fragile in doc_typicality's docstring; floor-quantized bits
    are the exact-integer version of that score).

    Plan shape: identical to doc_typicality — vocab-sized tf table
    (broadcastable at any corpus size), one token-stream join, per-doc
    agg with map-side combine; the N scalar is a window total over the
    VOCAB-sized frame, never the corpus. Nothing quadratic, no
    corpus-sized window."""
    from pyspark.sql import Window

    tok = documents.select(
        "doc_id",
        "source",
        F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("token"),
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    tf = tf.withColumn(
        "_n_total", F.sum("freq").over(Window.partitionBy())
    ).withColumn(
        "_bits",
        F.expr(
            "CAST(length(bin(_n_total)) - length(bin(freq)) AS BIGINT)"
        ),
    )
    return (
        tok.join(tf, "token")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_bits").cast("long").alias("surprisal_bits"),
        )
        .withColumn(
            "bits_per_token", round_div("surprisal_bits", "n_tokens", 2)
        )
    )


def build_doc_surprisal(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return doc_surprisal_bits(load_star(spark, sf_dir)["documents"], ctx)


ORACLE_SQL_DOC_SURPRISAL = f"""
WITH tok AS (
  SELECT doc_id, source, u.t AS token
  FROM documents, unnest(string_split(COALESCE(text, ''), ' ')) AS u(t)
),
tf AS (
  SELECT token, COUNT(*) AS freq,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
  FROM tok GROUP BY token
),
b AS (
  SELECT token, freq,
         CAST(length(bin(n_total)) - length(bin(freq)) AS BIGINT) AS bits
  FROM tf
),
agg AS (
  SELECT t.doc_id, t.source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(b.bits) AS BIGINT) AS surprisal_bits
  FROM tok t JOIN b ON t.token = b.token
  GROUP BY t.doc_id, t.source
)
SELECT doc_id, source, n_tokens, surprisal_bits,
       {{BPT}} AS bits_per_token
FROM agg
""".replace(
    "{BPT}", round_div_expr("surprisal_bits", "n_tokens", 2, "duckdb")
)


# ---------------------------------------- composite quality gate ----------
#: the public web-corpus rule stack (Gopher/C4-style heuristics, all
#: integer-exact). QG_KEEP_LANGS mirrors curation.KEEP_LANGS by value —
#: defined here because curation imports text (module-level oracle
#: strings cannot lazily import the other direction).
QG_KEEP_LANGS = ("de", "en", "es", "fr")
QG_MIN_TOKENS = 10
QG_MAX_TOKENS = 100_000
QG_MIN_MEAN_WORD_LEN = 2   # mean token length bounds (Gopher rule 3-10,
QG_MAX_MEAN_WORD_LEN = 12  # widened for the synthetic corpus alphabet)
QG_MIN_STOPWORD_PCT = 2    # ≥ 2% stopword occurrences (Gopher stop-word rule)
QG_MAX_REP_PCT = 20        # duplicate-3-gram occurrence share < 20%
QG_KEEP_SCORE = 70         # soft-score keep threshold

_QG_WEIGHTS = {  # rule weights sum to 100
    "pass_length": 20,
    "pass_word_len": 15,
    "pass_stopwords": 15,
    "pass_noise": 15,
    "pass_repetition": 15,
    "pass_lang": 20,
}


def doc_quality_gate(
    documents: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """FineWeb/Gopher-style composite quality gate: the six standing
    per-document signals (length bounds, mean word length, stopword
    share, URL/e-mail noise, duplicate-3-gram repetition, language
    policy) folded into ONE weighted 0-100 score and a keep decision —
    hard rules (length, language) must pass AND the score must reach
    QG_KEEP_SCORE. This is the single filter-stack row a curation run
    reads per document, built from the same rule family text_stats /
    noise_scan / doc_repetition expose individually.

    Every comparison is cross-multiplied integer space (no division, no
    floats) and NULL text is folded to '' up front, so the verdict bits
    are hash-exact across engines on any corpus — including the hostile
    NULL/duplicate/Unicode rows. Map-only single pass: all six signals
    come from the row's own token array (transform/filter/regexp_count)
    — no shuffle, no join; at 100 TB this is one scan.
    """
    t = F.coalesce(F.col("text"), F.lit(""))
    tokens = F.split(t, " ")
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    lang_list = ", ".join(f"'{lang}'" for lang in QG_KEEP_LANGS)
    # Spark's sequence(0, n) DESCENDS when n < 0, so the shingle count is
    # computed arithmetically (size-2, clamped) and the distinct count is
    # when-guarded for docs shorter than one 3-gram.
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tokens) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, 3)),
    )
    d = documents.withColumns(
        {
            "_n_tokens": F.size(tokens).cast("long"),
            "_token_chars": F.aggregate(
                F.transform(tokens, F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("long"),
            "_n_stop": F.size(
                F.expr(
                    f"filter(split(coalesce(text, ''), ' '),"
                    f" t -> t IN ({stop_list}))"
                )
            ).cast("long"),
            "_n_noise": (
                F.regexp_count(t, F.lit(NOISE_PATTERNS["n_urls"]))
                + F.regexp_count(t, F.lit(NOISE_PATTERNS["n_emails"]))
            ).cast("long"),
            "_n_sh": F.greatest(F.size(tokens) - 2, F.lit(0)).cast("long"),
            "_n_sh_uniq": F.when(
                F.size(tokens) >= 3, F.size(F.array_distinct(sh))
            )
            .otherwise(F.lit(0))
            .cast("long"),
        }
    )
    bits = {
        "pass_length": (
            (F.col("_n_tokens") >= QG_MIN_TOKENS)
            & (F.col("_n_tokens") <= QG_MAX_TOKENS)
        ),
        "pass_word_len": (
            (F.col("_token_chars") >= QG_MIN_MEAN_WORD_LEN * F.col("_n_tokens"))
            & (F.col("_token_chars") <= QG_MAX_MEAN_WORD_LEN * F.col("_n_tokens"))
        ),
        "pass_stopwords": (
            F.col("_n_stop") * 100 >= QG_MIN_STOPWORD_PCT * F.col("_n_tokens")
        ),
        "pass_noise": (F.col("_n_noise") * 100 < F.col("_n_tokens")),
        "pass_repetition": (
            (F.col("_n_sh") <= 0)
            | (
                (F.col("_n_sh") - F.col("_n_sh_uniq")) * 100
                < QG_MAX_REP_PCT * F.col("_n_sh")
            )
        ),
        "pass_lang": F.col("lang").isin(*QG_KEEP_LANGS),
    }
    for name, cond in bits.items():
        d = d.withColumn(name, F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int"))
    score = None
    for name, wt in _QG_WEIGHTS.items():
        term = F.col(name) * F.lit(wt)
        score = term if score is None else score + term
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.col("_n_tokens").alias("n_tokens"),
        *[F.col(n) for n in _QG_WEIGHTS],
        score.cast("int").alias("quality_score"),
        (
            (F.col("pass_length") == 1)
            & (F.col("pass_lang") == 1)
            & (score >= QG_KEEP_SCORE)
        ).alias("is_kept"),
    )


def build_quality_gate(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return doc_quality_gate(load_star(spark, sf_dir)["documents"], ctx)


def _quality_gate_oracle() -> str:
    lang_list = ", ".join(f"'{lang}'" for lang in QG_KEEP_LANGS)
    score = " + ".join(f"{n} * {wt}" for n, wt in _QG_WEIGHTS.items())
    return f"""
WITH d AS (
  SELECT doc_id, lang, source,
         string_split(COALESCE(text, ''), ' ') AS toks,
         COALESCE(text, '') AS t
  FROM documents
), sig AS (
  SELECT doc_id, lang, source,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
           AS token_chars,
         CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS BIGINT)
           AS n_stop,
         CAST(len(regexp_extract_all(t, '{NOISE_PATTERNS["n_urls"]}'))
              + len(regexp_extract_all(t, '{NOISE_PATTERNS["n_emails"]}'))
              AS BIGINT) AS n_noise,
         CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_sh,
         CAST(len(list_distinct(list_transform(
                range(1, greatest(len(toks) - 1, 1)),
                i -> array_to_string(toks[i:i+2], ' ')))) AS BIGINT)
           AS n_sh_uniq
  FROM d
), bits AS (
  SELECT doc_id, lang, source, n_tokens,
         CASE WHEN n_tokens >= {QG_MIN_TOKENS}
               AND n_tokens <= {QG_MAX_TOKENS} THEN 1 ELSE 0 END
           AS pass_length,
         CASE WHEN token_chars >= {QG_MIN_MEAN_WORD_LEN} * n_tokens
               AND token_chars <= {QG_MAX_MEAN_WORD_LEN} * n_tokens
              THEN 1 ELSE 0 END AS pass_word_len,
         CASE WHEN n_stop * 100 >= {QG_MIN_STOPWORD_PCT} * n_tokens
              THEN 1 ELSE 0 END AS pass_stopwords,
         CASE WHEN n_noise * 100 < n_tokens THEN 1 ELSE 0 END AS pass_noise,
         CASE WHEN n_sh <= 0
               OR (n_sh - n_sh_uniq) * 100 < {QG_MAX_REP_PCT} * n_sh
              THEN 1 ELSE 0 END AS pass_repetition,
         CASE WHEN lang IN ({lang_list}) THEN 1 ELSE 0 END AS pass_lang
  FROM sig
)
SELECT doc_id, lang, source, n_tokens,
       CAST(pass_length AS INTEGER) AS pass_length,
       CAST(pass_word_len AS INTEGER) AS pass_word_len,
       CAST(pass_stopwords AS INTEGER) AS pass_stopwords,
       CAST(pass_noise AS INTEGER) AS pass_noise,
       CAST(pass_repetition AS INTEGER) AS pass_repetition,
       CAST(pass_lang AS INTEGER) AS pass_lang,
       CAST({score} AS INTEGER) AS quality_score,
       (pass_length = 1 AND pass_lang = 1
        AND ({score}) >= {QG_KEEP_SCORE}) AS is_kept
FROM bits
"""


ORACLE_SQL_QUALITY_GATE = _quality_gate_oracle()
