"""In-engine BPE tokenizer training (north-star extension; no reference
counterpart — SURVEY §8).

Classic byte-pair-encoding merge learning (Sennrich-style, word-level):
count word frequencies once over the corpus, represent each DISTINCT
word as a space-separated symbol string, then repeatedly (a) count
adjacent symbol pairs weighted by word frequency, (b) pick the most
frequent pair (deterministic tie-break: count desc, lhs, rhs), and
(c) merge every non-overlapping left-to-right occurrence.

Scale design — the reason this works at 100 TB: after the single
corpus-wide ``groupBy(word)`` pass, every iteration runs on the DISTINCT
VOCABULARY (bounded in the low millions for natural language no matter
the corpus size), not on the corpus. That one pass is a plain partial+
final count aggregation; each merge round is a vocab-sized explode +
groupBy + LIMIT 1, and the argmax that reaches the driver is ONE row per
round (same scalar-per-iteration discipline as graph.part_pagerank).
The symbol table is ``localCheckpoint``-ed each round so the plan stays
flat across iterations.

Cross-engine exactness: the merge step is *literal* (non-regex) replace.
The symbol encoding is chosen so that ONE left-to-right replace pass is
exactly the greedy list merge: every symbol carries its OWN leading and
trailing space (``' a '``), so adjacent symbols are separated by a
double space and two consecutive merge sites share no characters. (The
naive single-space encoding fails here: in `` a b a b `` the second
site loses its leading space to the first match, so a pass merges only
alternating sites — and iterating to a fixpoint still disagrees with
greedy on same-symbol runs like ``aaaaaaa``, where match consumption
skips the run's third token. Both failure modes are pinned in
``tests/test_tokenizer.py`` against a pure-Python greedy reference.)
The encoding is prefix-unambiguous because symbols can never contain a
space — words come from a space split and merged symbols are plain
concatenations. Character splitting uses ``([\\s\\S])`` instead of
``(.)`` — Java's ``.`` excludes ``\\r`` while RE2's does not, so a bare
dot diverges on carriage returns (pinned by the oracle-fuzz corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.io import load_star

#: merge rounds for the registered query (a production vocab uses tens of
#: thousands; 4 keeps the oracle twin readable while exercising the loop)
BPE_ROUNDS = 4

#: char-splitting pattern with verified Java⇔RE2 parity (see module doc)
_CHAR_PAT = r"([\s\S])"


def bpe_merges(
    documents: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    rounds: int = BPE_ROUNDS,
) -> DataFrame:
    """Learn ``rounds`` BPE merges; returns (round, lhs, rhs, merged,
    pair_count) — the merge table a tokenizer ships."""
    spark = documents.sparkSession
    words = (
        documents.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    sym = words.withColumn(
        "sym", F.regexp_replace("word", _CHAR_PAT, " $1 ")
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        ts = F.split(F.trim(F.col("sym")), "  ")
        pairs = sym.select(
            F.explode(
                F.zip_with(
                    F.slice(ts, F.lit(1), F.size(ts) - 1),
                    F.slice(ts, F.lit(2), F.size(ts) - 1),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
        merges.append((r, lhs, rhs, lhs + rhs, cnt))
        sym = sym.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {lhs}  {rhs} "),
                F.lit(f" {lhs}{rhs} "),
            ),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        schema="round int, lhs string, rhs string, merged string, "
        "pair_count long",
    )


def build_bpe_merges(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return bpe_merges(load_star(spark, sf_dir)["documents"], ctx)


def _bpe_oracle(rounds: int = BPE_ROUNDS) -> str:
    parts = [
        """WITH w AS (
  SELECT u.t AS word, COUNT(*) AS freq
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  GROUP BY 1
),
s0 AS (
  SELECT word, freq,
         regexp_replace(word, '([\\s\\S])', ' \\1 ', 'g') AS sym
  FROM w
)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f""",
p{r} AS (
  SELECT ts[g.i - 1] AS lhs, ts[g.i] AS rhs, freq
  FROM (SELECT string_split(trim(sym), '  ') AS ts, freq FROM {prev}),
       unnest(generate_series(2, len(ts))) AS g(i)
),
b{r} AS (
  SELECT lhs, rhs, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM p{r} GROUP BY lhs, rhs
  ORDER BY pair_count DESC, lhs, rhs LIMIT 1
),
s{r} AS (
  SELECT word, freq,
         replace(sym,
                 ' ' || (SELECT lhs FROM b{r}) || '  '
                     || (SELECT rhs FROM b{r}) || ' ',
                 ' ' || (SELECT lhs FROM b{r})
                     || (SELECT rhs FROM b{r}) || ' ') AS sym
  FROM {prev}
)"""
        )
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS round, lhs, rhs, "
        f"lhs || rhs AS merged, pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n" + finals


ORACLE_SQL_BPE_MERGES = _bpe_oracle()
