"""Interchange-format roundtrips under the oracle gate (S-surface widened).

JSONL (one JSON object per line) is the lingua franca of LLM training
corpora — ingest pipelines receive it, export pipelines publish it.
``io.write_json`` / ``io.read_json`` already exist; this operator puts
the ROUNDTRIP under the driver's cross-engine hash gate: documents →
JSONL files → read back with the explicit schema → the full row set,
which must hash-equal the parquet truth (the oracle reads parquet
directly). That pins the properties an exchange format must not lose:
NULL fields (the writer omits them, the schema-driven reader restores
NULL), empty strings vs NULLs (distinct in JSON: ``""`` vs absent),
Unicode (escaped or raw, the decoded string is identical), negative
and NULL keys, and whitespace-exact text.

100 TB shape: pure narrow map on both legs — the writer emits one JSONL
file per partition, the reader parallelizes per file; no shuffle at
all. Line-splittable text formats keep full scan parallelism (unlike a
naive gzip of the whole corpus — compress per-file if needed).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.io import load_star, read_json, write_json
from demo_etl_spark.schemas import DOCUMENTS

_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_ROUNDTRIP_COUNTER = iter(range(1, 1_000_000))


def jsonl_roundtrip(documents: DataFrame) -> DataFrame:
    """Write the corpus as JSONL, read it back with the explicit
    DOCUMENTS schema, return the canonical projection. The staging dir
    is unique per call (the returned DataFrame reads it lazily — the
    caller triggers actions later, so the dir must stay distinct across
    invocations in one session)."""
    spark = documents.sparkSession
    path = os.path.join(
        tempfile.gettempdir(),
        f"demo_etl_jsonl_{os.getpid()}_{next(_ROUNDTRIP_COUNTER)}",
    )
    write_json(documents.select(*_COLS), path)
    return read_json(spark, path, DOCUMENTS).select(*_COLS)


def build_jsonl_roundtrip(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return jsonl_roundtrip(load_star(spark, sf_dir)["documents"])


#: the parquet truth — the roundtrip must be lossless, so the oracle
#: never touches JSON at all
ORACLE_SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


# ------------------------------------------------------ CSV roundtrip ---
def csv_roundtrip(documents: DataFrame) -> DataFrame:
    """documents → CSV files → back, hash-equal to the parquet truth.

    CSV is where exchange pipelines actually lose data, so every option
    that guards a pathology is explicit on BOTH legs:

    * ``nullValue='\\\\N'`` — distinguishes NULL text from the empty
      string (the default writes both as an empty field and the reader
      can't tell them apart);
    * ``quoteAll`` + ``escape='"'`` — fields containing the delimiter,
      quotes, tabs or NEWLINES survive verbatim;
    * ``ignoreLeadingWhiteSpace=False`` / ``ignoreTrailingWhiteSpace=
      False`` on the WRITE leg — the writer's defaults are TRUE there
      (unlike the reader's) and silently trim padded fields: the hostile
      corpus's '  leading'/'trailing  '/lone-space docs came back
      changed until these were pinned;
    * ``multiLine`` on the read leg — embedded newlines mean a record
      is no longer a physical line. (Scale note: multiLine CSV is NOT
      line-splittable — one file becomes one task. The writer keeps one
      file per input partition, so read parallelism survives per-file;
      a corpus with newline-free text should drop multiLine and keep
      intra-file splitting. This is exactly why JSONL beats CSV as the
      corpus format — see jsonl_roundtrip.)
    """
    spark = documents.sparkSession
    path = os.path.join(
        tempfile.gettempdir(),
        f"demo_etl_csv_{os.getpid()}_{next(_ROUNDTRIP_COUNTER)}",
    )
    (
        documents.select(*_COLS)
        .write.mode("overwrite")
        .options(header=True, nullValue="\\N", quoteAll=True, escape='"',
                 ignoreLeadingWhiteSpace=False,
                 ignoreTrailingWhiteSpace=False)
        .csv(path)
    )
    return (
        spark.read.schema(DOCUMENTS)
        .options(header=True, nullValue="\\N", multiLine=True, escape='"',
                 ignoreLeadingWhiteSpace=False,
                 ignoreTrailingWhiteSpace=False)
        .csv(path)
        .select(*_COLS)
    )


def build_csv_roundtrip(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return csv_roundtrip(load_star(spark, sf_dir)["documents"])


ORACLE_SQL_CSV_ROUNDTRIP = ORACLE_SQL_JSONL_ROUNDTRIP


# ------------------------------------------- partitioned corpus read ----
def partitioned_corpus_read(documents: DataFrame, lang: str = "en") -> DataFrame:
    """Hive-style partitioned write + partition-PRUNED read: the corpus
    lands as ``lang=<value>/part-*.parquet`` directories and the filtered
    read touches only the requested partition's files — the physical
    layout that makes per-language reprocessing O(partition), not
    O(corpus), at 100 TB. The plan pin (tests) asserts the filter shows
    up in PartitionFilters, i.e. pruning happens at file listing, not as
    a post-scan filter.

    NULL langs land in the writer's ``__HIVE_DEFAULT_PARTITION__``
    directory and a concrete-value filter never reads them (both engines
    agree: ``lang = 'en'`` is NULL-rejecting).
    """
    spark = documents.sparkSession
    path = os.path.join(
        tempfile.gettempdir(),
        f"demo_etl_part_{os.getpid()}_{next(_ROUNDTRIP_COUNTER)}",
    )
    (
        documents.select(*_COLS)
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(path)
    )
    from pyspark.sql import functions as F

    return (
        spark.read.schema(DOCUMENTS).parquet(path)
        .where(F.col("lang") == lang)
        .select(*_COLS)
    )


def build_partitioned_corpus_read(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return partitioned_corpus_read(load_star(spark, sf_dir)["documents"])


ORACLE_SQL_PARTITIONED_READ = """
SELECT doc_id, text, lang, source, n_chars
FROM documents WHERE lang = 'en'
"""
