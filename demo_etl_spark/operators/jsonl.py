"""JSONL corpus sink/source under the oracle gate (S-surface widened).

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
