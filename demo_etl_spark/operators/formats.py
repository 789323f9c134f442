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

#: one staging ROOT per process, deleted at interpreter exit — repeated
#: bench/gate runs previously accumulated unbounded temp-disk corpus
#: copies (ADVICE r7). Cleanup must be deferred to exit, not per call:
#: the returned DataFrames read their staging dir LAZILY and the caller
#: triggers actions arbitrarily later in the session.
_STAGING_ROOT: str | None = None


def _staging_dir(kind: str) -> str:
    global _STAGING_ROOT
    if _STAGING_ROOT is None:
        import atexit
        import shutil

        _STAGING_ROOT = tempfile.mkdtemp(prefix="demo_etl_stage_")
        atexit.register(shutil.rmtree, _STAGING_ROOT, ignore_errors=True)
    return os.path.join(
        _STAGING_ROOT, f"{kind}_{next(_ROUNDTRIP_COUNTER)}"
    )


def jsonl_roundtrip(documents: DataFrame) -> DataFrame:
    """Write the corpus as JSONL, read it back with the explicit
    DOCUMENTS schema, return the canonical projection. The staging dir
    is unique per call (the returned DataFrame reads it lazily — the
    caller triggers actions later, so the dir must stay distinct across
    invocations in one session)."""
    spark = documents.sparkSession
    path = _staging_dir("jsonl")
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
#: the CSV NULL sentinel — and therefore CSV's sentinel-collision
#: class: quoteAll does NOT protect it (probed r13: the reader applies
#: nullValue comparison after unquoting, so a text that is LITERALLY
#: backslash-N comes back NULL). Same declared quarantine policy as
#: the XML leg's __NULL__ collision.
_CSV_NULL = "\\N"


def csv_roundtrip(documents: DataFrame) -> DataFrame:
    """documents → CSV files → back, hash-equal to the parquet truth on
    the sentinel-collision-free row set.

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
    from pyspark.sql import functions as F

    spark = documents.sparkSession
    path = _staging_dir("csv")

    def _ok(col: str):
        # a string column whose value IS the null sentinel cannot
        # survive the roundtrip (quoted or not) — quarantine on both
        # engine sides instead of silently nulling (r13 review probe)
        return F.col(col).isNull() | (F.col(col) != _CSV_NULL)

    legal = documents.filter(_ok("text") & _ok("lang") & _ok("source"))
    (
        legal.select(*_COLS)
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


_CSV_OK_SQL = " AND ".join(
    f"({c} IS NULL OR {c} <> '{_CSV_NULL}')"
    for c in ("text", "lang", "source")
)

ORACLE_SQL_CSV_ROUNDTRIP = f'''
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE {_CSV_OK_SQL}
'''


# ------------------------------------------------------ ORC roundtrip ---
def orc_roundtrip(documents: DataFrame) -> DataFrame:
    """documents → ORC files → back, hash-equal to the parquet truth —
    the second first-class columnar interchange format (Hive/Trino
    ecosystems hand Spark ORC as often as parquet). Unlike the CSV leg
    there are no loss-guarding knobs to pin: ORC is typed and
    NULL-faithful by construction, so the roundtrip asserts the
    CODEC/WRITER path, not a text-escaping contract — zstd compression
    on the write leg exercises the non-default codec, predicate pushdown
    and column pruning work on the read leg exactly as for parquet
    (spark.sql.orc.filterPushdown is on by default). The oracle never
    touches ORC (DuckDB reads none): losslessness means the readback
    must hash-equal the parquet source."""
    spark = documents.sparkSession
    path = _staging_dir("orc")
    (
        documents.select(*_COLS)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .orc(path)
    )
    return spark.read.schema(DOCUMENTS).orc(path).select(*_COLS)


def build_orc_roundtrip(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return orc_roundtrip(load_star(spark, sf_dir)["documents"])


ORACLE_SQL_ORC_ROUNDTRIP = ORACLE_SQL_JSONL_ROUNDTRIP


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
    path = _staging_dir("part")
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


# ------------------------------------------------- schema evolution -----
def schema_evolution_read(documents: DataFrame) -> DataFrame:
    """Corpora drift: later shards carry columns earlier shards never
    had. Stage the corpus as two parquet shard generations — v1 with the
    base schema, v2 with an added ``quality`` column — and read them as
    ONE table with ``mergeSchema``: v1 rows surface quality=NULL, v2
    rows keep their value, nothing is rewritten. This is the upgrade
    path a 100 TB corpus actually takes (rewriting history to add a
    column is a full-corpus write; merged-schema reads are free).

    The generation split is deterministic (doc_id parity, NULL ids to
    v1) and the v2 quality is a pure doc_id expression, so the DuckDB
    oracle reproduces the merged result from the original table alone.
    """
    from pyspark.sql import functions as F

    spark = documents.sparkSession
    path = _staging_dir("evo")
    base = documents.select(*_COLS)
    is_v2 = F.col("doc_id").isNotNull() & (F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    base.where(~is_v2).write.mode("overwrite").parquet(os.path.join(path, "g=1"))
    (
        base.where(is_v2)
        .withColumn("quality", F.pmod(F.col("doc_id"), F.lit(100)).cast("int"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "g=2"))
    )
    merged = spark.read.option("mergeSchema", True).parquet(
        os.path.join(path, "g=1"), os.path.join(path, "g=2")
    )
    return merged.select(*_COLS, "quality")


def build_schema_evolution_read(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return schema_evolution_read(load_star(spark, sf_dir)["documents"])


ORACLE_SQL_SCHEMA_EVOLUTION = """
SELECT doc_id, text, lang, source, n_chars,
       -- ((x%100)+100)%100: DuckDB % is sign-of-dividend, Spark pmod is
       -- always positive — negative even doc_ids would diverge otherwise
       CASE WHEN doc_id IS NOT NULL AND doc_id % 2 = 0
            THEN CAST(((doc_id % 100) + 100) % 100 AS INTEGER) END AS quality
FROM documents
"""


# -------------------------------------------- malformed-line ingest -----
#: the malformed lines staged into every ingest dir — one truncated
#: JSON object, one non-JSON line, one wrong-type field (string doc_id
#: that can't coerce): the three corruption classes a crawler feed ships
_BAD_LINES = [
    '{"doc_id": 999001, "text": "truncated',
    "this is not json at all",
    '{"doc_id": "not-a-number", "text": "bad type", "lang": "en",'
    ' "source": "bad", "n_chars": 8}',
]


def jsonl_malformed_ingest(documents: DataFrame) -> DataFrame:
    """PERMISSIVE-mode JSONL ingest with dead-letter accounting: the
    corpus plus three deliberately-corrupt lines go through the schema'd
    reader; well-formed rows pass, malformed lines surface in
    ``_corrupt_record`` instead of failing the job (the file-ingest twin
    of the quarantine_audit policy — never let one bad crawler line kill
    a 100 TB load). Returns one summary row: clean vs quarantined
    counts. The oracle knows exactly 3 lines are corrupt (the staged
    constants), so the split itself is under the gate.

    Type-coercion note: a parseable JSON object whose field can't
    coerce ('not-a-number' doc_id) is ALSO routed to _corrupt_record by
    PERMISSIVE mode — corruption is schema-relative, not just syntax.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    spark = documents.sparkSession
    path = _staging_dir("badjsonl")
    write_json(documents.select(*_COLS), path)
    with open(os.path.join(path, "part-corrupt.json"), "w") as fh:
        fh.write("\n".join(_BAD_LINES) + "\n")
    schema = StructType(
        list(DOCUMENTS) + [StructField("_corrupt_record", StringType())]
    )
    from demo_etl_spark.io import register_persist

    # Spark refuses to answer queries that project ONLY the internal
    # _corrupt_record column from a raw scan (the parser would have to
    # re-run ambiguously); the documented contract is to materialize the
    # parse first — which is also the real-pipeline shape, where the
    # clean/quarantine split writes both halves from one parsed pass
    raw = register_persist(
        spark.read.schema(schema)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record")
        .json(path)
    )
    return raw.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_clean"),
        F.count("_corrupt_record").alias("n_quarantined"),
    )


def build_jsonl_malformed_ingest(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return jsonl_malformed_ingest(load_star(spark, sf_dir)["documents"])


ORACLE_SQL_JSONL_MALFORMED = f"""
SELECT COUNT(*) + {len(_BAD_LINES)} AS n_lines,
       COUNT(*) AS n_clean,
       CAST({len(_BAD_LINES)} AS BIGINT) AS n_quarantined
FROM documents
"""


# ------------------------------------------------------ XML roundtrip ---
#: XML 1.0 legally cannot carry C0 control characters other than
#: tab/LF/CR — Spark's native XML writer (Spark 4) CRASHES the task on
#: them (probed: woodstox BaseStreamWriter.writeCharacters throws). The
#: exchange therefore declares a legality quarantine: rows whose text
#: carries an XML-illegal character are excluded on BOTH engine sides.
#: Literal char-class only — the verified Java⇔RE2 parity subset.
_XML_ILLEGAL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
_XML_NULL_SENTINEL = "__NULL__"


def xml_roundtrip(documents: DataFrame) -> DataFrame:
    """documents → XML files → back, hash-equal to the parquet truth on
    the XML-legal row set — the third self-describing interchange format
    (Spark 4 ships the former spark-xml as a native source).

    Loss-guarding options pinned by probe (r10):

    * ``nullValue='__NULL__'`` on both legs — the writer omits a NULL
      element and serializes '' as an empty element; the sentinel keeps
      NULL text and empty-string text distinct through the roundtrip;
    * ``ignoreSurroundingSpaces=false`` on the read leg — the reader's
      DEFAULT trims element text, eating the hostile corpus's padded
      docs exactly like the CSV writer's trim defaults did;
    * XML-legality quarantine (module constant) on EVERY string column
      (text, lang, source — the writer serializes all of them, and an
      illegal char in any one crashes the task) — control characters
      are not a data-loss bug but a property of the format, declared
      and mirrored in the oracle (same dead-letter discipline as
      io.timed_events);
    * sentinel-collision quarantine — XML has no quoteAll/escape
      mechanism, so a string column whose value is LITERALLY the
      nullValue sentinel cannot survive the roundtrip (the reader maps
      it to NULL); such rows are excluded on both sides rather than
      silently corrupted (r10 review).

    100 TB shape: narrow map on both legs, one XML file per input
    partition, reader parallelizes per file. Like multiLine CSV, a row
    spans lines, so intra-file splitting is off — per-file parallelism
    is the scale unit (the writer's partitioning preserves it).
    """
    from pyspark.sql import functions as F

    spark = documents.sparkSession
    path = _staging_dir("xml")

    def _ok(col: str):
        return F.col(col).isNull() | (
            ~F.col(col).rlike(_XML_ILLEGAL)
            & (F.col(col) != _XML_NULL_SENTINEL)
        )

    legal = documents.filter(_ok("text") & _ok("lang") & _ok("source"))
    (
        legal.select(*_COLS)
        .write.mode("overwrite")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .option("nullValue", _XML_NULL_SENTINEL)
        .format("xml")
        .save(path)
    )
    return (
        spark.read.schema(DOCUMENTS)
        .option("rowTag", "doc")
        .option("nullValue", _XML_NULL_SENTINEL)
        .option("ignoreSurroundingSpaces", "false")
        .format("xml")
        .load(path)
        .select(*_COLS)
    )


def build_xml_roundtrip(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    return xml_roundtrip(load_star(spark, sf_dir)["documents"])


def _xml_ok_sql(col: str) -> str:
    return (
        f"({col} IS NULL OR (NOT regexp_matches({col}, '{_XML_ILLEGAL}') "
        f"AND {col} <> '{_XML_NULL_SENTINEL}'))"
    )


ORACLE_SQL_XML_ROUNDTRIP = f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE {_xml_ok_sql('text')} AND {_xml_ok_sql('lang')} AND {_xml_ok_sql('source')}
"""
