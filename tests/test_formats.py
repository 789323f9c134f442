"""Interchange-format roundtrips: losslessness + the pruning plan pin.

The cross-engine hash equivalence runs in tools/verify_oracle.py over
all corpora; these tests pin the properties that could silently rot:
the CSV writer's whitespace-trimming defaults, NULL-vs-empty-string
distinctness through both formats, and that the partitioned read prunes
at FILE LISTING (PartitionFilters), not as a post-scan filter.
"""

from __future__ import annotations

import io as _io
import contextlib

from pyspark.sql import Row

from demo_etl_spark.operators.formats import (
    csv_roundtrip,
    jsonl_roundtrip,
    orc_roundtrip,
    partitioned_corpus_read,
)

PATHOLOGICAL = [
    Row(doc_id=1, text=None, lang="en", source="s", n_chars=None),
    Row(doc_id=2, text="", lang="en", source="s", n_chars=0),
    Row(doc_id=3, text=" ", lang="en", source="s", n_chars=1),
    Row(doc_id=4, text="  leading and trailing  ", lang="en", source="s",
        n_chars=24),
    Row(doc_id=5, text='quote " comma , tab\tnewline\nmixed', lang="en",
        source="s", n_chars=33),
    Row(doc_id=6, text="unicode 中文 🚀 café", lang="zh", source="s",
        n_chars=17),
    Row(doc_id=7, text="\\N literal backslash-N", lang="en", source="s",
        n_chars=22),
    Row(doc_id=None, text="null key", lang=None, source="s", n_chars=8),
]


def _assert_lossless(spark, roundtrip):
    docs = spark.createDataFrame(PATHOLOGICAL)
    got = sorted(
        roundtrip(docs).collect(),
        key=lambda r: (r["doc_id"] is None, r["doc_id"] or 0),
    )
    want = sorted(
        PATHOLOGICAL, key=lambda r: (r["doc_id"] is None, r["doc_id"] or 0)
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_jsonl_roundtrip_lossless(spark):
    _assert_lossless(spark, jsonl_roundtrip)


def test_csv_roundtrip_lossless(spark):
    # would fail without nullValue (NULL vs ''), quoteAll+escape
    # (quote/comma/newline), ignore*WhiteSpace=False (padding, lone
    # space) — every option in the operator is load-bearing here
    _assert_lossless(spark, csv_roundtrip)


def test_partitioned_read_prunes_at_listing(spark):
    docs = spark.createDataFrame(PATHOLOGICAL)
    df = partitioned_corpus_read(docs, lang="en")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the lang predicate must appear in PartitionFilters, and the only
    # rows returned are the en-partition's (NULL lang pruned with them)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "lang" in pf
    assert sorted(r["doc_id"] for r in df.collect()) == [1, 2, 3, 4, 5, 7]


def test_orc_roundtrip_lossless_and_zstd(spark):
    """ORC is typed/NULL-faithful so losslessness should hold with no
    knobs — this pins it on the pathological rows (NULs, astral
    unicode, NULL key) AND that the write leg actually produced
    zstd-compressed ORC files (the non-default codec requested)."""
    import glob
    import os

    docs = spark.createDataFrame(PATHOLOGICAL)
    out = orc_roundtrip(docs)
    got = sorted(
        out.collect(),
        key=lambda r: (r["doc_id"] is None, r["doc_id"] or 0),
    )
    want = sorted(
        PATHOLOGICAL, key=lambda r: (r["doc_id"] is None, r["doc_id"] or 0)
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    path = out.inputFiles()[0]
    stage_dir = os.path.dirname(path.replace("file:", ""))
    assert glob.glob(f"{stage_dir}/*.zstd.orc"), os.listdir(stage_dir)
