"""r13 review probe pin: CSV's nullValue sentinel collision.

A text that is LITERALLY backslash-N survives JSONL/ORC but cannot
survive the CSV roundtrip (the reader applies nullValue comparison
after unquoting, so quoteAll does not protect it) — the operator
quarantines such rows on both engine sides instead of silently
nulling them, mirroring the XML leg's __NULL__ policy."""

from __future__ import annotations


def test_csv_sentinel_collision_quarantined(spark):
    from demo_etl_spark.operators.formats import (
        _CSV_NULL,
        csv_roundtrip,
        jsonl_roundtrip,
    )

    assert _CSV_NULL == "\\N" and len(_CSV_NULL) == 2
    docs = spark.createDataFrame(
        [
            (1, "\\N", "en", "s", 2),    # literal sentinel -> quarantined
            (2, None, "en", "s", None),  # real NULL -> survives as NULL
            (3, "", "en", "s", 0),       # empty string -> survives as ''
            (4, "plain", "en", "s", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r["text"] for r in csv_roundtrip(docs).collect()}
    assert set(out) == {2, 3, 4}  # the collision row is quarantined
    assert out[2] is None and out[3] == "" and out[4] == "plain"
    # JSONL carries the same text losslessly — the sentinel class is a
    # CSV property, not a corpus defect
    j = {r["doc_id"]: r["text"] for r in jsonl_roundtrip(docs).collect()}
    assert j[1] == "\\N"
