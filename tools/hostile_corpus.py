"""Hostile documents corpus — the repro fixture for the r5/r6 driver reds.

Generates a `documents.parquet` carrying every pathology class the
driver's regenerated testdata can emit but the pristine local corpus
never does (profiled: 500 docs, 0 NULLs, 0 dup ids, 0 multi-space):

* NULL ``text``          — Spark ``size(split(NULL))`` = -1 / NULL-int
                           arithmetic vs DuckDB ``CASE…ELSE 0`` → proved
                           to flip ``sequence_packing.n_straddle``
                           (VERDICT r6, What's wrong #1)
* NULL ``doc_id``        — Spark window ORDER BY defaults NULLS FIRST,
                           DuckDB NULLS LAST → every running-sum offset
                           after the NULL row shifts in one engine only
                           (VERDICT r6, What's wrong #2)
* duplicate ``doc_id``   — within and across sources (covered by the
                           (doc_id, n_tokens) secondary sort key)
* empty string ``text``  — split('') = [''] → 1 token in both engines
* multi/trailing/leading spaces — split parity between engines
* single-doc source      — window/group edge

Usage::

    python tools/hostile_corpus.py /tmp/hostile        # writes the dir
    python tools/verify_oracle.py /tmp/hostile sequence_packing ...

The generated directory carries ALL ten star tables (non-documents
tables are copied from sf0.001) so the gate mirror's view registration
works unchanged. Also imported by tests/test_oracle_fuzz.py.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF = "/root/testdata/sf0.001"

#: (doc_id, text, lang, source) — n_chars derived. Deliberately tiny:
#: every pathology lands in a source small enough to eyeball, plus one
#: "normal" source whose offsets shift if NULL ordering diverges.
ROWS = [
    # src_a: clean docs + a NULL text in the middle + empty string
    (100, "alpha beta gamma delta", "en", "src_a"),
    (101, None, "en", "src_a"),                      # NULL text
    (102, "epsilon zeta", "en", "src_a"),
    (103, "", "en", "src_a"),                        # empty string
    (104, "eta theta iota kappa lambda mu", "en", "src_a"),
    # src_b: NULL doc_id + docs after it (their offsets shift if the
    # engines disagree on where the NULL row sorts)
    (None, "nu xi omicron", "en", "src_b"),          # NULL doc_id
    (200, "pi rho sigma tau", "en", "src_b"),
    (201, "upsilon phi", "en", "src_b"),
    (202, "chi psi omega alef bet gimel dalet he vav zayin het tet yod "
          "kaf lamed mem nun samekh ayin pe tsadi qof resh shin tav",
     "en", "src_b"),
    # src_c: duplicate doc_ids — same id, same token count (fully tied)
    # and same id, different token count (tie broken by n_tokens)
    (300, "one two three", "en", "src_c"),
    (300, "uno dos tres", "es", "src_c"),            # dup id, same count
    (301, "quatre cinq", "fr", "src_c"),
    (301, "six sept huit neuf", "fr", "src_c"),      # dup id, diff count
    # src_d: whitespace pathologies
    (400, "  leading spaces", "en", "src_d"),
    (401, "trailing spaces  ", "en", "src_d"),
    (402, "multi   internal    spaces", "en", "src_d"),
    (403, " ", "en", "src_d"),                       # lone space
    # src_e: single-document source
    (500, "solo", "en", "src_e"),
    # src_f: long docs that straddle the 512-token packing cap — 200
    # tokens each so four of them cross a boundary; plus a NULL text
    # right at the straddle region to compose both pathologies
    *[
        (600 + i, " ".join(f"w{i}t{j}" for j in range(200)), "en", "src_f")
        for i in range(6)
    ],
    (610, None, "en", "src_f"),                      # NULL text mid-pack
    (611, " ".join(f"tail{j}" for j in range(200)), "en", "src_f"),
]


def build_documents_table() -> pa.Table:
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for doc_id, text, lang, source in ROWS:
        doc_ids.append(doc_id)
        texts.append(text)
        langs.append(lang)
        sources.append(source)
        n_chars.append(None if text is None else len(text))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def write_corpus(out_dir: str, src_sf: str = SRC_SF) -> str:
    """Write the hostile dir: all star tables from ``src_sf`` with
    documents.parquet replaced by the hostile corpus."""
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(src_sf):
        if name.endswith(".parquet") and name != "documents.parquet":
            dst = os.path.join(out_dir, name)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(src_sf, name), dst)
    pq.write_table(build_documents_table(),
                   os.path.join(out_dir, "documents.parquet"))
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile"
    print(write_corpus(out))
