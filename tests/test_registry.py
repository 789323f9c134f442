"""Driver-contract consistency guard for __spark_entry__.

The grading driver consumes ``queries()`` / ``oracle_sql()`` blindly;
these tests fail fast on the registry mistakes that would silently
weaken the correctness gate (missing oracle twin, dangling oracle,
non-callable builder, empty SQL)."""

from __future__ import annotations

import __spark_entry__ as entry

#: the ONLY queries allowed to lack a DuckDB oracle twin — the approx
#: sketch twins (HLL++ / percentile_approx state is engine-specific;
#: the driver records a rows-only check and tests/test_approx.py pins
#: the error envelopes). Anything else missing an oracle is a registry
#: mistake.
ROWS_ONLY = {"customer_analytics_approx", "source_profile_approx"}


def test_every_query_has_an_oracle_twin():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) - set(o) == ROWS_ONLY, (
        f"missing oracles: {set(q) - set(o) - ROWS_ONLY}"
    )
    assert not set(o) - set(q), f"dangling oracles: {set(o) - set(q)}"


def test_builders_are_callables_and_oracles_are_select_sql():
    for name, fn in entry.queries().items():
        assert callable(fn), name
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registry_is_large_and_window_covers_families():
    q = list(entry.queries())
    assert len(q) >= 110
    # spot-check the r11 window composition: the 8 first-time seats
    # (7 r10 additions + the new similarity_pq_recall) that close union
    # driver coverage, the 12 re-gates of every query whose code or
    # oracle changed in r11, and representatives of the stalest-rotation
    # pool (last gated r2-r7).
    window = set(q[:50])
    for rep in (
        # first-time seats (union coverage 176/176 once gated)
        "xml_roundtrip",
        "doc_quality_gate",
        "streaming_quality_gate",
        "multimodal_decode_audit",
        "bpe_roundtrip",
        "similarity_ivf_recall",
        "corpus_temperature_sample",
        "similarity_pq_recall",
        # r11-touched re-gates (e6 integer-dot conversion, unified
        # running-offset window, active_users oracle fix)
        "events_active_users",
        "similarity_topk_cosine",
        "similarity_lsh_bucketed",
        "similarity_ivf_topk",
        "dedup_embedding_cosine",
        "dedup_embedding_ann",
        "dedup_ann_pair_recall",
        "similarity_ann_recall",
        "sequence_packing",
        "sequence_spans",
        "packing_offsets_canary",
        "sequence_export",
        # stalest-rotation representatives
        "corpus_sample",
        "lang_profile",
        "sales_cube",
        "embedding_quantize",
        "bpe_merges",
        "similarity_pq_topk",
        "date_dim_join",
        "dedup_simhash",
    ):
        assert rep in window, f"{rep} fell out of the driver window"


def test_entry_returns_dataframe_builder(spark):
    df = entry.entry(spark)
    assert df.schema is not None and len(df.columns) > 5


def test_no_fetch_fragile_oracle_types():
    """Commit-time twin of verify_oracle.py's sweep-time type gate (r8
    verdict #4): bind every oracle_sql() against the sf0.001 views in
    DuckDB ONLY (no Spark session, no execution — relation binding
    resolves the result types) and fail on any fetch-fragile output
    type. DuckDB types integer SUM() as HUGEINT, and the driver's
    pandas-path fetch downcasts HUGEINT → float64, hashing `3.0`
    against Spark's `3` — the class that cost the r3-r7
    sequence_packing reds. Every oracle output column must be
    explicitly CAST to its Spark physical type."""
    import os
    import sys

    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from verify_oracle import _FETCH_FRAGILE

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        frag = [
            f"{c}: {t}"
            for c, t in zip(rel.columns,
                            (str(x).split("(")[0] for x in rel.types))
            if t in _FETCH_FRAGILE
        ]
        if frag:
            bad[name] = frag
    assert not bad, f"fetch-fragile oracle output columns: {bad}"
