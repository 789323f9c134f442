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
    # spot-check that one representative of each extension family sits
    # inside the driver's 50-entry correctness window (r8 rotation)
    window = set(q[:50])
    for rep in (
        "dedup_minhash_lsh",      # dedup
        "dedup_fuzzy_verify",     # fuzzy verify (r8 promotion)
        "doc_fingerprints",       # fingerprinting
        "cdc_latest_state",       # CDC
        "streaming_daily_rollup", # streaming
        "streaming_enriched_rollup",  # stream-static join (r8 promotion)
        "similarity_topk_cosine", # similarity search (exact baseline)
        "multimodal_features",    # multimodal
        "corpus_curation",        # curation
        "text_stats",             # text
        "bucketed_order_join",    # physical layout
        "salted_order_join",      # skew salting (r8 promotion)
        "key_skew_profile",       # skew diagnostics (r8 promotion)
        "kmv_distinct_ngrams",    # KMV sketch under the gate (r8)
        "packing_tokens_canary",  # packing gate canary (r8)
        "packing_offsets_canary", # packing gate canary (r8)
        "sequence_packing",       # training-data assembly/export
        "sequence_spans",         # span materialization
        "shard_manifest",         # export-shard manifests
        "sequence_export",        # packing writer stage
        "customer_analytics_approx",  # A5 approx twin, rows-only (r8)
        "bpe_merges_batched",     # tokenizer training (batched rep)
        "part_pagerank",          # graph analytics
        "data_quality_audit",     # data-quality governance
        "customer_rfm",           # RFM ntile decomposition
        "detail_summary_union",   # §2 A7/U2 representative
        "events_gapfill",         # calendar densification (r8 promotion)
        "shipping_priority_sql",  # TPC-H Q3 shape
        "nation_market_share_sql",# TPC-H Q8 shape
        "top_supplier_sql",       # TPC-H Q15 shape
        "last_shipment_sql",      # TPC-H Q? shape (r8 promotion)
        "disjunctive_revenue_sql",    # TPC-H Q19 shape (r8 promotion)
        "customer_order_distribution_sql",  # TPC-H Q13 (r8 promotion)
        "lateral_order_topk_sql", # LATERAL decorrelation (r8 promotion)
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
