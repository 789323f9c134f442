"""Driver-contract consistency guard for __spark_entry__.

The grading driver consumes ``queries()`` / ``oracle_sql()`` blindly;
these tests fail fast on the registry mistakes that would silently
weaken the correctness gate (missing oracle twin, dangling oracle,
non-callable builder, empty SQL)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle_twin():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {set(q) - set(o)}; dangling: {set(o) - set(q)}"
    )


def test_builders_are_callables_and_oracles_are_select_sql():
    for name, fn in entry.queries().items():
        assert callable(fn), name
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registry_is_large_and_window_covers_families():
    q = list(entry.queries())
    assert len(q) >= 110
    # spot-check that one representative of each extension family sits
    # inside the driver's 50-entry correctness window
    window = set(q[:50])
    for rep in (
        "dedup_minhash_lsh",      # dedup
        "doc_fingerprints",       # fingerprinting
        "fingerprint_profile",    # fingerprint governance (r5 promotion)
        "cdc_latest_state",       # CDC
        "streaming_daily_rollup", # streaming
        "similarity_topk_cosine", # similarity search (exact baseline)
        "multimodal_features",    # multimodal
        "brand_affinity",         # association mining
        "corpus_curation",        # curation
        "text_stats",             # text
        "bucketed_order_join",    # physical layout
        "sequence_packing",       # training-data assembly/export
        "sequence_spans",         # span materialization (r5 promotion)
        "shard_manifest",         # export-shard manifests (r4 promotion)
        "embedding_pq",           # product quantization (r4 promotion)
        "bpe_merges_batched",     # tokenizer training (r7: batched rep)
        "part_pagerank",          # graph analytics
        "data_quality_audit",     # data-quality governance
        "sequence_export",        # packing writer stage (r7 promotion)
        "dedup_span_scrub",       # verbatim-span dedup (r7 promotion)
        "dedup_simhash",          # simhash near-dup (r7 promotion)
        "corpus_source_profile",  # corpus governance (r7 promotion)
        "customer_rfm",           # RFM ntile decomposition (r7 promotion)
        "detail_summary_union",   # §2 A7/U2 representative (r7 return)
        "shipping_priority_sql",  # TPC-H Q3 shape (r7 promotion)
        "nation_market_share_sql",# TPC-H Q8 shape (r7 promotion)
        "top_supplier_sql",       # TPC-H Q15 shape (r7 promotion)
    ):
        assert rep in window, f"{rep} fell out of the driver window"


def test_entry_returns_dataframe_builder(spark):
    df = entry.entry(spark)
    assert df.schema is not None and len(df.columns) > 5
