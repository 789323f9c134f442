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
        "similarity_pq_topk",     # PQ ADC probe (r5 promotion)
        "bpe_merges",             # tokenizer training
        "part_pagerank",          # graph analytics
        "data_quality_audit",     # data-quality governance
    ):
        assert rep in window, f"{rep} fell out of the driver window"


def test_entry_returns_dataframe_builder(spark):
    df = entry.entry(spark)
    assert df.schema is not None and len(df.columns) > 5
