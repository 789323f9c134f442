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
    # inside the driver's 50-entry correctness window (r10 rotation: the
    # 8 core flagships + ALL 42 remaining never-gated queries, closing
    # union driver coverage to 168/168)
    window = set(q[:50])
    for rep in (
        # held flagships (3-round re-gate cadence)
        "customer_analytics",     # reference A1 flagship
        "product_ranking",
        "revenue_trend",
        "star_join_detail",
        "sales_asset_union",
        "pricing_summary_sql",
        "dedup_minhash_lsh",      # dedup
        "corpus_curation",        # curation
        # r10 rotation promotions (first-ever driver seats)
        "dedup_semantic_clusters",  # SemDeDup semantic dedup
        "dedup_cluster_profile",
        "dedup_repeated_spans",
        "dedup_incremental",
        "ngram_novelty",
        "multimodal_resize",
        "bpe_encode",               # tokenizer
        "bpe_vocab_coverage",
        "bpe_pair_counts",
        "pmi_collocations",         # text analysis
        "text_noise_scan",
        "doc_length_outliers",
        "regional_rollup",          # star-schema analytics
        "sales_grouping_sets",
        "shipping_sla",
        "incremental_join_view",
        "events_props_breakdown",   # event analytics
        "events_active_users",
        "events_cohort_retention",
        "events_value_histogram",
        "events_props_typed",
        "events_incremental_rollup",
        "events_lateness_audit",
        "events_unpivot",
        "signup_to_purchase",
        "user_rate_audit",
        "revenue_seasonality",      # time series
        "revenue_forecast_backtest",
        "supplier_analytics",       # product/customer analytics
        "brand_rules",
        "market_concentration",
        "order_bookends",
        "part_similarity",          # graph
        "embedding_centroids",      # embedding monitoring
        "streaming_dedup",          # streaming
        "corpus_mixture_plan",      # curation planning
        "product_profit_sql",       # TPC-H shapes
        "priority_shipping_split_sql",
        "idle_customers_sql",
        "part_supplier_variety_sql",
        "bolt_volume_suppliers_sql",
        "orc_roundtrip",            # formats
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
