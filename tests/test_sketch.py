"""count-min sketch: (ε, δ) guarantees and merge associativity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cms_bounds_and_determinism(spark, sf_dir, tables):
    from demo_etl_spark.operators.sketch import CMS_EPS, cms_estimate, token_cms

    docs = tables["documents"]
    row = token_cms(docs).first()
    sketch, n_total = bytes(row["sketch"]), row["n_tokens"]

    exact = {
        r["token"]: r["n"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est = cms_estimate(spark, sketch, list(exact))
    # CMS never under-counts, and over-counts by at most eps*N (w.h.p.)
    for tok, true_n in exact.items():
        assert est[tok] >= true_n
        assert est[tok] <= true_n + CMS_EPS * n_total
    # absent item estimates stay within the same additive bound
    ghost = cms_estimate(spark, sketch, ["never-a-token-xyzzy"])
    assert ghost["never-a-token-xyzzy"] <= CMS_EPS * n_total
    # deterministic: rebuilding yields the identical binary
    again = bytes(token_cms(docs).first()["sketch"])
    assert again == sketch


def test_cms_partition_invariance(spark, tables):
    """Sketch merges are associative/commutative: any partitioning of the
    input produces the same sketch — the property that makes the one-pass
    distributed build correct."""
    from demo_etl_spark.operators.sketch import token_cms

    docs = tables["documents"]
    a = bytes(token_cms(docs.repartition(3)).first()["sketch"])
    b = bytes(token_cms(docs.repartition(17)).first()["sketch"])
    assert a == b
