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


def test_hll_daily_sketches_merge_to_global_estimate(spark, sf_dir):
    """Per-day HLL estimates sit within the 4096-register error bound of
    exact per-day distincts, and unioning the daily sketches reproduces
    (within bound) the whole-table exact distinct — re-aggregation
    without re-reading events. Also partition-invariant: sketch merge is
    a commutative monoid."""
    from demo_etl_spark.io import read_star_table
    from demo_etl_spark.operators.sketch import (
        daily_user_sketches,
        merged_user_estimate,
    )

    ev = read_star_table(spark, sf_dir, "events")
    daily = daily_user_sketches(ev)
    exact_by_day = {
        r["day"]: r["n"]
        for r in ev.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = daily.collect()
    assert len(rows) == len(exact_by_day)
    for r in rows:
        exact = exact_by_day[r["day"]]
        assert abs(r["est_users"] - exact) <= max(3, 0.05 * exact)

    exact_total = ev.select("user_id").distinct().count()
    merged = merged_user_estimate(daily).collect()[0]
    assert abs(merged["est_total"] - exact_total) <= max(3, 0.05 * exact_total)
    assert merged["n_events"] == ev.count()

    # partition invariance of the merge
    re_part = daily_user_sketches(ev.repartition(13))
    merged2 = merged_user_estimate(re_part).collect()[0]
    assert merged2["est_total"] == merged["est_total"]
