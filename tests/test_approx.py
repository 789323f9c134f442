"""Error-envelope pins for the approx twins (VERDICT r7 #6).

The two documented 100 TB swaps — ``approx_count_distinct`` for the A5
exact countDistincts and ``percentile_approx`` for the source-profile
length percentiles — are registered as rows-only gate entries (sketch
state is engine-specific, the sketch family's declared oracle
exception). These tests pin what the gate can't: the estimates must
land inside their published error envelopes against the EXACT builds,
and every non-sketched column must be bit-identical.
"""

from __future__ import annotations


def test_customer_analytics_approx_error_envelope(spark, sf_dir):
    from demo_etl_spark.operators import customer as C

    exact = {
        r["customer_id"]: r
        for r in C.build(spark, sf_dir).collect()
    }
    approx = {
        r["customer_id"]: r
        for r in C.build_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx), "row set must not change"

    # HLL++ default rsd = 5%; per-row envelope is probabilistic, so pin
    # a generous per-row bound AND a tight aggregate-mean bound
    worst = 0.0
    total_rel = 0.0
    for cid, e in exact.items():
        a = approx[cid]
        for col in ("total_orders", "unique_products_purchased"):
            rel = abs(a[col] - e[col]) / max(e[col], 1)
            worst = max(worst, rel)
            total_rel += rel
        # everything not derived from a distinct count is untouched by
        # the swap and must be bit-identical
        for col in (
            "total_spent",
            "first_purchase_date",
            "last_purchase_date",
            "weekend_spending",
            "weekday_spending",
            "days_since_last_purchase",
            "days_as_customer",
            "weekend_shopper_ratio",
        ):
            assert a[col] == e[col], f"{col} changed under the approx swap"
    n = 2 * len(exact)
    assert worst <= 0.25, f"worst-case relative error {worst:.3f} > 25%"
    assert total_rel / n <= 0.05, (
        f"mean relative error {total_rel / n:.4f} breaches the 5% rsd"
    )


def test_source_profile_approx_brackets_exact(spark, sf_dir):
    import math

    from pyspark.sql import functions as F

    from demo_etl_spark.io import load_star
    from demo_etl_spark.operators import text as T

    exact = {r["source"]: r for r in T.build_source_profile(spark, sf_dir).collect()}
    approx = {
        r["source"]: r
        for r in T.build_source_profile_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)

    # the real sketch contract: with n << accuracy the estimate is an
    # ACTUAL element within one rank of the exact interpolation bracket
    # (percentile definitions differ in rank convention by up to one) —
    # pin against the per-source sorted length lists themselves
    docs = load_star(spark, sf_dir)["documents"]
    lengths: dict[str, list[int]] = {}
    for r in (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("long").alias("nt")
        )
        .where(F.col("nt").isNotNull())
        .collect()
    ):
        lengths.setdefault(r["source"], []).append(r["nt"])

    for src, e in exact.items():
        a = approx[src]
        for col in ("n_docs", "total_tokens", "total_chars", "avg_tokens"):
            assert a[col] == e[col], f"{col} changed under the approx swap"
        if e["p50_tokens"] is None:
            continue  # all-NULL-text source: both paths emit NULL pcts
        assert a["p10_tokens"] <= a["p50_tokens"] <= a["p90_tokens"]
        vals = sorted(lengths[src])
        n = len(vals)
        for q, col in (
            (0.1, "p10_tokens"), (0.5, "p50_tokens"), (0.9, "p90_tokens")
        ):
            pos = q * (n - 1)
            lo = vals[max(0, math.floor(pos) - 1)]
            hi = vals[min(n - 1, math.ceil(pos) + 1)]
            assert lo <= a[col] <= hi, (
                f"{src}.{col}: approx {a[col]} outside the one-rank "
                f"envelope [{lo}, {hi}] (exact {e[col]})"
            )


def test_approx_twins_registered_without_oracle():
    """Registry discipline: both twins must be in queries() (driver
    rows-only seat) and ABSENT from oracle_sql() (no fake oracle)."""
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in ("customer_analytics_approx", "source_profile_approx"):
        assert name in qs
        assert name not in oracles
    # r9 verdict item 2: the rows-only twins must stay OUT of the driver
    # window permanently — a no-oracle seat can never hash-match and
    # burns a seat as a red `err` (one did in each of r8 and r9). They
    # live at the very bottom of queries(); the error envelopes are
    # pinned by the pytest cases above instead.
    window = list(qs)[:50]
    assert "customer_analytics_approx" not in window
    assert "source_profile_approx" not in window
