"""Invariant tests for the reference-surface operators (SURVEY.md §5).

The oracle harness (tools/verify_oracle.py) checks exact cross-engine
equality; these tests pin *semantic invariants* that would survive a
refactor of the oracle itself — the reference's documented relationships
(weekend+weekday=total, rank≤3 per category, union sizing, calendar frames).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_customer_weekend_plus_weekday_equals_total(tables):
    from demo_etl_spark.operators.customer import customer_analytics

    df = customer_analytics(tables["lineitem"], tables["orders"], tables["customer"])
    bad = df.filter(
        F.abs(
            F.col("weekend_spending") + F.col("weekday_spending")
            - F.col("total_spent")
        )
        > 0.011  # two independent cent-roundings
    )
    assert bad.count() == 0


def test_customer_score_sign_and_dates(tables):
    from demo_etl_spark.operators.customer import customer_analytics

    df = customer_analytics(
        tables["lineitem"], tables["orders"], tables["customer"]
    ).cache()
    assert df.filter(F.col("first_purchase_date") > F.col("last_purchase_date")).count() == 0
    assert df.filter(F.col("days_since_last_purchase") < 0).count() == 0
    # anchor is after all data: every customer gets the −0.2 recency factor
    assert df.filter(F.col("customer_value_score") < 0).count() == 0


def test_purchase_frequency_anchored_on_first_purchase(spark):
    """Pins the reference's definition (generate-asset.scala:73-78):
    purchase_frequency_days = datediff(anchor, first_purchase) /
    (total_orders − 1) — anchor−first, NOT last−first."""
    import datetime as dt

    from demo_etl_spark.context import RunContext
    from demo_etl_spark.operators.customer import customer_analytics

    ctx = RunContext(anchor_date=dt.date(2002, 1, 1))
    orders = spark.createDataFrame(
        [(1, 10, dt.datetime(2001, 1, 1)), (2, 10, dt.datetime(2001, 12, 22))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(1, 5, 1.0, 100.0, 0.0), (2, 5, 1.0, 100.0, 0.0)],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    customer = spark.createDataFrame([(10, "c10")], "c_custkey long, c_name string")
    row = customer_analytics(lineitem, orders, customer, ctx).first()
    assert row["days_as_customer"] == 365  # 2001-01-01 → 2002-01-01
    assert row["days_since_last_purchase"] == 10
    # anchor−first = 365 over (2−1) orders; last−first would give 355
    assert row["purchase_frequency_days"] == 365.0


def test_product_ranking_top3_flag(tables):
    from demo_etl_spark.operators.product import product_ranking

    df = product_ranking(tables["lineitem"], tables["orders"], tables["part"]).cache()
    # is_top_seller ⟺ rank ≤ 3 (modulo ties, count per category ≥ 3 possible)
    mismatch = df.filter(
        (F.col("revenue_rank_in_category") <= 3) != F.col("is_top_seller")
    )
    assert mismatch.count() == 0
    # percent_rank bounded [0, 1]
    assert df.filter(
        (F.col("percent_rank_in_category") < 0) | (F.col("percent_rank_in_category") > 1)
    ).count() == 0


def test_trend_moving_avg_calendar_frame(spark):
    """RANGE frame must be calendar days (gaps count), not 7 rows."""
    from demo_etl_spark.operators.timeseries import revenue_trend

    rows = [
        # one order/line per date; 10-day gap between 2nd and 3rd date
        (1, datetime.datetime(2001, 1, 1), 100.0),
        (2, datetime.datetime(2001, 1, 2), 200.0),
        (3, datetime.datetime(2001, 1, 12), 400.0),
    ]
    lineitem = spark.createDataFrame(
        [(k, 1, 1.0, v, 0.0, d) for k, d, v in rows],
        "l_orderkey long, l_partkey long, l_quantity double, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(k, k) for k, _, _ in rows], "o_orderkey long, o_custkey long"
    )
    out = {r["date"]: r for r in revenue_trend(lineitem, orders).collect()}
    # Jan 2: window covers Jan 1-2 → avg 150
    assert out[datetime.date(2001, 1, 2)]["revenue_7day_avg"] == 150.0
    # Jan 12: 10-day gap → window covers only Jan 12 → avg 400 (NOT 3-row avg)
    assert out[datetime.date(2001, 1, 12)]["revenue_7day_avg"] == 400.0


def test_backlog_difference_array_semantics(spark):
    """Pins the interval semantics: close = GREATEST(order, last ship)
    + 1 day (ship-before-order spans ≥ 1 day), unshipped orders never
    close, and the timeline is the sparse delta-date set with an exact
    running backlog."""
    import datetime as dt

    from demo_etl_spark.operators.timeseries import orders_backlog_timeline

    d = lambda n: dt.datetime(2024, 1, n)  # noqa: E731
    orders = spark.createDataFrame(
        [
            (1, 1, d(1), 10.0),  # ships Jan 3 → closes Jan 4
            (2, 1, d(2), 10.0),  # no lines → never closes
            (3, 1, d(5), 10.0),  # line "shipped" Jan 1 → closes Jan 6
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(1, d(2)), (1, d(3)), (3, d(1))],
        "l_orderkey long, l_shipdate timestamp",
    )
    rows = {
        r["date"]: (r["n_opened"], r["n_closed"], r["open_backlog"])
        for r in orders_backlog_timeline(orders, lineitem).collect()
    }
    assert rows == {
        dt.date(2024, 1, 1): (1, 0, 1),
        dt.date(2024, 1, 2): (1, 0, 2),
        dt.date(2024, 1, 4): (0, 1, 1),
        dt.date(2024, 1, 5): (1, 0, 2),
        dt.date(2024, 1, 6): (0, 1, 1),
    }


def test_gapfill_interp_line_and_brackets(spark):
    """Pins the linear interpolation: gap hours land exactly on the
    time-weighted line between bracketing observations, a valueless
    hour (events present, NULL value) is NOT an observation, and hours
    outside the bracket interpolate to NULL."""
    import datetime as dt

    from demo_etl_spark.operators.events import gapfill_interp_hourly

    h = lambda k: dt.datetime(2024, 1, 1, k)  # noqa: E731
    rows = [
        (1, h(0), 7, "purchase", 10.0, None),
        # h(1), h(2): true gaps → 20.0, 30.0 on the line to h(3)
        (2, h(3), 7, "purchase", 40.0, None),
        # h(4): events exist but value NULL → NOT an observation
        (3, h(4), 7, "purchase", None, None),
        (4, h(6), 7, "purchase", 100.0, None),  # h(5): line 40→100
        # a second type pins partition isolation + the outside-bracket NULL
        (5, h(2), 7, "view", 1.0, None),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        (r["event_type"], r["hour"].hour): r
        for r in gapfill_interp_hourly(events).collect()
    }
    p = lambda k: out[("purchase", k)]  # noqa: E731
    assert p(0)["interp_value"] == 10.0 and p(0)["is_gap"] is False
    assert p(1)["interp_value"] == 20.0 and p(1)["is_gap"] is True
    assert p(2)["interp_value"] == 30.0
    assert p(3)["interp_value"] == 40.0
    # h(4) is valueless: interpolates 40 → 100 over 3 hours = 60
    assert p(4)["is_gap"] is True and p(4)["interp_value"] == 60.0
    assert p(5)["interp_value"] == 80.0
    assert p(6)["interp_value"] == 100.0
    # 'view' observed only at h(2): before/after the bracket → NULL
    assert out[("view", 2)]["interp_value"] == 1.0
    assert out[("view", 0)]["interp_value"] is None
    assert out[("view", 6)]["interp_value"] is None


def test_gapfill_interp_matches_reference_on_random_series(spark):
    """Property pin: on random sparse hourly observations the grid
    interpolation equals an independent Python implementation of the
    cross-multiplied formula (exact cents, HALF_UP 2dp), including the
    outside-bracket NULLs."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from demo_etl_spark.operators.events import gapfill_interp_hourly

    @settings(max_examples=5, deadline=None)
    @given(
        st.dictionaries(
            st.integers(min_value=0, max_value=30),  # hour slots
            st.integers(min_value=-50_00, max_value=50_00),  # cents
            min_size=1,
            max_size=8,
        )
    )
    def check(obs):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i + 1, t0 + dt.timedelta(hours=hr), 7, "view", c / 100.0, None)
            for i, (hr, c) in enumerate(sorted(obs.items()))
        ]
        events = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        got = {
            int((r["hour"] - t0).total_seconds() // 3600): r["interp_value"]
            for r in gapfill_interp_hourly(events).collect()
            if r["event_type"] == "view"
        }
        hours = sorted(obs)
        lo, hi = hours[0], hours[-1]
        assert set(got) == set(range(lo, hi + 1))  # grid spans bounds

        def half_up(num, den):  # sign-safe HALF_UP(num/den, 2) on cents
            m, s = (num, 1) if num >= 0 else (-num, -1)
            return s * ((m * 2 + den) // (2 * den)) / 100.0

        for h in range(lo, hi + 1):
            if h in obs:
                assert got[h] == half_up(obs[h], 1)
                continue
            p = max(x for x in hours if x < h)
            n = min(x for x in hours if x > h)
            num = obs[p] * (n - p) + (obs[n] - obs[p]) * (h - p)
            assert got[h] == half_up(num, n - p)

    check()


def test_cusum_closed_form_hand_series(spark):
    """Pins the CUSUM prefix closed form on a hand-computed series
    (100, 100, 100, 1000 dollars): the deficit CUSUM peaks on day 3
    (drift_down fires), the day-4 spike pays it back and trips
    drift_up, and the mean-days ratios are exact HALF_UP 4dp."""
    from demo_etl_spark.operators.timeseries import revenue_cusum

    revs = [100.0, 100.0, 100.0, 1000.0]  # mean 325 → dev -225 ×3, +675
    lineitem = spark.createDataFrame(
        [
            (k + 1, 1, 1.0, v, 0.0, datetime.datetime(2024, 1, k + 1))
            for k, v in enumerate(revs)
        ],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(k + 1, 1) for k in range(4)], "o_orderkey long, o_custkey long"
    )
    out = {r["date"]: r for r in revenue_cusum(lineitem, orders).collect()}
    d = lambda n: datetime.date(2024, 1, n)  # noqa: E731
    assert out[d(1)]["dev_from_mean"] == -225.0
    assert out[d(4)]["dev_from_mean"] == 675.0
    # S' = (-90000, -180000, -270000, 0) cents·days; total_cc = 130000
    assert out[d(3)]["cusum_down_mean_days"] == round(270000 / 130000, 4)
    assert out[d(3)]["drift_down"] is True  # 270000 > 2·130000
    assert out[d(2)]["drift_down"] is False  # 180000 < 260000
    assert out[d(4)]["cusum_up_mean_days"] == round(270000 / 130000, 4)
    assert out[d(4)]["drift_up"] is True
    assert out[d(1)]["cusum_up_mean_days"] == 0.0  # clamped at zero


def test_cusum_equals_direct_recurrence_on_random_series(spark):
    """Property pin: the window closed form S'_k − min(0, runmin)
    equals the DIRECT clamped recurrence max(0, S_{k-1} + dev_k) (and
    symmetrically for the downward side) on random daily series."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from demo_etl_spark.operators.timeseries import revenue_cusum

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2_000_00),  # cents
            min_size=1,
            max_size=20,
        )
    )
    def check(cents):
        lineitem = spark.createDataFrame(
            [
                (k + 1, 1, 1.0, c / 100.0, 0.0,
                 dt.datetime(2024, 1, 1) + dt.timedelta(days=k))
                for k, c in enumerate(cents)
            ],
            "l_orderkey long, l_partkey long, l_quantity double, "
            "l_extendedprice double, l_discount double, l_shipdate timestamp",
        )
        orders = spark.createDataFrame(
            [(k + 1, 1) for k in range(len(cents))],
            "o_orderkey long, o_custkey long",
        )
        rows = sorted(
            revenue_cusum(lineitem, orders).collect(), key=lambda r: r["date"]
        )
        # direct recurrence reference (cents·days units, like the op)
        d_days = len(cents)
        total = sum(cents)
        up = down = 0
        for r, c in zip(rows, cents):
            dev = c * d_days - total
            up = max(0, up + dev)
            down = max(0, down - dev)
            assert r["drift_up"] == (up > 2 * total)
            assert r["drift_down"] == (down > 2 * total)
            if total:
                # exact HALF_UP(up/total, 4) in integer space — the
                # round_div spelling (operands non-negative here)
                assert r["cusum_up_mean_days"] == (
                    (up * 20000 + total) // (2 * total)
                ) / 10000.0
                assert r["cusum_down_mean_days"] == (
                    (down * 20000 + total) // (2 * total)
                ) / 10000.0
            else:
                assert r["cusum_up_mean_days"] is None

    check()


def test_asset_union_size_and_null_padding(spark, tables, sf_dir):
    from demo_etl_spark.operators import asset, customer, product
    from demo_etl_spark.schemas import SALES_ANALYTICS_ASSET

    df = asset.build(spark, sf_dir).cache()
    # schema is exactly the 23-column asset DDL
    assert [f.name for f in df.schema.fields] == [
        f.name for f in SALES_ANALYTICS_ASSET.fields
    ]
    n_cust = customer.build(spark, sf_dir).count()
    n_prod = product.build_ranking(spark, sf_dir).count()
    by_type = {r["asset_type"]: r["n"] for r in df.groupBy("asset_type").agg(F.count("*").alias("n")).collect()}
    assert by_type["customer"] == n_cust
    assert by_type["product"] == n_prod
    assert by_type.get("time", 0) > 0
    # null padding: product rows have no customer_id; customer rows no category
    assert df.filter((F.col("asset_type") == "product") & F.col("customer_id").isNotNull()).count() == 0
    assert df.filter((F.col("asset_type") == "customer") & F.col("category").isNotNull()).count() == 0


def test_detail_summary_union_null_keys(spark, sf_dir):
    from demo_etl_spark.operators import star

    df = star.build_union(spark, sf_dir).cache()
    summaries = df.filter(F.col("row_type") == "summary")
    details = df.filter(F.col("row_type") == "detail")
    assert summaries.filter(F.col("customer_id").isNotNull()).count() == 0
    # P1: null-rejecting filter recovers exactly the detail rows
    assert df.filter(F.col("customer_id").isNotNull()).count() == details.count()


def test_asof_join_tie_and_cutoff_semantics(spark):
    """Pins as-of semantics: same-timestamp purchase IS matched (>=),
    earlier events get NULLs, later purchases stay invisible."""
    import datetime as dt

    from demo_etl_spark.operators.temporal import asof_last_purchase

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        (1, t(10), 7, "purchase", 5.0, '{"k": 1}'),
        (2, t(10), 7, "click", 1.0, '{"k": 2}'),  # tie → matched
        (3, t(9), 7, "view", 1.0, None),  # before any purchase → NULL
        (4, t(11), 7, "click", 1.0, None),
        (5, t(12), 7, "purchase", 9.0, None),
        (6, t(12, 30), 7, "click", 1.0, None),  # newest purchase wins
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r for r in asof_last_purchase(events).collect()}
    assert len(out) == 4  # purchases are not left rows
    assert out[2]["last_purchase_event_id"] == 1
    assert out[2]["secs_since_purchase"] == 0
    assert out[2]["props_k"] == 2
    assert out[3]["last_purchase_event_id"] is None
    assert out[4]["last_purchase_event_id"] == 1
    assert out[6]["last_purchase_event_id"] == 5
    assert out[6]["secs_since_purchase"] == 1800
    assert out[6]["last_purchase_value"] == 9.0


def test_rate_limit_burst_refill_clamp(spark):
    """Pins the token-bucket recurrence: burst exhaustion at capacity,
    rejection once empty, linear refill with truncation, clamp back at
    capacity after a long gap, and per-user isolation."""
    import datetime as dt

    from demo_etl_spark.operators.temporal import (
        RL_CAP_MTOK,
        rate_limit_events,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # user 7: 4 rapid events — 3 admitted (burst), 4th rejected
        (1, s(0), 7, "click", 1.0, None),
        (2, s(1), 7, "click", 1.0, None),
        (3, s(2), 7, "click", 1.0, None),
        (4, s(3), 7, "click", 1.0, None),
        # half a day later: refill = 0.5 token < cost → still rejected
        (5, s(43_200), 7, "click", 1.0, None),
        # 1.5 days after event 5 → bucket 0.5 + 1.5 = 2.0 → admitted
        (6, s(43_200 + 129_600), 7, "click", 1.0, None),
        # 100 days later: clamped at capacity, then one consume
        (7, s(43_200 + 129_600 + 8_640_000), 7, "click", 1.0, None),
        # user 8 is isolated: full burst available
        (8, s(2), 8, "click", 1.0, None),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r for r in rate_limit_events(events).collect()}
    assert [out[i]["admitted"] for i in range(1, 8)] == [
        True, True, True, False, False, True, True,
    ]
    # 1-second gaps each refill (1e6·1e6)//86.4e9 = 11 µtok
    assert out[3]["bucket_mtok"] == 22
    # 43_197 s ≈ half a day → +499_965; 33 + it < cost, kept on reject
    assert out[5]["bucket_mtok"] == 499_998
    # +1.5 days = +1_500_000 exactly → admitted, one consume
    assert out[6]["bucket_mtok"] == 999_998
    assert out[7]["bucket_mtok"] == RL_CAP_MTOK - 1_000_000  # clamped
    assert out[8]["admitted"] and out[8]["bucket_mtok"] == RL_CAP_MTOK - 1_000_000


def test_rate_limit_identity_passthrough_exact(spark):
    """Pins the r14 single-pass kernel's identity pass-through: event_id
    rides through the Arrow kernel as a decimal string (a nullable int64
    pandas column would degrade to float64 and corrupt ids past 2^53),
    so hostile ids — 2^62-scale, negative, NULL — and µs-precision
    timestamps must round-trip bit-exactly, including timestamp ties
    where the numeric event_id order decides admission."""
    import datetime as dt

    from demo_etl_spark.operators.temporal import rate_limit_events

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)  # µs precision
    big = (1 << 62) + 3  # not representable in float64
    rows = [
        (big, t0, 7, "click", 1.0, None),
        (-5, t0, 7, "click", 1.0, None),  # tied ts: numeric order decides
        (2, t0, 7, "click", 1.0, None),
        (None, t0 + dt.timedelta(seconds=1), 7, "click", 1.0, None),
        (9, t0 + dt.timedelta(seconds=2), 7, "click", 1.0, None),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = rate_limit_events(events).collect()
    assert sorted(
        (r["event_id"] for r in out), key=lambda v: (v is None, v or 0)
    ) == [-5, 2, 9, big, None]
    by_id = {r["event_id"]: r for r in out}
    assert by_id[big]["ts"] == t0  # µs preserved through unix_micros
    # 3-token burst at one instant: the three tied rows all admit
    # (numeric order -5 < 2 < big, bucket 3 → 0), the NULL-id 4th
    # rejects, the 5th refills 2s worth (22 µtok) — still rejected
    assert by_id[-5]["admitted"] and by_id[2]["admitted"] and by_id[big]["admitted"]
    assert not by_id[None]["admitted"]
    assert not by_id[9]["admitted"] and by_id[9]["bucket_mtok"] == 22


def test_rate_limit_matches_reference_on_random_streams(spark):
    """Property pin: the distributed applyInPandas kernel equals an
    independent driver-side implementation of the same recurrence on
    random event streams (including exact-timestamp ties, where
    event_id order decides), and the bucket stays within [0, CAP]."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from demo_etl_spark.operators.temporal import (
        DAY_US,
        RL_CAP_MTOK,
        RL_COST_MTOK,
        RL_GAP_FULL_US,
        RL_REFILL_MTOK_PER_DAY,
        rate_limit_events,
    )

    def reference(offsets_sorted):
        b, prev, out = RL_CAP_MTOK, None, []
        for off in offsets_sorted:
            us = off * 1_000_000
            if prev is not None:
                gap = min(us - prev, RL_GAP_FULL_US)
                b = min(RL_CAP_MTOK, b + gap * RL_REFILL_MTOK_PER_DAY // DAY_US)
            ok = b >= RL_COST_MTOK
            if ok:
                b -= RL_COST_MTOK
            out.append((ok, b))
            prev = us
        return out

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=400_000),  # ≤ ~4.6 days
            min_size=1,
            max_size=30,
        )
    )
    def check(offsets):
        offsets = sorted(offsets)  # ties stay adjacent; event_id decides
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i + 1, t0 + dt.timedelta(seconds=off), 7, "click", 1.0, None)
            for i, off in enumerate(offsets)
        ]
        events = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        got = {
            r["event_id"]: (r["admitted"], r["bucket_mtok"])
            for r in rate_limit_events(events).collect()
        }
        for i, expect in enumerate(reference(offsets)):
            assert got[i + 1] == expect
            assert 0 <= got[i + 1][1] <= RL_CAP_MTOK

    check()


def test_range_join_window_boundaries(spark):
    """Bucketized range join: inclusive at +window, exclusive after, and
    pairs crossing an hour-bucket boundary are found exactly once."""
    import datetime as dt

    from demo_etl_spark.operators.temporal import purchase_followups

    base = dt.datetime(2024, 1, 1, 10, 30)  # mid-bucket anchor
    rows = [
        (1, base, 7, "purchase", 5.0, None),
        (2, base + dt.timedelta(seconds=3600), 7, "click", 1.0, None),  # in
        (3, base + dt.timedelta(seconds=3601), 7, "view", 1.0, None),  # out
        (4, base + dt.timedelta(minutes=45), 7, "click", 1.0, None),  # next bucket, in
        (5, base + dt.timedelta(minutes=10), 8, "click", 1.0, None),  # other user
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    pairs = {
        (r["purchase_event_id"], r["follow_event_id"], r["secs_after"])
        for r in purchase_followups(events).collect()
    }
    assert pairs == {(1, 2, 3600), (1, 4, 2700)}


def test_date_dimension_java_enum_casing(spark):
    from demo_etl_spark.operators.timeseries import date_dimension

    row = date_dimension(spark).filter(F.col("date") == "2001-01-01").first()
    assert row["day_of_week"] == "MONDAY"
    assert row["month_name"] == "JANUARY"
    assert row["month_num"] == 1 and row["year"] == 2001


def test_funnel_requires_ordered_progression(spark):
    """A click BEFORE the user's first view that day must not count as a
    funnel conversion; one at/after it must."""
    import datetime as dt

    from demo_etl_spark.operators.events import daily_funnel

    d = dt.datetime(2024, 5, 1, 12, 0)
    rows = [
        # user 1: click precedes the first view → no click conversion
        (1, d, 1, "click", 1.0, None),
        (2, d + dt.timedelta(minutes=5), 1, "view", 1.0, None),
        # user 2: view → click → purchase in order → full conversion
        (3, d, 2, "view", 1.0, None),
        (4, d + dt.timedelta(minutes=1), 2, "click", 1.0, None),
        (5, d + dt.timedelta(minutes=2), 2, "purchase", 1.0, None),
        # user 3: purchase before any click → no purchase conversion
        (6, d, 3, "view", 1.0, None),
        (7, d + dt.timedelta(minutes=1), 3, "purchase", 1.0, None),
        (8, d + dt.timedelta(minutes=2), 3, "click", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = daily_funnel(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_view_users"] == 3
    assert r["n_click_users"] == 2  # users 2 and 3 (click after view)
    assert r["n_purchase_users"] == 1  # only user 2 purchased after click


def test_benford_digit_extraction_and_bp(spark):
    """Pins the leading-digit lift and exact-bp math: digits come from
    the ten-thousandths BIGINT string, NULL/zero/negative amounts are
    excluded (and counted on the digit-1 row), zero-count digits emit
    grid rows, and the Benford literals sum to exactly 10000 bp."""
    from demo_etl_spark.operators.quality import (
        BENFORD_BP,
        orders_benford_audit,
    )

    assert sum(BENFORD_BP.values()) == 10000
    orders = spark.createDataFrame(
        [(123.45,), (19.99,), (2000.0,), (-5.0,), (None,), (0.0,)],
        "o_totalprice double",
    )
    out = {r["digit"]: r for r in orders_benford_audit(orders).collect()}
    assert sorted(out) == list(range(1, 10))  # all 9 grid rows
    assert out[1]["n_amounts"] == 2 and out[2]["n_amounts"] == 1
    assert out[1]["observed_bp"] == 6667  # HALF_UP(2/3 · 10⁴)
    assert out[1]["deviation_bp"] == 6667 - 3010
    assert out[3]["n_amounts"] == 0 and out[3]["observed_bp"] == 0
    assert out[1]["excluded_rows"] == 3 and out[2]["excluded_rows"] == 0


def test_quality_audit_flags_injected_violations(spark, sf_dir, tables):
    """All-zero on the healthy warehouse; injected orphans/dups/domain
    breaches are counted exactly."""
    from pyspark.sql import functions as F

    from demo_etl_spark.operators.quality import data_quality_audit

    healthy = {r["check"]: r["n_violations"]
               for r in data_quality_audit(tables).collect()}
    # the synthetic generator draws ship/order dates independently, so
    # ship-before-order legitimately fires — the audit is a REPORT; every
    # enforced invariant of the testdata must be clean
    assert healthy.pop("lineitem_ship_before_order") > 0
    assert set(healthy.values()) == {0}

    broken = dict(tables)
    bad_orders = spark.createDataFrame(
        [(999_999_001, 888_888_001, -5.0, None, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    broken["orders"] = (
        tables["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
                "o_orderpriority")
        .unionByName(bad_orders)
        .unionByName(bad_orders)  # duplicate pk ×2
    )
    audit = {r["check"]: r["n_violations"]
             for r in data_quality_audit(broken).collect()}
    assert audit["orders_orphan_custkey"] == 2
    assert audit["orders_dup_pk"] == 1
    assert audit["orders_negative_totalprice"] == 2


def test_hourly_anomaly_flags_injected_spike(spark):
    """A flat series is never flagged; a 10× spike after 24 steady hours
    is; and the exact-integer test agrees with a float z-score oracle."""
    import datetime as dt

    from demo_etl_spark.operators.events import hourly_anomaly

    base = dt.datetime(2024, 3, 1, 0, 0)
    rows, eid = [], 0
    for h in range(30):
        # steady 5 events/hour, except hour 27: 50 events (the spike);
        # tiny jitter (4/5/6) so trailing variance is nonzero
        n = 50 if h == 27 else (4 + (h % 3))
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=i % 60), 1,
                 "click", 1.0, None)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["hour_start"].hour + 24 * (r["hour_start"].day - 1): r["is_anomaly"]
           for r in hourly_anomaly(ev).collect()}
    assert out[27] is True
    assert all(v is False for h, v in out.items() if h != 27)
