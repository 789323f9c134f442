"""Unit tests for the KMV cardinality sketch and the key-skew profiler.

Fixture-level pins (the cross-engine oracle equivalence is separately
gated by tools/verify_oracle.py over all four corpora): the exact
column must be truly exact, the sketch must be exact below K and inside
its accuracy envelope above K, and the skew profiler must rank the hot
key first with the right fixed-point ratios.
"""

from __future__ import annotations

from pyspark.sql import Row

from demo_etl_spark.operators.sketch import KMV_K, kmv_distinct
from demo_etl_spark.operators.skew import key_skew_profile


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t or ""))
         for i, (t, s) in enumerate(rows)]
    )


def test_kmv_exact_below_k(spark):
    # 3 docs, 6 distinct bigrams total — far below K=64, so the sketch
    # must equal the exact count with zero error
    df = kmv_distinct(
        _docs(spark, [("a b c", "s1"), ("a b d", "s1"), ("x y", "s2")])
    )
    got = {r["source"]: r for r in df.collect()}
    # s1 bigrams: "a b", "b c", "b d" ; s2: "x y"
    assert got["s1"]["n_distinct_exact"] == 3
    assert got["s1"]["kmv_estimate"] == 3
    assert got["s1"]["err_bp"] == 0
    assert got["s2"]["n_distinct_exact"] == 1
    assert got["s2"]["kmv_estimate"] == 1


def test_kmv_null_and_whitespace_hostile(spark):
    # NULL text, empty text and multi-space runs contribute no bigrams;
    # a source with ONLY such docs disappears entirely (no group row)
    df = kmv_distinct(
        _docs(
            spark,
            [(None, "s1"), ("", "s1"), ("  ", "s1"), ("a  b", "s1"),
             ("p q r", "s2")],
        )
    )
    got = {r["source"]: r for r in df.collect()}
    # "a  b" splits to [a, '', b] — both bigrams touch the empty token
    assert "s1" not in got
    assert got["s2"]["n_distinct_exact"] == 2


def test_kmv_estimator_envelope_above_k(spark):
    # 2000 distinct bigrams from a deterministic chain doc: the
    # estimator path (h_K present) must engage and land within a loose
    # 5/sqrt(K) band (~62 %) — deterministic given the md5 hash, the
    # band just guards against decimal/overflow regressions
    text = " ".join(f"w{i}" for i in range(2001))  # 2000 distinct bigrams
    df = kmv_distinct(_docs(spark, [(text, "big")]))
    row = df.collect()[0]
    assert row["n_distinct_exact"] == 2000
    assert row["kmv_estimate"] != 2000  # estimator, not the exact fallback
    assert abs(row["kmv_estimate"] - 2000) / 2000 < 5 / (KMV_K ** 0.5)
    assert row["err_bp"] == round(
        abs(row["kmv_estimate"] - 2000) * 10000 / 2000
    )


def test_key_skew_profile_ranks_hot_key(spark):
    # 60 rows on key 7, 1 row each on 20 cold keys, 3 NULL-key rows:
    # the hot key leads, the NULL group competes like any key, and the
    # fixed-point ratios match hand computation
    rows = [Row(o_custkey=7) for _ in range(60)]
    rows += [Row(o_custkey=100 + i) for i in range(20)]
    rows += [Row(o_custkey=None) for _ in range(3)]
    df = key_skew_profile(spark.createDataFrame(rows))
    out = df.collect()
    assert len(out) == 10
    top = out[0]
    assert top["key"] == 7 and top["freq"] == 60
    assert top["total_rows"] == 83 and top["n_keys"] == 21
    # freq_bp = HALF_UP(60/83 * 10000) = 7229
    assert top["freq_bp"] == 7229
    # mean non-null freq = 80/21; skew ×100 = HALF_UP(60*21/80*100) = 1575
    assert top["skew_x100"] == 1575
    # NULL group (freq 3) outranks the 20 singleton keys
    assert out[1]["key"] is None and out[1]["freq"] == 3
    # remaining seats: coldest keys ascending (tie-broken by key)
    assert [r["key"] for r in out[2:]] == [100 + i for i in range(8)]


# ---------------------------------------------- property: bit-exactness --
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_kmv(texts: list[str | None]) -> tuple[int, int]:
    """Pure-Python replica of the engine's KMV over one source:
    (exact_distinct_bigrams, kmv_estimate)."""
    bigrams = set()
    for t in texts:
        toks = (t or "").split(" ")
        for a, b in zip(toks, toks[1:]):
            if a and b:
                bigrams.add(f"{a} {b}")
    exact = len(bigrams)
    hs = sorted(
        (int(hashlib.md5(g.encode()).hexdigest()[:13], 16), g)
        for g in bigrams
    )
    if exact < KMV_K:
        return exact, exact
    h_k = hs[KMV_K - 1][0]
    return exact, (KMV_K - 1) * (16 ** 13) // max(h_k, 1)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=30),
            min_size=0, max_size=60,
        ).map(lambda ws: " ".join(f"w{w}" for w in ws)),
        min_size=1, max_size=25,
    )
)
def test_kmv_matches_pure_python_replica(spark, docs_texts):
    # small random vocab (31 words) over up to 25 docs: crosses the
    # below-K/above-K boundary across examples. The engine result must
    # BIT-match the pure-Python replica — same md5, same integer
    # division — not just land in an accuracy envelope.
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(docs_texts)
    ]
    out = kmv_distinct(spark.createDataFrame(rows)).collect()
    exact, est = _py_kmv(docs_texts)
    if exact == 0:
        assert out == []
    else:
        (row,) = out
        assert (row["n_distinct_exact"], row["kmv_estimate"]) == (exact, est)
