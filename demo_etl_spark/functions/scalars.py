"""Scalar expression library (SURVEY.md §2.8).

Thin wrappers over built-in ``pyspark.sql.functions`` where the reference's
semantics need pinning — money rounding (generate-test-data.scala:133,167),
guarded ratios (generate-asset.scala:75-84), Java-enum day/month names
(generate-asset.scala:133,181-188), and tagged asset ids
(generate-asset.scala:193,201,209). Everything stays JVM-side /
whole-stage-codegen — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_SCALE = 2
RATIO_SCALE = 6


#: fixed-point scale for exact money aggregation: 1e-4 money units.
FIXED_POINT = 10_000


def money_round(c: Column, scale: int = MONEY_SCALE) -> Column:
    """Cents rounding — the reference's float-money discipline
    (``math.round(x*100)/100.0``, generate-test-data.scala:133)."""
    return F.round(c, scale)


def money_fixed(c: Column) -> Column:
    """Money expression → exact integer ten-thousandths (BIGINT).

    Source money columns carry ≤2 decimals and discount rates ≤2 decimals,
    so every money expression is an exact multiple of 1e-4: scaling by 1e4
    and rounding recovers the exact integer. Aggregating these longs is
    bit-exact and engine-independent — float partial-sum ordering (which
    differs between Spark's shuffle order and any oracle engine) can no
    longer flip a rounding boundary. Overflow bound: sums stay exact below
    2^63/1e4 ≈ 9.2e14 money units per group — far beyond any per-key group
    even at 100 TB; grand totals beyond that should use DECIMAL(38,4).

    try_cast, not cast: a NaN/Infinity measure must become NULL (skipped
    by SUM) on BOTH engines — a plain cast CRASHES under Spark 4's ANSI
    mode and DuckDB alike, so one bad double would abort whole queries
    instead of being excluded (r7 hostile repro). The quarantine
    operators drop such rows up front where identity/time analytics
    demand it; try_cast is the defense-in-depth for every other path.
    """
    return F.round(c * FIXED_POINT).try_cast("long")


def money_unfixed(c: Column, scale: int = MONEY_SCALE) -> Column:
    """Exact fixed-point long → rounded DOUBLE money value."""
    return F.round(c / FIXED_POINT, scale)


def sql_money_fixed(expr: str) -> str:
    """DuckDB twin of :func:`money_fixed` for oracle SQL strings."""
    return f"TRY_CAST(ROUND(({expr}) * {FIXED_POINT}, 0) AS BIGINT)"


def safe_ratio(num: Column, den: Column, scale: int | None = RATIO_SCALE) -> Column:
    """num/den with NULL (not error / NaN) when den = 0 — the reference's
    guarded-division idiom (generate-asset.scala:75-78,84)."""
    out = F.when(den != 0, num / den)
    return F.round(out, scale) if scale is not None else out


def is_weekend(ts: Column) -> Column:
    """Saturday/Sunday flag (reference is_weekend, SURVEY §1.3).

    Spark ``dayofweek`` is 1=Sunday..7=Saturday; oracle twin uses
    ``isodow(ts) IN (6,7)`` — identical semantics.
    """
    return F.dayofweek(ts).isin(1, 7)


def day_name_upper(d: Column) -> Column:
    """Upper-case day name (MONDAY..SUNDAY) matching the Java
    ``DayOfWeek.toString`` values the reference joins on
    (generate-asset.scala:133,188; SURVEY §7 risk 6)."""
    return F.upper(F.date_format(d, "EEEE"))


def month_name_upper(d: Column) -> Column:
    """Upper-case month name (JANUARY..DECEMBER) matching Java
    ``Month.toString`` (generate-asset.scala:181,187-188)."""
    return F.upper(F.date_format(d, "MMMM"))


def final_price(extended: Column, discount_rate: Column) -> Column:
    """extended_price net of discount: the star-schema realization of the
    reference's ``final_price = extended_price - discount_amount``
    (SURVEY §1.3; FIXTURES.md §B mapping)."""
    return extended * (F.lit(1.0) - discount_rate)


def tagged_id(prefix: str, c: Column) -> Column:
    """'CUST_'||id style asset ids (generate-asset.scala:193,201,209)."""
    return F.concat(F.lit(prefix), c.cast("string"))
