"""Engine-independent exact rounding (oracle-parity discipline).

Two sources of cross-engine float divergence exist for money metrics:

1. **Partial-sum ordering** — Spark's shuffle order vs any other engine's
   scan order make ``SUM(double)`` differ in final ulps. Fixed by summing
   exact integer fixed-point longs (``money_fixed``): source money values
   are exact multiples of 1e-4, so the scaled longs are exact.

2. **Rounding-mode on shortest-repr** — Java's ``round(x, 2)`` rounds the
   *shortest decimal representation* of the double (BigDecimal.valueOf →
   Double.toString → HALF_UP) while DuckDB/C++ round the *binary value*
   (std::round(x*100)/100). For a quotient like 1398694250/10000 both
   engines hold the identical double ≈139869.42499999999 but Spark prints
   "139869.425" and rounds it to .43 while DuckDB rounds the binary to .42.

   Fixed by rounding in integer space before ever leaving fixed point:

       round_half_up(p / q, s) = (p·10^s·2 + q) div (2·q) / 10^s

   with p, q BIGINT. Both engines then divide the *same* integer by the
   same power of ten — bit-identical doubles out.

``div`` (Spark) and ``//`` (DuckDB) BOTH truncate toward zero
(empirically pinned: -3 // 2 = -1 in DuckDB, same as Spark's div) — the
engines agree on every sign. The sign-split is needed anyway because
truncation is not HALF-AWAY-FROM-ZERO for negative numerators (the bare
``(p·2s + q) div (2q)`` shortcut lands a hash-consistent but wrongly
rounded value), so the formula rounds the MAGNITUDE and reapplies the
sign (half away from zero — also both engines' native ROUND semantics).
Overflow headroom: |p|·10^s·2 must stay below
2^63 ≈ 9.2e18 — with money fixed-point p ≤ 1e13 (1e9 money units/group)
and s=6 the worst case is ~2e19; callers with ratio-scale rounding must
keep p below ~4.6e12, which every per-key group satisfies by orders of
magnitude (grand totals at 100 TB should use DECIMAL paths instead).

Second-tier bound (r12, hypothesis-found): ENGINE parity (identical
doubles out — what the oracle hash gate stands on) holds for every
input, but equality with the exact decimal additionally requires the
scaled integer |round(p·10^s/q)| ≤ 2^53 — past double's integer-exact
range the final ÷10^s itself rounds, identically on both engines but
one ulp off the true decimal. Every money (cents ≤ ~9e14) and ratio
(≤ 10^10 at s=6) column satisfies it; outputs that could exceed ~9e15
at scale s should lower s or emit the fixed-point BIGINT directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DIV = {"spark": "div", "duckdb": "//"}


def round_div_expr(num: str, den: str, scale: int, dialect: str) -> str:
    """SQL text for exact HALF-AWAY-FROM-ZERO(num/den, scale) → DOUBLE.

    ``num`` and ``den`` are integer-typed SQL expressions; ``den`` must
    be positive (zero is the cross-engine crash-vs-NULL class — guard at
    the call site; see fixed_ratio_expr's precondition note). The
    internal multiplications are BIGINT-promoted here (the scale factor
    and the 2× are CAST to BIGINT), so INT-typed inputs — e.g. bare SQL
    integer literals, which parse as INT in Spark's ANSI mode — can't
    overflow 32-bit intermediates; found by the hypothesis property test
    with p=1074, s=6 (1074·2·10⁶ > 2³¹). The documented 2⁶³ headroom
    bound on |p|·10^s·2 (module docstring) still applies.

    SIGN-SAFE as of r11: the bare ``(p·2s + q) div (2q)`` shortcut is
    exact HALF_UP only for p ≥ 0. For negative p both engines truncate
    toward zero identically (hash-consistent, empirically pinned:
    DuckDB's integer ``//`` truncates like Spark's ``div``), but the
    produced value is NOT half-away-from-zero — e.g. p=-3, q=2, s=0
    yields -1 instead of -2 under a .5 boundary. The magnitude is
    rounded and the sign reapplied, which is exactly both engines'
    native ROUND semantics. For p ≥ 0 the result is bit-identical to
    the old formula.
    """
    ps = 10**scale
    d = _DIV[dialect]
    mag = (
        f"((ABS({num}) * CAST({2 * ps} AS BIGINT) + ({den})) {d} "
        f"(CAST(2 AS BIGINT) * ({den})))"
    )
    # divide by an *integer* literal: int/int is DOUBLE true-division in
    # both Spark SQL and DuckDB, while `x / 100.0` would be DECIMAL math
    # in Spark (decimal-point literals parse as DecimalType).
    return (
        f"CAST((CASE WHEN ({num}) >= 0 THEN {mag} ELSE -{mag} END) "
        f"/ {ps} AS DOUBLE)"
    )


def round_div(num: str, den: str, scale: int) -> Column:
    """Spark Column for exact HALF_UP(num/den, scale); args are SQL
    fragments referencing in-scope column names."""
    return F.expr(round_div_expr(num, den, scale, "spark"))


def fixed_ratio_expr(num: str, den: str, scale: int, dialect: str) -> str:
    """Exact HALF_UP(num/den · 10^scale) as a BIGINT — the all-integer
    sibling of ``round_div_expr`` for when the *output column* must stay
    integer (hash-robust across engines and across any downstream float
    normalization; e.g. basis-point ratios). ``num``/``den`` are
    non-negative integer SQL expressions; same 2^63 headroom bound on
    num·10^scale·2 as the module docstring.

    Precondition (same as ``round_div_expr``): ``den`` must be a
    provably NONZERO expression — a zero denominator yields NULL in
    non-ANSI Spark but raises in DuckDB, a cross-engine divergence.
    Call sites with a possibly-zero denominator must guard with
    CASE/``F.when`` before reaching this formula."""
    assert scale >= 0, f"scale must be non-negative, got {scale}"
    ps = 10**scale
    d = _DIV[dialect]
    return (
        f"CAST(((({num}) * CAST({2 * ps} AS BIGINT) + ({den})) {d} "
        f"(CAST(2 AS BIGINT) * ({den}))) AS BIGINT)"
    )


def fixed_ratio(num: str, den: str, scale: int) -> Column:
    """Spark Column for exact integer HALF_UP(num/den · 10^scale)."""
    return F.expr(fixed_ratio_expr(num, den, scale, "spark"))


def round_div_signed_expr(num: str, den: str, scale: int, dialect: str) -> str:
    """Alias of ``round_div_expr`` — which is itself sign-safe as of
    r11 (see its docstring); kept so existing signed call sites read
    explicitly."""
    return round_div_expr(num, den, scale, dialect)


def round_div_signed(num: str, den: str, scale: int) -> Column:
    return F.expr(round_div_signed_expr(num, den, scale, "spark"))


def unfix_expr(fixed: str, scale: int, dialect: str, fp: int = 10_000) -> str:
    """Fixed-point long (1e-4 units) → money DOUBLE rounded to ``scale``."""
    return round_div_expr(fixed, str(fp), scale, dialect)


def unfix(fixed: str, scale: int = 2) -> Column:
    return F.expr(unfix_expr(fixed, scale, "spark"))
