"""Order-independent money/metric aggregates.

Double addition is order-dependent, and partition layout differs between
harness sessions, so ``round(sum(double), 2)`` can flip its last cent
when the true sum sits near a rounding boundary (observed: q05 revenue
.18 vs .17 at 32 vs 8 shuffle partitions). These helpers make the whole
aggregate exact and engine-identical:

1. per row, scale to micro-units and round to LONG —
   ``CAST(round(e * 1e6) AS BIGINT)``. The input double is bit-identical
   in Spark and DuckDB, and for money/metric expressions whose true
   value has <= 6 decimals the long is the exact scaled value; for
   arbitrary doubles the 1e-6 pre-rounding is part of the query
   contract, mirrored on both sides.
2. sum LONGs — exact, order-free, whole-stage-codegen fast (measured
   ~1.6x a plain double sum vs ~2.6x for a decimal(30,8) sum).
3. round to the output scale in INTEGER space (half away from zero) —
   no double ever gets rounded, so engine round() semantics (Spark's
   shortest-repr HALF_UP vs DuckDB's C round) can't diverge on
   boundary values. The final division by a power of ten happens on a
   value < 2^53, where doubles are exact.

Domain: |e| < 9e12 per row and |sum| < 9e18 micro-units — comfortably
beyond any money/metric column here. True half-away-from-zero rounding
is guaranteed for |sum| up to ~1.4e17 micro-units; beyond that the
finalizers degrade to engine-agreement-only (see ``_int_div``). Pair
each Spark helper with its ``sql_*`` DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _micro(c: Column) -> Column:
    """round-half-up(c * 1e6) as LONG via a single floor — F.round on
    doubles goes through BigDecimal per row (~1.5x the whole aggregate),
    and a sign-splitting CASE re-evaluates the (often compound) input
    expression per branch (measured 2x on q01's seven aggregates).
    floor(x + 0.5) rounds halves toward +inf instead of away from zero,
    but the SQL twin uses the IDENTICAL formula so both engines always
    agree — and ties cannot occur anyway (the scaled true value is
    integral for fixed-point inputs and never exactly .5 otherwise)."""
    return F.floor(c * _MICRO + F.lit(0.5))


def _micro_sum(c: Column) -> Column:
    return F.sum(_micro(c))


def _int_div(n: Column, d: Column) -> Column:
    """Exact n div d for non-negative longs with n possibly > 2^53.
    Strip the remainder (long arithmetic) so the true quotient is
    integral, divide in double, and round off the conversion error:
    |double(x) - x| <= ulp(n)/2, which is <= 8 for n <= ~1.4e17, so the
    quotient is within 8/d < 0.5 of the exact integer for every d >= 32.
    Above ~1.4e17 the conversion error can reach ulp(9e18)/2 = 1024 and
    the claim weakens to ENGINE AGREEMENT: Spark and the SQL twin run the
    identical IEEE double path, so the oracle always matches, but a
    |sum| beyond ~1.4e17 micro-units (1.4e11 in output units) with small
    d may differ from true half-away rounding by one output step. No
    column here approaches that magnitude. (A decimal division was exact
    everywhere, but its codegen cost ~0.3s PER QUERY — measured on q01's
    seven finalizers over six rows.)"""
    exact = n - F.pmod(n, d)
    return F.round(exact / d).cast("long")


def _round_scaled(micro: Column, out_scale: int) -> Column:
    """Half-away-from-zero rounding of a micro-unit LONG to ``out_scale``
    decimals, entirely in integer space; returns double.

    Supported scales: 0..4 (rounding step >= 100 micro-units, inside
    ``_int_div``'s d >= 32 exactness bound) and >= 6 (micro-units carry
    at most 6 decimals, so there is nothing left to round). scale 5
    (step 10) would need an integer division below that bound and is
    rejected rather than silently misrounded."""
    if out_scale >= 6:  # already at or beyond micro precision
        return (micro / F.lit(float(10**6))).cast("double")
    if out_scale == 5:
        raise ValueError(
            "out_scale=5 unsupported: its 10-micro rounding step is below "
            "_int_div's exactness bound (d >= 32); use scale <= 4 or >= 6"
        )
    down = 10 ** (6 - out_scale)  # micro-units per output unit step
    a = F.abs(micro) + F.lit(down // 2)
    q = _int_div(a, F.lit(down))
    signed = F.when(micro < 0, -q).otherwise(q)
    return (signed / F.lit(float(10**out_scale))).cast("double")


def micro_col(c: Column | str) -> Column:
    """Public per-row micro-unit conversion — pre-project this ONCE as a
    real column when several aggregates share the input (aggregate-buffer
    expressions are not always deduplicated), then finalize with
    ``finalize_sum`` / ``finalize_avg`` over ``F.sum(micro)``."""
    return _micro(_col(c))


def finalize_sum(micro_sum: Column, scale: int = 2) -> Column:
    """Round an aggregated micro-unit LONG sum to ``scale`` (double)."""
    return _round_scaled(micro_sum, scale)


def finalize_avg(micro_sum: Column, cnt: Column, scale: int = 4) -> Column:
    """Exact rounded mean from an aggregated micro sum + row count."""
    down_per_unit = 10 ** (6 - scale)  # even for every scale <= 5
    d = cnt * F.lit(down_per_unit)
    b = F.abs(micro_sum) + cnt * F.lit(down_per_unit // 2)
    q = _int_div(b, d)
    signed = F.when(micro_sum < 0, -q).otherwise(q)
    return (signed / F.lit(float(10**scale))).cast("double")


def exact_sum(c: Column | str, scale: int = 2) -> Column:
    """Order-independent rounded sum of a double expression (see module
    docstring). Output double, like ``F.round(F.sum(c), scale)``."""
    return _round_scaled(_micro_sum(_col(c)), scale)


def exact_avg(c: Column | str, scale: int = 4) -> Column:
    """Order-independent rounded mean: exact micro-unit sum divided by
    the non-null count with integer half-away rounding at ``scale``."""
    c = _col(c)
    return finalize_avg(_micro_sum(c), F.count(c), scale)


def _sql_int_div(n: str, d: str) -> str:
    """Dialect-neutral exact integer division — same remainder-strip +
    round scheme as ``_int_div`` (and the same bound: exact for
    d >= 32)."""
    return f"CAST(round((({n}) - ({n}) % ({d})) / ({d})) AS BIGINT)"


def _sql_micro(e: str) -> str:
    """SQL twin of ``_micro`` (floor-based; CAST(double AS BIGINT)
    truncates in Spark but ROUNDS in DuckDB, so the explicit floor keeps
    both dialects on the same integer)."""
    return f"CAST(floor(({e}) * {_MICRO} + 0.5) AS BIGINT)"


def sql_exact_sum(e: str, scale: int = 2) -> str:
    """SQL twin of ``exact_sum`` — dialect-neutral (runs under BOTH
    DuckDB and Spark SQL; q05 feeds the same text to each)."""
    down = 10 ** (6 - scale)
    s = f"sum({_sql_micro(e)})"
    a = f"(abs({s}) + {down // 2})"
    q = _sql_int_div(a, str(down))
    return f"CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) * {q} / {float(10 ** scale)} AS DOUBLE)"


def sql_finalize_sum(s: str, scale: int = 2) -> str:
    """SQL twin of ``finalize_sum`` for an ALREADY-aggregated micro-unit
    sum expression — e.g. a windowed ``sum(micro) OVER (...)`` where the
    micro conversion and the aggregation are written separately."""
    down = 10 ** (6 - scale)
    a = f"(abs({s}) + {down // 2})"
    q = _sql_int_div(a, str(down))
    return f"CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) * {q} / {float(10 ** scale)} AS DOUBLE)"


def sql_finalize_avg(s: str, cnt: str, scale: int = 4) -> str:
    """SQL twin of ``finalize_avg`` for an already-aggregated micro sum
    plus non-null count (incremental state finalization)."""
    down = 10 ** (6 - scale)
    d = f"(({cnt}) * {down})"
    b = f"(abs({s}) + ({cnt}) * {down // 2})"
    q = _sql_int_div(b, d)
    return f"CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) * {q} / {float(10 ** scale)} AS DOUBLE)"


def sql_exact_avg(e: str, scale: int = 4) -> str:
    """SQL twin of ``exact_avg`` — dialect-neutral."""
    down = 10 ** (6 - scale)
    s = f"sum({_sql_micro(e)})"
    d = f"(count({e}) * {down})"
    b = f"(abs({s}) + count({e}) * {down // 2})"
    q = _sql_int_div(b, d)
    return f"CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) * {q} / {float(10 ** scale)} AS DOUBLE)"

# ---------------------------------------------------------------------------
# Wide (decimal-backed) variants — the >= sf1e4 path.
#
# The long-backed ``exact_sum`` is exact while |sum| < 9e18 micro-units.
# Per-GROUP money sums stay far inside that at any realistic scale, but a
# GLOBAL money total does not: TPC-H revenue is ~2.2e11 units at sf1, so
# ~2.2e16 units = 2.2e22 micro at sf1e5 (100 TB) — Spark raises
# ARITHMETIC_OVERFLOW (ANSI) while DuckDB widens to HUGEINT silently.
# These variants keep the per-row micro conversion bit-identical (same
# query contract, same hashes on in-domain data) but aggregate the micro
# longs into DECIMAL(38,0) and do the half-away rounding in integer
# (decimal/HUGEINT) space, so the ONLY double rounding on either engine
# is the final correctly-rounded int->double cast followed by one
# identical IEEE division by 10^scale. ("Correctly rounded" needs care
# on the twin side: DuckDB's direct HUGEINT->DOUBLE cast is NOT — see
# _sql_hugeint_to_double.) Cost: a decimal sum is ~2.6x a
# long sum ON THE AGGREGATE (measured round 3); use them for global/
# coarse-group money totals when the target scale exceeds ~sf1e3, keep
# the long path for per-key aggregation. Output stays DOUBLE like the
# narrow variants (a total past 2^53 micro is no longer exactly
# representable as a double; the rounded quotient's nearest double is
# what both engines return, identically).
#
# Domain bound (scale <= 4): Spark's decimal(38,0)/decimal(38,0)
# division yields decimal(38,6), capping the integer quotient at 1e32
# output steps — so the wide path is exact for |sum| up to about
# 1e32 * 10^(6-scale) micro-units (1e36 micro = 1e30 units at the
# default scale=2), NOT the full 1e38 the decimal(38,0) sum itself can
# hold; past that Spark raises (quotient overflow / abs(s)+half-step
# overflow near the 1e38 edge) rather than returning a wrong number.
# At 100 TB (sf1e5) global revenue is ~2.2e22 micro — 14 orders of
# magnitude of headroom. scale >= 6 divides exactly at full 1e38 range.
# ---------------------------------------------------------------------------

_DEC = "decimal(38,0)"


def exact_sum_wide(c: Column | str, scale: int = 2) -> Column:
    """Order-independent rounded sum, exact (true half-away rounding) to
    |sum| < ~1e32 * 10^(6-scale) micro-units — see the domain-bound note
    above. Same per-row micro rounding as ``exact_sum``; decimal
    aggregation; one int->double cast + one division at the very end."""
    if not (0 <= scale <= 4 or scale >= 6):
        raise ValueError("scale 5 unsupported (see _round_scaled)")
    s = F.sum(_micro(_col(c)).cast(_DEC))
    if scale >= 6:
        # No rounding step exists at micro-or-finer scales. Cast the
        # exact integer micro sum to double (correctly rounded), then
        # one IEEE division — the twin mirrors both steps exactly.
        # (An exact decimal division here would be correctly rounded to
        # the true value, but DuckDB has no exact decimal division —
        # its `/` on HUGEINT/DECIMAL is float division — so the twin
        # could drift 1 ulp. Identical cast+divide on both engines is
        # the portable contract; deviation from the TRUE value is
        # <= 1 ulp only past 2^53 micro.)
        return (s.cast("double") / F.lit(float(10**6))).cast("double")
    down = 10 ** (6 - scale)
    # decimal integer floor-divide: strip the remainder, then divide —
    # all exact in decimal space (pmod of non-negative decimals). The
    # quotient is an integral decimal(38,6); dividing it by the double
    # literal casts it to double (correctly rounded) first.
    a = F.abs(s) + F.lit(down // 2).cast(_DEC)
    q = (a - F.pmod(a, F.lit(down).cast(_DEC))) / F.lit(down).cast(_DEC)
    signed = F.when(s < 0, -q).otherwise(q)
    return (signed / F.lit(float(10**scale))).cast("double")


def _sql_hugeint_to_double(x: str) -> str:
    """Correctly-rounded HUGEINT->DOUBLE. DuckDB's direct
    CAST(HUGEINT AS DOUBLE) is NOT correctly rounded past 2^64 (~2% of
    random 2^64..2^80 values land 1 ulp off the nearest double — ADVICE
    r11, re-verified empirically: 371/20000 direct-cast mismatches vs
    Python/Spark correct rounding, 0 via this route). Round-tripping
    through VARCHAR uses DuckDB's correctly-rounded decimal-string
    parser (fast_float), matching Java BigDecimal/Python exactly."""
    return f"CAST(CAST({x} AS VARCHAR) AS DOUBLE)"


def sql_exact_sum_wide(e: str, scale: int = 2) -> str:
    """DuckDB twin of ``exact_sum_wide``. The quotient uses HUGEINT
    INTEGER division (``//``) — DuckDB's ``/`` on HUGEINT is FLOAT
    division, which would round the >2^53 numerator to double BEFORE
    dividing and drift 1 ulp from Spark's exact decimal quotient (ADVICE
    r10, verified empirically) — and the final int->double cast goes
    through VARCHAR because the direct HUGEINT cast is not correctly
    rounded past 2^64 (ADVICE r11; see ``_sql_hugeint_to_double``).
    With both, the only double rounding is the same correctly-rounded
    final cast + / 10^scale Spark performs."""
    if not (0 <= scale <= 4 or scale >= 6):
        raise ValueError("scale 5 unsupported (see _round_scaled)")
    s = f"sum(CAST({_sql_micro(e)} AS HUGEINT))"
    if scale >= 6:
        return f"({_sql_hugeint_to_double(s)} / {float(10 ** 6)})"
    down = 10 ** (6 - scale)
    a = f"(abs({s}) + CAST({down // 2} AS HUGEINT))"
    q = f"(({a} - ({a} % CAST({down} AS HUGEINT))) // CAST({down} AS HUGEINT))"
    signed = f"(CASE WHEN {s} < 0 THEN -{q} ELSE {q} END)"
    return f"({_sql_hugeint_to_double(signed)} / {float(10 ** scale)})"
