"""Bit-deterministic float aggregation helpers.

Distributed SUM/AVG over doubles is order-dependent in the last bits, and
the driver's correctness gate hashes exact values against a DuckDB oracle.
All money-like columns in the testdata are exact 2-decimal values, so the
engine sums them as integer cents (exact, order-independent, overflow-safe
up to ~9e16 cents) and divides once at the end.  The per-element
``round(x*scale)`` is a single IEEE op on identical inputs, so Spark and
DuckDB produce identical integers; integer sums then match bit-for-bit at
any parallelism — this is what makes the same query hash-stable on 32 local
threads and on a 1000-executor cluster.

Oracle-side mirrors (DuckDB SQL): ``SUM(CAST(ROUND(x * 100) AS BIGINT))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact integer representation of a fixed-decimal double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale)).cast("bigint")


def money_sum(col: Column | str, scale: int = 100) -> Column:
    """Order-independent SUM of a fixed-decimal double (returns double)."""
    return F.sum(cents(col, scale)) / F.lit(float(scale))


def money_avg(col: Column | str, scale: int = 100) -> Column:
    """Order-independent AVG of a fixed-decimal double (returns double)."""
    return F.sum(cents(col, scale)) / F.lit(float(scale)) / F.count(F.lit(1))


def ratio_e4(num_sql: str, den_sql: str) -> Column:
    """ROUND(num/den, 4) decided ENTIRELY in exact integer arithmetic for
    integer num (any sign) and positive integer den, given as SQL
    fragments over already-aliased columns:

        floor((2a + b) / (2b)) = round-half-up of a/b, then /10000.0.

    Why: double ``round()`` diverges between engines on .00005 ties —
    Spark rounds the shortest decimal rendering of the double, DuckDB the
    exact binary value (observed: 18 tie buckets at sf0.1 in q36, 4 in
    q21).  Integer-decided, the same number leaves both engines.

    Domain: num must be NON-NEGATIVE (den positive) — on that domain
    Spark's ``div`` and DuckDB's ``//`` agree (truncation == floor).  For
    signed numerators use :func:`ratio_e4_signed`, which sign-splits (on
    negatives the two engines' integer divisions disagree: Spark ``div``
    and DuckDB ``//`` truncate toward zero, where the formula needs
    floor).  Operands are DECIMAL(38,0) so ``a*20000`` cannot overflow
    even at 100 TB-scale cents sums (~1e20); DuckDB's integer SUM is
    already HUGEINT, same headroom.

    Oracle mirror: ``((a) * 20000 + (b)) // (2 * (b)) / 10000.0``."""
    return ratio_round(num_sql, den_sql, 4)


def ratio_round(num_sql: str, den_sql: str, decimals: int) -> Column:
    """ROUND(num/den, decimals) decided in exact integer arithmetic —
    see :func:`ratio_e4` for rationale and domain (num >= 0, den > 0).

    Oracle mirror: ``((a) * {2*10^d} + (b)) // (2 * (b)) / {10^d}.0``."""
    f = 10 ** decimals
    a = f"CAST(({num_sql}) AS DECIMAL(38,0))"
    b = f"CAST(({den_sql}) AS DECIMAL(38,0))"
    return F.expr(f"((({a}) * {2 * f} + ({b})) div (2 * ({b})))") / float(f)


def ratio_e4_signed(num_sql: str, den_sql: str) -> Column:
    """ratio_e4 for a numerator of either sign: |num|/den rounds half
    AWAY from zero (a fixed, engine-identical convention), then the sign
    is reapplied.  Exact 4-decimal values (e.g. -2.5) are unchanged.

    Oracle mirror:
    ``CASE WHEN (a) < 0 THEN -((-(a)*20000 + (b)) // (2*(b)))
           ELSE (((a)*20000 + (b)) // (2*(b))) END / 10000.0``."""
    a = f"CAST(({num_sql}) AS DECIMAL(38,0))"
    b = f"CAST(({den_sql}) AS DECIMAL(38,0))"
    pos = f"((({a}) * 20000 + ({b})) div (2 * ({b})))"
    neg = f"-(((-({a})) * 20000 + ({b})) div (2 * ({b})))"
    return F.expr(f"(CASE WHEN ({a}) < 0 THEN {neg} ELSE {pos} END)") / 10000.0
