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
