"""Generic tick-table operators — the reference's query surface as reusable
DataFrame transforms over ANY (symbol, ts, price, volume, seq) frame.

These are the library form of q04-q08 (which bind them to `events`); the
golden-fixture tests (tests/test_golden_ticks.py) run them against
FIXTURES.md#F1, whose expectations were captured by executing the C++
reference binary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_scan(ticks: DataFrame, lo, hi, ts_col: str = "ts") -> DataFrame:
    """Inclusive-both-ends time range (reference S4, `timeseries_db.cpp:170-193`),
    sorted by the (ts, seq) total order.  An inverted range yields 0 rows
    (verified reference behavior)."""
    out = ticks.where((F.col(ts_col) >= lo) & (F.col(ts_col) <= hi))
    return out.orderBy(F.asc(ts_col), F.asc("seq"))


def point_lookup(ticks: DataFrame, t, ts_col: str = "ts") -> DataFrame:
    """Degenerate range: all ticks at exactly t."""
    return range_scan(ticks, t, t, ts_col)


def last_n(ticks: DataFrame, n: int, seq_col: str = "seq") -> DataFrame:
    """Last n rows in ARRIVAL order (reference S6, `timeseries_db.cpp:195-219`):
    by seq, not timestamp; emitted oldest-first; n > count returns all."""
    return (
        ticks.orderBy(F.desc(seq_col)).limit(n).orderBy(F.asc(seq_col))
    )


def tick_count(ticks: DataFrame) -> int:
    """Row count (reference S7)."""
    return ticks.count()
