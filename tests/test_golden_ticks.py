"""Golden semantics tests — FIXTURES.md#F1/#F2: expectations captured by
running the C++ reference binary (SURVEY.md §2.1 observed behavior)."""

from __future__ import annotations

from pathlib import Path

import pytest

from low_latency_time_series_database_tsdb_for_market_data_spark.operators import (
    tickops,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.sources import (
    read_tick_csv,
)

F1_ROWS = [
    # (seq, ts, price, volume) — symbol DEMO
    (0, 1000, 10.50, 100),
    (1, 1003, 11.25, 200),
    (2, 1001, 10.75, 150),
    (3, 1001, 99.99, 999),
    (4, 1002, 12.00, 300),
]


@pytest.fixture(scope="module")
def ticks(spark):
    return spark.createDataFrame(
        [("DEMO", ts, price, vol, seq) for seq, ts, price, vol in F1_ROWS],
        "symbol string, ts long, price double, volume long, seq long",
    )


def test_range_inclusive_both_ends(ticks):
    rows = tickops.range_scan(ticks, 1000, 1002).collect()
    assert [r.seq for r in rows] == [0, 2, 3, 4]  # ts=1003 excluded
    assert [r.ts for r in rows] == [1000, 1001, 1001, 1002]  # ts-sorted


def test_range_point(ticks):
    rows = tickops.point_lookup(ticks, 1001).collect()
    assert sorted(r.seq for r in rows) == [2, 3]


def test_range_inverted_empty(ticks):
    assert tickops.range_scan(ticks, 9999, 0).count() == 0


def test_last_n_arrival_order(ticks):
    rows = tickops.last_n(ticks, 3).collect()
    # arrival order, NOT ts order: seq 2,3,4 (ts=1003/seq=1 absent), oldest first
    assert [r.seq for r in rows] == [2, 3, 4]


def test_last_n_clamps(ticks):
    assert tickops.last_n(ticks, 100).count() == 5


def test_count(ticks):
    assert tickops.tick_count(ticks) == 5


def test_csv_import_f2(spark):
    path = Path(__file__).parent / "fixtures" / "ticks_malformed.csv"
    df = read_tick_csv(spark, str(path))
    rows = sorted(df.collect(), key=lambda r: r.ts)
    # reference keeps 3 rows (4-field row survives, header/bad/xx dropped)
    # and we report the TRUE count, not the reference's misprint of 5
    assert [(r.ts, r.price, r.volume) for r in rows] == [
        (2000, 50.5, 10),
        (2001, 51.0, 20),
        (2003, 52.5, 40),
    ]
