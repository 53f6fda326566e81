"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in
``low_latency_time_series_database_tsdb_for_market_data_spark`` — this file
is a thin adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (  # noqa: E402
    load_all,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's S4 inclusive time-range scan) on
    /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_all()
    return reg["q04_range_scan"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted entries get rows-only checks."""
    return {
        name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None
    }
