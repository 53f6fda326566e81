"""Partitioned, sorted tick writer — the batch half of the ingest path.

Replaces the reference's writer thread + per-symbol column files
(`timeseries_db.cpp:60-155`, `column_storage.cpp:178-261`) with the layout
discipline SURVEY.md §4.2.1 calls for:

  * ``partitionBy(symbol)`` — the directory-per-symbol model, but pruned by
    Catalyst instead of chosen by hand;
  * ``sortWithinPartitions(ts)`` — parquet row-group min/max stats become a
    selective time index (the B+ tree's job, for free at read time);
  * parquet atomic commit protocol — replaces the reference's
    crash-unsafe MS_ASYNC header/data ordering (SURVEY.md §4.3.8).

``seq`` (arrival order) must be assigned by the SOURCE (e.g. event_id) —
never monotonically_increasing_id in a correctness path (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_ticks(
    ticks: DataFrame,
    path: str,
    mode: str = "append",
    symbol_col: str = "symbol",
    ts_col: str = "ts",
) -> None:
    """Append ticks to a partitioned, time-sorted parquet table.

    Range-partitioning on (symbol, ts) — NOT ``repartition(symbol)`` —
    keeps the write parallel per symbol: a hot symbol spreads across
    many tasks, each emitting a contiguous time slice, so every file in
    a symbol's directory is still ts-sorted with disjoint min/max row
    groups (pruning stays selective) while ingest throughput scales
    with cores instead of with symbol count."""
    (
        ticks.repartitionByRange(symbol_col, ts_col)
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .partitionBy(symbol_col)
        .parquet(path)
    )


def read_ticks(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
