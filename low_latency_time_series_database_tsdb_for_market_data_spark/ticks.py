"""Tick view: maps the driver's `events` table onto the reference Tick model.

Reference row is ``struct Tick { uint64 timestamp; double price; uint64
volume; }`` plus an implicit symbol (directory name) and implicit arrival
order (row index) — `timeseries_db.hpp:19-24`, `column_storage.cpp:13-18`.
Spark has no physical row order, so arrival order is an explicit ``seq``
column (SURVEY.md §1.3); per FIXTURES.md §B the mapping over `events` is
``event_type→symbol, ts→timestamp, value→price, event_id→seq``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import table


def tick_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` re-expressed as the reference's tick table."""
    return table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        F.col("ts"),
        F.col("value").alias("price"),
        F.col("user_id").alias("volume"),
        F.col("event_id").alias("seq"),
    )
