"""Testdata catalog: parquet table loading + temp-view registration.

The reference binds one process to one symbol directory of raw column files
(`column_storage.cpp:13-18`); here the catalog is simply partition-prunable
parquet read through the DataFrame API so Catalyst gets pushdown and column
pruning for free (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table.

    Sets UTC session TZ defensively so timestamp values compare cleanly
    against the DuckDB oracle regardless of who built the session.

    `events.ts` is physically parquet TIMESTAMP(NANOS) which Spark cannot
    map to a Catalyst type; we read it via the legacy nanos-as-long path and
    rebuild a microsecond timestamp (`timestamp_micros(ns div 1000)`), which
    is exactly DuckDB's nanos->micros truncation.  The div/cast is a cheap
    codegen'd projection and does not block predicate pushdown on the
    underlying int64 column.
    """
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` with `ts` left as raw int64 nanoseconds.

    Time-range operators filter on this column so the comparison reaches the
    parquet scan as a pushed filter on the physical int64 (row-group min/max
    pruning — the Spark analogue of the reference's B+ tree range probe,
    `bplus_tree.hpp:70-91`), then convert to timestamp on the surviving rows.
    """
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def with_ts(df: DataFrame) -> DataFrame:
    """Convert `events_raw`'s int64-nanos ts into a microsecond timestamp."""
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
