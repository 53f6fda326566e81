"""Bucketed table layout — the co-located-join path.

At 100 TB the dominant recurring cost is re-shuffling fact tables for
every key join.  Bucketing amortizes it: write once hash-partitioned
(and optionally sorted) on the join key, then every subsequent equi-join
or aggregation on that key reads co-located buckets and skips its
exchange entirely (tests/test_bucketing.py asserts the plan has zero
shuffle exchanges for a bucketed-bucketed join).

The reference has a degenerate form of this idea: one directory per
symbol IS a single-key bucket layout (`column_storage.cpp:13-18`) —
bucketing generalizes it to any key and any bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str | list[str],
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist df as a bucketed (optionally bucket-sorted) catalog table.

    ``bucket_col`` may be a list for composite-key joins — Spark's
    co-partition check (`spark.sql.requireAllClusterKeysForCoPartition`,
    default true) only skips the exchange when the bucket columns equal
    the JOIN keys exactly, so bucket on the full key set a consumer
    joins on, not a subset."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
