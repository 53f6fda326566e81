"""Source/sink roundtrips: every supported format must reproduce the tick
table bit-for-bit (timestamps through JSONL/CSV string forms included)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.sources.formats import (
    FORMATS,
    read_table,
    write_table,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.ticks import tick_view


@pytest.fixture(scope="module")
def ticks(spark, sf_dir):
    return tick_view(spark, sf_dir)


def digest(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("seq").alias("s"),
        F.sum(F.round(F.col("price") * 100).cast("bigint")).alias("p"),
        F.sum("volume").alias("v"),
        F.countDistinct("symbol").alias("k"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    ).collect()[0]


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(spark, ticks, fmt):
    tmp = tempfile.mkdtemp(prefix=f"tsdb_fmt_{fmt}_")
    try:
        write_table(ticks, f"{tmp}/t", fmt=fmt)
        back = read_table(spark, f"{tmp}/t", ticks.schema, fmt=fmt)
        assert digest(back) == digest(ticks)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_presorted_write_keeps_time_clustered_stats(spark):
    """The presorted + target_files fast path must not trade away the
    time index: writing a time-ordered source through it has to produce
    files whose ts footer ranges do not overlap (coalesce merges ADJACENT
    partitions, so time-contiguous inputs stay time-contiguous), keeping
    row-group min/max pruning as selective as the sorted slow path."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from low_latency_time_series_database_tsdb_for_market_data_spark.sources.writer import (
        write_ticks,
    )

    n = 200_000
    gen = spark.range(n).select(
        F.lit("CLUST").alias("symbol"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("ts"),
        (F.col("id") % 100 / 10.0).alias("price"),
        F.lit(1).alias("volume"),
        F.col("id").alias("seq"),
    )
    tmp = tempfile.mkdtemp(prefix="tsdb_presort_")
    try:
        write_ticks(gen, f"{tmp}/t", mode="overwrite", presorted=True,
                    target_files=4)
        files = sorted(Path(f"{tmp}/t").glob("**/*.parquet"))
        assert 1 < len(files) <= 4
        ranges = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx["ts"]).statistics
                assert st is not None and st.has_min_max
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi < lo, f"overlapping file time ranges: {ranges}"
        # and the rows all arrived
        back = spark.read.parquet(f"{tmp}/t")
        assert back.count() == n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
