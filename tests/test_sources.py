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
