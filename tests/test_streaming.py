"""Streaming ingest equivalence: AvailableNow stream-ingest of the events
table must equal the direct batch load (SURVEY.md §5.2), and the
watermarked windowed aggregate must equal its batch twin over on-time data."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import table
from low_latency_time_series_database_tsdb_for_market_data_spark.streaming import (
    ingest_available_now,
    windowed_counts_stream,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.ticks import tick_view


def test_stream_ingest_equals_batch(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="tsdb_stream_")
    try:
        ingest_available_now(
            spark,
            f"{sf_dir}/events*.parquet",
            f"{tmp}/table",
            f"{tmp}/ckpt",
        )
        ingested = spark.read.parquet(f"{tmp}/table")
        direct = tick_view(spark, sf_dir)
        assert ingested.count() == direct.count()
        # value-level equivalence on a deterministic digest
        def digest(df):
            return df.agg(
                F.sum("seq").alias("s"),
                F.sum(F.round(F.col("price") * 100).cast("bigint")).alias("p"),
                F.sum("volume").alias("v"),
                F.countDistinct("symbol").alias("k"),
                F.max("ts").alias("mx"),
                F.min("ts").alias("mn"),
            ).collect()[0]
        assert digest(ingested) == digest(direct)
        # layout contract: partitioned by symbol
        names = {r.symbol for r in ingested.select("symbol").distinct().collect()}
        assert len(names) >= 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_stream_equals_batch_twin(spark, sf_dir):
    agg = windowed_counts_stream(spark, f"{sf_dir}/events*.parquet")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql(
        "SELECT window.start AS bucket, event_type, n, avg_value FROM win_out"
    )
    ev = table(spark, sf_dir, "events")
    batch = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0
            / F.count(F.lit(1)),
            4,
        ).alias("avg_value"),
    )
    a = sorted(streamed.collect())
    b = sorted(batch.collect())
    assert a == b
