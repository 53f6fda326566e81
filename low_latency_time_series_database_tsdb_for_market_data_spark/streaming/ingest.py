"""Structured Streaming ingest — the reference's async writer pipeline
re-expressed as micro-batch streaming (SURVEY.md §1.3, §3.2):

    reference                      Spark
    ---------                      -----
    append/append_batch enqueue    readStream source
    writer thread drains <=1000    micro-batch trigger (AvailableNow here)
    column appends + header flush  foreachBatch -> partitioned parquet
    sync() flush barrier           query.processAllAvailable()/awaitTermination

Out-of-order timestamps are accepted forever by the reference (verified);
the streaming aggregation path bounds that with an explicit watermark —
the documented late-data policy the reference never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.writer import write_ticks

def require_nanos_as_long(spark: SparkSession) -> None:
    """The events parquet is physically TIMESTAMP(NANOS); reading it with
    TICK_STREAM_SCHEMA's LongType ts requires the legacy nanos-as-long
    path.  Every streaming reader sets it here so standalone use works —
    never rely on a prior catalog.table() call having set it session-wide
    (PARQUET_TYPE_ILLEGAL otherwise)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


TICK_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # int64 nanos on disk (events table)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def ingest_available_now(
    spark: SparkSession, source_dir: str, dest_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently in source_dir into the partitioned tick
    table at dest_dir, then stop — the streaming equivalent of the
    reference's append_batch + sync().  Exactly-once via checkpoint +
    parquet commit protocol.

    source_dir must be a directory or glob (Spark's file stream source
    rejects a bare file path), e.g. ``.../sf0.01/events*.parquet``."""
    require_nanos_as_long(spark)
    stream = (
        spark.readStream.schema(TICK_STREAM_SCHEMA)
        .parquet(source_dir)
        .withColumn("ts_event", F.expr("timestamp_micros(ts div 1000)"))
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        ticks = batch_df.select(
            F.col("event_type").alias("symbol"),
            F.col("ts_event").alias("ts"),
            F.col("value").alias("price"),
            F.col("user_id").alias("volume"),
            F.col("event_id").alias("seq"),
        )
        write_ticks(ticks, dest_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts_stream(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over the tick stream — the
    streaming twin of q21_time_bucket.  Rows later than the watermark are
    dropped (explicit late-data policy); state is bounded by
    watermark/window, so it runs forever at 100 TB/day."""
    require_nanos_as_long(spark)
    stream = (
        spark.readStream.schema(TICK_STREAM_SCHEMA)
        .parquet(source_dir)
        .withColumn("ts_event", F.expr("timestamp_micros(ts div 1000)"))
    )
    return (
        stream.withWatermark("ts_event", watermark)
        .groupBy(F.window("ts_event", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
    )
