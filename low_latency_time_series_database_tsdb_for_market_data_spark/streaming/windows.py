"""Streaming window operators over the tick stream — the streaming
capability block the reference lacks entirely (its only state is the
ingest queue, `timeseries_db.hpp:88-97`).  Every operator here is a
standard Structured Streaming shape: watermark bounds state, windowed
aggregation shuffles on (window, key), and state store size is
O(open windows x keys) — constant per key over time, so these run
forever at ingest rates the micro-batch scheduler can sustain.

Batch twins (q21 tumbling / q22 OHLC) are DuckDB-oracle checked; these
streaming forms are equivalence-tested against their batch twins over a
replayed events table (tests/test_streaming.py) — the honest check for
streaming semantics, since an oracle cannot replay a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import open_tick_stream


def tick_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source tick stream with a normalized `ts_event` event-time
    column (schema-adaptive — see ingest.open_tick_stream)."""
    return open_tick_stream(spark, source_dir)


def sliding_vwap_stream(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window VWAP per symbol: each event lands in
    window/slide overlapping windows; partial aggregates are map-side so
    the shuffle carries one row per (window, symbol) per batch."""
    return (
        stream.withWatermark("ts_event", watermark)
        .groupBy(
            F.window("ts_event", window, slide).alias("w"),
            F.col("event_type").alias("symbol"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact integer cents in the numerator (value is 2-decimal,
            # user_id integral, so value*user_id is cent-exact): partial
            # aggregates merge in arrival order, which differs run to run
            # — a raw double sum could round the 4th decimal differently
            # across micro-batch splits (the rollup bug class)
            F.round(
                F.try_divide(
                    F.sum(
                        F.round(F.col("value") * F.col("user_id") * 100).cast(
                            "bigint"
                        )
                    ),
                    100 * F.sum(F.col("user_id")),
                ),
                4,
            ).alias("vwap"),
        )
    )


def session_window_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per symbol: a session closes after `gap` of
    silence.  Spark merges overlapping sessions in the state store; the
    watermark lets closed sessions emit and their state drop."""
    return (
        stream.withWatermark("ts_event", watermark)
        .groupBy(
            F.session_window("ts_event", gap).alias("w"),
            F.col("event_type").alias("symbol"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact cents sum, one divide — order-independent (see vwap)
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0,
                4,
            ).alias("sum_value"),
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming form of q50.  State holds one key per event inside the
    horizon and is purged as the watermark advances (bounded memory; an
    unbounded dropDuplicates would leak state forever at 100 TB/day)."""
    return stream.withWatermark("ts_event", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    left_key: str = "user_id",
    right_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static enrichment: join a live tick/event stream to a
    batch dimension (CRM, instrument master) — Spark runs the static
    side as a broadcast rebuilt per micro-batch, so the streaming plan
    stays stateless (no watermark, no state store) and dimension
    updates between batches are picked up automatically.  LEFT join:
    events with no dimension row flow through with NULL attributes
    rather than silently dropping."""
    return stream.join(
        F.broadcast(dim), stream[left_key] == dim[right_key], "left"
    )
