"""Stream-stream join: same-symbol tick pairs within a time bound.

The streaming twin of q17's interval self-join — two independent tick
streams joined on symbol with a two-sided event-time bound.  Structured
Streaming keeps each side's rows in the state store only until the other
side's watermark passes the bound, so state is O(rate x bound), never
unbounded: exactly the discipline an always-on 100 TB/day correlation
job needs.  Equivalence vs the batch q17 is tested over a replayed
events table (tests/test_streaming.py) — the honest check, since no SQL
oracle can replay a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import tick_stream


def interval_pair_stream(
    spark: SparkSession,
    source_dir: str,
    bound_seconds: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (id_a < id_b) of same-symbol events within +/-bound_seconds,
    as an append-mode stream-stream inner join.

    Both inputs carry a watermark and the join condition bounds b's event
    time relative to a's in BOTH directions — the two requirements that
    let Spark expire join state.  The equality on event_type makes the
    state-store shuffle key (symbol), matching every other per-symbol
    operator in the engine."""
    a = tick_stream(spark, source_dir).withWatermark("ts_event", watermark)
    b = (
        tick_stream(spark, source_dir)
        .withWatermark("ts_event", watermark)
        .select(
            F.col("event_type").alias("event_type_b"),
            F.col("event_id").alias("id_b"),
            F.col("ts_event").alias("ts_event_b"),
        )
    )
    cond = (
        (F.col("event_type") == F.col("event_type_b"))
        & (F.col("event_id") < F.col("id_b"))
        & (
            F.col("ts_event_b")
            >= F.col("ts_event") - F.expr(f"interval {bound_seconds} seconds")
        )
        & (
            F.col("ts_event_b")
            <= F.col("ts_event") + F.expr(f"interval {bound_seconds} seconds")
        )
    )
    return a.join(b, cond).select(
        "event_type",
        F.col("event_id").alias("id_a"),
        "id_b",
    )
