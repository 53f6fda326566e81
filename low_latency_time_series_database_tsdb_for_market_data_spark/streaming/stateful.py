"""Custom stateful streaming operator: per-symbol running tick state.

The reference keeps exactly one piece of live state — the in-memory index
+ pending-writes counter a reader consults for "what's the latest?"
(`timeseries_db.cpp:195-219`).  The streaming generalization is a
per-symbol running snapshot (count / last price / min / max / vwap parts)
maintained with ``applyInPandasWithState``: Spark hash-partitions by
symbol, each micro-batch delivers that symbol's new rows as Arrow
batches, and the GroupState round-trips a tiny fixed-width tuple.  State
is O(1) per symbol, so a million symbols cost megabytes at 100 TB/day.

This is the `applyInPandasWithState` pattern the engine reserves for
semantics the built-in windowed aggregates cannot express (running
snapshots emitted per batch, not per closed window).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_price", T.DoubleType()),
        T.StructField("min_price", T.DoubleType()),
        T.StructField("max_price", T.DoubleType()),
        T.StructField("sum_pv", T.DoubleType()),
        T.StructField("sum_v", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_price", T.DoubleType()),
        T.StructField("min_price", T.DoubleType()),
        T.StructField("max_price", T.DoubleType()),
        T.StructField("sum_pv", T.DoubleType()),
        T.StructField("sum_v", T.DoubleType()),
    ]
)


def _update_symbol_state(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one symbol into the running snapshot.

    Arrival order within the batch follows the seq column (ties in a
    micro-batch are resolved by max seq), so `last_*` is deterministic."""
    if state.exists:
        n, last_ts, last_price, mn, mx, sum_pv, sum_v = state.get
    else:
        n, last_ts, last_price, mn, mx, sum_pv, sum_v = (
            0,
            -1,
            float("nan"),
            float("inf"),
            float("-inf"),
            0.0,
            0.0,
        )
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values("seq")
        n += len(pdf)
        ts_v = pdf["ts"].iloc[-1]
        # ts may arrive as int64 epoch nanos or as a timestamp column
        # (pd.Timestamp.value = epoch nanos) — state holds nanos either way
        last_ts = int(ts_v.value) if isinstance(ts_v, pd.Timestamp) else int(ts_v)
        last_price = float(pdf["price"].iloc[-1])
        mn = min(mn, float(pdf["price"].min()))
        mx = max(mx, float(pdf["price"].max()))
        sum_pv += float((pdf["price"] * pdf["volume"]).sum())
        sum_v += float(pdf["volume"].sum())
    state.update((n, last_ts, last_price, mn, mx, sum_pv, sum_v))
    yield pd.DataFrame(
        [
            {
                "symbol": key[0],
                "n": n,
                "last_ts": last_ts,
                "last_price": last_price,
                "min_price": mn,
                "max_price": mx,
                "sum_pv": sum_pv,
                "sum_v": sum_v,
            }
        ]
    )


def symbol_snapshot_stream(ticks: DataFrame) -> DataFrame:
    """Per-symbol running snapshot stream.

    `ticks` must have (symbol, ts, price, volume, seq) with ts either
    int64 epoch nanos or a timestamp — e.g. the tick_view mapping of the
    events stream.  Emits one updated snapshot row per symbol per
    micro-batch (update output mode)."""
    return ticks.groupBy("symbol").applyInPandasWithState(
        _update_symbol_state,
        outputStructType=SNAPSHOT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
