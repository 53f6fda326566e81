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


# --- streaming feed-gap monitor (the real-time form of q87) ---------------

GAP_ALERT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("gap_start_us", T.LongType()),
        T.StructField("gap_end_us", T.LongType()),  # -1 while still open
        T.StructField("gap_us", T.LongType()),  # -1 while still open
        T.StructField("open_gap", T.BooleanType()),
    ]
)

GAP_STATE_SCHEMA = T.StructType([T.StructField("last_ts_us", T.LongType())])


def _ts_us(pdf: pd.DataFrame) -> "pd.Series":
    """ts column as int64 epoch MICROS, whatever layout arrived (int64
    epoch nanos, or a datetime64 column of any unit/tz — the unit comes
    from dtype introspection, never a substring sniff: a tz name like
    Australia/Sydney would false-positive an 'us' search)."""
    import numpy as np

    s = pdf["ts"]
    if str(s.dtype).startswith("datetime64"):
        unit = getattr(s.dtype, "unit", None) or np.datetime_data(s.dtype)[0]
        vals = s.astype("int64")
        to_us = {"s": 1_000_000, "ms": 1_000, "us": 1}
        return vals * to_us[unit] if unit in to_us else vals // 1_000
    return s.astype("int64") // 1_000


def make_gap_monitor(gap_us: int, open_alerts: bool):
    """Build the applyInPandasWithState update function for
    :func:`gap_alert_stream` (closure carries the threshold)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        if open_alerts and state.hasTimedOut:
            # watermark passed last_ts + gap with no new tick: the feed
            # is silent NOW — emit one open-gap alert and disarm (the
            # next tick re-arms; no repeated alerts for one silence).
            # Disarming = re-persisting state WITHOUT a new timeout: a
            # timeout only clears when the invocation touches state, so
            # returning untouched would refire every subsequent batch.
            (last,) = state.get
            state.update((last,))
            yield pd.DataFrame(
                [
                    {
                        "symbol": sym,
                        "gap_start_us": last,
                        "gap_end_us": -1,
                        "gap_us": -1,
                        "open_gap": True,
                    }
                ]
            )
            return
        import numpy as np

        ts_list = [_ts_us(pdf) for pdf in pdfs if not pdf.empty]
        if not ts_list:
            return
        ts = np.sort(pd.concat(ts_list).to_numpy())
        prev = state.get[0] if state.exists else None
        seq = ts if prev is None else np.concatenate(([prev], ts))
        gaps = np.diff(seq)
        idx = np.nonzero(gaps > gap_us)[0]
        state.update((int(seq[-1]),))
        if open_alerts:
            # re-arm: silent past last_ts + gap -> open-gap timeout
            state.setTimeoutTimestamp(int(seq[-1]) // 1000 + gap_us // 1000)
        if len(idx):
            yield pd.DataFrame(
                {
                    "symbol": sym,
                    "gap_start_us": seq[idx].astype("int64"),
                    "gap_end_us": seq[idx + 1].astype("int64"),
                    "gap_us": gaps[idx].astype("int64"),
                    "open_gap": False,
                }
            )

    return update


# --- streaming tick-rate burst monitor (the real-time form of q106) -------

BURST_ALERT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("minute_us", T.LongType()),
        T.StructField("n_ticks", T.LongType()),
        T.StructField("prior_minutes", T.LongType()),
        T.StructField("prior_ticks", T.LongType()),
    ]
)

BURST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_minute_us", T.LongType()),
        T.StructField("cur_count", T.LongType()),
        T.StructField("closed_minutes", T.LongType()),
        T.StructField("closed_ticks", T.LongType()),
    ]
)

_MIN_US = 60_000_000


def make_burst_monitor(factor: int, warmup: int):
    """Build the applyInPandasWithState update function for
    :func:`burst_alert_stream` (closure carries threshold + warmup).

    A minute CLOSES when a later-minute tick arrives (arrival-driven,
    like the gap monitor's closed-gap path); the closed minute alerts
    when cnt * prior_minutes > factor * prior_ticks — the q106
    comparison made CAUSAL: the mean is over minutes closed BEFORE this
    one, because a live monitor cannot consult the future.  The whole
    test is integer cross-multiplication, bit-identical to a batch
    replay.  Late rows (minute older than the open one) fold into the
    prior-ticks total (raising the running mean — conservative: fewer
    alerts, never spurious ones) but never re-open a minute or re-fire
    an alert — an alert, once suppressed or raised, is immutable."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts_list = [_ts_us(pdf) for pdf in pdfs if not pdf.empty]
        if not ts_list:
            return
        minutes = (pd.concat(ts_list) // _MIN_US) * _MIN_US
        counts = minutes.value_counts().sort_index()
        cur_m, cur_c, nm, tot = (
            state.get if state.exists else (-1, 0, 0, 0)
        )
        alerts: list[dict] = []
        for m, c in counts.items():
            m, c = int(m), int(c)
            if cur_m == -1:
                cur_m, cur_c = m, c
                continue
            if m < cur_m:  # late arrival into already-closed history
                tot += c
                continue
            if m == cur_m:
                cur_c += c
                continue
            # m > cur_m: the open minute closes — judge it causally
            if nm >= warmup and cur_c * nm > factor * tot:
                alerts.append(
                    {
                        "symbol": key[0],
                        "minute_us": cur_m,
                        "n_ticks": cur_c,
                        "prior_minutes": nm,
                        "prior_ticks": tot,
                    }
                )
            nm += 1
            tot += cur_c
            cur_m, cur_c = m, c
        state.update((cur_m, cur_c, nm, tot))
        if alerts:
            yield pd.DataFrame(alerts)

    return update


def burst_alert_stream(
    ticks: DataFrame, factor: int = 2, warmup: int = 5
) -> DataFrame:
    """Streaming tick-rate burst alerts — the real-time form of q106's
    batch screen.  Emits one row per closed minute whose tick count
    exceeds `factor`x the symbol's running mean minute-rate (integer
    cross-multiplied), after `warmup` closed minutes of history.

    `ticks` needs (symbol, ts) with ts int64 epoch nanos or timestamp.
    State is four int64s per symbol (O(1) — a million symbols cost
    megabytes); output is alert-sized, not tick-sized.  Partitioning is
    by symbol, the same key as every batch microstructure operator, so
    at 100 TB/day the stateful shuffle is the natural one."""
    return ticks.groupBy("symbol").applyInPandasWithState(
        make_burst_monitor(factor, warmup),
        outputStructType=BURST_ALERT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def gap_alert_stream(
    ticks: DataFrame, gap_s: int = 300, open_alerts: bool = False
) -> DataFrame:
    """Streaming feed-gap alerts — the real-time form of q87's batch
    report.  Emits one row per inter-tick gap longer than `gap_s` the
    moment the closing tick arrives; with open_alerts=True ALSO fires an
    event-time timeout when the watermark passes a symbol's last tick by
    more than the threshold — the "symbol went dark and is still dark"
    page, which pure arrival-driven logic can never raise.  open_alerts
    requires `ticks` to carry a watermark (EventTimeTimeout contract).

    `ticks` needs (symbol, ts) with ts int64 epoch nanos or timestamp.
    State is one int64 per symbol; alerts are O(gaps), not O(ticks) —
    at 100 TB/day the output stream stays alert-sized, and partitioning
    is by symbol exactly like the batch operator."""
    return ticks.groupBy("symbol").applyInPandasWithState(
        make_gap_monitor(gap_s * 1_000_000, open_alerts),
        outputStructType=GAP_ALERT_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if open_alerts
            else GroupStateTimeout.NoTimeout
        ),
    )


OFI_ROW_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("minute_us", T.LongType()),
        T.StructField("ofi", T.LongType()),
        T.StructField("total_volume", T.LongType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)

OFI_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_minute_us", T.LongType()),
        T.StructField("ofi", T.LongType()),
        T.StructField("vol", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("last_c", T.LongType()),
        T.StructField("has_last", T.LongType()),
    ]
)


def make_ofi_monitor():
    """Build the applyInPandasWithState update function for
    :func:`ofi_stream` — the real-time form of q155's order-flow
    imbalance.

    Per-symbol state is six int64s: the open minute's running
    (ofi, volume, n) plus the last tick's exact cents price, which the
    tick rule compares against ACROSS minute boundaries exactly like
    the batch lag() does.  A minute EMITS when a later-minute tick
    arrives (arrival-driven close, the burst monitor's discipline), so
    each symbol's final minute stays open — a live monitor cannot know
    the minute is over.  Ticks are processed in (ts, seq) order inside
    every batch; a tick older than the open minute is DROPPED
    deterministically (it already missed its emitted minute — folding
    it anywhere would disagree with the batch replay) — the ordered
    file replay never produces one, and a production feed with real
    disorder widens the watermark instead.  All arithmetic is BIGINT:
    classification on exact cents, signed volume sums — bit-identical
    to q155 over closed minutes."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        frames = [pdf for pdf in pdfs if not pdf.empty]
        if not frames:
            return
        batch = pd.concat(frames).sort_values(["ts", "seq"])
        ts_us = _ts_us(batch)
        minutes = (ts_us // _MIN_US) * _MIN_US
        cents_s = (batch["price"] * 100).round().astype("int64")
        vols = batch["volume"].astype("int64")

        cur_m, ofi, vol, n, last_c, has_last = (
            state.get if state.exists else (-1, 0, 0, 0, 0, 0)
        )
        out: list[dict] = []
        for m, c, v in zip(minutes, cents_s, vols):
            m, c, v = int(m), int(c), int(v)
            if not has_last:  # very first tick: no previous price
                cur_m, last_c, has_last = m, c, 1
                continue
            if m < cur_m:  # disordered beyond the open minute: drop
                continue
            if m > cur_m:  # open minute closes
                out.append(
                    {
                        "symbol": key[0],
                        "minute_us": cur_m,
                        "ofi": ofi,
                        "total_volume": vol,
                        "n_ticks": n,
                    }
                )
                cur_m, ofi, vol, n = m, 0, 0, 0
            sign = 1 if c > last_c else (-1 if c < last_c else 0)
            ofi += sign * v
            vol += v
            n += 1
            last_c = c
        state.update((cur_m, ofi, vol, n, last_c, has_last))
        # a minute that closed with zero counted ticks (only the state
        # seed lived there) still emits its zero row IF any tick was
        # counted in it — n==0 rows only appear for the seed minute and
        # are dropped to match the batch WHERE pc IS NOT NULL
        rows = [r for r in out if r["n_ticks"] > 0]
        if rows:
            yield pd.DataFrame(rows)

    return update


def ofi_stream(ticks: DataFrame) -> DataFrame:
    """Streaming order-flow imbalance per closed (symbol, minute) — the
    real-time twin of q155.  `ticks` needs (symbol, ts, price, volume,
    seq).  State is six int64s per symbol; output is minute-bounded, not
    tick-bounded; the stateful shuffle is the natural symbol key."""
    return ticks.groupBy("symbol").applyInPandasWithState(
        make_ofi_monitor(),
        outputStructType=OFI_ROW_SCHEMA,
        stateStructType=OFI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


VBAR_ROW_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("bar_id", T.LongType()),
        T.StructField("n_ticks", T.LongType()),
        T.StructField("open_c", T.LongType()),
        T.StructField("high_c", T.LongType()),
        T.StructField("low_c", T.LongType()),
        T.StructField("close_c", T.LongType()),
        T.StructField("bar_volume", T.LongType()),
    ]
)

VBAR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum", T.LongType()),
        T.StructField("cur_bar", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("open_c", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
        T.StructField("close_c", T.LongType()),
        T.StructField("vol", T.LongType()),
        T.StructField("has", T.LongType()),
    ]
)


def make_volume_bar_builder(bar_v: int):
    """Build the applyInPandasWithState update function for
    :func:`volume_bar_stream` — the real-time form of q165's
    volume-clock bars.

    Per-symbol state is nine int64s: the running volume prefix sum plus
    the OPEN bar's (id, n, OHLC cents, volume).  A tick's bar id is
    floor(prefix_before / V) — bit-identical to the batch assignment —
    and a bar EMITS when a tick lands in a LATER bar (arrival-driven
    close, the OFI monitor's discipline), so each symbol's final bar
    stays open: a live sampler cannot know no more volume is coming.
    Bar ids a single oversized tick jumps clean over never existed in
    either engine (no empty bars).  Ticks are processed in (ts, seq)
    order inside every batch; the prefix sum assumes the replay is
    ordered across batches exactly like the batch window's sort — the
    ordered file replay guarantees it, and a production feed with real
    disorder must widen the upstream watermark instead.  All arithmetic
    is BIGINT on exact cents."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        frames = [pdf for pdf in pdfs if not pdf.empty]
        if not frames:
            return
        batch = pd.concat(frames).sort_values(["ts", "seq"])
        cents_s = (batch["price"] * 100).round().astype("int64")
        vols = batch["volume"].astype("int64")

        cum, cur_bar, n, open_c, hi, lo, close_c, vol, has = (
            state.get if state.exists else (0, -1, 0, 0, 0, 0, 0, 0, 0)
        )
        out: list[dict] = []
        for c, v in zip(cents_s, vols):
            c, v = int(c), int(v)
            bar = cum // bar_v
            if not has:
                cur_bar, n, open_c, hi, lo, close_c, vol, has = (
                    bar, 1, c, c, c, c, v, 1,
                )
            elif bar > cur_bar:
                out.append(
                    {
                        "symbol": key[0],
                        "bar_id": cur_bar,
                        "n_ticks": n,
                        "open_c": open_c,
                        "high_c": hi,
                        "low_c": lo,
                        "close_c": close_c,
                        "bar_volume": vol,
                    }
                )
                cur_bar, n, open_c, hi, lo, close_c, vol = (
                    bar, 1, c, c, c, c, v,
                )
            else:
                n += 1
                hi = max(hi, c)
                lo = min(lo, c)
                close_c = c
                vol += v
            cum += v
        state.update((cum, cur_bar, n, open_c, hi, lo, close_c, vol, has))
        if out:
            yield pd.DataFrame(out)

    return update


def volume_bar_stream(ticks: DataFrame, bar_v: int = 100_000) -> DataFrame:
    """Streaming volume-clock bars per symbol — the real-time twin of
    q165 (every CLOSED bar matches the batch replay bit-for-bit; each
    symbol's final bar stays open).  `ticks` needs (symbol, ts, price,
    volume, seq).  State is nine int64s per symbol; output is
    bar-bounded, not tick-bounded; the stateful shuffle is the natural
    symbol key."""
    return ticks.groupBy("symbol").applyInPandasWithState(
        make_volume_bar_builder(bar_v),
        outputStructType=VBAR_ROW_SCHEMA,
        stateStructType=VBAR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
