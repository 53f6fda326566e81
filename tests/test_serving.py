"""PointServer (hot-slice serving path): results must be identical to
the registry's q04/q05 — only the physical source (InMemoryTableScan vs
parquet FileScan) may differ — and probes outside the cached slice must
fall back to the parquet path transparently."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (
    events_raw,
    ts_min_epoch_ns,
    ts_max_epoch_ns,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.serving import (
    PointServer,
)
from tests.oracle_diff import assert_df_equal

SF = "/root/testdata/sf0.01"


def _sorted(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_point_server_matches_q05(spark):
    reg = load_all()
    srv = PointServer(spark, SF)
    try:
        srv.open()
        got = _sorted(srv.point(srv.table_min_ns()))
        want = _sorted(reg["q05_point_lookup"].fn(spark, SF))
        assert_df_equal(got, want, name="server point vs q05")
        # the cached probe really serves from the in-memory relation
        plan = srv.point(srv.table_min_ns())._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        srv.close()


def test_range_matches_q04_and_footer_bounds(spark):
    reg = load_all()
    srv = PointServer(spark, SF)
    try:
        srv.open()
        # q04's fixed window, through the server
        from low_latency_time_series_database_tsdb_for_market_data_spark.operators.reference_surface import (  # noqa: E501
            _T1_NS,
            _T2_NS,
        )

        got = _sorted(srv.range(_T1_NS, _T2_NS))
        want = _sorted(reg["q04_range_scan"].fn(spark, SF))
        assert_df_equal(got, want, name="server range vs q04")
        # footer max twin agrees with the data
        mx = ts_max_epoch_ns(f"{SF}/events.parquet")
        if mx is not None:
            raw = events_raw(spark, SF)
            from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (  # noqa: E501
                with_ts,
            )

            data_max = (
                with_ts(raw)
                .agg(F.max(F.unix_micros("ts")))
                .collect()[0][0]
            )
            assert mx == data_max * 1000
    finally:
        srv.close()


def test_probe_outside_cached_slice_falls_back(spark):
    """A server caching only a late window must still answer an early
    probe correctly (parquet fallback), and the plan must NOT be the
    cache."""
    reg = load_all()
    lo = ts_min_epoch_ns(f"{SF}/events.parquet")
    srv = PointServer(spark, SF, lo_ns=lo + 10**15)  # cache starts later
    try:
        srv.open()
        q = srv.point(lo)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan
        got = _sorted(q)
        want = _sorted(reg["q05_point_lookup"].fn(spark, SF))
        assert_df_equal(got, want, name="fallback point vs q05")
    finally:
        srv.close()


def test_symbol_sliced_server(spark):
    """A server caching one event_type slice: (a) a probe restricted to
    that slice serves FROM the cache and matches the raw-path filter
    exactly; (b) a ts-only probe must NOT serve from the symbol-sliced
    cache (it would silently drop the other event types) and still
    returns the full q04-equivalent result; (c) construction with the
    default symbol_col works against the events schema (round-6 advice:
    the old code filtered a nonexistent `symbol` column and ignored the
    slice in _in_cache)."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.reference_surface import (  # noqa: E501
        _T1_NS,
        _T2_NS,
    )
    from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (  # noqa: E501
        with_ts,
        ts_bound,
    )

    reg = load_all()
    srv = PointServer(spark, SF, symbols=["click"])
    try:
        srv.open()
        # (a) restricted probe: cached, and value-identical to raw
        q = srv.range(_T1_NS, _T2_NS, symbols=["click"])
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        raw = events_raw(spark, SF)
        want_df = with_ts(
            raw.where(
                (F.col("ts") >= ts_bound(raw, _T1_NS))
                & (F.col("ts") <= ts_bound(raw, _T2_NS, upper=True))
                & (F.col("event_type") == "click")
            )
        )
        assert_df_equal(
            _sorted(q), _sorted(want_df), name="symbol-sliced range"
        )
        assert (_sorted(q)["event_type"] == "click").all()
        # (b) ts-only probe: falls back AND returns every event type
        q2 = srv.range(_T1_NS, _T2_NS)
        plan2 = q2._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan2
        want2 = _sorted(reg["q04_range_scan"].fn(spark, SF))
        assert_df_equal(_sorted(q2), want2, name="ts-only fallback")
        # (c) a superset symbol probe also falls back
        q3 = srv.range(_T1_NS, _T2_NS, symbols=["click", "view"])
        assert "InMemoryTableScan" not in (
            q3._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        srv.close()


def test_refresh_picks_up_externally_appended_rows(spark, tmp_path):
    """Same-session Spark writes auto-refresh cached plans
    (refreshByPath), so the stale-cache case is an EXTERNAL writer
    (another process/cluster commits files).  Simulated by copying a
    part file in at the filesystem level: the served slice keeps
    answering from the pinned listing until refresh() re-resolves the
    table."""
    import shutil

    import os
    from pathlib import Path

    live = str(tmp_path / "live_sf")
    src = Path(f"{SF}/events.parquet")
    dst = Path(f"{live}/events.parquet")
    if src.is_dir():
        shutil.copytree(src, dst)
    else:  # single-file fixture: wrap it in a directory table
        dst.mkdir(parents=True)
        shutil.copy(src, dst / "part-000.parquet")
    srv = PointServer(spark, live)
    try:
        srv.open()
        lo = srv.table_min_ns()
        before = srv.point(lo).count()
        # external writer: duplicate a part file at the filesystem level
        # (no Spark write path, no refreshByPath)
        part = next(dst.glob("part-*.parquet"))
        shutil.copy(part, part.with_name("part-ext-copy.parquet"))
        # stale cache still answers from the pinned listing
        assert srv.point(lo).count() == before
        srv.refresh()
        assert srv.point(lo).count() == 2 * before
        plan = srv.point(lo)._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        srv.close()
