"""q162-q165: independent pandas/python recomputation of the declared
semantics (not oracle re-runs), plus the plan-shape contracts each
docstring claims (single symbol-keyed exchange; vocabulary-sized
shuffles for the rare-token query)."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.plans import (
    exchanges,
    physical_plan,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _pdf(reg, spark, name, sf=SF):
    return reg[name].fn(spark, sf).toPandas()


@pytest.fixture(scope="module")
def tape(spark):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("bigint").alias("c"),
        )
        .toPandas()
    )
    return ev.sort_values(["event_type", "ts", "event_id"]).reset_index(
        drop=True
    )


def test_q162_variance_ratio_matches_float_replay(reg, spark, tape):
    got = _pdf(reg, spark, "q162_variance_ratio").set_index("event_type")
    for sym, g in tape.groupby("event_type"):
        c = g.c.to_numpy()
        r1 = c[1:] - c[:-1]
        assert int(got.loc[sym, "n_ticks"]) == len(r1)
        for k in (2, 4, 8):
            rk = c[k:] - c[:-k]
            vr = rk.var() / (k * r1.var())  # numpy: population variance
            assert abs(got.loc[sym, f"vr{k}_e4"] - vr) <= 5.1e-5, (sym, k)


def test_q163_rsi_counts_match_rolling_replay(reg, spark, tape):
    got = _pdf(reg, spark, "q163_rsi_screen").set_index("event_type")
    for sym, g in tape.groupby("event_type"):
        d = g.c.diff().dropna()
        gain = d.clip(lower=0).rolling(14).sum().dropna()
        loss = (-d.clip(upper=0)).rolling(14).sum().dropna()
        ob = int((3 * gain > 7 * loss).sum())
        os_ = int((7 * gain < 3 * loss).sum())
        assert int(got.loc[sym, "n_windows"]) == len(gain)
        assert int(got.loc[sym, "overbought"]) == ob, sym
        assert int(got.loc[sym, "oversold"]) == os_, sym


def test_q163_flat_window_is_neutral():
    # G = L = 0 fails both 3G > 7L and 7G < 3L: neutral, not both-sided
    g = l = 0
    assert not (3 * g > 7 * l) and not (7 * g < 3 * l)


def test_q164_rare_token_ratio_matches_counter_replay(reg, spark):
    got = _pdf(reg, spark, "q164_rare_token_ratio").set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cf = Counter()
    for t in docs.text:
        cf.update(t.split(" "))
    for src, g in docs.groupby("source"):
        toks = [w for t in g.text for w in t.split(" ")]
        rare = [w for w in toks if cf[w] <= 3]
        assert int(got.loc[src, "total_tokens"]) == len(toks)
        assert int(got.loc[src, "rare_tokens"]) == len(rare)
        assert int(got.loc[src, "rare_types"]) == len(set(rare))
        share = (len(rare) * 20000 + len(toks)) // (2 * len(toks)) / 10000.0
        assert got.loc[src, "rare_share"] == share


def test_q165_volume_clock_bars_match_cumsum_replay(reg, spark, tape):
    got = _pdf(reg, spark, "q165_volume_clock")
    rows = []
    for sym, g in tape.groupby("event_type"):
        g = g.reset_index(drop=True)
        cum_before = g.user_id.cumsum() - g.user_id
        g = g.assign(bar=cum_before // 100_000)
        for bar, b in g.groupby("bar"):
            rows.append(
                (sym, bar, len(b), b.c.iloc[0], b.c.max(), b.c.min(),
                 b.c.iloc[-1], int(b.user_id.sum()))
            )
    exp = pd.DataFrame(
        rows,
        columns=["event_type", "bar_id", "n_ticks", "open_c", "high_c",
                 "low_c", "close_c", "bar_volume"],
    )
    key = ["event_type", "bar_id"]
    m = exp.merge(got, on=key, suffixes=("_e", "_g"))
    assert len(m) == len(exp) == len(got)
    for col in ("n_ticks", "open_c", "high_c", "low_c", "close_c",
                "bar_volume"):
        assert (m[f"{col}_e"] == m[f"{col}_g"]).all(), col


def test_q165_bar_volume_partitions_the_tape(reg, spark, tape):
    # bars tile the tape: per symbol, bar volumes sum to total volume
    # and tick counts sum to the tape length
    got = _pdf(reg, spark, "q165_volume_clock")
    per_sym = got.groupby("event_type")[["n_ticks", "bar_volume"]].sum()
    tot = tape.groupby("event_type").agg(
        n=("c", "size"), v=("user_id", "sum")
    )
    assert (per_sym.n_ticks == tot.n).all()
    assert (per_sym.bar_volume == tot.v).all()


def test_indicator_queries_single_symbol_exchange(reg, spark, sf_dir):
    # q162/q163: window pass(es) + agg all share the symbol key —
    # exactly ONE shuffle each, scan read once.  (q165 moved to the
    # keyed-prefix contract in test_plan_contracts.py in round 8 — its
    # prefix sum now slices by (symbol, hour) with a second
    # column-pruned boundary scan.)
    for name in (
        "q162_variance_ratio",
        "q163_rsi_screen",
    ):
        df = reg[name].fn(spark, sf_dir)
        assert exchanges(df) == 1, name
        assert physical_plan(df).count("FileScan") == 1, name


def test_q164_shuffles_are_vocabulary_sized(reg, spark, sf_dir):
    # explode-spread repartition + (source, token) agg + token window +
    # source agg: four exchanges, none moving the raw corpus twice
    df = reg["q164_rare_token_ratio"].fn(spark, sf_dir)
    assert exchanges(df) <= 4
    assert physical_plan(df).count("FileScan") == 1
