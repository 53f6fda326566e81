"""Round-6 additions (q148-q158): independent recomputation tests —
pandas/python replays of the declared semantics, not oracle re-runs —
plus the exactness properties each query's docstring claims."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

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
    """In-order cents tape per symbol (the replay ground truth)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    ).toPandas()
    return ev.sort_values(["event_type", "ts", "event_id"]).reset_index(
        drop=True
    )


def test_q148_trade_matrix_excludes_domestic_and_sums_exact(reg, spark):
    got = _pdf(reg, spark, "q148_nation_trade_matrix")
    assert (got.supp_nation != got.cust_nation).all()
    assert (got.n_items > 0).all() and (got.revenue > 0).all()
    # cross-check one cell against a direct join recomputation
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    s = spark.read.parquet(f"{SF}/supplier.parquet").toPandas()
    n = spark.read.parquet(f"{SF}/nation.parquet").toPandas()
    j = (
        li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(n.add_prefix("s_n_"), left_on="s_nationkey",
               right_on="s_n_n_nationkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n.add_prefix("c_n_"), left_on="c_nationkey",
               right_on="c_n_n_nationkey")
    )
    j = j[j.s_n_n_name != j.c_n_n_name]
    j["year"] = pd.to_datetime(j.l_shipdate).dt.year
    j["rev_u"] = (j.l_extendedprice * 100).round().astype("int64") * (
        100 - (j.l_discount * 100).round().astype("int64")
    )
    exp = (
        j.groupby(["s_n_n_name", "c_n_n_name", "year"])
        .agg(n_items=("rev_u", "size"), rev_u=("rev_u", "sum"))
        .reset_index()
    )
    assert len(exp) == len(got)
    row = exp.iloc[0]
    g = got[
        (got.supp_nation == row.s_n_n_name)
        & (got.cust_nation == row.c_n_n_name)
        & (got.ship_year == row.year)
    ].iloc[0]
    assert int(g.n_items) == int(row.n_items)
    # revenue = round(rev_u / 10000, 2) half-up
    assert abs(g.revenue - ((row.rev_u * 200 + 10000) // 20000) / 100.0) < 1e-12


def test_q149_share_in_unit_interval_and_year_bounded(reg, spark):
    got = _pdf(reg, spark, "q149_market_share_trend")
    assert ((got.focal_share >= 0) & (got.focal_share <= 1)).all()
    assert got.order_year.between(1995, 2001).all()
    assert got.order_year.is_unique


def test_q151_large_orders_threshold_and_order(reg, spark):
    got = _pdf(reg, spark, "q151_large_orders", sf="/root/testdata/sf0.01")
    assert (got.total_qty > 300).all()
    assert len(got) <= 20
    # descending qty with orderkey tiebreak
    key = list(zip(-got.total_qty, got.o_orderkey))
    assert key == sorted(key)
    # total quantity re-derived from lineitem for the top row
    li = pd.read_parquet("/root/testdata/sf0.01/lineitem.parquet")
    top = got.iloc[0]
    assert (
        int(li[li.l_orderkey == top.o_orderkey].l_quantity.round().sum())
        == top.total_qty
    )


def test_q152_dormant_rich_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q152_dormant_rich_customers", sf=SF)
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    recent = set(o[pd.to_datetime(o.o_orderdate) >= "2001-01-01"].o_custkey)
    bal_c = (c.c_acctbal * 100).round().astype("int64")
    s_, n_ = int(bal_c.sum()), len(c)
    dormant = c[(~c.c_custkey.isin(recent)) & (bal_c * n_ > s_)]
    exp = (
        dormant.assign(bc=(dormant.c_acctbal * 100).round().astype("int64"))
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .groupby("n_name")
        .agg(n_dormant=("bc", "size"), bal=("bc", "sum"))
    )
    gotm = got.set_index("n_name")
    assert sorted(gotm.index) == sorted(exp.index)
    for name, row in exp.iterrows():
        assert int(gotm.loc[name].n_dormant) == int(row.n_dormant)
        assert abs(gotm.loc[name].dormant_balance - row.bal / 100.0) < 1e-9


def test_q153_abc_partitions_and_monotone(reg, spark):
    got = _pdf(reg, spark, "q153_part_revenue_abc", sf=SF)
    # every part classified exactly once
    p = pd.read_parquet(f"{SF}/part.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    sold = p[p.p_partkey.isin(li.l_partkey)]
    assert int(got.n_parts.sum()) == len(sold)
    assert set(got.abc) <= {"A", "B", "C"}
    # A-class revenue share really is <= 80%: replay the classification
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["rev_u"] = (j.l_extendedprice * 100).round().astype("int64") * (
        100 - (j.l_discount * 100).round().astype("int64")
    )
    pr = (
        j.groupby("p_partkey")["rev_u"].sum().sort_values(
            ascending=False
        )
    )
    pr = pr.reset_index()
    pr = pr.sort_values(["rev_u", "p_partkey"],
                        ascending=[False, True]).reset_index(drop=True)
    total = pr.rev_u.sum()
    cum = pr.rev_u.cumsum()
    n_a = int((cum * 10 <= total * 8).sum())
    assert n_a == int(got[got.abc == "A"].n_parts.sum())


def test_q154_amihud_single_exact_ratio(reg, spark, tape):
    got = _pdf(reg, spark, "q154_amihud_illiquidity").set_index("event_type")
    for sym, g in tape.groupby("event_type"):
        dc = g.c.diff().dropna().abs().astype("int64")
        dollars = int((g.c * g.user_id).iloc[1:].sum())
        if dollars <= 0:
            assert sym not in got.index
            continue
        move = int(dc.sum())
        assert int(got.loc[sym].move_c) == move
        assert int(got.loc[sym].dollar_u) == dollars
        expect = ((move * 10**9 * 20000 + dollars) // (2 * dollars)) / 10000.0
        assert got.loc[sym].illiq_e4 == expect


def test_q155_ofi_matches_causal_replay(reg, spark, tape):
    got = _pdf(reg, spark, "q155_order_flow_imbalance")
    got["minute"] = pd.to_datetime(got["minute"])
    gm = got.set_index(["event_type", "minute"])
    for sym, g in tape.groupby("event_type"):
        prev = g.c.shift()
        sign = (g.c > prev).astype(int) - (g.c < prev).astype(int)
        mask = prev.notna()
        df = pd.DataFrame(
            {
                "minute": g.ts.dt.floor("min")[mask],
                "sv": (sign * g.user_id)[mask],
                "v": g.user_id[mask],
            }
        )
        exp = df.groupby("minute").agg(
            ofi=("sv", "sum"), vol=("v", "sum"), n=("sv", "size")
        )
        for minute, row in exp.iterrows():
            r = gm.loc[(sym, minute)]
            assert int(r.ofi) == int(row.ofi)
            assert int(r.total_volume) == int(row.vol)
            assert int(r.n_ticks) == int(row.n)


def test_q156_q157_breakouts_match_rolling_replay(reg, spark, tape):
    boll = _pdf(reg, spark, "q156_bollinger_breakouts").set_index("event_type")
    don = _pdf(reg, spark, "q157_donchian_breakouts").set_index("event_type")
    for sym, g in tape.groupby("event_type"):
        c = g.c.reset_index(drop=True)
        if len(c) >= 20:
            s = c.rolling(20).sum()
            q = (c * c).rolling(20).sum()
            dev = 20 * c - s
            wide = dev * dev > 4 * (20 * q - s * s)
            up = int(((dev > 0) & wide).sum())
            dn = int(((dev < 0) & wide).sum())
            assert int(boll.loc[sym].upper_breaks) == up
            assert int(boll.loc[sym].lower_breaks) == dn
            assert int(boll.loc[sym].n_windows) == len(c) - 19
        if len(c) >= 21:
            hi = c.shift(1).rolling(20).max()
            lo = c.shift(1).rolling(20).min()
            assert int(don.loc[sym].new_highs) == int((c > hi).sum())
            assert int(don.loc[sym].new_lows) == int((c < lo).sum())
            assert int(don.loc[sym].n_windows) == len(c) - 20


def test_q158_acf_matches_numpy_pearson(reg, spark, tape):
    import numpy as np

    got = _pdf(reg, spark, "q158_price_acf").set_index(
        ["event_type", "lag_k"]
    )
    for sym, g in tape.groupby("event_type"):
        c = g.c.to_numpy(dtype="int64")
        for k in (1, 2, 3, 5, 10):
            if len(c) <= k:
                continue
            x, y = c[k:], c[:-k]
            n = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x.astype(object) * y).sum())
            sxx = int((x.astype(object) * x).sum())
            syy = int((y.astype(object) * y).sum())
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if vx <= 0 or vy <= 0:
                assert (sym, k) not in got.index
                continue
            r = (n * sxy - sx * sy) / np.sqrt(float(vx) * float(vy))
            assert abs(got.loc[(sym, k)].r - round(r, 4)) <= 1e-4
            assert int(got.loc[(sym, k)].n) == n


def test_q161_kyle_lambda_matches_numpy_ols(reg, spark, tape):
    """The slope must equal numpy's least-squares fit of Δcents on
    tick-rule signed volume, computed independently per symbol."""
    import numpy as np

    got = _pdf(reg, spark, "q161_kyle_lambda").set_index("event_type")
    for sym, g in tape.groupby("event_type"):
        prev = g.c.shift()
        mask = prev.notna()
        dy = (g.c - prev)[mask].to_numpy(dtype="float64")
        sign = ((g.c > prev).astype(int) - (g.c < prev).astype(int))[mask]
        x = (sign * g.user_id[mask]).to_numpy(dtype="float64")
        if np.var(x) == 0:
            assert sym not in got.index
            continue
        slope = np.polyfit(x, dy, 1)[0]
        assert abs(got.loc[sym].lambda_cents - slope) < 1e-4
        assert int(got.loc[sym].n) == len(x)
