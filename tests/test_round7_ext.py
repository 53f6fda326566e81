"""Round-7 additions (q167-q172): independent recomputation tests —
pandas/python replays of the declared semantics, not oracle re-runs —
plus the exactness properties each query's docstring claims."""

from __future__ import annotations

import pandas as pd
import pytest

from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _pdf(reg, spark, name, sf=SF):
    return reg[name].fn(spark, sf).toPandas()


def _rev_u(li: pd.DataFrame) -> pd.Series:
    return (li.l_extendedprice * 100).round().astype("int64") * (
        100 - (li.l_discount * 100).round().astype("int64")
    )


def test_q167_top_supplier_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q167_top_supplier")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    q = li[
        (pd.to_datetime(li.l_shipdate) >= "1996-01-01")
        & (pd.to_datetime(li.l_shipdate) < "1996-04-01")
    ].copy()
    q["rev_u"] = _rev_u(q)
    rev = q.groupby("l_suppkey").rev_u.sum()
    top = rev[rev == rev.max()]
    assert sorted(got.s_suppkey) == sorted(top.index)
    for _, r in got.iterrows():
        ru = int(top.loc[r.s_suppkey])
        assert r.total_revenue == ((ru * 200 + 10000) // 20000) / 100.0
        assert r.s_name == s.set_index("s_suppkey").loc[r.s_suppkey, "s_name"]


def test_q168_small_qty_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q168_small_qty_revenue")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(
        p[p.p_brand == "Brand#3"][["p_partkey"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    j["q"] = j.l_quantity.round().astype("int64")
    j["c"] = (j.l_extendedprice * 100).round().astype("int64")
    st = j.groupby("l_partkey").agg(sq=("q", "sum"), n=("q", "size"))
    j = j.join(st, on="l_partkey")
    small = j[j.q * 5 * j.n < j.sq]
    assert int(got.n_items.iloc[0]) == len(small)
    sc = int(small.c.sum())
    assert got.avg_yearly.iloc[0] == ((sc * 200 + 700) // 1400) / 100.0


def test_q169_pareto_monotone_and_replay(reg, spark):
    got = _pdf(reg, spark, "q169_customer_pareto").set_index("pct")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    x = (
        o.assign(c=(o.o_totalprice * 100).round().astype("int64"))
        .groupby("o_custkey")
        .c.sum()
        .sort_values(ascending=False)
    )
    # pandas stable sort ties differ from (x desc, custkey) — but the
    # threshold count is tie-insensitive because equal-x customers
    # contribute identical increments; replay with the exact key anyway
    x = x.reset_index().sort_values(
        ["c", "o_custkey"], ascending=[False, True], ignore_index=True
    )
    cum = x.c.cumsum()
    tot = int(x.c.sum())
    for pct in (50, 80, 95):
        need = int(((cum - x.c) * 100 < tot * pct).sum())
        assert int(got.loc[pct].n_customers) == need
        assert got.loc[pct].base_share == (
            (need * 20000 + len(x)) // (2 * len(x))
        ) / 10000.0
    # the ladder is monotone in pct
    assert (
        got.loc[50].n_customers
        <= got.loc[80].n_customers
        <= got.loc[95].n_customers
    )


def test_q170_transitions_match_python_replay(reg, spark):
    got = _pdf(reg, spark, "q170_event_transitions")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["prev"] = ev.groupby("user_id").event_type.shift()
    t = (
        ev.dropna(subset=["prev"])
        .groupby(["prev", "event_type"])
        .size()
        .reset_index(name="n")
    )
    m = got.merge(
        t,
        left_on=["prev_type", "next_type"],
        right_on=["prev", "event_type"],
        how="outer",
    )
    assert not m.n_x.isna().any() and not m.n_y.isna().any()
    assert (m.n_x == m.n_y).all()
    row_tot = t.groupby("prev").n.sum()
    for _, r in got.iterrows():
        tot = int(row_tot.loc[r.prev_type])
        assert r.row_share == (
            (int(r.n) * 20000 + tot) // (2 * tot)
        ) / 10000.0
    # each row's shares form a distribution summing to ~1 (e4 rounding)
    s = got.groupby("prev_type").row_share.sum()
    assert ((s - 1.0).abs() < 3e-4).all()


def test_q171_paths_match_python_replay(reg, spark):
    got = _pdf(reg, spark, "q171_user_paths")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    first3 = ev.groupby("user_id").head(3)
    paths = first3.groupby("user_id").event_type.agg(">".join)
    expect = paths.value_counts()
    key = sorted(
        ((int(n), p) for p, n in expect.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    assert [(int(r.n_users), r.path) for _, r in got.iterrows()] == key


def test_q173_forecast_revenue_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q173_forecast_revenue")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    q = li[
        (pd.to_datetime(li.l_shipdate) >= "1996-01-01")
        & (pd.to_datetime(li.l_shipdate) < "1997-01-01")
        & (li.l_discount >= 0.05)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    ]
    units = (
        (q.l_extendedprice * 100).round().astype("int64")
        * (q.l_discount * 100).round().astype("int64")
    ).sum()
    assert int(got.n_items.iloc[0]) == len(q)
    assert got.promo_revenue.iloc[0] == int(units) / 10000.0


def test_q174_order_aging_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q174_order_aging")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    age = (
        pd.Timestamp("2001-08-01") - pd.to_datetime(o.o_orderdate)
    ).dt.days
    band = pd.cut(
        age,
        bins=[-1, 364, 1094, 1824, 10**9],
        labels=["lt_1y", "1y_3y", "3y_5y", "ge_5y"],
    ).astype(str)
    exp = (
        o.assign(
            band=band, c=(o.o_totalprice * 100).round().astype("int64")
        )
        .groupby(["o_orderpriority", "band"])
        .agg(
            n=("c", "size"),
            n_open=("o_orderstatus", lambda s: int((s == "O").sum())),
            v=("c", "sum"),
        )
    )
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        e = exp.loc[(r.o_orderpriority, r.age_band)]
        assert int(r.n_orders) == int(e.n)
        assert int(r.n_open) == int(e.n_open)
        assert r.total_value == int(e.v) / 100.0
    # every order lands in exactly one cell
    assert int(got.n_orders.sum()) == len(o)


def test_q175_burst_screen_replay_sf001(reg, spark):
    """At sf0.01 (the driver's fixture) the screen is non-empty; replay
    the self-relative threshold and the earliest-argmax-hour rule."""
    sf = "/root/testdata/sf0.01"
    got = _pdf(reg, spark, "q175_user_burst_screen", sf=sf).set_index(
        "user_id"
    )
    ev = pd.read_parquet(f"{sf}/events.parquet")
    hr = (
        ev.ts.to_numpy().astype("datetime64[us]").astype("int64")
        // 3_600_000_000
    )
    m = (
        ev.assign(hr=hr)
        .groupby(["user_id", "hr"])
        .size()
        .reset_index(name="c")
    )
    expect = {}
    for uid, g in m.groupby("user_id"):
        tot, act, peak = int(g.c.sum()), len(g), int(g.c.max())
        if peak * act * 10 > 20 * tot:
            peak_hr = int(g[g.c == peak].hr.min())
            expect[uid] = (tot, act, peak, peak_hr)
    assert len(got) > 0
    assert sorted(got.index) == sorted(expect)
    for uid, (tot, act, peak, peak_hr) in expect.items():
        r = got.loc[uid]
        assert (
            int(r.n_events),
            int(r.active_hours),
            int(r.peak_hour_events),
            int(r.peak_hour),
        ) == (tot, act, peak, peak_hr)
        assert r.burst_ratio == (
            (peak * act * 20000 + tot) // (2 * tot)
        ) / 10000.0


def test_q176_minute_coverage_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q176_minute_coverage").set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    mn = (
        ev.ts.to_numpy().astype("datetime64[us]").astype("int64")
        // 60_000_000
    )
    for sym, g in ev.assign(m=mn).groupby("event_type"):
        act = g.m.nunique()
        span = int(g.m.max() - g.m.min() + 1)
        r = got.loc[sym]
        assert int(r.active_minutes) == act
        assert int(r.span_minutes) == span
        assert int(r.missing_minutes) == span - act
        assert r.coverage == ((act * 20000 + span) // (2 * span)) / 10000.0


def test_q177_vpin_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q177_vpin").set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["event_type", "ts", "event_id"]
    )
    for sym, g in ev.groupby("event_type"):
        g = g.reset_index(drop=True)
        c = (g.value * 100).round().astype("int64")
        pc = c.shift()
        sv = g.user_id.where(c > pc, 0) - g.user_id.where(c < pc, 0).fillna(
            0
        )
        sv = sv.fillna(0).astype("int64")
        cum = g.user_id.cumsum()
        bar = (cum - g.user_id) // 20_000
        bars = pd.DataFrame({"bar": bar, "sv": sv, "v": g.user_id}).groupby(
            "bar"
        ).agg(oi=("sv", lambda s: abs(int(s.sum()))), vol=("v", "sum"))
        r = got.loc[sym]
        assert int(r.n_buckets) == len(bars)
        assert int(r.total_volume) == int(bars.vol.sum())
        so, sv_ = int(bars.oi.sum()), int(bars.vol.sum())
        assert r.vpin == ((so * 20000 + sv_) // (2 * sv_)) / 10000.0
        assert int(r.toxic_buckets) == int(
            (bars.oi * 5 > bars.vol * 2).sum()
        )


def test_q178_first_touch_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q178_first_touch").set_index("first_type")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    first = ev.groupby("user_id").event_type.first()
    purchased = (
        ev.assign(p=(ev.event_type == "purchase").astype(int))
        .groupby("user_id")
        .p.max()
    )
    exp = pd.DataFrame({"ft": first, "conv": purchased}).groupby("ft").agg(
        n=("conv", "size"), c=("conv", "sum")
    )
    assert sorted(got.index) == sorted(exp.index)
    for ft, row in exp.iterrows():
        r = got.loc[ft]
        assert int(r.n_users) == int(row.n)
        assert int(r.n_converted) == int(row.c)
        assert r.conv_rate == (
            (int(row.c) * 20000 + int(row.n)) // (2 * int(row.n))
        ) / 10000.0
    # every user attributed exactly once
    assert int(got.n_users.sum()) == ev.user_id.nunique()


def test_q172_novelty_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q172_source_novelty").set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    per_src: dict[str, set] = {}
    for _, r in d.iterrows():
        t = r.text.split(" ")
        # <3-token docs yield NO shingles (texthash.ngrams guard)
        sh = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        per_src.setdefault(r.source, set()).update(sh)
    from collections import Counter

    freq = Counter()
    for s in per_src.values():
        freq.update(s)
    for src, sh in per_src.items():
        n_ex = sum(1 for x in sh if freq[x] == 1)
        row = got.loc[src]
        assert int(row.n_shingles) == len(sh)
        assert int(row.n_exclusive) == n_ex
        assert row.exclusive_share == (
            (n_ex * 20000 + len(sh)) // (2 * len(sh))
        ) / 10000.0
