"""Round-9 additions (q206-q225): independent recomputation tests —
pandas/python replays of the declared semantics, not oracle re-runs —
plus the exactness properties each query's docstring claims."""

from __future__ import annotations

import numpy as np
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


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev["c"] = (ev.value * 100).round().astype("int64")
    ev["dno"] = ev.us // 86_400_000_000
    return ev.sort_values(["event_type", "ts", "event_id"]).reset_index(
        drop=True
    )


def _ratio_e4(num: int, den: int) -> float:
    return ((num * 20000 + den) // (2 * den)) / 10000.0


def test_q206_product_margin_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q206_product_margin").set_index(
        ["n_name", "ship_year"]
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    j = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(n, left_on="s_nationkey", right_on="n_nationkey")
    )
    rev_u = (j.l_extendedprice * (1 - j.l_discount) * 10000).round().astype(
        "int64"
    )
    cost_u = (
        (j.p_retailprice * 100).round().astype("int64")
        * 100
        * j.l_quantity.astype("int64")
    )
    j = j.assign(
        margin_u=rev_u - cost_u,
        ship_year=pd.to_datetime(j.l_shipdate).dt.year.astype("int64"),
    )
    exp = j.groupby(["n_name", "ship_year"]).agg(
        n_items=("margin_u", "size"), margin_u=("margin_u", "sum")
    )
    assert len(got) == len(exp)
    for key, e in exp.iterrows():
        r = got.loc[key]
        assert r.n_items == e.n_items
        assert r.margin == e.margin_u / 1000000.0, key


def test_q207_supplier_span_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q207_supplier_span").set_index("n_suppliers")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    per = li.groupby("l_orderkey").agg(
        ns=("l_suppkey", "nunique"), nl=("l_suppkey", "size")
    )
    exp = per.groupby("ns").agg(n_orders=("nl", "size"), n_lines=("nl", "sum"))
    assert len(got) == len(exp)
    for ns, e in exp.iterrows():
        r = got.loc[ns]
        assert r.n_orders == e.n_orders and r.n_lines == e.n_lines, ns


def test_q208_prospect_segments_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q208_prospect_segments").set_index("c_mktsegment")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c["bal_c"] = (c.c_acctbal * 100).round().astype("int64")
    oc = o.groupby("o_custkey").size()
    c["n_ord"] = c.c_custkey.map(oc).fillna(0).astype("int64")
    pos = c[c.bal_c > 0]
    n_pos, sum_pos = len(pos), int(pos.bal_c.sum())
    pr = c[
        (c.bal_c * n_pos > sum_pos) & (c.n_ord * 2 * len(c) < len(o))
    ]
    assert len(pr) > 0  # the variant exists BECAUSE Q22-strict is empty
    exp = pr.groupby("c_mktsegment").agg(
        n=("bal_c", "size"), tot=("bal_c", "sum"), no=("n_ord", "sum")
    )
    assert len(got) == len(exp)
    for seg, e in exp.iterrows():
        r = got.loc[seg]
        assert r.n_prospects == e.n
        assert r.total_bal == e.tot / 100.0, seg
        assert r.orders_held == e.no, seg


def test_q209_ma_crossover_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q209_ma_crossover").set_index("event_type")
    ev = _events()
    for sym, g in ev.groupby("event_type"):
        cs = g.c.to_numpy()
        s5 = pd.Series(cs).rolling(5).sum().to_numpy()
        s20 = pd.Series(cs).rolling(20).sum().to_numpy()
        state = np.where(
            np.isnan(s20), np.nan, np.sign(4 * s5 - s20)
        )
        up = dn = 0
        for i in range(1, len(state)):
            if np.isnan(state[i]) or np.isnan(state[i - 1]):
                continue
            if state[i] == 1 and state[i - 1] <= 0:
                up += 1
            if state[i] == -1 and state[i - 1] >= 0:
                dn += 1
        r = got.loc[sym]
        assert r.n_ticks == len(g)
        assert r.cross_up == up and r.cross_down == dn, sym


def test_q210_stickiness_matches_bruteforce(reg, spark):
    got = _pdf(reg, spark, "q210_stickiness").set_index("dno")
    ev = _events()
    ud = ev[["user_id", "dno"]].drop_duplicates()
    days = sorted(ud.dno.unique())
    assert list(got.index) == days
    for d in days:
        dau = int((ud.dno == d).sum())
        mau = ud[(ud.dno >= d - 27) & (ud.dno <= d)].user_id.nunique()
        r = got.loc[d]
        assert r.dau == dau and r.mau == mau, d
        assert r.stickiness_e4 == _ratio_e4(dau, mau), d


def test_q210_sweep_merges_overlapping_cover_intervals(reg, spark, tmp_path):
    """A user active on days 0 and 27 (overlapping 28-day covers) must
    count ONCE in every MAU between; a user active on days 0 and 28
    (adjacent covers) must still count once on each covered day."""
    rows = []
    for i, (uid, dnos) in enumerate(
        [(1, [0, 27]), (2, [0, 28])]
    ):
        for d in dnos:
            rows.append(
                {
                    "event_id": i * 100 + d,
                    "ts": pd.Timestamp("1970-01-01")
                    + pd.Timedelta(days=int(d), hours=1),
                    "user_id": uid,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
            )
    from pyspark.sql import functions as F

    df = pd.DataFrame(rows)
    d = tmp_path / "sweep"
    sdf = spark.createDataFrame(df).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    sdf.write.parquet(str(d / "events.parquet"))
    got = (
        _pdf(reg, spark, "q210_stickiness", str(d)).set_index("dno")
    )
    # observed days: 0 (both users), 27 (u1), 28 (u2)
    assert got.loc[0].mau == 2
    assert got.loc[27].mau == 2  # u1 twice-active counts once; u2 covered
    assert got.loc[28].mau == 2  # u1's day-27 cover + u2's day-28 start


def test_q211_l28_histogram_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q211_l28_histogram").set_index("active_days")
    ev = _events()
    ud = ev[["user_id", "dno"]].drop_duplicates()
    amax = ud.dno.max()
    l28 = ud[ud.dno >= amax - 27].groupby("user_id").size()
    exp = l28.groupby(l28).size()
    assert len(got) == len(exp)
    for ad, n in exp.items():
        assert got.loc[ad].n_users == n, ad


def test_q212_engulfing_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q212_engulfing_candles").set_index("event_type")
    ev = _events()
    for sym, g in ev.groupby("event_type"):
        daily = g.groupby(g.dno).agg(o=("c", "first"), cl=("c", "last"))
        po, pc = daily.o.shift(), daily.cl.shift()
        bull = (pc < po) & (daily.cl > daily.o) & (daily.o <= pc) & (
            daily.cl >= po
        )
        bear = (pc > po) & (daily.cl < daily.o) & (daily.o >= pc) & (
            daily.cl <= po
        )
        r = got.loc[sym]
        assert r.n_days == len(daily)
        assert r.n_bullish == int(bull.sum()), sym
        assert r.n_bearish == int(bear.sum()), sym


def test_q213_prefix_collisions_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q213_prefix_collisions")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    g = d.assign(pfx=d.text.str[:64]).groupby("pfx").agg(
        n_docs=("text", "size"), n_texts=("text", "nunique")
    )
    g = g[g.n_docs > 1]
    exp = g.groupby("n_docs").agg(
        n_groups=("n_texts", "size"),
        n_divergent=("n_texts", lambda s: int((s > 1).sum())),
    )
    if len(exp) == 0:
        assert len(got) == 0
        return
    got = got.set_index("group_size")
    assert len(got) == len(exp)
    for k, e in exp.iterrows():
        r = got.loc[k]
        assert r.n_groups == e.n_groups and r.n_divergent == e.n_divergent


def test_q213_planted_prefix_divergence(reg, spark, tmp_path):
    """Planted corpus: two docs sharing a 64-char prefix but diverging
    after it must surface as ONE divergent group of size 2; two exact
    duplicates share a prefix but are NOT divergent."""
    pre = "x" * 64
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                pre + " tail one",
                pre + " tail two",
                "dup dup dup " + "y" * 60,
                "dup dup dup " + "y" * 60,
                "unique short doc",
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [73, 73, 72, 72, 16],
        }
    )
    d = tmp_path / "pfx"
    spark.createDataFrame(docs).write.parquet(str(d / "documents.parquet"))
    got = _pdf(reg, spark, "q213_prefix_collisions", str(d)).set_index(
        "group_size"
    )
    assert got.loc[2].n_groups == 2
    assert got.loc[2].n_divergent == 1


def test_q214_tick_runs_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q214_tick_runs").set_index("event_type")
    ev = _events()
    for sym, g in ev.groupby("event_type"):
        cs = g.c.to_numpy()
        dirs = np.sign(np.diff(cs))
        runs = {1: [], -1: []}
        i = 0
        while i < len(dirs):
            if dirs[i] == 0:
                i += 1
                continue
            j = i
            while j + 1 < len(dirs) and dirs[j + 1] == dirs[i]:
                j += 1
            runs[int(dirs[i])].append(j - i + 1)
            i = j + 1
        r = got.loc[sym]
        assert r.n_up_runs == len(runs[1])
        assert r.n_down_runs == len(runs[-1])
        assert r.max_up_run == (max(runs[1]) if runs[1] else 0)
        assert r.max_down_run == (max(runs[-1]) if runs[-1] else 0), sym


def test_q215_bounce_rate_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q215_bounce_rate").set_index("entry")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"])
    stats: dict[str, list[int]] = {}
    for _, g in ev.groupby("user_id"):
        gap = g.us.diff()
        new_s = gap.isna() | (gap > 1800 * 1_000_000)
        sid = new_s.cumsum()
        for _, s in g.groupby(sid):
            entry = s.iloc[0].event_type
            n, b = stats.setdefault(entry, [0, 0])
            stats[entry] = [n + 1, b + (1 if len(s) == 1 else 0)]
    assert len(got) == len(stats)
    for entry, (n, b) in stats.items():
        r = got.loc[entry]
        assert r.n_sessions == n and r.n_bounces == b, entry
        assert r.bounce_e4 == _ratio_e4(b, n), entry


def test_q216_top_boilerplate_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q216_top_boilerplate").set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    for src, g in d.groupby("source"):
        cnt: Counter = Counter()
        for t in g.text:
            toks = t.split(" ")
            # 1- and 2-token docs yield ZERO 3-shingles on both engines:
            # the oracle's range(1, greatest(len-1, 1)) has an exclusive
            # stop, so it is empty below 3 tokens, matching shingles()
            n_sh = 0 if len(toks) < 3 else len(toks) - 2
            for i in range(n_sh):
                cnt[" ".join(toks[i : i + 3])] += 1
        mc = max(cnt.values())
        best = min(s for s, n in cnt.items() if n == mc)
        r = got.loc[src]
        assert r.occurrences == mc, src
        assert r.top_shingle == best, src


def test_q217_type_affinity_matches_python_replay(reg, spark):
    sf = "/root/testdata/sf0.01"
    got = _pdf(reg, spark, "q217_type_affinity", sf)
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ut = ev.groupby(["user_id", "event_type"]).size().rename("u_t")
    uu = ut.groupby("user_id").sum()
    gt = ev.groupby("event_type").size()
    g_tot = len(ev)
    rows = []
    for (u, ty), n in ut.items():
        if n < 5:
            continue
        lift = _ratio_e4(int(n) * g_tot, int(uu[u]) * int(gt[ty]))
        rows.append((u, ty, int(n), lift))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    exp = rows[:20]
    assert len(got) == len(exp)
    for i, (u, ty, n, lift) in enumerate(exp):
        r = got.iloc[i]
        assert (r.user_id, r.event_type, r.u_t, r.lift_e4) == (
            u, ty, n, lift
        ), i


def test_q218_single_source_risk_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q218_single_source_risk").set_index("n_nations")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j["rev_u"] = (
        (j.l_extendedprice * (1 - j.l_discount) * 10000).round().astype(
            "int64"
        )
    )
    p = j.groupby("l_partkey").agg(
        nn=("s_nationkey", "nunique"), rev=("rev_u", "sum")
    )
    exp = p.groupby("nn").agg(n_parts=("rev", "size"), rev=("rev", "sum"))
    assert len(got) == len(exp)
    for nn, e in exp.iterrows():
        r = got.loc[nn]
        assert r.n_parts == e.n_parts
        assert r.revenue == e.rev / 1000000.0, nn


def test_q219_label_balance_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q219_label_balance").iloc[0]
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    c = e.groupby("label").size()
    n, k = len(e), len(c)
    sum_c2 = int((c.astype("int64") ** 2).sum())
    assert got.n_vecs == n and got.n_labels == k
    assert got.min_count == c.min() and got.max_count == c.max()
    assert got.imbalance_e4 == _ratio_e4(int(c.max()), int(c.min()))
    assert got.chi2_e4 == _ratio_e4(k * sum_c2 - n * n, n)


def test_q220_order_fill_days_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q220_order_fill_days").set_index(
        "o_orderpriority"
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    f = li.groupby("l_orderkey").l_shipdate.max().rename("last_ship")
    j = o.merge(f, left_on="o_orderkey", right_index=True)
    fill = (
        pd.to_datetime(j.last_ship) - pd.to_datetime(j.o_orderdate)
    ).dt.days.astype("int64")
    j = j.assign(fill_d=fill)
    for pri, g in j.groupby("o_orderpriority"):
        r = got.loc[pri]
        assert r.n_orders == len(g)
        for p, col in ((25, "p25_days"), (50, "p50_days"), (75, "p75_days")):
            assert r[col] == round(
                float(np.percentile(g.fill_d, p, method="linear")), 4
            ), (pri, col)
        assert r.max_days == g.fill_d.max()


def test_q221_gap_continuation_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q221_gap_continuation").set_index("event_type")
    ev = _events()
    for sym, g in ev.groupby("event_type"):
        daily = g.groupby(g.dno).agg(o=("c", "first"), cl=("c", "last"))
        pc = daily.cl.shift()
        d = daily.assign(pc=pc).dropna(subset=["pc"])
        up = d.o > d.pc
        upc = up & (d.cl > d.o)
        dn = d.o < d.pc
        dnc = dn & (d.cl < d.o)
        r = got.loc[sym]
        assert r.n_gap_up == int(up.sum())
        assert r.n_up_continued == int(upc.sum())
        assert r.up_cont_e4 == _ratio_e4(int(upc.sum()), max(int(up.sum()), 1))
        assert r.n_gap_down == int(dn.sum())
        assert r.n_down_continued == int(dnc.sum()), sym


def test_q222_repeat_purchase_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q222_repeat_purchase").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    p = ev[ev.event_type == "purchase"].sort_values(
        ["user_id", "us", "event_id"]
    )
    gaps, n_buyers, n_repeat = [], 0, 0
    for _, g in p.groupby("user_id"):
        n_buyers += 1
        if len(g) >= 2:
            n_repeat += 1
            gaps.append(int(g.us.iloc[1] - g.us.iloc[0]))
    assert got.n_buyers == n_buyers and got.n_repeat == n_repeat
    assert got.repeat_e4 == _ratio_e4(n_repeat, n_buyers)
    assert got.p50_gap_us == round(
        float(np.percentile(gaps, 50, method="linear")), 4
    )


def test_q223_crosslang_dups_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q223_crosslang_dups").set_index(
        ["n_langs", "is_dup"]
    )
    d = pd.read_parquet(f"{SF}/documents.parquet")
    g = d.groupby("text").agg(
        n_docs=("lang", "size"), n_langs=("lang", "nunique")
    )
    g = g.assign(is_dup=g.n_docs > 1)
    exp = g.groupby(["n_langs", "is_dup"]).agg(
        n_groups=("n_docs", "size"), n_docs=("n_docs", "sum")
    )
    assert len(got) == len(exp) and len(exp) > 0
    for k, e in exp.iterrows():
        r = got.loc[k]
        assert r.n_groups == e.n_groups and r.n_docs == e.n_docs


def test_q223_planted_crosslang(reg, spark, tmp_path):
    """Planted: identical text under two langs surfaces as one
    (n_langs=2, dup) group; identical text under one lang stays
    (1, dup); the unique doc lands in the (1, non-dup) baseline."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["same body", "same body", "mono body", "mono body",
                     "unique"],
            "lang": ["en", "de", "en", "en", "en"],
            "source": ["s"] * 5,
            "n_chars": [9, 9, 9, 9, 6],
        }
    )
    d = tmp_path / "xl"
    spark.createDataFrame(docs).write.parquet(str(d / "documents.parquet"))
    got = _pdf(reg, spark, "q223_crosslang_dups", str(d)).set_index(
        ["n_langs", "is_dup"]
    )
    assert got.loc[(2, True)].n_groups == 1
    assert got.loc[(2, True)].n_docs == 2
    assert got.loc[(1, True)].n_groups == 1
    assert got.loc[(1, True)].n_docs == 2
    assert got.loc[(1, False)].n_groups == 1
    assert got.loc[(1, False)].n_docs == 1


def test_q224_vocab_growth_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q224_vocab_growth").set_index("decile")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    first: dict[str, int] = {}
    for _, row in d.sort_values("doc_id").iterrows():
        toks = row.text.split(" ")
        # zero 3-shingles below 3 tokens on both engines (see q216 replay)
        n_sh = 0 if len(toks) < 3 else len(toks) - 2
        for i in range(n_sh):
            s = " ".join(toks[i : i + 3])
            if s not in first:
                first[s] = int(row.doc_id)
    m = int(d.doc_id.max())
    exp: dict[int, int] = {}
    for fd in first.values():
        b = (fd * 10) // (m + 1)
        exp[b] = exp.get(b, 0) + 1
    assert len(got) == len(exp)
    for b, n in exp.items():
        assert got.loc[b].new_shingles == n, b
    # the curve exists: later deciles introduce FEWER new shingles than
    # the first (template corpus -> vocabulary saturates)
    if 0 in exp and 9 in exp:
        assert exp[9] < exp[0]


def test_q225_referential_orphans_all_edges_clean(reg, spark):
    got = _pdf(reg, spark, "q225_referential_orphans").set_index(
        "relationship"
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    exp = {
        "lineitem->orders": (
            int(~li.l_orderkey.isin(set(o.o_orderkey)).all()) * 0
            + int((~li.l_orderkey.isin(set(o.o_orderkey))).sum()),
            len(li),
        ),
        "lineitem->part": (
            int((~li.l_partkey.isin(set(p.p_partkey))).sum()), len(li)
        ),
        "lineitem->supplier": (
            int((~li.l_suppkey.isin(set(s.s_suppkey))).sum()), len(li)
        ),
        "orders->customer": (
            int((~o.o_custkey.isin(set(c.c_custkey))).sum()), len(o)
        ),
    }
    assert len(got) == 4
    for rel, (orph, checked) in exp.items():
        r = got.loc[rel]
        assert r.n_orphans == orph and r.n_checked == checked, rel


def test_q225_planted_orphans_detected(reg, spark, tmp_path):
    """Plant one orphaned lineitem (no parent order) and one orphaned
    order (no customer): the audit must count exactly them."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet").head(50).copy()
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[o.o_orderkey.isin(set(li.l_orderkey))].copy()
    p = pd.read_parquet(f"{SF}/part.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    li.loc[li.index[0], "l_orderkey"] = 10**9  # orphan line
    o.loc[o.index[0], "o_custkey"] = 10**9  # orphan order
    d = tmp_path / "ref"
    for t, df in (
        ("lineitem", li), ("orders", o), ("part", p),
        ("supplier", s), ("customer", c),
    ):
        spark.createDataFrame(df).write.parquet(str(d / f"{t}.parquet"))
    got = _pdf(reg, spark, "q225_referential_orphans", str(d)).set_index(
        "relationship"
    )
    assert got.loc["lineitem->orders"].n_orphans == 1
    assert got.loc["orders->customer"].n_orphans == 1
    assert got.loc["lineitem->part"].n_orphans == 0
    assert got.loc["lineitem->supplier"].n_orphans == 0
