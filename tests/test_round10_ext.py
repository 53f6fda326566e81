"""Round-10 additions (q227+): independent recomputation tests —
pandas/python replays of the declared semantics, not oracle re-runs —
plus planted fixtures for the bucket-boundary machinery."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from low_latency_time_series_database_tsdb_for_market_data_spark.operators import (
    round10_ext,
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


def _ratio_e4(num: int, den: int) -> float:
    return ((num * 20000 + den) // (2 * den)) / 10000.0


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    return ev


def test_q227_jsd_matches_python_replay(reg, spark):
    import math
    from collections import Counter
    from itertools import combinations

    got = _pdf(reg, spark, "q227_source_divergence").set_index(["sa", "sb"])
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts: dict[str, Counter] = {}
    for src, grp in docs.groupby("source"):
        c = Counter()
        for txt in grp.text:
            c.update(txt.split(" "))
        counts[src] = c
    assert len(got) == len(counts) * (len(counts) - 1) // 2
    for sa, sb in combinations(sorted(counts), 2):
        ca, cb = counts[sa], counts[sb]
        At, Bt = sum(ca.values()), sum(cb.values())
        klp = klq = 0
        sa_i = sb_i = 0
        shared = set(ca) & set(cb)
        for tok in shared:
            a, b = ca[tok], cb[tok]
            m = math.log(float(a) * Bt + float(b) * At)
            qp = round(1e6 * (math.log(2.0 * a * Bt) - m))
            qq = round(1e6 * (math.log(2.0 * b * At) - m))
            klp += a * qp
            klq += b * qq
            sa_i += a
            sb_i += b
        klp += (At - sa_i) * 693147
        klq += (Bt - sb_i) * 693147
        num = klp * Bt + klq * At
        den = 2_000_000 * At * Bt
        if num < 0:
            exp = -((-num * 20000 + den) // (2 * den)) / 10000.0
        else:
            exp = ((num * 20000 + den) // (2 * den)) / 10000.0
        r = got.loc[(sa, sb)]
        assert r.n_shared == len(shared)
        assert r.jsd_nats == exp, (sa, sb)
        assert 0.0 <= r.jsd_nats <= 0.6932  # JSD bounded by ln 2


def test_q227_jsd_identical_and_disjoint_bounds(reg, spark, tmp_path):
    # source X == source Y token-for-token (JSD 0); source Z disjoint
    # from both (JSD ln 2 up to micro-nat quantization).
    rows = []
    for i in range(50):
        rows.append((i, f"alpha beta gamma_{i % 7} delta", "en", "X", 10))
        rows.append((100 + i, f"alpha beta gamma_{i % 7} delta", "en", "Y", 10))
        rows.append((200 + i, f"omega_{i % 5} psi chi", "en", "Z", 10))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        reg["q227_source_divergence"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index(["sa", "sb"])
    )
    assert len(got) == 3  # every pair reports, shared tokens or not
    assert got.loc[("X", "Y")].jsd_nats == 0.0
    assert got.loc[("X", "Y")].n_shared > 0
    for pair in (("X", "Z"), ("Y", "Z")):
        assert got.loc[pair].n_shared == 0
        assert got.loc[pair].jsd_nats == 0.6931  # ln 2, micro-nat exact


def _sessions(ev: pd.DataFrame) -> pd.DataFrame:
    ev = ev.sort_values(["user_id", "us", "event_id"]).copy()
    gap = ev.us - ev.groupby("user_id").us.shift(1)
    ev["new_s"] = (gap.isna() | (gap > 1800 * 1_000_000)).astype(int)
    ev["sid"] = ev.groupby("user_id").new_s.cumsum()
    return ev


def test_q228_session_depth_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q228_session_depth").set_index("entry_type")
    ev = _sessions(_events())
    d = ev.groupby(["user_id", "sid"]).agg(
        depth=("event_id", "size"),
        entry=("event_type", "first"),  # sorted: first row IS new_s=1
    )
    for entry, grp in d.groupby("entry"):
        r = got.loc[entry]
        assert r.n_sessions == len(grp)
        assert r.max_depth == grp.depth.max()
        for q, col in ((25, "p25_depth"), (50, "p50_depth"), (75, "p75_depth")):
            exp = round(float(np.percentile(grp.depth, q)), 4)
            assert r[col] == exp, (entry, q)


def test_q229_arrival_audit_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q229_arrival_order_audit").set_index("user_id")
    ev = _events().sort_values(["user_id", "event_id"])
    ev["wm"] = ev.groupby("user_id").us.apply(
        lambda s: s.cummax().shift(1)
    ).reset_index(level=0, drop=True)
    # NOTE: the generated testdata is perfectly ordered (event_id IS the
    # per-user time order), so n_late is 0 everywhere here — the healthy
    # reading, like q225's all-zeros.  The late path is exercised by the
    # planted fixture below.
    for uid, grp in ev.groupby("user_id"):
        r = got.loc[uid]
        lt = grp[grp.us < grp.wm]
        assert r.n_events == len(grp)
        assert r.n_late == len(lt)
        assert r.late_share_e4 == _ratio_e4(len(lt), len(grp))
        exp_max = int((lt.wm - lt.us).max()) if len(lt) else 0
        assert r.max_late_us == exp_max, uid


def test_q229_planted_late_arrivals(reg, spark, tmp_path):
    # user 1: third ARRIVAL (event_id order) carries an event time 90 s
    # behind the watermark; user 2 stays ordered.
    base = pd.Timestamp("2024-01-01")
    sec = [0, 100, 10, 200]  # arrival 3 is 90 s late vs wm=100
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": [base + pd.Timedelta(seconds=s) for s in sec + [0, 50]],
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["click"] * 6,
            "value": [1.0] * 6,
            "props": ['{"k": 1}'] * 6,
        }
    ).to_parquet(tmp_path / "events.parquet")
    got = (
        reg["q229_arrival_order_audit"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("user_id")
    )
    assert got.loc[1].n_late == 1
    assert got.loc[1].max_late_us == 90 * 1_000_000
    assert got.loc[1].late_share_e4 == _ratio_e4(1, 4)
    assert got.loc[2].n_late == 0 and got.loc[2].max_late_us == 0


def test_q230_gaps_match_python_replay(reg, spark):
    got = _pdf(reg, spark, "q230_eventid_gaps").iloc[0]
    ids = np.sort(_events().event_id.unique())
    diffs = np.diff(ids) - 1
    assert got.n_ids == len(ids)
    assert got.min_id == ids[0] and got.max_id == ids[-1]
    assert got.n_missing == ids[-1] - ids[0] + 1 - len(ids)
    assert got.n_gap_runs == int((diffs > 0).sum())
    assert got.max_gap == (int(diffs.max()) if len(diffs) else 0)


def test_q230_planted_boundary_gaps(reg, spark, tmp_path, monkeypatch):
    # ids crafted so (with 8-wide buckets) there is an intra-bucket run,
    # a zero boundary gap, a gap spanning an entirely EMPTY bucket, and
    # a duplicate id the distinct must collapse.
    ids = [0, 1, 2, 5, 5, 6, 7, 8, 22, 23]
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": ids,
            "ts": [base + pd.Timedelta(seconds=i) for i in range(len(ids))],
            "user_id": [1] * len(ids),
            "event_type": ["click"] * len(ids),
            "value": [1.0] * len(ids),
            "props": ['{"k": 1}'] * len(ids),
        }
    ).to_parquet(tmp_path / "events.parquet")
    monkeypatch.setattr(round10_ext, "_GAP_BUCKET", 8)
    got = reg["q230_eventid_gaps"].fn(spark, str(tmp_path)).toPandas().iloc[0]
    assert got.n_ids == 9
    assert got.min_id == 0 and got.max_id == 23
    assert got.n_missing == 24 - 9
    assert got.n_gap_runs == 2  # (2->5) intra, (8->22) across empty bucket
    assert got.max_gap == 13


def test_q231_signup_conversion_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q231_signup_conversion").set_index("week")
    ev = _events()
    wk = 7 * 86400 * 1_000_000
    s = (
        ev[ev.event_type == "signup"]
        .groupby("user_id")
        .us.min()
        .rename("signup_us")
    )
    p = ev[ev.event_type == "purchase"].merge(
        s, left_on="user_id", right_index=True
    )
    p = p[p.us >= p.signup_us].groupby("user_id").us.min().rename("fp_us")
    c = pd.concat([s, p], axis=1)
    c["week"] = c.signup_us // wk
    c["conv"] = ((c.fp_us - c.signup_us) <= wk).fillna(False).astype(int)
    exp = c.groupby("week").agg(n=("conv", "size"), k=("conv", "sum"))
    assert len(got) == len(exp)
    for week, e in exp.iterrows():
        r = got.loc[week]
        assert r.n_signups == e.n
        assert r.n_converted_7d == e.k
        assert r.conv_share_e4 == _ratio_e4(int(e.k), int(e.n)), week


def test_q232_props_profile_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q232_props_profile").set_index("event_type")
    ev = _events()
    ev["k"] = ev.props.map(lambda s: int(json.loads(s)["k"]))
    for et, grp in ev.groupby("event_type"):
        r = got.loc[et]
        assert r.n == len(grp)
        assert r.n_distinct_k == grp.k.nunique()
        assert r.min_k == grp.k.min() and r.max_k == grp.k.max()
        for q, col in ((25, "p25_k"), (50, "p50_k"), (75, "p75_k")):
            assert r[col] == round(float(np.percentile(grp.k, q)), 4), (et, q)


def test_q233_drift_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q233_ingestion_drift").set_index("decile")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    m = int(docs.doc_id.max())
    docs["decile"] = docs.doc_id * 10 // (m + 1)
    mult = docs.groupby("text").doc_id.transform("size")
    docs["dup"] = (mult > 1).astype(int)
    exp = docs.groupby("decile").agg(
        n=("doc_id", "size"), sc=("n_chars", "sum"), nd=("dup", "sum")
    )
    assert len(got) == len(exp)
    for dec, e in exp.iterrows():
        r = got.loc[dec]
        assert r.n_docs == e.n and r.sum_chars == e.sc and r.n_dup == e.nd
        assert r.avg_chars == _ratio_e4(int(e.sc), int(e.n))
        assert r.dup_share_e4 == _ratio_e4(int(e.nd), int(e.n)), dec


def test_q234_margin_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q234_centroid_margin").set_index("margin_bucket")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.floor(np.stack(emb.embedding.values).astype("float64") * 10000
                 ).astype("int64")
    labels = emb.label.astype("int64").values
    cents = {}
    for lb in np.unique(labels):
        s = X[labels == lb].sum(axis=0).astype(object)
        n = int((labels == lb).sum())
        ci = [
            -(((-v) * 20000 + n) // (2 * n)) if v < 0
            else ((v * 20000 + n) // (2 * n))
            for v in s
        ]
        cents[int(lb)] = np.array(ci, dtype="int64")
    buckets = {}
    for row in X:
        # argmin over (dist, label) total order; q lifted to ci's e8 scale
        ds = sorted(
            (int(((row * 10000 - c) ** 2).sum()), lb)
            for lb, c in cents.items()
        )
        d1, d2 = ds[0][0], ds[1][0]
        b = min(999, (d2 - d1) * 1000 // max(d1, 1))
        buckets[b] = buckets.get(b, 0) + 1
    assert len(got) == len(buckets)
    for b, n in buckets.items():
        assert got.loc[b].n_vectors == n, b


def test_q235_bucket_profile_consistent_with_q55(reg, spark):
    prof = _pdf(reg, spark, "q235_lsh_bucket_profile").set_index("band")
    b55 = _pdf(reg, spark, "q55_lsh_buckets")
    for band, grp in b55.groupby("band"):
        r = prof.loc[band]
        n = grp.n_docs.astype("int64")
        assert r.n_buckets == len(grp)
        assert r.n_singletons == int((n == 1).sum())
        assert r.singleton_share_e4 == _ratio_e4(int((n == 1).sum()), len(grp))
        assert r.max_bucket == int(n.max())
        assert r.p95_bucket == round(float(np.percentile(n, 95)), 4), band


def test_q236_curve_monotone_and_consistent_with_q56(reg, spark):
    curve = _pdf(reg, spark, "q236_jaccard_threshold_curve").set_index(
        "threshold_e1"
    )
    assert list(curve.index) == [5, 6, 7, 8, 9]
    # monotone non-increasing in the threshold, on both measures
    assert curve.n_pairs.is_monotonic_decreasing
    assert curve.n_docs.is_monotonic_decreasing
    # the 0.6 point IS q56's pair count (same integer rule)
    q56 = _pdf(reg, spark, "q56_ngram_jaccard_pairs")
    assert curve.loc[6].n_pairs == len(q56)
    assert curve.loc[6].n_docs == len(
        set(q56.doc_a) | set(q56.doc_b)
    )


def test_q237_record_days_match_python_replay(reg, spark):
    got = _pdf(reg, spark, "q237_record_days")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["day"] = (
        j.o_orderdate.astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    j["cents"] = (j.o_totalprice * 100).round().astype("int64")
    d = (
        j.groupby(["c_mktsegment", "day"])
        .cents.max()
        .reset_index()
        .sort_values(["c_mktsegment", "day"])
    )
    exp = []
    for seg, grp in d.groupby("c_mktsegment"):
        best = None
        for _, row in grp.iterrows():
            if best is None or row.cents > best:
                best = int(row.cents)
                exp.append((seg, int(row.day), best / 100.0))
    exp_df = (
        pd.DataFrame(exp, columns=["segment", "day", "record_price"])
        .sort_values(["segment", "day"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["segment", "day"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp_df, check_dtype=False)


def test_q238_weighted_median_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q238_weighted_median").set_index("event_type")
    ev = _events()
    ev["v_c"] = (ev.value * 100).round().astype("int64")
    ev["wt"] = ev.props.map(lambda s: int(json.loads(s)["k"]))
    for et, grp in ev.groupby("event_type"):
        g = grp.groupby("v_c").wt.sum().sort_index()
        tot = int(g.sum())
        cum = g.cumsum()
        wmed = int(cum[2 * cum >= tot].index[0])
        r = got.loc[et]
        assert r.wmedian_price == wmed / 100.0
        assert r.total_weight == tot
        # at least half the weight sits at-or-below the weighted median
        assert 2 * int(cum.loc[wmed]) >= tot


def test_q239_profile_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q239_column_profile").set_index("column_name")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["l_shipdate_day"] = (
        li.l_shipdate.astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    for name in (
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate_day",
    ):
        r = got.loc[name]
        s = li[name]
        assert r.n_rows == len(li)
        assert r.n_nulls == int(s.isna().sum())
        assert r.n_distinct == s.nunique()
        assert r.min_value == float(s.min())
        assert r.max_value == float(s.max()), name


def test_q240_pmi_matches_python_replay(reg, spark):
    import math
    from collections import Counter

    got = _pdf(reg, spark, "q240_token_pmi")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    uni, big = Counter(), Counter()
    for txt in docs.text:
        t = txt.split(" ")
        uni.update(t)
        big.update(zip(t, t[1:]))
    T = sum(uni.values())
    rows = []
    for (w1, w2), n in big.items():
        if n < 10:
            continue
        pmi = round(
            1e6
            * (
                math.log(float(n))
                + math.log(float(T))
                - math.log(float(uni[w1]))
                - math.log(float(uni[w2]))
            )
        )
        rows.append((f"{w1} {w2}", n, pmi))
    rows.sort(key=lambda r: (-r[2], r[0]))
    exp = [(bg, n, pm / 1e6) for bg, n, pm in rows[:20]]
    assert len(got) == len(exp)
    for (bg, n, pmi), (_, r) in zip(exp, got.iterrows()):
        assert r.bigram == bg and r.n == n and r.pmi_nats == pmi, bg


def test_q241_planted_sources(reg, spark, tmp_path):
    # source X: three byte-identical docs + one unrelated unique doc;
    # source Y: unique disjoint docs.  Identical texts collide in every
    # LSH band, so X flags exactly its 3 copies; Y flags nothing.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today", "en", "X", 10),
        (2, "the quick brown fox jumps over the lazy dog again today", "en", "X", 10),
        (3, "the quick brown fox jumps over the lazy dog again today", "en", "X", 10),
        (4, "completely unrelated text about market data engines here", "en", "X", 10),
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "Y", 10),
        (6, "one two three four five six seven eight nine ten eleven", "en", "Y", 10),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        reg["q241_near_dup_rate_by_source"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("source")
    )
    assert got.loc["X"].n_docs == 4 and got.loc["X"].n_flagged == 3
    assert got.loc["X"].flagged_share_e4 == _ratio_e4(3, 4)
    assert got.loc["Y"].n_docs == 2 and got.loc["Y"].n_flagged == 0
    assert got.loc["Y"].flagged_share_e4 == 0.0


def test_q242_backtest_matches_python_replay(reg, spark):
    import math

    got = _pdf(reg, spark, "q242_sma_backtest").set_index("event_type")
    ev = _events().sort_values(["event_type", "ts", "event_id"])
    ev["day"] = ev.ts.dt.normalize()
    ev["c"] = (ev.value * 100).round().astype("int64")
    for et, grp in ev.groupby("event_type"):
        cl = grp.groupby("day").c.last()  # (ts, event_id)-ordered close
        n20 = cl.rolling(20, min_periods=1).count().astype("int64")
        s20 = cl.rolling(20, min_periods=1).sum().astype("int64")
        sig = (cl * n20 > s20).astype(int)
        pos = sig.shift(1)
        pc = cl.shift(1)
        mask = pc.notna()
        ret = [
            round(1e6 * (math.log(float(a)) - math.log(float(b))))
            for a, b in zip(cl[mask], pc[mask])
        ]
        pos_m = pos[mask].astype(int).values
        r = got.loc[et]
        assert r.n_days == int(mask.sum())
        assert r.n_days_long == int(pos_m.sum())
        assert r.bh_ret_micro == sum(ret)
        assert r.strat_ret_micro == sum(
            rr for rr, p in zip(ret, pos_m) if p == 1
        ), et


def test_q243_knn_matches_python_replay(reg, spark):
    got = _pdf(reg, spark, "q243_knn_eval")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.floor(
        np.stack(emb.embedding.values).astype("float64") * 10000
    ).astype("int64")
    ids = emb.vec_id.values
    labels = emb.label.astype("int64").values
    te = ids < 200
    conf = {}
    for i in np.where(te)[0]:
        cands = []
        for j in np.where(~te)[0]:
            d = int(((X[i] - X[j]) ** 2).sum())
            cands.append((d, int(ids[j]), int(labels[j])))
        cands.sort()
        votes = {}
        for _, _, lb in cands[:5]:
            votes[lb] = votes.get(lb, 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        conf[(int(labels[i]), pred)] = conf.get(
            (int(labels[i]), pred), 0
        ) + 1
    assert len(got) == len(conf)
    for _, r in got.iterrows():
        assert conf[(r.label_true, r.label_pred)] == r.n
    # (no learnability assert: at sf0.001 the train split is tiny and
    # accuracy is data, not operator, behaviour — exact equality above
    # is the contract)
