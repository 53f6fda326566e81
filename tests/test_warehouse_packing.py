"""Invariant tests for the q113-q124 block (warehouse joins, portfolio
depth, training-batch packing): the semantics a single oracle diff can't
pin — full Python recomputation of the packing/lexical math, crafted
event-study fixtures, conservation laws on the distribution reports.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _pdf(reg, spark, sf, name):
    return reg[name].fn(spark, sf).toPandas()


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text", "source", "n_chars")
        .toPandas()
        .set_index("doc_id")
    )


# ---------------------------------------------------------------- warehouse


def test_q113_top10_filters_and_total_order(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q113_ship_priority")
    assert len(got) == 10
    assert (got.o_orderdate < dt.datetime(1998, 1, 1)).all()
    assert (got.n_items >= 1).all() and (got.revenue > 0).all()
    # TakeOrdered emits the total order: revenue desc, orderkey tie-break
    keys = list(zip(-got.revenue, got.o_orderkey))
    assert keys == sorted(keys)


def test_q115_zero_order_customers_are_counted(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q115_cust_order_distribution")
    n_cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    active = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert got.custdist.sum() == n_cust  # every customer in exactly one bucket
    zero = got.set_index("c_count").custdist.get(0, 0)
    assert zero == n_cust - active  # the LEFT-join-only bucket


def test_q114_shares_sum_to_one(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q114_region_revenue_share")
    assert len(got) >= 1
    # each share is individually round-half-up e4, so the sum sits
    # within n/2 ulps of exactly 1
    assert abs(got.share_e4.sum() - 1.0) <= len(got) * 5e-5 + 1e-12


# ---------------------------------------------------------------- portfolio


def test_q117_pair_counts_match_bucket_counts(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q117_flow_autocorr").set_index(
        "event_type"
    )
    buckets = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("event_type", F.date_trunc("hour", "ts"))
        .count()
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    for sym, n_buckets in buckets.items():
        assert got.loc[sym].n_pairs == n_buckets - 1
        assert -1.0 <= got.loc[sym].r <= 1.0


def test_q118_hhi_bounds(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q118_turnover_hhi")
    assert len(got) > 0
    for r in got.itertuples():
        # HHI lives in (1e8/n, 1e8]; rounding adds at most ~n_symbols bp^2
        assert r.hhi_e8 <= 10_000**2 + r.n_symbols * 10_000
        assert r.hhi_e8 >= 10_000**2 // r.n_symbols - r.n_symbols * 10_000
        assert 0 < r.top_share_bp <= 10_000


def _events_dir(spark, tmp_path, name, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tmp_path / name
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_q120_alignment_on_crafted_users(reg, spark, tmp_path):
    """User 1 signs up at t0 with activity at -2h, 0, +1.5h; user 2
    never signs up and must vanish; user 3 signs up twice — the FIRST
    signup anchors."""
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t0 - 2 * h, 1, "click", 10.0, "{}"),
        (2, t0, 1, "signup", 20.0, "{}"),
        (3, t0 + dt.timedelta(hours=1, minutes=30), 1, "view", 30.0, "{}"),
        (4, t0, 2, "click", 99.0, "{}"),
        (5, t0, 3, "signup", 40.0, "{}"),
        (6, t0 + 5 * h, 3, "signup", 50.0, "{}"),
    ]
    sf = _events_dir(spark, tmp_path, "study", rows)
    got = (
        reg["q120_event_study"].fn(spark, sf).toPandas().set_index("rel_hour")
    )
    assert set(got.index) == {-2, 0, 1, 5}
    assert got.loc[-2].n == 1 and got.loc[-2].avg_value == 10.0
    # rel 0 collects user 1's signup and user 3's first signup
    assert got.loc[0].n == 2 and got.loc[0].avg_value == 30.0
    assert got.loc[1].n == 1 and got.loc[1].avg_value == 30.0
    # user 3's second signup aligns at +5 — anchored on the FIRST
    assert got.loc[5].n == 1 and got.loc[5].avg_value == 50.0
    assert 99.0 not in set(got.avg_value)  # user 2 excluded entirely


# ------------------------------------------------------------------ packing


def test_q121_chunks_tile_every_document(reg, spark, docs):
    got = _pdf(reg, spark, SF_SMALL, "q121_chunk_overlap")
    by_doc = got.groupby("doc_id")
    for doc_id, g in by_doc:
        n = int(docs.loc[doc_id].n_chars)
        assert len(g) == (n - 1) // 150 + 1
        g = g.sort_values("chunk_start")
        assert list(g.chunk_start) == list(range(1, n + 1, 150))
        assert list(g.chunk_id) == list(range(len(g)))
        # every chunk is full-size except where the text runs out
        last = g.iloc[-1]
        assert last.chunk_start + last.chunk_len - 1 == n
        assert all(
            ln == min(200, n - st + 1)
            for st, ln in zip(g.chunk_start, g.chunk_len)
        )
    # chunk hashes are the real substrings
    sample = got[got.doc_id == got.doc_id.iloc[0]].sort_values("chunk_start")
    text = docs.loc[sample.doc_id.iloc[0]].text
    for r in sample.itertuples():
        sub = text[r.chunk_start - 1 : r.chunk_start - 1 + 200]
        assert hashlib.md5(sub.encode()).hexdigest() == r.chunk_md5


def test_q122_matches_python_recomputation(reg, spark, docs):
    got = _pdf(reg, spark, SF_SMALL, "q122_pack_contexts").set_index(
        "doc_id"
    )
    cap = 4096
    by_source: dict[str, list] = {}
    for doc_id, row in docs.iterrows():
        key = hashlib.md5(str(doc_id).encode()).hexdigest()
        by_source.setdefault(row.source, []).append(
            (key, doc_id, int(row.n_chars))
        )
    n_span = 0
    for source, items in by_source.items():
        cum = 0
        for key, doc_id, n in sorted(items):
            r = got.loc[doc_id]
            assert r.source == source
            assert r.pack_window == cum // cap
            assert r.window_offset == cum % cap
            spans = 1 if (cum + n - 1) // cap > cum // cap else 0
            assert r.spans_boundary == spans
            n_span += spans
            cum += n
    assert n_span > 0  # the fixture corpus actually exercises spanning


def test_q123_matches_python_recomputation(reg, spark, docs):
    got = _pdf(reg, spark, SF_SMALL, "q123_lexical_diversity").set_index(
        "doc_id"
    )
    assert len(got) == len(docs)
    for doc_id, row in docs.iterrows():
        c = Counter(row.text.split(" "))
        n_tok = sum(c.values())
        n_dis = len(c)
        n_hap = sum(1 for v in c.values() if v == 1)
        r = got.loc[doc_id]
        assert (r.n_tokens, r.n_distinct, r.n_hapax) == (n_tok, n_dis, n_hap)
        assert r.ttr_e4 == ((n_dis * 20000 + n_tok) // (2 * n_tok)) / 10000.0
        assert (
            r.hapax_e4 == ((n_hap * 20000 + n_tok) // (2 * n_tok)) / 10000.0
        )


def test_q124_matches_python_recomputation(reg, spark, docs):
    got = _pdf(reg, spark, SF_SMALL, "q124_df_score").set_index("doc_id")
    df: Counter = Counter()
    vocab = {}
    for doc_id, row in docs.iterrows():
        vocab[doc_id] = set(row.text.split(" "))
        df.update(vocab[doc_id])
    for doc_id, toks in vocab.items():
        r = got.loc[doc_id]
        s = sum(df[t] for t in toks)
        assert r.n_distinct == len(toks) and r.sum_df == s
        assert (
            r.mean_df == ((s * 20000 + len(toks)) // (2 * len(toks))) / 10000.0
        )


# --------------------------------------------------------------- engagement


def test_q125_crafted_cohorts(reg, spark, tmp_path):
    """Three users across two cohorts: A (week 1; back in week 3),
    B (week 2 only), C (week 1; back in weeks 2 and 3)."""
    w1 = dt.datetime(2024, 1, 1, 9)   # Mondays: Jan 1, 8, 15
    w2 = dt.datetime(2024, 1, 8, 9)
    w3 = dt.datetime(2024, 1, 15, 9)
    rows = [
        (1, w1, 10, "click", 1.0, "{}"),
        (2, w3, 10, "click", 1.0, "{}"),
        (3, w2, 20, "view", 1.0, "{}"),
        (4, w1, 30, "click", 1.0, "{}"),
        (5, w2 + dt.timedelta(days=2), 30, "view", 1.0, "{}"),
        (6, w3, 30, "purchase", 1.0, "{}"),
    ]
    sf = _events_dir(spark, tmp_path, "cohorts", rows)
    got = (
        reg["q125_retention_cohorts"]
        .fn(spark, sf)
        .toPandas()
        .set_index(["cohort_week", "week_offset"])
    )
    c1, c2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)
    assert got.loc[(c1, 0)].n_users == 2  # A and C
    assert got.loc[(c1, 1)].n_users == 1  # C only
    assert got.loc[(c1, 2)].n_users == 2  # A and C return
    assert got.loc[(c2, 0)].n_users == 1  # B's own cohort
    assert (c2, 1) not in got.index  # B never returns
    assert got.loc[(c1, 1)].retention_e4 == 0.5
    # offset 0 is the cohort itself: retention exactly 1 everywhere
    zero = got.reset_index().query("week_offset == 0")
    assert (zero.retention_e4 == 1.0).all()


def test_q126_window_membership_and_bounds(reg, spark, tmp_path):
    """User 1 active on day 1 only: it must appear in the WAU of days
    1-7 and vanish on day 8; DAU tracks exact-day activity."""
    d0 = dt.datetime(2024, 3, 1, 12)
    rows = [(1, d0, 1, "click", 1.0, "{}")] + [
        (10 + i, d0 + dt.timedelta(days=i), 2, "view", 1.0, "{}")
        for i in range(10)
    ]
    sf = _events_dir(spark, tmp_path, "rolling", rows)
    got = (
        reg["q126_rolling_active_users"]
        .fn(spark, sf)
        .toPandas()
        .set_index("day")
    )
    base = dt.datetime(2024, 3, 1)  # days report as midnight timestamps
    for i in range(10):
        day = base + dt.timedelta(days=i)
        expect_wau = 2 if i < 7 else 1  # user 1 falls out after 7 days
        assert got.loc[day].wau == expect_wau, day
        assert got.loc[day].dau == (2 if i == 0 else 1)
    assert (got.dau <= got.wau).all()
    assert (got.stickiness_e4 <= 1.0).all()


def test_q127_shares_and_conservation(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q127_brand_revenue_share")
    n_li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").count()
    assert got.n_items.sum() == n_li  # every lineitem has its part
    assert abs(got.share_e4.sum() - 1.0) <= len(got) * 5e-5 + 1e-12


def test_q128_matches_q99_centroids(reg, spark):
    """The distance matrix must be exactly the pairwise sums of squared
    differences of q99's (rescaled) centroid components, with all
    C(labels, 2) ordered pairs present."""
    cent = _pdf(reg, spark, SF_SMALL, "q99_label_centroids")
    cent["ci"] = (cent.centroid_e4 * 10000).round().astype("int64")
    by_label = {
        lbl: g.set_index("dim").ci for lbl, g in cent.groupby("label")
    }
    got = _pdf(reg, spark, SF_SMALL, "q128_centroid_separation")
    labels = sorted(by_label)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    g = got.set_index(["label_a", "label_b"])
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            d = by_label[a] - by_label[b]
            assert g.loc[(a, b)].l2sq_e16 == int((d * d).sum()), (a, b)


# ------------------------------------------------------------- edit distance


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_q129_distances_match_pure_python(reg, spark, docs):
    """Every emitted pair: recompute Levenshtein in pure Python, check
    the distance, the integer-decided similarity, the <=20% filter, the
    pair ordering, and that both ends are exact-dup representatives."""
    got = _pdf(reg, spark, SF_SMALL, "q129_edit_distance_pairs")
    assert len(got) > 0
    rep_ids = set(
        docs.reset_index().groupby("text").doc_id.min()
    )
    for r in got.itertuples():
        assert r.doc_a < r.doc_b
        assert r.doc_a in rep_ids and r.doc_b in rep_ids
        ta, tb = docs.loc[r.doc_a].text, docs.loc[r.doc_b].text
        d = _lev(ta, tb)
        ml = max(len(ta), len(tb))
        assert (r.dist, r.max_len) == (d, ml)
        assert 5 * d <= ml
        assert r.sim_e4 == ((ml - d) * 20000 + ml) // (2 * ml) / 10000.0
    # near-dup (not exact-dup) pairs exist in the fixture: some dist > 0
    assert (got.dist > 0).any()


def test_edit_gate_is_admissible(spark):
    """The q129 char-histogram gate is a provable lower bound: for a
    seeded zoo of string pairs (boundary near-dups at dist ==
    floor(max_len/5), anagram-ish same-length pairs, disjoint-alphabet
    pairs), (1) the Spark probe histogram equals the Python mirror,
    (2) L1/2 <= true Levenshtein always, and (3) the gate's drop
    condition never fires on a pair the keep-filter would keep."""
    import random

    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.dedup import (
        _EDIT_GATE_PROBES,
        _EDIT_MAX_FRAC_DEN as DEN,
        _edit_gate_l1,
        _edit_probe_counts,
    )

    rng = random.Random(42)
    alpha = "etaoins bcdfghjklmpqruvwxyz"
    pairs = []
    for _ in range(60):
        n = rng.randint(5, 120)
        a = "".join(rng.choice(alpha) for _ in range(n))
        # a boundary near-dup: exactly floor(n/DEN) substitutions
        b = list(a)
        for i in rng.sample(range(n), n // DEN):
            b[i] = rng.choice(alpha)
        pairs.append((a, "".join(b)))
        # an unrelated same-length string (gate should often fire)
        pairs.append((a, "".join(rng.choice("zqxj") for _ in range(n))))
    pairs.append(("abc", "abc"))
    pairs.append(("", "xyz"))

    def hist(t):
        counts = [t.count(c) for c in _EDIT_GATE_PROBES]
        return counts + [len(t) - sum(counts)]

    df = spark.createDataFrame(pairs, "ta string, tb string").select(
        "ta",
        "tb",
        _edit_probe_counts("ta").alias("ha"),
        _edit_probe_counts("tb").alias("hb"),
    )
    rows = df.withColumn("l1", _edit_gate_l1("ha", "hb")).collect()
    assert len(rows) == len(pairs)
    for r in rows:
        assert list(r["ha"]) == hist(r["ta"])
        assert list(r["hb"]) == hist(r["tb"])
        d = _lev(r["ta"], r["tb"])
        ml = max(len(r["ta"]), len(r["tb"]))
        assert r["l1"] <= 2 * d, (r["ta"], r["tb"])  # admissible bound
        if DEN * d <= ml:  # keep-filter keeps -> gate must not drop
            assert DEN * r["l1"] <= 2 * ml, (r["ta"], r["tb"])


# ------------------------------------------------------- classification eval


def test_q130_matches_python_argmin(reg, spark):
    """Recompute the full nearest-centroid assignment in numpy over the
    quantized fixture vectors and compare the confusion matrix cell by
    cell (including the (dist, label) tie order)."""
    import numpy as np

    emb = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
    )
    q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype("float64") * 10_000
    ).astype("int64")
    labels = emb.label.astype("int64").to_numpy()
    uniq = np.unique(labels)
    cents = {}
    for lbl in uniq:
        s = q[labels == lbl].sum(axis=0)
        n = int((labels == lbl).sum())
        cents[lbl] = np.where(
            s < 0, -((-s * 20000 + n) // (2 * n)), (s * 20000 + n) // (2 * n)
        )
    expect: dict = {}
    for i in range(len(emb)):
        best = min(
            (
                (int(((q[i] * 10000 - cents[lbl]) ** 2).sum()), int(lbl))
                for lbl in uniq
            )
        )
        key = (int(labels[i]), best[1])
        expect[key] = expect.get(key, 0) + 1
    got = _pdf(reg, spark, SF_SMALL, "q130_nearest_centroid_eval")
    assert {
        (r.label_true, r.label_pred): r.n for r in got.itertuples()
    } == expect
    assert got.n.sum() == len(emb)  # every vector assigned exactly once


def test_q131_semi_join_counts(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q131_late_ship_priority").set_index(
        "o_orderpriority"
    )
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").toPandas()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").toPandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    late = m[m.l_shipdate > m.o_orderdate + dt.timedelta(days=90)]
    expect = late.groupby("o_orderpriority").o_orderkey.nunique()
    assert got.n_orders.to_dict() == expect.to_dict()


def test_q132_gini_matches_python(reg, spark):
    """Recompute every nation's Gini from raw orders/customer tables
    with the classic mean-absolute-difference formula (O(n^2), fine at
    sf0.001) — a DIFFERENT formulation than the engine's rank formula,
    so agreement pins the math, not the plumbing."""
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet").toPandas()
    n = spark.read.parquet(f"{SF_SMALL}/nation.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    spend = o.groupby("o_custkey").cents.sum().reset_index()
    m = spend.merge(
        c, left_on="o_custkey", right_on="c_custkey"
    ).merge(n, left_on="c_nationkey", right_on="n_nationkey")
    got = _pdf(reg, spark, SF_SMALL, "q132_spend_gini").set_index("n_name")
    for name, g in m.groupby("n_name"):
        xs = sorted(g.cents)
        nn = len(xs)
        mad = sum(abs(a - b) for a in xs for b in xs)  # n^2 |xi - xj|
        num, den = mad, 2 * nn * sum(xs)
        e4 = (num * 20000 + den) // (2 * den) / 10000.0
        r = got.loc[name]
        assert r.n_customers == nn
        assert r.gini_e4 == e4, name
        assert 0 <= r.gini_e4 < 1


def test_q205_binned_gini_tracks_exact_within_tolerance(reg, spark):
    """The q132 docstring's promised 100 TB fallback, executable: the
    digit-binned Lorenz-trapezoid estimator must sit within 5 e4-ticks
    of the exact rank-formula Gini per nation (measured: ONE tick at
    sf0.01, exactly 0 at sf0.1 — see BASELINE.md "binned Gini"), and
    must never exceed the exact value (value-contiguous bins ignore
    within-bin inequality, so it under-estimates by construction)."""
    sf = "/root/testdata/sf0.01"
    exact = _pdf(reg, spark, sf, "q132_spend_gini").set_index("n_name")
    binned = _pdf(reg, spark, sf, "q205_spend_gini_binned").set_index(
        "n_name"
    )
    assert set(exact.index) == set(binned.index)
    for name in exact.index:
        e, b = exact.loc[name], binned.loc[name]
        assert b.n_customers == e.n_customers
        assert abs(b.gini_e4 - e.gini_e4) <= 0.0005, name
        assert b.gini_e4 <= e.gini_e4 + 1e-12, name


def test_q205_plan_single_fact_pass(reg, spark):
    """The digit-bin rewrite's point: bin ids are a pure function of
    the value (no per-group min/max pre-pass), so the FULL plan holds
    exactly one scan per table — orders, customer, nation — with no
    checkpoint truncating the lineage."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.plans import (
        physical_plan,
    )

    plan = physical_plan(
        reg["q205_spend_gini_binned"].fn(spark, SF_SMALL)
    )
    assert plan.count("Scan parquet") == 3
    for tbl in ("orders", "customer", "nation"):
        assert plan.count(f"{tbl}.parquet") == 1, tbl
    assert "Checkpoint" not in plan


def test_q205_binned_gini_planted_distributions(reg, spark, tmp_path):
    """Planted extremes through the full operator (not the registry
    fixture): a perfectly equal group must score exactly 0, and a
    one-customer-takes-all group must approach (n-1)/n."""
    import pandas as pd

    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.tpch_ext import (
        spend_gini_binned,
    )

    n = 200
    # nation 0 "EQ": all spend 500.00; nation 1 "ONE": one whale
    orders = pd.DataFrame(
        {
            "o_custkey": list(range(n)) + list(range(n, 2 * n)),
            "o_totalprice": [500.0] * n + [1e6] + [1.0] * (n - 1),
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": range(2 * n),
            "c_nationkey": [0] * n + [1] * n,
        }
    )
    nation = pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["EQ", "ONE"]}
    )
    d = tmp_path / "gini"
    for t, df in (
        ("orders", orders),
        ("customer", customer),
        ("nation", nation),
    ):
        spark.createDataFrame(df).write.parquet(str(d / f"{t}.parquet"))
    got = (
        spend_gini_binned(spark, str(d)).toPandas().set_index("n_name")
    )
    assert got.loc["EQ"].gini_e4 == 0.0
    # exact Gini for one-takes-(almost)-all is ~(n-1)/n = 0.995; the
    # binned estimator must land within a tick of it
    assert abs(got.loc["ONE"].gini_e4 - 0.9949) <= 0.0005


# ------------------------------------------------------------- robust stats


def test_q133_decile_invariants(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q133_value_deciles")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    for sym, g in got.groupby("event_type"):
        g = g.sort_values("decile")
        assert list(g.decile) == list(range(1, 11))
        n_sym = (ev.event_type == sym).sum()
        assert g.n.sum() == n_sym
        # ANSI NTILE: sizes differ by at most 1, larger buckets first
        assert g.n.max() - g.n.min() <= 1
        assert list(g.n) == sorted(g.n, reverse=True)
        # bucket ranges are ordered and non-overlapping (ties aside)
        assert (g.lo.values <= g.hi.values).all()
        assert (g.hi.values[:-1] <= g.lo.values[1:]).all()
        assert (g.lo <= g.avg_value).all() and (g.avg_value <= g.hi).all()


def test_q134_matches_python_trim(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q134_trimmed_mean").set_index(
        "event_type"
    )
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    ev["c"] = (ev.value * 100).round().astype("int64")
    for sym, g in ev.groupby("event_type"):
        xs = [c for c, _ in sorted(zip(g.c, g.event_id))]
        n = len(xs)
        kept = [x for i, x in enumerate(xs, 1) if 5 * n < 100 * i <= 95 * n]
        r = got.loc[sym]
        assert r.n_ticks == n
        s, k = sum(kept), len(kept)
        assert r.trimmed_avg == ((s * 20000 + 100 * k) // (200 * k)) / 10000.0
        # the trim really dropped both tails
        assert min(kept) > min(xs) and max(kept) < max(xs)


# ------------------------------------------------------------- nearest as-of


def test_q135_nearest_direction_and_ties(reg, spark, tmp_path):
    """Crafted tape: closer-next wins, exact tie goes to the past,
    one-sided users pick their only side, purchase-free users stay
    NULL."""
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: purchase 10s before and 3s after the click -> next
        (1, t0 - 10 * s, 1, "purchase", 1.0, "{}"),
        (2, t0, 1, "click", 1.0, "{}"),
        (3, t0 + 3 * s, 1, "purchase", 1.0, "{}"),
        # user 2: equidistant (5s both sides) -> tie to prev
        (4, t0 - 5 * s, 2, "purchase", 1.0, "{}"),
        (5, t0, 2, "click", 1.0, "{}"),
        (6, t0 + 5 * s, 2, "purchase", 1.0, "{}"),
        # user 3: only an earlier purchase -> prev
        (7, t0 - 60 * s, 3, "purchase", 1.0, "{}"),
        (8, t0, 3, "click", 1.0, "{}"),
        # user 4: only a later purchase -> next
        (9, t0, 4, "click", 1.0, "{}"),
        (10, t0 + 60 * s, 4, "purchase", 1.0, "{}"),
        # user 5: no purchases -> NULLs
        (11, t0, 5, "click", 1.0, "{}"),
        # user 6: purchase exactly AT the click -> prev at distance 0
        (12, t0, 6, "purchase", 1.0, "{}"),
        (13, t0, 6, "click", 1.0, "{}"),
    ]
    sf = _events_dir(spark, tmp_path, "nearest", rows)
    got = (
        reg["q135_asof_nearest"].fn(spark, sf).toPandas().set_index("user_id")
    )
    us0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got.loc[1].asof_side == "next" and got.loc[1].near_us == us0 + 3e6
    assert got.loc[2].asof_side == "prev" and got.loc[2].near_us == us0 - 5e6
    assert got.loc[3].asof_side == "prev" and got.loc[3].near_us == us0 - 60e6
    assert got.loc[4].asof_side == "next" and got.loc[4].near_us == us0 + 60e6
    import pandas as pd

    assert pd.isna(got.loc[5].asof_side) and pd.isna(got.loc[5].near_us)
    assert got.loc[6].asof_side == "prev" and got.loc[6].near_us == us0


# ----------------------------------------------------------------- Holt trend


def test_q136_holt_semantics_on_crafted_series(reg, spark, tmp_path):
    """Constant tape -> trend exactly 0 and level = the constant; a
    linear ramp -> the forecast converges toward the true next value
    and the trend toward the true slope."""
    t0 = dt.datetime(2024, 5, 1)
    h = dt.timedelta(hours=1)
    rows = []
    eid = 0
    for i in range(48):
        rows.append((eid, t0 + i * h, 1, "FLAT", 50.0, "{}")); eid += 1
        rows.append((eid, t0 + i * h, 1, "RAMP", 100.0 + 2 * i, "{}")); eid += 1
    sf = _events_dir(spark, tmp_path, "holt", rows)
    got = reg["q136_holt_trend"].fn(spark, sf).toPandas()
    flat = got[got.event_type == "FLAT"].sort_values("h")
    assert (flat.level == 50.0).all()
    assert (flat.trend == 0.0).all()
    assert (flat.forecast == 50.0).all()
    ramp = got[got.event_type == "RAMP"].sort_values("h")
    last = ramp.iloc[-1]
    assert abs(last.trend - 2.0) < 0.05       # converged to the slope
    assert abs(last.forecast - (100.0 + 2 * 48)) < 0.2  # next true value
    # exact recurrence replay in pure python
    l = t = None
    for i, x in enumerate(ramp.x):
        if i == 0:
            l, t = x, 0.0
        else:
            ln = 0.5 * x + 0.5 * (l + t)
            t = 0.25 * (ln - l) + 0.75 * t
            l = ln
    assert last.level == round(l, 4) and last.trend == round(t, 4)


def test_q138_bridges_events_to_customer_segments(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q138_segment_activity")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet").toPandas()
    # conservation: every event lands in exactly one (segment, type) cell
    assert got.n_events.sum() == len(ev)
    seg = c.set_index("c_custkey").c_mktsegment
    m = ev.assign(seg=ev.user_id.map(seg))
    expect = m.groupby(["seg", "event_type"]).size()
    for r in got.itertuples():
        assert r.n_events == expect[(r.c_mktsegment, r.event_type)]
        assert r.n_users <= r.n_events


def test_q139_promo_share_bounds_and_conservation(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q139_promo_share_monthly")
    n_li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").count()
    assert got.n_items.sum() == n_li
    assert ((got.promo_share_e4 >= 0) & (got.promo_share_e4 <= 1)).all()
    assert got.promo_share_e4.nunique() > 1  # a real trend, not constant


def test_q140_growth_matches_pandas(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q140_monthly_growth").sort_values(
        "month"
    )
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    o["month"] = o.o_orderdate.dt.to_period("M").dt.to_timestamp()
    m = o.groupby("month").cents.sum().sort_index()
    assert list(got.revenue) == [c / 100.0 for c in m]
    import pandas as pd

    assert pd.isna(got.growth_e4.iloc[0])
    for i in range(1, len(m)):
        su, pu = int(m.iloc[i]), int(m.iloc[i - 1])
        d = su - pu
        e4 = (
            -(((-d) * 20000 + pu) // (2 * pu)) if d < 0
            else ((d * 20000 + pu) // (2 * pu))
        ) / 10000.0
        assert got.growth_e4.iloc[i] == e4


def test_q141_poc_is_modal_bin_and_shares_conserve(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q141_market_profile")
    for sym, g in got.groupby("event_type"):
        poc = g[g.is_poc == 1]
        assert len(poc) == 1  # exactly one point of control
        top_n = g.n.max()
        # the POC is a modal bin, and the LOWEST such bin on ties
        assert poc.n.iloc[0] == top_n
        assert poc.bin.iloc[0] == g[g.n == top_n].bin.min()
        assert abs(g.share_e4.sum() - 1.0) <= len(g) * 5e-5 + 1e-12


def test_q142_fertility_matches_python(reg, spark, docs):
    got = _pdf(reg, spark, SF_SMALL, "q142_tokenizer_fertility")
    langs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "lang")
        .toPandas()
        .set_index("doc_id")
    )
    agg: dict = {}
    for doc_id, row in docs.iterrows():
        lang = langs.loc[doc_id].lang
        a = agg.setdefault(lang, [0, 0, 0])
        a[0] += 1
        a[1] += int(row.n_chars)
        a[2] += len(row.text.split(" "))
    for r in got.itertuples():
        nd, nc, nt = agg[r.lang]
        assert (r.n_docs, r.total_chars, r.total_tokens) == (nd, nc, nt)
        assert r.chars_per_token == ((nc * 20000 + nt) // (2 * nt)) / 10000.0


def test_q143_quartiles_match_numpy(reg, spark, docs):
    import numpy as np

    got = _pdf(reg, spark, SF_SMALL, "q143_length_percentiles").set_index(
        "source"
    )
    src = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source")
        .toPandas()
        .set_index("doc_id")
    )
    joined = docs.join(src, rsuffix="_s")
    for source, g in joined.groupby("source"):
        xs = np.sort(g.n_chars.to_numpy())
        r = got.loc[source]
        assert r.n_docs == len(xs)
        assert r.min_chars == xs[0] and r.max_chars == xs[-1]
        # numpy 'linear' is the same interpolation rule both engines use
        for p, col in ((25, "p25"), (50, "p50"), (75, "p75")):
            assert getattr(r, col) == round(
                float(np.percentile(xs, p, method="linear")), 4
            )


def test_q144_concentration_monotone_and_exact(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q144_flow_concentration")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    ev["c"] = (ev.value * 100).round().astype("int64")
    for sym, g in got.groupby("event_type"):
        g = g.sort_values("pct")
        # shares grow with the percentile and always exceed uniform share
        assert list(g.share_e4) == sorted(g.share_e4)
        xs = [c for c, _ in sorted(
            zip(ev[ev.event_type == sym].c, ev[ev.event_type == sym].event_id),
            key=lambda t: (-t[0], t[1]))]
        n, tot = len(xs), sum(xs)
        for r in g.itertuples():
            k = sum(1 for i in range(1, n + 1) if 100 * i <= r.pct * n)
            topc = sum(xs[:k])
            assert r.top_n == k
            assert r.share_e4 == ((topc * 20000 + tot) // (2 * tot)) / 10000.0
            assert r.share_e4 * 10000 >= r.pct * 100 - 1  # top-p% >= p%


def test_q145_quartiles_match_numpy(reg, spark):
    import numpy as np

    got = _pdf(reg, spark, SF_SMALL, "q145_interarrival_quartiles").set_index(
        "event_type"
    )
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    ev["us"] = ev.ts.astype("int64") // 1000  # ns -> us
    for sym, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        gaps = np.diff(g.us.to_numpy())
        r = got.loc[sym]
        assert r.n_gaps == len(gaps) and r.max_us == gaps.max()
        for p, col in ((25, "p25_us"), (50, "p50_us"), (75, "p75_us")):
            assert getattr(r, col) == round(
                float(np.percentile(gaps, p, method="linear")), 4
            )


def test_q146_weekday_alignment_and_conservation(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q146_weekday_seasonality")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    assert got.n_ticks.sum() == len(ev)
    assert set(got.weekday) <= set(range(7))
    # cross-check the Monday=0 convention against pandas (also Monday=0)
    expect = ev.groupby(
        [ev.event_type, ev.ts.dt.weekday]
    ).size()
    for r in got.itertuples():
        assert r.n_ticks == expect[(r.event_type, r.weekday)]


def test_q147_bands_partition_and_monotone(reg, spark):
    got = _pdf(reg, spark, SF_SMALL, "q147_customer_value_bands").sort_values(
        "band"
    )
    active = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert list(got.band) == [1, 2, 3, 4, 5]
    assert got.n_customers.sum() == active
    assert got.n_customers.max() - got.n_customers.min() <= 1
    # spend ranges ordered and non-overlapping; top band dominates revenue
    assert (got.max_spend.values[:-1] <= got.min_spend.values[1:]).all()
    assert list(got.revenue_share_e4) == sorted(got.revenue_share_e4)
    assert abs(got.revenue_share_e4.sum() - 1.0) <= 5e-4


def test_q121_empty_document_yields_zero_chunks(reg, spark, tmp_path):
    """Spark's sequence(1, 0, +step) raises on empty text where DuckDB's
    generate_series returns the empty set — the guard must make an empty
    document produce zero chunks, not crash the job."""
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(3)
    rows = src.collect()
    empty = spark.createDataFrame(
        [tuple("" if f == "text" else r[f] for f in src.columns)
         for r in rows[:1]],
        src.schema,
    )
    fixture = str(tmp_path / "docs_empty")
    src.unionByName(empty).write.parquet(f"{fixture}/documents.parquet")
    got = reg["q121_chunk_overlap"].fn(spark, fixture).toPandas()
    empty_id = rows[0]["doc_id"]
    # the non-empty copies of doc 0 chunk normally; the empty clone
    # contributes nothing
    n_for_doc0 = (rows[0]["n_chars"] - 1) // 150 + 1
    assert len(got[got.doc_id == empty_id]) == n_for_doc0
    assert len(got) == sum((r["n_chars"] - 1) // 150 + 1 for r in rows)
