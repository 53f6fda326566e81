"""Semantic invariants + plan contracts for the q101-q108 quality block
(the driver's oracle diff pins engine-vs-DuckDB equality; these pin the
semantics on identities a single example can't, plus the plan shapes).
"""

from __future__ import annotations

import numpy as np
import pytest

from low_latency_time_series_database_tsdb_for_market_data_spark.plans import (
    exchanges,
    physical_plan,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _pdf(reg, spark, sf_dir, name):
    return reg[name].fn(spark, sf_dir).toPandas()


def test_q102_q105_tick_conservation(reg, spark, sf_dir, ddb):
    """Per symbol: drawdown ticks + at-peak ticks == total ticks, and
    price runs + stale ticks == total ticks (each tick either starts a
    run or extends one)."""
    totals = dict(
        ddb.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    dd = _pdf(reg, spark, sf_dir, "q102_drawdown_spells")
    for r in dd.itertuples():
        assert 0 < r.n_spells <= r.dd_ticks
        assert r.max_spell <= r.dd_ticks < totals[r.event_type]
    st = _pdf(reg, spark, sf_dir, "q105_staleness_runs")
    assert set(st.event_type) == set(totals)
    for r in st.itertuples():
        assert r.n_runs + r.stale_ticks == totals[r.event_type]
        assert r.max_run >= 1


def test_q103_roll_matches_numpy_per_symbol(reg, spark, sf_dir, ddb):
    """ncov_scaled recomputed independently in exact int64 numpy from
    the raw tape, per symbol; regime labels the sign."""
    got = _pdf(reg, spark, sf_dir, "q103_roll_spread").set_index(
        "event_type"
    )
    raw = ddb.execute(
        "SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c "
        "FROM events ORDER BY event_type, ts, event_id"
    ).df()
    for sym, grp in raw.groupby("event_type"):
        d = np.diff(grp.c.to_numpy(dtype=np.int64))
        a, b = d[1:].astype(object), d[:-1].astype(object)  # exact py ints
        n = len(a)
        ncov = n * int((a * b).sum()) - int(a.sum()) * int(b.sum())
        row = got.loc[sym]
        assert row.n_pairs == n
        assert row.ncov_scaled == ncov
        assert row.regime == ("bounce" if ncov < 0 else "trend")


def test_q104_shares_partition_unity(reg, spark, sf_dir):
    """Per symbol the digit shares are ratio_e4 values summing to 1
    within 9 rounding half-ups, digits drawn from 1-9 (cents >= 1 means
    no leading zero), and counts are positive."""
    got = _pdf(reg, spark, sf_dir, "q104_benford_digits")
    assert set(got.digit) <= set("123456789")
    assert (got.n > 0).all()
    for _, g in got.groupby("event_type"):
        assert abs(g.share.sum() - 1.0) <= 9 * 1e-4 + 1e-9


def test_q106_burst_counts_and_bounds(reg, spark, sf_dir, ddb):
    """Burst minutes recomputed from the raw minute grid with the same
    integer cross-multiplication; peak >= mean always."""
    got = _pdf(reg, spark, sf_dir, "q106_minute_rate_anomaly").set_index(
        "event_type"
    )
    m = ddb.execute(
        "SELECT event_type, date_trunc('minute', ts) AS minute, "
        "COUNT(*) AS cnt FROM events GROUP BY 1, 2"
    ).df()
    for sym, g in m.groupby("event_type"):
        nm, tot = len(g), int(g.cnt.sum())
        bursts = int((g.cnt.to_numpy() * nm > 2 * tot).sum())
        row = got.loc[sym]
        assert row.n_minutes == nm and row.n_ticks == tot
        assert row.n_burst_minutes == bursts
        assert row.peak_rate >= row.mean_rate - 1e-9


def test_q107_coverage_against_brute_force(reg, spark, sf_dir, ddb):
    """Top-100 mass recomputed with pandas using the same (count desc,
    token asc) tie order; coverage in (0, 1]."""
    got = _pdf(reg, spark, sf_dir, "q107_zipf_coverage").set_index("lang")
    t = ddb.execute(
        "SELECT lang, unnest(string_split(text, ' ')) AS token "
        "FROM documents"
    ).df()
    t = t[t.token != ""]
    for lang, g in t.groupby("lang"):
        cnt = (
            g.groupby("token").size().reset_index(name="c")
            .sort_values(["c", "token"], ascending=[False, True])
        )
        row = got.loc[lang]
        assert row.total_tokens == int(cnt.c.sum())
        assert row.distinct_tokens == len(cnt)
        assert row.top100_tokens == int(cnt.c.head(100).sum())
        assert 0 < row.coverage <= 1


def test_q108_above_mean_matches_numpy(reg, spark, sf_dir, ddb):
    """Scaled-norm banding recomputed in numpy: same float64 fold over
    the embedding, same single ROUND to e6 ints, same integer
    cross-multiplied above-mean test."""
    got = _pdf(reg, spark, sf_dir, "q108_norm_band").set_index("label")
    raw = ddb.execute(
        "SELECT label, embedding FROM embeddings"
    ).df()
    for label, g in raw.groupby("label"):
        r6 = np.array(
            [
                int(
                    np.round(
                        sum(
                            float(np.float64(x) * np.float64(x))
                            for x in map(np.float64, v)
                        )
                        * 1_000_000
                    )
                )
                for v in g.embedding
            ],
            dtype=object,
        )
        n, sr = len(r6), int(sum(r6))
        row = got.loc[label]
        assert row.n_vecs == n
        assert row.n_above_mean == int(sum(int(x) * n > sr for x in r6))
        assert 0 <= row.n_above_mean <= n


def test_q109_gap_consistency(reg, spark, sf_dir, ddb):
    """gap_cents == open - prev close re-derived from q22-style day
    endpoints; gap_ret sign matches gap_cents; first day per symbol is
    absent (no previous close)."""
    got = _pdf(reg, spark, sf_dir, "q109_overnight_gap")
    days = ddb.execute(
        "SELECT event_type, COUNT(DISTINCT CAST(ts AS DATE)) FROM events "
        "GROUP BY 1"
    ).fetchall()
    expect_rows = sum(n - 1 for _, n in days)
    assert len(got) == expect_rows
    g = got.sort_values(["event_type", "d"]).reset_index(drop=True)
    prev = g.close_c.shift()
    same = g.event_type == g.event_type.shift()
    assert (g.gap_cents[same] == (g.open_c - prev)[same]).all()
    assert ((g.gap_ret >= 0) == (g.gap_cents >= 0)).all()


def test_q110_band_matches_numpy(reg, spark, sf_dir, ddb):
    """Dispersion flags recomputed with exact python ints on one
    symbol-day; share is the integer-decided ratio."""
    got = _pdf(reg, spark, sf_dir, "q110_dispersion_screen")
    raw = ddb.execute(
        "SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS d, "
        "CAST(ROUND(value*100) AS BIGINT) AS c FROM events"
    ).df()
    merged = 0
    for (sym, d), g in raw.groupby(["event_type", "d"]):
        cs = [int(x) for x in g.c]
        n, sc = len(cs), sum(cs)
        nd = sum(100 * abs(c * n - sc) > sc for c in cs)
        row = got[(got.event_type == sym) & (got.d == d)]
        assert len(row) == 1
        assert int(row.n_ticks.iloc[0]) == n
        assert int(row.n_disperse.iloc[0]) == nd
        merged += 1
        if merged >= 12:  # a dozen symbol-days is plenty for the identity
            break
    assert merged > 0


def test_q111_equals_causal_replay(reg, spark, sf_dir, ddb):
    """q111 recomputed by an explicit in-order pandas replay of the
    integer rule (the same replay the streaming burst test uses) — the
    batch query and the live monitor share one decision procedure."""
    got = {
        (r.event_type, r.minute, int(r.n_ticks), int(r.prior_minutes),
         int(r.prior_ticks))
        for r in _pdf(reg, spark, sf_dir, "q111_causal_bursts").itertuples()
    }
    m = ddb.execute(
        "SELECT event_type, date_trunc('minute', ts) AS minute, "
        "COUNT(*) AS cnt FROM events GROUP BY 1, 2"
    ).df()
    expect = set()
    for sym, g in m.groupby("event_type"):
        nm = tot = 0
        for r in g.sort_values("minute").itertuples():
            if nm >= 5 and int(r.cnt) * nm > 2 * tot:
                expect.add((sym, r.minute, int(r.cnt), nm, tot))
            nm += 1
            tot += int(r.cnt)
    assert got == expect


def test_q112_beta_numpy_mirror_and_market_identity(reg, spark, sf_dir, ddb):
    """Beta pieces recomputed with exact python ints from independently
    re-derived hourly closes; and when every symbol covers every hour,
    the betas' numerators must sum to the shared denominator (regressing
    the sum of parts on itself: sum_s cov(dx_s, dm) == var(dm))."""
    got = _pdf(reg, spark, sf_dir, "q112_market_beta").set_index("event_type")
    closes = ddb.execute(
        """
        WITH r AS (SELECT event_type, date_trunc('hour', ts) AS h, value,
                          row_number() OVER (
                              PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
                   FROM events)
        SELECT event_type, h, CAST(ROUND(value*100) AS BIGINT) AS c
        FROM r WHERE rn = 1 ORDER BY event_type, h
        """
    ).df()
    dm: dict = {}
    dxs: dict = {}
    for sym, g in closes.groupby("event_type"):
        cs = [int(x) for x in g.c]
        hs = list(g.h)
        for h, prev, cur in zip(hs[1:], cs[:-1], cs[1:]):
            d = cur - prev
            dxs.setdefault(sym, []).append((h, d))
            dm[h] = dm.get(h, 0) + d
    same_hours = len({len(v) for v in dxs.values()}) == 1 and all(
        len(v) == len(dm) for v in dxs.values()
    )
    ncovs = {}
    for sym, pairs in dxs.items():
        xs = [d for _, d in pairs]
        ys = [dm[h] for h, _ in pairs]
        n = len(xs)
        ncov = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        nvar = n * sum(y * y for y in ys) - sum(ys) ** 2
        ncovs[sym] = (ncov, nvar)
        if nvar <= 0:
            assert sym not in got.index
            continue
        row = got.loc[sym]
        assert row.n_hours == n
        assert row.ncov_scaled == ncov and row.nvar_scaled == nvar
        assert (row.beta >= 0) == (ncov >= 0)
    if same_hours:
        nvars = {v[1] for v in ncovs.values()}
        assert len(nvars) == 1  # shared hour set -> shared denominator
        assert sum(v[0] for v in ncovs.values()) == nvars.pop()


def _events_dir(spark, tmp_path, name, rows):
    """Tiny events.parquet shaped like the testdata (the operators read
    `{sf_dir}/events.parquet`)."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tmp_path / name
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_islands_edge_paths(reg, spark, tmp_path):
    """Adversarial price paths the fixtures never produce: a monotone
    rise (never in drawdown, every tick a fresh run), a constant tape
    (one run, never dispersed, zero drawdown), and a monotone fall (one
    spell spanning all but the first tick)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(10):
        ts = t0 + dt.timedelta(seconds=i)
        rows.append((eid, ts, 1, "UP", 100.0 + i, "{}")); eid += 1
        rows.append((eid, ts, 1, "FLAT", 50.0, "{}")); eid += 1
        rows.append((eid, ts, 1, "DOWN", 100.0 - i, "{}")); eid += 1
    sf = _events_dir(spark, tmp_path, "edge", rows)

    dd = _pdf(reg, spark, sf, "q102_drawdown_spells").set_index("event_type")
    assert "UP" not in dd.index and "FLAT" not in dd.index
    assert dd.loc["DOWN"].n_spells == 1
    assert dd.loc["DOWN"].max_spell == 9 == dd.loc["DOWN"].dd_ticks

    st = _pdf(reg, spark, sf, "q105_staleness_runs").set_index("event_type")
    assert st.loc["UP"].n_runs == 10 and st.loc["UP"].stale_ticks == 0
    assert st.loc["UP"].max_run == 1
    assert st.loc["FLAT"].n_runs == 1 and st.loc["FLAT"].max_run == 10
    assert st.loc["FLAT"].stale_ticks == 9

    disp = _pdf(reg, spark, sf, "q110_dispersion_screen").set_index(
        "event_type"
    )
    assert disp.loc["FLAT"].n_disperse == 0  # every tick IS the mean
    # UP's 1%-of-mean band (~1.05 cents around 104.5) excludes the
    # extremes: 100.00 and 109.00 are >1% away
    assert disp.loc["UP"].n_disperse >= 2


def test_q109_single_tick_days(reg, spark, tmp_path):
    """One tick per day: open == close each day, so the gap is exactly
    the day-over-day price change and gap_ret its signed 4-decimal
    ratio."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12)
    prices = [100.0, 110.0, 99.0]
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "A", p, "{}")
        for i, p in enumerate(prices)
    ]
    sf = _events_dir(spark, tmp_path, "days", rows)
    got = _pdf(reg, spark, sf, "q109_overnight_gap").sort_values("d")
    assert list(got.gap_cents) == [1000, -1100]
    assert list(got.gap_ret) == [0.1, -0.1]


def test_quality_block_shuffle_budgets(reg, spark, sf_dir):
    """The islands/lag queries (q102/q103/q105/q108) chain every window
    and agg on ONE partition-key exchange; the agg+window-over-aggregate
    queries (q104/q106/q107) get two; q101's three all move bucket-scale
    rows and the pair join must broadcast, never cartesian."""
    for name, budget in (
        ("q102_drawdown_spells", 1),
        ("q103_roll_spread", 1),
        ("q105_staleness_runs", 1),
        ("q108_norm_band", 1),
        ("q110_dispersion_screen", 1),
        ("q104_benford_digits", 2),
        ("q106_minute_rate_anomaly", 2),
        ("q107_zipf_coverage", 2),
        ("q109_overnight_gap", 2),
        ("q111_causal_bursts", 2),
    ):
        df = reg[name].fn(spark, sf_dir)
        assert exchanges(df) <= budget, name
    # q112: the dx grid is checkpoint-materialized once; the visible
    # plan is the hour agg + broadcast grid join + final symbol agg
    df = reg["q112_market_beta"].fn(spark, sf_dir)
    assert exchanges(df) <= 2
    assert "BroadcastExchange" in physical_plan(df)
    # q101: the bucket table is checkpoint-materialized once (one tape
    # scan); the visible plan is the broadcast pair join + final agg
    df = reg["q101_lead_lag"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert exchanges(df) <= 1
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
