"""Invariant tests for the q95-q100 depth block (SURVEY.md §5.2 style):
semantics a single oracle example can't pin — banding recall, funnel
ordering on adversarial journeys, exact centroid mirrors, conservation
laws across the profile/dup reports.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.events_ext import (
    funnel_counts,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.corpus_ext import (
    simhash_pairs,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_q95_pairs_match_recomputed_hamming_and_order(reg, spark):
    """Every emitted pair is ordered (doc_a < doc_b) and its hamming
    equals bit_count(xor) of the q57 signatures, recomputed
    independently."""
    sims = {
        r.doc_id: r.simhash
        for r in reg["q57_simhash"].fn(spark, SF_SMALL).collect()
    }
    pairs = reg["q95_simhash_pairs"].fn(spark, SF_SMALL).collect()
    assert pairs, "fixture corpus should contain near-dup signatures"
    for r in pairs:
        assert r.doc_a < r.doc_b
        expect = bin(sims[r.doc_a] ^ sims[r.doc_b]).count("1")
        assert r.hamming == expect
        assert r.hamming <= 3


def test_q95_banding_guarantees_hamming_le_1_recall(reg, spark):
    """Splitting 16 bits into two 8-bit bands catches EVERY pair at
    Hamming distance <= 1 (a single flipped bit leaves the other band
    intact) — the LSH recall floor, checked against the full cross
    product of signatures."""
    sims = [
        (r.doc_id, r.simhash)
        for r in reg["q57_simhash"].fn(spark, SF_SMALL).collect()
    ]
    got = {
        (r.doc_a, r.doc_b)
        for r in reg["q95_simhash_pairs"].fn(spark, SF_SMALL).collect()
    }
    for i in range(len(sims)):
        for j in range(i + 1, len(sims)):
            (a, sa), (b, sb) = sims[i], sims[j]
            if bin(sa ^ sb).count("1") <= 1:
                key = (a, b) if a < b else (b, a)
                assert key in got, key


def test_q95_strict_cap_raises_on_hot_bucket(spark, ddb):
    """A bucket that reaches the cap must raise (the oracle is uncapped
    — silent truncation would be quietly wrong), while the shipped cap
    leaves the fixture corpus untouched."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(6)],
        "doc_id long, text string",
    )
    # 6 identical texts share every band bucket: cap of 4 must trip
    with pytest.raises(RuntimeError, match="per-bucket cap"):
        simhash_pairs(docs, max_band=4).count()
    # uncapped on the same corpus: all C(6,2) identical-signature pairs
    assert simhash_pairs(docs).count() == 15


def test_q96_profile_conservation_and_bounds(reg, spark, sf_dir, ddb):
    rows = reg["q96_intraday_profile"].fn(spark, sf_dir).collect()
    total = ddb.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n_ticks for r in rows) == total
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        assert r.min_value <= r.avg_value <= r.max_value
        assert 1 <= r.n_users <= r.n_ticks


def test_q97_coarser_sampling_never_adds_returns(reg, spark, sf_dir):
    """Per symbol, n_returns is non-increasing in the sampling width:
    every nonempty 15-min bucket contains a nonempty 1-min bucket."""
    rows = reg["q97_vol_signature"].fn(spark, sf_dir).collect()
    by_symbol: dict[str, dict[int, int]] = {}
    for r in rows:
        by_symbol.setdefault(r.event_type, {})[r.width_s] = r.n_returns
    assert by_symbol
    for sym, widths in by_symbol.items():
        assert widths[60] >= widths[300] >= widths[900], sym


def _funnel_frame(spark, journeys):
    """journeys: list of (user_id, [(event_type, us), ...])."""
    rows = [
        (uid, et, us)
        for uid, evs in journeys
        for et, us in evs
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, us long")
    return df.select(
        "user_id", "event_type", F.timestamp_micros("us").alias("ts")
    )


def test_q98_funnel_ordering_semantics(spark):
    """Hand-built journeys: strict ordering is what converts — a user
    who purchases BEFORE viewing, or clicks at the exact view instant,
    must not advance past the stage the order supports."""
    out = funnel_counts(
        _funnel_frame(
            spark,
            [
                # full ordered conversion
                (1, [("view", 10), ("click", 20), ("purchase", 30)]),
                # purchase before view: stalls at stage 2
                (2, [("purchase", 5), ("view", 10), ("click", 20)]),
                # click at the same micro as view: strict > fails stage 2
                (3, [("view", 10), ("click", 10)]),
                # never viewed: stage 0
                (4, [("click", 10), ("purchase", 20)]),
                # second view/click chain converts via the EARLIEST view
                (5, [("view", 10), ("view", 100), ("click", 50), ("purchase", 60)]),
            ],
        )
    ).collect()[0]
    assert (out.n_users, out.n_stage1, out.n_stage2, out.n_stage3) == (
        5,
        4,  # users 1, 2, 3, 5 viewed
        3,  # users 1, 2, 5 clicked after a view
        2,  # users 1 and 5 purchased after that click
    )


def test_q98_funnel_counts_monotone(reg, spark, sf_dir):
    out = reg["q98_user_funnel"].fn(spark, sf_dir).collect()[0]
    assert out.n_users >= out.n_stage1 >= out.n_stage2 >= out.n_stage3


def test_q99_centroids_match_python_int_mirror(reg, spark, ddb, sf_dir):
    """centroid_e4 equals the pure-Python integer mirror (floor quant,
    half-away-from-zero signed ratio) — no float aggregation anywhere."""
    vecs = ddb.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    acc: dict[tuple[int, int], list[int]] = {}
    for label, emb in vecs:
        for pos, v in enumerate(emb):
            key = (label, pos + 1)
            cell = acc.setdefault(key, [0, 0])
            cell[0] += math.floor(float(v) * 10_000)
            cell[1] += 1
    rows = reg["q99_label_centroids"].fn(spark, sf_dir).collect()
    assert len(rows) == len(acc)
    for r in rows:
        sum_q, n = acc[(r.label, r.dim)]
        assert r.sum_q == sum_q and r.n == n
        if sum_q < 0:
            e4 = -((-sum_q * 20000 + n) // (2 * n))
        else:
            e4 = (sum_q * 20000 + n) // (2 * n)
        assert r.centroid_e4 == e4 / 10000.0, (r.label, r.dim)


def test_q100_dup_report_conservation(reg, spark, ddb, sf_dir):
    rows = reg["q100_dup_rate_by_source"].fn(spark, sf_dir).collect()
    total = ddb.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        # cross-source dup implies corpus dup
        assert 0 <= r.n_cross_docs <= r.n_dup_docs <= r.n_docs
        assert 0.0 <= r.dup_share <= 1.0
