"""Semantic edge-case tests for the q86-q92 depth operators (the oracle
diff pins engine-vs-DuckDB equality; these pin the SEMANTICS on corpora
built to hit the edges the testdata may not)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.operators import (
    tsdb_ext,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.curation_ext import (
    split_assign,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)


def _events(spark, rows, tmp_path, name):
    """Write a tiny events.parquet shaped like the testdata and return
    its directory (the operators read `{sf_dir}/events.parquet`)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = tmp_path / name
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_tick_direction_and_variance_consistency(spark, sf_dir):
    """upticks+downticks+flats == n_returns cell-for-cell, and rv == 0
    exactly where every move is flat."""
    reg = load_all()
    d = reg["q88_tick_direction"].fn(spark, sf_dir).toPandas()
    v = reg["q86_realized_variance"].fn(spark, sf_dir).toPandas()
    m = d.merge(v, on=["event_type", "d"], how="outer")
    assert not m.isna().any().any()
    assert (
        m.upticks + m.downticks + m.flats == m.n_returns
    ).all(), "direction counts must partition the return count"
    flat_only = m[(m.upticks == 0) & (m.downticks == 0)]
    assert (flat_only.rv == 0).all()


def test_gap_report_synthetic_threshold(spark, tmp_path):
    """Gaps strictly over 300 s count; the 300 s boundary itself does not."""
    rows = [
        # sym A: gaps of exactly 300 s (excluded) and 301 s (counted)
        (1, _ts(0), 1, "A", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 5, 0), 1, "A", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 10, 1), 1, "A", 1.0, "{}"),
        # sym B: single tick -> no gaps, NULL max
        (4, _ts(0), 1, "B", 1.0, "{}"),
    ]
    sf = _events(spark, rows, tmp_path, "gaps")
    out = {
        r["event_type"]: r
        for r in tsdb_ext.q87_gap_report(spark, sf).collect()
    }
    assert out["A"]["n_gaps"] == 1
    assert out["A"]["gap_time_us"] == 301 * 1_000_000
    assert out["A"]["max_gap_us"] == 301 * 1_000_000
    assert out["B"]["n_gaps"] == 0 and out["B"]["max_gap_us"] is None


def test_resample_linear_bracketing(spark, tmp_path):
    """Grid points interpolate linearly between bracketing ticks, carry
    the last value forward past the final tick (LOCF), take a tick
    sitting exactly ON the grid instant verbatim, and drop grid points
    before the symbol's first tick."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # sym A: ticks at 00:00 (10.00, exactly on-grid) and 01:00 (22.00)
        (1, t0, 1, "A", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 0, 0), 1, "A", 22.0, "{}"),
        # sym B: first tick at 00:45 -> 00:00/00:30 grid points dropped
        (3, dt.datetime(2024, 1, 1, 0, 45, 0), 1, "B", 5.0, "{}"),
    ]
    sf = _events(spark, rows, tmp_path, "lin")
    out = {
        (r["event_type"], r["bucket"]): r["v_interp"]
        for r in tsdb_ext.q89_resample_linear(spark, sf).collect()
    }
    assert out[("A", t0)] == 10.0  # on-grid tick taken verbatim
    # 00:30 is halfway between 10.00 and 22.00
    assert out[("A", dt.datetime(2024, 1, 1, 0, 30, 0))] == 16.0
    assert out[("A", dt.datetime(2024, 1, 1, 1, 0, 0))] == 22.0  # LOCF tail
    assert ("B", t0) not in out  # before first tick: dropped
    assert ("B", dt.datetime(2024, 1, 1, 0, 30, 0)) not in out
    assert out[("B", dt.datetime(2024, 1, 1, 1, 0, 0))] == 5.0


def test_spike_mad_planted_outlier(spark, tmp_path):
    """A planted fat-finger print is the ONLY spike; a constant-price
    symbol (MAD 0) flags its single off-price tick."""
    base = [(i, _ts(i), 1, "A", 100.0 + (i % 2) * 0.02, "{}") for i in range(20)]
    spike = [(99, _ts(30), 1, "A", 250.0, "{}")]
    const = [(200 + i, _ts(i), 1, "B", 50.0, "{}") for i in range(10)]
    const += [(299, _ts(40), 1, "B", 50.01, "{}")]
    sf = _events(spark, base + spike + const, tmp_path, "spikes")
    out = {
        r["event_type"]: r for r in tsdb_ext.q93_spike_mad(spark, sf).collect()
    }
    a = out["A"]
    assert a["n_spikes"] == 1
    assert round(a["max_dev_value"] - (250.0 - a["med_value"]), 9) == 0
    b = out["B"]  # MAD 0: any deviation is a spike
    assert b["mad_value"] == 0.0 and b["n_spikes"] == 1


def test_hash_split_stable_and_total(spark, sf_dir):
    """Split fractions land near 80/10/10, every doc gets exactly one
    split, and the assignment is a pure function of doc_id (stable under
    corpus growth — the property text-keyed splits lose)."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (
        table,
    )

    d = table(spark, sf_dir, "documents")
    n = d.count()
    per = dict(
        d.select(split_assign().alias("s")).groupBy("s").count().collect()
    )
    assert sum(v for _, v in per.items()) == n
    assert 0.70 <= per.get("train", 0) / n <= 0.90
    # same doc_id -> same split even when computed over a different frame
    a = d.limit(20).select("doc_id", split_assign().alias("s1"))
    b = (
        d.withColumn("doc_id", F.col("doc_id"))  # fresh lineage
        .select("doc_id", split_assign().alias("s2"))
    )
    j = a.join(b, "doc_id")
    assert j.where(F.col("s1") != F.col("s2")).count() == 0


def test_stratified_sample_rates_and_hash_independence(spark, sf_dir):
    """Even sources keep 100%, odd ~50%; and the keep decision must be
    statistically independent of q90's split hash (different salt) —
    among kept docs of a downsampled source, train-share stays near 80%
    (a shared hash would make kept == a fixed split region)."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (
        table,
    )
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.curation_ext import (
        sample_keep,
        split_assign,
    )

    reg = load_all()
    out = reg["q94_stratified_sample"].fn(spark, sf_dir).toPandas()
    for _, r in out.iterrows():
        num = int("".join(ch for ch in r.source if ch.isdigit()))
        if num % 2 == 0:
            assert r.n_kept == r.n_total and r.kept_share == 1.0
        else:
            assert 0.25 <= r.kept_share <= 0.75  # ~0.5 at fixture sizes
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", sample_keep().alias("k"), split_assign().alias("s")
    )
    kept = d.where(F.col("k")).toPandas()
    odd_kept = kept[kept.source.str.extract(r"(\d+)$")[0].astype(int) % 2 == 1]
    if len(odd_kept) >= 50:
        train_share = (odd_kept.s == "train").mean()
        assert 0.6 <= train_share <= 0.95


def test_source_overlap_brute_force(spark, tmp_path):
    """q91 matches a brute-force pair count on a corpus with planted
    cross-source 5-gram overlap."""
    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    rows = [
        (0, shared + " zeta", "en", "s1", 1),
        (1, "eta " + shared, "en", "s2", 1),  # shares the 5-gram with s1
        (2, "one two three four five six", "en", "s3", 1),  # disjoint
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    d = tmp_path / "ovl"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    reg = load_all()
    out = reg["q91_source_overlap"].fn(spark, str(d)).collect()
    assert {(r["src_a"], r["src_b"], r["n_shared"]) for r in out} == {
        ("s1", "s2", 1)
    }


def test_token_df_bounds(spark, sf_dir):
    """df <= cf, df <= corpus size, df_share in (0, 1]."""
    reg = load_all()
    out = reg["q92_token_df"].fn(spark, sf_dir).toPandas()
    assert (out.df <= out.cf).all()
    assert (out.df_share > 0).all() and (out.df_share <= 1).all()
    assert out.token.is_unique
