"""Property tests (SURVEY.md §5.2): invariants that must hold for every
range, partitioning, and input subset — the distributed-correctness
guarantees a single example can't establish.

hypothesis drives the range/partition choices; each property is checked
against a small in-memory tick table built once per module.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

N_ROWS = 500
TS_LO, TS_HI = 1000, 1400  # ts domain (duplicates guaranteed: 500 rows/400 slots)


@pytest.fixture(scope="module")
def ticks(spark):
    """Deterministic tick table with duplicate timestamps, several symbols."""
    df = spark.range(N_ROWS).select(
        (TS_LO + (F.col("id") * 7919) % (TS_HI - TS_LO)).alias("ts"),
        (F.col("id") % 5).cast("string").alias("symbol"),
        (F.col("id") * 1.5).alias("price"),
        (F.col("id") % 97).alias("volume"),
        F.col("id").alias("seq"),
    )
    df = df.cache()
    df.count()
    return df


def range_scan(df, lo, hi):
    return df.where((F.col("ts") >= lo) & (F.col("ts") <= hi))


bounds = st.tuples(
    st.integers(TS_LO - 50, TS_HI + 50), st.integers(TS_LO - 50, TS_HI + 50)
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(b=bounds, parts=st.integers(1, 7))
def test_range_scan_partition_invariance(ticks, b, parts):
    """Result multiset is independent of physical partitioning."""
    lo, hi = b
    base = sorted(r.seq for r in range_scan(ticks, lo, hi).collect())
    repart = sorted(
        r.seq for r in range_scan(ticks.repartition(parts), lo, hi).collect()
    )
    assert base == repart


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(b=bounds, mid=st.integers(TS_LO - 50, TS_HI + 50))
def test_range_scan_split_disjoint_union(ticks, b, mid):
    """[lo,mid] ∪ [mid+1,hi] == [lo,hi] and the halves are disjoint —
    the inclusive-bounds contract (S4) stated as an algebraic law."""
    lo, hi = min(b), max(b)
    mid = min(max(mid, lo - 1), hi)
    left = {r.seq for r in range_scan(ticks, lo, mid).collect()}
    right = {r.seq for r in range_scan(ticks, mid + 1, hi).collect()}
    whole = {r.seq for r in range_scan(ticks, lo, hi).collect()}
    assert left | right == whole
    assert not (left & right)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(b=bounds)
def test_inverted_range_is_empty(ticks, b):
    lo, hi = b
    if lo <= hi:
        lo, hi = hi + 1, lo
    assert range_scan(ticks, lo, hi).count() == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(0, N_ROWS + 10))
def test_last_n_arrival_suffix(ticks, n):
    """last-N is exactly the seq-suffix of the table (S6 semantics)."""
    got = [
        r.seq
        for r in ticks.orderBy(F.desc("seq")).limit(n).orderBy("seq").collect()
    ]
    lo = max(0, N_ROWS - n)
    assert got == list(range(lo, N_ROWS))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(parts=st.integers(1, 7))
def test_dedup_idempotent_and_partition_invariant(ticks, parts):
    """Exact dedup (q50 shape) is idempotent and partition-invariant."""
    dup = ticks.union(ticks).repartition(parts)
    once = dup.groupBy("ts", "symbol", "price", "volume", "seq").agg(
        F.min("seq").alias("keep")
    )
    assert once.count() == N_ROWS
    twice = once.groupBy("ts", "symbol", "price", "volume", "seq", "keep").count()
    assert twice.count() == N_ROWS


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(b=bounds, parts=st.integers(1, 5))
def test_count_consistency(ticks, b, parts):
    """count(range) + count(complement) == count(*) under any partitioning."""
    lo, hi = min(b), max(b)
    df = ticks.repartition(parts)
    inside = range_scan(df, lo, hi).count()
    outside = df.where((F.col("ts") < lo) | (F.col("ts") > hi)).count()
    assert inside + outside == N_ROWS


def test_ratio_round_matches_duckdb_mirror(spark, ddb):
    """functions.ratio_e4 / ratio_e4_signed must equal their documented
    DuckDB oracle mirrors on ties, negatives, zero, and 1e15 magnitudes
    (the engine-divergence class behind the q21/q36 fixes)."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.functions import (
        ratio_e4,
        ratio_e4_signed,
    )

    cases = [
        (755, 16), (-755, 16), (1, 3), (-1, 3), (5, 2), (-5, 2),
        (0, 7), (10**15, 7), (-(10**15), 7), (99995, 200000),
    ]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", ratio_e4_signed("a", "b").alias("r")
    )
    got = {(r.a, r.b): r.r for r in df.collect()}
    for a, b in cases:
        want = ddb.execute(
            f"""SELECT CASE WHEN ({a}) < 0
                THEN -(((-CAST({a} AS HUGEINT)) * 20000 + ({b})) // (2 * ({b})))
                ELSE ((CAST({a} AS HUGEINT) * 20000 + ({b})) // (2 * ({b})))
                END / 10000.0"""
        ).fetchone()[0]
        assert got[(a, b)] == float(want), (a, b, got[(a, b)], want)
    # positive-domain helper agrees with the signed one where both apply
    pos = [(a, b) for a, b in cases if a >= 0]
    df2 = spark.createDataFrame(pos, "a long, b long").select(
        "a", "b", ratio_e4("a", "b").alias("r")
    )
    for r in df2.collect():
        assert r.r == got[(r.a, r.b)]
    # exact ties keep 4-decimal-exact values fixed (the -2.5 case)
    assert got[(-5, 2)] == -2.5 and got[(5, 2)] == 2.5


def test_q25_approx_distinct_within_error_bound(spark, sf_dir):
    """q25 is rows-only at the oracle gate (HLL sketches differ between
    engines by design) — this is its real check: per-group approximate
    cardinality within 3x the configured rsd (2%) of the exact count."""
    from pyspark.sql import functions as F

    from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (
        table,
    )
    from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
        load_all,
    )

    approx = {
        r.event_type: r.approx_users
        for r in load_all()["q25_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.06 * n), (k, approx[k], n)
