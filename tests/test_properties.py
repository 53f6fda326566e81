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


def _interp_mirror(ticks_us_cents, grid_us):
    """Exact rational mirror of q89's interpolation: round-half-up at 4
    decimals via fractions — the ground truth the integer arithmetic
    must reproduce bit-for-bit.  ticks: sorted [(us, cents)]."""
    from fractions import Fraction

    out = {}
    for g in grid_us:
        prev = [(u, c) for u, c in ticks_us_cents if u <= g]
        nxt = [(u, c) for u, c in ticks_us_cents if u > g]
        if not prev:
            continue
        pu, pc = prev[-1]
        if not nxt:
            out[g] = (pc * 100) / 10000.0
            continue
        nu, nc = nxt[0]
        v = Fraction(pc * (nu - g) + nc * (g - pu), 100 * (nu - pu))
        e4 = (2 * 10000 * v.numerator + v.denominator) // (2 * v.denominator)
        out[g] = int(e4) / 10000.0
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 4 * 1800 - 1),  # seconds inside a 4-bucket span
            st.integers(1, 99999),  # cents
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_resample_linear_matches_rational_mirror(spark, data):
    """q89 on random tick layouts == the exact Fraction round-half-up
    mirror at every grid point (bracketing, on-grid ticks, LOCF tail,
    and dropped leading edge all included)."""
    import datetime as dt

    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.tsdb_ext import (
        _GRID_US,
        resample_linear_frame,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), c / 100.0)
        for i, (s, c) in enumerate(sorted(data))
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).withColumn("event_type", F.lit("X"))
    got = {
        int(r["bucket"].timestamp()) * 1_000_000: r["v_interp"]
        for r in resample_linear_frame(ev).collect()
    }
    base_us = int(base.timestamp()) * 1_000_000
    ticks = sorted((base_us + s * 1_000_000, c) for s, c in data)
    lo = (ticks[0][0] // _GRID_US) * _GRID_US
    hi = (ticks[-1][0] // _GRID_US) * _GRID_US
    grid = range(lo, hi + 1, _GRID_US)
    want = _interp_mirror(ticks, grid)
    assert got == want


def test_split_assign_matches_hashlib_mirror(spark):
    """split_assign == a driver-side hashlib md5 reimplementation for the
    first 512 ids (the cross-engine hash recipe, pinned outside Spark)."""
    import hashlib

    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.curation_ext import (
        _TEST_LO,
        _VAL_LO,
        split_assign,
    )

    got = {
        r.doc_id: r.s
        for r in spark.range(512)
        .select(F.col("id").alias("doc_id"), split_assign().alias("s"))
        .collect()
    }
    for i in range(512):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
        want = "train" if b < _VAL_LO else ("val" if b < _TEST_LO else "test")
        assert got[i] == want, i


@given(
    window=st.lists(
        st.integers(1, 50_000), min_size=20, max_size=20  # cents prices
    )
)
@settings(max_examples=200, deadline=None)
def test_bollinger_integer_test_equals_float_band(window):
    """q156's BIGINT band test (n·c − s)² > 4(n·q − s²) must agree with
    the float formula |c − mean| > 2σ everywhere the float test is not
    sitting on a representability knife-edge — and the integer test is
    the DEFINED semantics on ties, so only clear float verdicts are
    compared."""
    import math

    n = len(window)
    s = sum(window)
    q = sum(x * x for x in window)
    c = window[-1]
    dev = n * c - s
    int_wide = dev * dev > 4 * (n * q - s * s)
    mean = s / n
    var = (q - s * s / n) / n
    sigma = math.sqrt(max(var, 0.0))
    lhs, rhs = abs(c - mean), 2 * sigma
    if abs(lhs - rhs) > 1e-9 * max(1.0, rhs):  # clear float verdict
        assert int_wide == (lhs > rhs)


@given(
    sizes=st.lists(st.integers(1, 1_000_000), min_size=1, max_size=200),
    target_block=st.integers(1, 4096),
    max_seeds=st.integers(1, 512),
)
@settings(max_examples=300, deadline=None)
def test_seed_rationing_never_exceeds_budget(sizes, target_block, max_seeds):
    """_ration_seeds must keep the level-2 seed total within ONE
    max_seeds budget for ANY hot-cell size distribution (round-6
    advice: the 1-seed floor could overshoot when many cells round up),
    give every surviving cell >= 1 seed, and never exceed a cell's
    ceil(size/target_block) need."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.dedup import (  # noqa: E501
        _ration_seeds,
    )

    hot = {i: sz for i, sz in enumerate(sizes)}
    want = _ration_seeds(hot, target_block, max_seeds)
    assert sum(want.values()) <= max_seeds
    assert all(k >= 1 for k in want.values())
    assert set(want) <= set(hot)
    if sum(min(-(-sz // target_block), max_seeds)
           for sz in sizes) <= max_seeds:
        # under-budget wants pass through untrimmed
        assert want == {
            c: min(-(-sz // target_block), max_seeds)
            for c, sz in hot.items()
        }


@given(
    c=st.integers(0, 10_000),
    na=st.integers(1, 10_000),
    nb=st.integers(1, 10_000),
)
@settings(max_examples=300, deadline=None)
def test_containment_thresholds_match_rational_arithmetic(c, na, nb):
    """q159's keep-predicate (5c >= 4·min AND 5c < 3·union) must equal
    the exact rational conditions containment >= 0.8 and jaccard < 0.6
    (Fraction arithmetic — no float anywhere)."""
    from fractions import Fraction

    c = min(c, na, nb)  # |A∩B| cannot exceed either set
    union = na + nb - c
    mn = min(na, nb)
    int_keep = (c * 5 >= mn * 4) and (c * 5 < union * 3)
    frac_keep = Fraction(c, mn) >= Fraction(4, 5) and (
        Fraction(c, union) < Fraction(3, 5) if union else False
    )
    assert int_keep == frac_keep


@given(
    move=st.integers(0, 10**10),
    dollars=st.integers(1, 10**15),
)
@settings(max_examples=300, deadline=None)
def test_amihud_e4_ratio_is_exact_half_up(move, dollars):
    """q154's scaled e4 ratio equals round-half-up of the exact rational
    (move·1e9/dollars) at 4 decimals, computed via Fractions."""
    from fractions import Fraction

    got = ((move * 10**9 * 20000 + dollars) // (2 * dollars)) / 10000.0
    x = Fraction(move * 10**9, dollars)
    scaled = x * 10000
    half_up = (
        int(scaled) + (1 if scaled - int(scaled) >= Fraction(1, 2) else 0)
    )
    assert got == half_up / 10000.0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    window=st.integers(1, 600),
    null_mod=st.integers(2, 9),
)
def test_time_extrema_decomposition_equals_classic(ticks, window, null_mod):
    """For ANY window width (including widths below/above the ts
    spacing and wider than the whole span region) and any NULL
    sprinkling, the two-bucket extrema decomposition must equal the
    classic bounded-RANGE frame row-for-row — the property the planted
    examples can't establish across arbitrary bucket alignments."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.prefix import (
        classic_time_rolling,
        keyed_time_rolling,
    )

    df = ticks.select(
        "symbol",
        F.col("ts").cast("bigint").alias("us"),
        F.when(F.col("seq") % null_mod == 0, None)
        .otherwise(F.col("volume"))
        .alias("x"),
        "seq",
    )
    kw = dict(mins={"lo": "x"}, maxs={"hi": "x"})
    a = (
        keyed_time_rolling(
            df, ["symbol"], "us", window, classic_max_bytes=0, **kw
        )
        .toPandas()
        .sort_values(["symbol", "us", "seq"], ignore_index=True)
    )
    b = (
        classic_time_rolling(df, ["symbol"], "us", window, **kw)
        .toPandas()
        .sort_values(["symbol", "us", "seq"], ignore_index=True)
    )
    assert list(a.columns) == list(b.columns)
    assert a.equals(b), (window, null_mod)
