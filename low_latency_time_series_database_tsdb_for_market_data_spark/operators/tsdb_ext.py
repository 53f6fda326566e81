"""Time-series depth operators (q86-q89, q93): realized variance,
data-gap reporting, tick-rule direction counts, linear-interpolation
resampling, and MAD-based spike detection.

These extend the reference's scan/count surface (`timeseries_db.cpp:29-233`)
with the microstructure reports a market-data warehouse actually serves.
All four follow the repo's determinism discipline: price deltas and
interpolation are decided in exact integer cents/micros arithmetic
(functions.deterministic), tick order is the (ts, event_id) total order
(SURVEY.md §4.3.4), and every window partitions by symbol so the shuffle
key is the natural 100 TB partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query
from .prefix import hour_bucket, keyed_prefix

# Shared lag CTE: per-symbol previous tick in (ts, event_id) order, prices
# as exact integer cents.  The lag deliberately crosses day boundaries —
# the tick sequence is the object, calendar cells are just reporting keys.
_LAG_SQL = """s AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
           CAST(ROUND(value * 100) AS BIGINT) AS c,
           lag(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS pc
    FROM events)"""


def _lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, d, c, pc): per-symbol lagged cents, Spark twin of
    _LAG_SQL — routed through the keyed two-pass prefix
    (:func:`..prefix.keyed_prefix`) so parallelism scales with CORES,
    not min(#symbols, #cores): the r7 tape soak showed the
    ``Window.partitionBy(symbol)`` version running a 5-symbol 30M-row
    tape on 5 tasks (0.57-0.85 M rows/s) while scan-bound queries on
    the same tape used all 32.  Results are bit-identical (the lag is
    the same recurrence, carried across range-partition boundaries by
    the <=2N-row boundary frame).

    ``d`` is a DATE (4-byte int), computed AFTER the window pass, and
    consumers cast it to string only on the aggregated output: an
    earlier version materialized the string per row BEFORE the sort, and
    a 30M-row tape soak showed the string alloc + sort payload + string
    group keys costing ~6x the arithmetically identical q87 shape."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", "ts", "event_id", cents("value").alias("c")
    )
    kp = keyed_prefix(
        base, ["event_type"], ["ts", "event_id"],
        bucket=hour_bucket("ts"), lags={"pc": "c"},
    )
    return kp.select(
        "event_type",
        F.to_date("ts").alias("d"),
        "c",
        "pc",
    )


@query(
    "q86_realized_variance",
    oracle=f"""
    WITH {_LAG_SQL}
    SELECT event_type, d,
           CAST(COUNT(*) AS BIGINT) AS n_returns,
           CAST(SUM((c - pc) * (c - pc)) AS BIGINT) AS rv,
           (SUM(abs(c - pc)) * 20000 + COUNT(*))
             // (2 * COUNT(*)) / 10000.0 AS mean_abs_delta
    FROM s WHERE pc IS NOT NULL
    GROUP BY event_type, d
    """,
    category="timeseries-microstructure",
)
def q86_realized_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized variance per symbol-day: the sum of squared tick-to-tick
    price moves — the standard high-frequency volatility estimator
    (sqrt-free, so it stays in exact integer cents^2 and hashes
    identically at any parallelism).  mean_abs_delta is the average
    absolute move in cents, rounded 4-decimal in integer arithmetic.

    Shape: one symbol-keyed window pass + one hash-agg, both partial-
    aggregated map-side.  BIGINT headroom: a symbol-day needs ~1e9 ticks
    of ~$10 average moves before rv nears 2^63 — outside any real tape;
    the 100 TB variant widens the square to DECIMAL(38,0)."""
    lag = _lagged(spark, sf_dir)
    dlt = F.col("c") - F.col("pc")
    return (
        lag.where(F.col("pc").isNotNull())
        .groupBy("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n_returns"),
            F.sum(dlt * dlt).cast("bigint").alias("rv"),
            F.sum(F.abs(dlt)).alias("sum_abs"),
        )
        .select(
            "event_type",
            F.col("d").cast("string").alias("d"),
            "n_returns",
            "rv",
            ratio_e4("sum_abs", "n_returns").alias("mean_abs_delta"),
        )
    )


# A tick gap longer than this is a data-quality incident (feed outage,
# halted symbol): 5 minutes on a feed whose median spacing is seconds.
_GAP_US = 300 * 1_000_000


@query(
    "q87_gap_report",
    oracle=f"""
    WITH s AS (SELECT event_type, epoch_us(ts) AS us,
                      lag(epoch_us(ts)) OVER (
                          PARTITION BY event_type ORDER BY ts, event_id) AS pus
               FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(CASE WHEN us - pus > {_GAP_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gaps,
           CAST(SUM(CASE WHEN us - pus > {_GAP_US} THEN us - pus ELSE 0 END)
                AS BIGINT) AS gap_time_us,
           CAST(MAX(us - pus) AS BIGINT) AS max_gap_us
    FROM s GROUP BY event_type
    """,
    category="timeseries-quality",
)
def q87_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-gap report per symbol: how many inter-tick gaps exceeded the
    5-minute incident threshold, the total time spent inside such gaps,
    and the worst gap — the staleness/coverage audit behind every
    market-data SLA.  All values are exact epoch-microsecond integers.

    Shape: one symbol-keyed window pass + one hash-agg; the gap CASE
    filters map-side, so the agg input is one row per tick with three
    integer columns regardless of history depth."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    s = ev.select(
        "event_type",
        us.alias("us"),
        F.lag(us).over(w).alias("pus"),
    )
    gap = F.col("us") - F.col("pus")
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.when(gap > _GAP_US, 1).otherwise(0))
        .cast("bigint")
        .alias("n_gaps"),
        F.sum(F.when(gap > _GAP_US, gap).otherwise(0))
        .cast("bigint")
        .alias("gap_time_us"),
        F.max(gap).cast("bigint").alias("max_gap_us"),
    )


@query(
    "q88_tick_direction",
    oracle=f"""
    WITH {_LAG_SQL}
    SELECT event_type, d,
           CAST(SUM(CASE WHEN c > pc THEN 1 ELSE 0 END) AS BIGINT)
               AS upticks,
           CAST(SUM(CASE WHEN c < pc THEN 1 ELSE 0 END) AS BIGINT)
               AS downticks,
           CAST(SUM(CASE WHEN c = pc THEN 1 ELSE 0 END) AS BIGINT)
               AS flats,
           CAST(SUM(CASE WHEN c > pc THEN 1 ELSE 0 END)
                - SUM(CASE WHEN c < pc THEN 1 ELSE 0 END) AS BIGINT)
               AS net_direction
    FROM s WHERE pc IS NOT NULL
    GROUP BY event_type, d
    """,
    category="timeseries-microstructure",
)
def q88_tick_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-rule direction counts per symbol-day (the Lee-Ready style
    uptick/downtick classification order-flow studies start from), plus
    the net direction.  Comparisons happen on exact integer cents, so the
    classification can never float-drift between engines.

    Same shape as q86: symbol-keyed window pass + hash-agg with
    conditional counts, all partial-aggregated map-side."""
    lag = _lagged(spark, sf_dir)
    up = F.when(F.col("c") > F.col("pc"), 1).otherwise(0)
    dn = F.when(F.col("c") < F.col("pc"), 1).otherwise(0)
    fl = F.when(F.col("c") == F.col("pc"), 1).otherwise(0)
    return (
        lag.where(F.col("pc").isNotNull())
        .groupBy("event_type", "d")
        .agg(
            F.sum(up).cast("bigint").alias("upticks"),
            F.sum(dn).cast("bigint").alias("downticks"),
            F.sum(fl).cast("bigint").alias("flats"),
            (F.sum(up) - F.sum(dn)).cast("bigint").alias("net_direction"),
        )
        .select(
            "event_type",
            F.col("d").cast("string").alias("d"),
            "upticks",
            "downticks",
            "flats",
            "net_direction",
        )
    )


_MAD_K = 4  # spike threshold: deviation > 4 robust sigmas (MADs)


@query(
    "q93_spike_mad",
    oracle=f"""
    WITH b AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events),
    m AS (SELECT event_type, c,
                 CAST(median(c) OVER (PARTITION BY event_type) * 2 AS BIGINT)
                     AS med2
          FROM b),
    d AS (SELECT event_type, med2, abs(2 * c - med2) AS dev2 FROM m),
    m2 AS (SELECT event_type, med2, dev2,
                  CAST(median(dev2) OVER (PARTITION BY event_type) * 2
                       AS BIGINT) AS mad2
           FROM d)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(CASE WHEN dev2 > {_MAD_K} * mad2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_spikes,
           MAX(med2) / 200.0 AS med_value,
           MAX(mad2) / 200.0 AS mad_value,
           MAX(dev2) / 200.0 AS max_dev_value
    FROM m2 GROUP BY event_type
    """,
    category="timeseries-quality",
)
def q93_spike_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust spike detection per symbol: ticks whose price deviates from
    the symbol median by more than 4 MADs (median absolute deviation) —
    the fat-finger / bad-print screen that mean/stddev z-scores miss
    because outliers inflate their own yardstick.

    Exactness: medians of integers interpolate to halves at worst, so
    DOUBLED medians are exact BIGINTs in both engines; every deviation
    and the spike comparison live in that doubled-cents integer domain
    (the /200.0 reporting division is a single identical IEEE op).

    Shape: two exact per-symbol median window passes over (symbol, cents)
    pairs, then one hash-agg — symbol-partitioned like every
    microstructure op here.  Exact medians buffer a symbol's cents column
    per partition; the 100 TB variant swaps approx_percentile (and the
    answer leaves the oracle-exact regime, q73's documented territory)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    base = ev.select("event_type", cents("value").alias("c"))
    d = base.select(
        "event_type",
        "c",
        (F.median("c").over(w) * 2).cast("bigint").alias("med2"),
    ).select(
        "event_type",
        "med2",
        F.abs(2 * F.col("c") - F.col("med2")).alias("dev2"),
    )
    m2 = d.select(
        "event_type",
        "med2",
        "dev2",
        (F.median("dev2").over(w) * 2).cast("bigint").alias("mad2"),
    )
    return m2.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(
            F.when(F.col("dev2") > _MAD_K * F.col("mad2"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_spikes"),
        (F.max("med2") / 200.0).alias("med_value"),
        (F.max("mad2") / 200.0).alias("mad_value"),
        (F.max("dev2") / 200.0).alias("max_dev_value"),
    )


_GRID_US = 1800 * 1_000_000  # q36's 30-min grid, in epoch micros
_GRID_ORD = 9223372036854775807  # grid rows sort after any tick at equal ts


@query(
    "q89_resample_linear",
    oracle=f"""
    WITH t AS (SELECT event_type, epoch_us(ts) AS us,
                      CAST(ROUND(value * 100) AS BIGINT) AS c,
                      event_id AS ord, 0 AS is_grid FROM events),
    b AS (SELECT MIN(us // {_GRID_US} * {_GRID_US}) AS mn,
                 MAX(us // {_GRID_US} * {_GRID_US}) AS mx FROM t),
    g AS (SELECT s.event_type, unnest(range(b.mn, b.mx + 1, {_GRID_US})) AS us,
                 CAST(NULL AS BIGINT) AS c, {_GRID_ORD} AS ord, 1 AS is_grid
          FROM (SELECT DISTINCT event_type FROM t) s CROSS JOIN b),
    u AS (SELECT * FROM t UNION ALL SELECT * FROM g),
    w AS (SELECT event_type, us, is_grid,
          LAST_VALUE(c IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY us, ord
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
          LAST_VALUE(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY us, ord
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pus,
          FIRST_VALUE(c IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY us, ord
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
          FIRST_VALUE(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY us, ord
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nus
          FROM u)
    SELECT event_type, make_timestamp(us) AS bucket,
           CASE WHEN nus IS NULL THEN (pc * 100) / 10000.0
                ELSE ((CAST(pc AS HUGEINT) * (nus - us)
                       + CAST(nc AS HUGEINT) * (us - pus)) * 20000
                      + 100 * CAST(nus - pus AS HUGEINT))
                     // (2 * 100 * CAST(nus - pus AS HUGEINT)) / 10000.0
           END AS v_interp
    FROM w WHERE is_grid = 1 AND pus IS NOT NULL
    """,
    category="timeseries",
)
def q89_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to q36's regular 30-min grid with LINEAR interpolation
    between the bracketing ticks (LOCF past the final tick; grid points
    before a symbol's first tick are dropped) — the gap-fill mode q36's
    LOCF cannot express, and the one chart/feature pipelines actually
    want for slowly-sampled series.

    Implementation is the sorted-union trick: tag raw ticks is_grid=0 and
    generated grid points is_grid=1, sort each symbol by (epoch_us, ord)
    — ticks carry event_id, grid rows a sentinel that orders them AFTER a
    tick on the same microsecond — then one forward and one backward
    ignore-nulls window pass gives every grid row its bracketing ticks.
    BOTH passes use a growing UNBOUNDED PRECEDING frame (the backward one
    over the REVERSED (us, ord) ordering): Spark evaluates growing frames
    incrementally in O(rows), where a currentRow->unboundedFollowing
    frame re-scans the remainder per row — O(rows^2) per symbol, measured
    74 s vs 0.6 s at sf0.1.  One shuffle key (symbol, the same
    partitioning every per-symbol operator here uses), two in-partition
    sorts.  The interpolated value is decided entirely in integer
    cents x micros arithmetic (DECIMAL(38,0) headroom, round-half-up at
    4 decimals), so both engines emit the identical double."""
    return resample_linear_frame(table(spark, sf_dir, "events"))


def resample_linear_frame(ev: DataFrame) -> DataFrame:
    """q89's transformation over any (event_type, ts, event_id, value)
    frame — split out so property tests can drive it with in-memory
    corpora (the oracle gate covers the fixture; properties cover random
    tick layouts against an exact rational mirror)."""
    t = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        cents("value").alias("c"),
        F.col("event_id").alias("ord"),
        F.lit(0).alias("is_grid"),
    )
    bucket = (F.col("us") - F.col("us") % _GRID_US).alias("b")
    bounds = t.select(bucket).agg(
        F.min("b").alias("mn"), F.max("b").alias("mx")
    )
    grid = (
        t.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.lit(_GRID_US).cast("long"))
            ).alias("us"),
            F.lit(None).cast("bigint").alias("c"),
            F.lit(_GRID_ORD).alias("ord"),
            F.lit(1).alias("is_grid"),
        )
    )
    u = t.unionByName(grid)
    wp = (
        Window.partitionBy("event_type")
        .orderBy("us", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next tick" via last-ignorenulls over the REVERSED ordering's
    # growing frame: for row i it yields the ascending-first non-null at
    # or after i — identical to first over currentRow->following, but
    # incremental (O(rows)) instead of per-row frame re-scans (O(rows^2))
    wn = (
        Window.partitionBy("event_type")
        .orderBy(F.col("us").desc(), F.col("ord").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tick_us = F.when(F.col("is_grid") == 0, F.col("us"))
    w = u.select(
        "event_type",
        "us",
        "is_grid",
        F.last("c", ignorenulls=True).over(wp).alias("pc"),
        F.last(tick_us, ignorenulls=True).over(wp).alias("pus"),
        F.last("c", ignorenulls=True).over(wn).alias("nc"),
        F.last(tick_us, ignorenulls=True).over(wn).alias("nus"),
    )
    interp = ratio_e4(
        "CAST(pc AS DECIMAL(38,0)) * (nus - us)"
        " + CAST(nc AS DECIMAL(38,0)) * (us - pus)",
        "100 * CAST(nus - pus AS DECIMAL(38,0))",
    )
    return (
        w.where((F.col("is_grid") == 1) & F.col("pus").isNotNull())
        .select(
            "event_type",
            F.timestamp_micros("us").alias("bucket"),
            F.when(
                F.col("nus").isNull(), (F.col("pc") * 100) / F.lit(10000.0)
            )
            .otherwise(interp)
            .alias("v_interp"),
        )
    )
