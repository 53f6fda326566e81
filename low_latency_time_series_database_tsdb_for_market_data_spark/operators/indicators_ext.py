"""Round-6 indicator depth, part 2 (q162/q163/q165): variance-ratio
random-walk test, RSI regime screen, and volume-clock bars.

Same discipline as micro_ext.py: every published number is decided in
exact integer arithmetic (prices as BIGINT cents, tests as integer
cross-multiplications, ratios via ``ratio_e4``'s integer round-half-up),
and every query rides the catalog's one natural symbol-keyed shuffle.
Reference parity: the reference stops at OHLC-style scans
(`timeseries_db.cpp:170-233`); these are the market-microstructure /
ML-feature layer SURVEY §2.2 scopes on top of it.

Headroom notes are per-query: the variance-ratio moments are widened to
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) BEFORE any product of two
aggregates, because n·Σr² already passes int64 at ~20k ticks/symbol
when the lag-k deltas are a few hundred dollars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query
from .prefix import hour_bucket, keyed_prefix

# Variance-ratio aggregation horizons (ticks).
_VR_KS = (2, 4, 8)


def _dec(col: str) -> str:
    """SQL fragment: widen a BIGINT aggregate to DECIMAL(38,0) so the
    moment products below never touch int64 arithmetic (Spark wraps
    silently outside ANSI mode; DuckDB BIGINT * BIGINT raises)."""
    return f"CAST({col} AS DECIMAL(38,0))"


def _vr_num(k: int) -> str:
    """(nk*qk - sk^2) * n1^2 — the k-period variance cross-multiplied
    by the 1-period sample-size square (non-negative by Cauchy-Schwarz,
    so it sits inside ratio_e4's num >= 0 domain)."""
    return (
        f"({_dec(f'n{k}')} * q{k} - {_dec(f's{k}')} * s{k}) * n1 * n1"
    )


def _vr_den(k: int) -> str:
    """k * (n1*q1 - s1^2) * nk^2 — positive whenever the 1-tick return
    series has any variance at all (enforced by the WHERE)."""
    return f"{k} * ({_dec('n1')} * q1 - {_dec('s1')} * s1) * n{k} * n{k}"


def _hug(col: str) -> str:
    """DuckDB mirror of _dec: HUGEINT widening."""
    return f"CAST({col} AS HUGEINT)"


def _vr_num_sql(k: int) -> str:
    return f"(({_hug(f'n{k}')} * q{k} - {_hug(f's{k}')} * s{k}) * n1 * n1)"


def _vr_den_sql(k: int) -> str:
    return f"({k} * ({_hug('n1')} * q1 - {_hug('s1')} * s1) * n{k} * n{k})"


@query(
    "q162_variance_ratio",
    oracle=f"""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events),
    r AS (
      SELECT event_type,
             c - lag(c, 1) OVER w AS r1,
             {', '.join(f'c - lag(c, {k}) OVER w AS r{k}' for k in _VR_KS)}
      FROM c
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    m AS (
      SELECT event_type,
             CAST(COUNT(r1) AS BIGINT) AS n1,
             CAST(SUM(r1) AS BIGINT) AS s1,
             CAST(SUM(r1 * r1) AS BIGINT) AS q1,
             {', '.join(
                 f'CAST(COUNT(r{k}) AS BIGINT) AS n{k}, '
                 f'CAST(SUM(r{k}) AS BIGINT) AS s{k}, '
                 f'CAST(SUM(r{k} * r{k}) AS BIGINT) AS q{k}'
                 for k in _VR_KS)}
      FROM r GROUP BY 1)
    SELECT event_type, n1 AS n_ticks,
           {', '.join(
               f'(({_vr_num_sql(k)}) * 20000 + ({_vr_den_sql(k)}))'
               f' // (2 * ({_vr_den_sql(k)})) / 10000.0 AS vr{k}_e4'
               for k in _VR_KS)}
    FROM m
    WHERE {_hug('n1')} * q1 - {_hug('s1')} * s1 > 0
      AND n{max(_VR_KS)} >= 2
    """,
    category="timeseries-microstructure",
)
def q162_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio table: per symbol, Var(k-tick return)
    / (k x Var(1-tick return)) at k = 2, 4, 8 — the classic random-walk
    diagnostic (VR ~ 1 under a random walk, < 1 mean-reverting, > 1
    trending).  Overlapping k-tick returns, population variances.

    Exactness: each variance enters as the exact integer moment form
    n·Σr² - (Σr)², widened to DECIMAL(38,0)/HUGEINT before the cross-
    multiplication, and the ratio rounds half-up in integers via the
    ratio_e4 identity — no float variance or division ever compounds.
    Degenerate symbols (zero 1-tick variance, or fewer than 2 k-tick
    returns at the widest horizon) are excluded by the same exact test
    in both engines.

    Headroom: numerator peaks at (n·Σr²)·n² — fine to ~1e9 ticks/symbol
    in DECIMAL(38,0); beyond that, compute per day and average VRs.

    Shape: ONE window pass computes all lags over the shared symbol
    sort (the q158 template), one symbol-keyed hash-agg rides that
    partitioning, and the published ratios are in-row arithmetic on the
    five-symbol result — shuffle count independent of len(ks)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    c = cents("value")
    r = ev.select(
        "event_type",
        (c - F.lag(c, 1).over(w)).alias("r1"),
        *[(c - F.lag(c, k).over(w)).alias(f"r{k}") for k in _VR_KS],
    )

    def _moments(col: str) -> list:
        x = F.col(col)
        return [
            F.count(x).alias(f"n{col[1:]}"),
            F.sum(x).alias(f"s{col[1:]}"),
            F.sum(x * x).alias(f"q{col[1:]}"),
        ]

    m = r.groupBy("event_type").agg(
        *_moments("r1"),
        *[a for k in _VR_KS for a in _moments(f"r{k}")],
    )
    kept = m.where(
        F.expr(f"{_dec('n1')} * q1 - {_dec('s1')} * s1 > 0")
        & (F.col(f"n{max(_VR_KS)}") >= 2)
    )
    return kept.select(
        "event_type",
        F.col("n1").alias("n_ticks"),
        *[
            ratio_e4(_vr_num(k), _vr_den(k)).alias(f"vr{k}_e4")
            for k in _VR_KS
        ],
    )


# RSI window: trailing 14 one-tick changes (Cutler's SMA form).
_RSI_N = 14


@query(
    "q163_rsi_screen",
    oracle=f"""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events),
    d AS (
      SELECT event_type, ts, event_id,
             c - lag(c) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS d
      FROM c),
    w AS (
      SELECT event_type,
             SUM(CASE WHEN d > 0 THEN d ELSE 0 END) OVER win AS g,
             SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER win AS l,
             COUNT(*) OVER win AS n
      FROM d WHERE d IS NOT NULL
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN 3 * g > 7 * l THEN 1 ELSE 0 END) AS BIGINT)
             AS overbought,
           CAST(SUM(CASE WHEN 7 * g < 3 * l THEN 1 ELSE 0 END) AS BIGINT)
             AS oversold
    FROM w WHERE n = {_RSI_N}
    GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q163_rsi_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI regime screen (Cutler's 14-tick SMA form): per symbol, how
    many ticks printed overbought (RSI > 70) vs oversold (RSI < 30)
    against their own trailing 14 one-tick changes.

    Exactness: RSI = 100·G/(G+L) with G/L the trailing gain/loss sums,
    so RSI > 70 <=> 3G > 7L and RSI < 30 <=> 7G < 3L — both decided as
    pure BIGINT cross-multiplications; no float RSI ever exists.  A
    flat window (G = L = 0) is neutral under both tests, identically in
    both engines.

    Shape: per-symbol lag pass, then ONE bounded trailing frame (ROWS
    13 PRECEDING) inside the same symbol sort — O(1) amortized per row,
    streams at 100 TB; symbol-bounded hash-agg finishes."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    c = cents("value")
    d = ev.select(
        "event_type",
        "ts",
        "event_id",
        (c - F.lag(c).over(w)).alias("d"),
    ).where(F.col("d").isNotNull())
    win = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_RSI_N - 1), Window.currentRow)
    )
    gain = F.when(F.col("d") > 0, F.col("d")).otherwise(F.lit(0))
    loss = F.when(F.col("d") < 0, -F.col("d")).otherwise(F.lit(0))
    scr = d.select(
        "event_type",
        F.sum(gain).over(win).alias("g"),
        F.sum(loss).over(win).alias("l"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).where(F.col("n") == _RSI_N)
    return scr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(3 * F.col("g") > 7 * F.col("l"), 1).otherwise(0))
        .cast("bigint")
        .alias("overbought"),
        F.sum(F.when(7 * F.col("g") < 3 * F.col("l"), 1).otherwise(0))
        .cast("bigint")
        .alias("oversold"),
    )


# Volume-clock bar size: cents x size units of traded "dollar volume"
# analogue is overkill here — the bar advances on raw size (user_id).
_BAR_V = 100_000


@query(
    "q165_volume_clock",
    oracle=f"""
    WITH c AS (
      SELECT event_type, ts, event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events),
    r AS (
      SELECT event_type, user_id, c,
             row_number() OVER w AS rn,
             SUM(user_id) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum
      FROM c
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    b AS (
      SELECT event_type, (cum - user_id) // {_BAR_V} AS bar_id,
             user_id, c, rn
      FROM r)
    SELECT event_type, CAST(bar_id AS BIGINT) AS bar_id,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           min_by(c, rn) AS open_c,
           CAST(MAX(c) AS BIGINT) AS high_c,
           CAST(MIN(c) AS BIGINT) AS low_c,
           max_by(c, rn) AS close_c,
           CAST(SUM(user_id) AS BIGINT) AS bar_volume
    FROM b GROUP BY 1, 2
    """,
    category="timeseries-bars",
)
def q165_volume_clock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-clock bars: per symbol, re-bucket the tape by CUMULATIVE
    TRADED SIZE instead of wall-clock time — each bar closes when
    another 100k units have traded — and publish per-bar OHLC cents,
    tick count, and exact bar volume.  This is the information-driven
    bar family (volume/dollar bars) ML pipelines sample on so that
    activity bursts get more bars, not bigger ones (vs q21/q22's
    time-bucket bars).

    Exactness: the bar assignment floor(cum_before / V) is integer
    division of a non-negative BIGINT prefix sum — identical in both
    engines; open/close pick min_by/max_by on the deterministic
    row_number of the unique (ts, event_id) sort; high/low/volume are
    integer MIN/MAX/SUM.

    Shape: ONE symbol-keyed sort carries row_number and the running
    prefix sum (UNBOUNDED PRECEDING — the streaming-safe growing frame),
    and the (symbol, bar) hash-agg rides the same symbol partitioning
    (subset clustering), so the whole query is ONE exchange."""
    ev = table(spark, sf_dir, "events")
    c = cents("value")
    # row number AND volume prefix from ONE keyed two-pass range sort
    # (core-scaled parallelism — see ..prefix.keyed_prefix)
    r = keyed_prefix(
        ev.select(
            "event_type", "ts", "event_id", "user_id", c.alias("c")
        ),
        ["event_type"],
        ["ts", "event_id"],
        bucket=hour_bucket("ts"),
        cumsums={"cum": "user_id"},
        row_number_col="rn",
    ).select("event_type", "user_id", "c", "rn", "cum")
    b = r.select(
        "event_type",
        F.expr(f"(cum - user_id) div {_BAR_V}").alias("bar_id"),
        "user_id",
        "c",
        "rn",
    )
    return b.groupBy("event_type", "bar_id").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.min_by("c", "rn").alias("open_c"),
        F.max("c").alias("high_c"),
        F.min("c").alias("low_c"),
        F.max_by("c", "rn").alias("close_c"),
        F.sum("user_id").cast("bigint").alias("bar_volume"),
    )


@query(
    "q180_atr_daily",
    oracle="""
    WITH b AS (SELECT event_type, CAST(ts AS DATE) AS d, ts, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_type, d
                                       ORDER BY ts DESC, event_id DESC)
                      AS rn
          FROM b),
    day AS (SELECT event_type, d, MAX(c) AS hi, MIN(c) AS lo,
                   MAX(CASE WHEN rn = 1 THEN c END) AS cl
            FROM r GROUP BY 1, 2),
    lagd AS (SELECT event_type, hi, lo, cl,
                    lag(cl) OVER (PARTITION BY event_type ORDER BY d)
                      AS pcl
             FROM day),
    tr AS (SELECT event_type,
                  GREATEST(hi - lo, ABS(hi - pcl), ABS(lo - pcl)) AS t
           FROM lagd WHERE pcl IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           (SUM(t) * 20000 + 100 * COUNT(*)) // (200 * COUNT(*))
             / 10000.0 AS atr,
           MAX(t) / 100.0 AS max_tr
    FROM tr GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q180_atr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range per symbol: daily true range — the largest of
    (high-low), |high-prev close|, |low-prev close| — averaged over the
    full day grid.  The gap-aware volatility unit behind position
    sizing and stop placement (Bollinger q156 measures dispersion
    around a mean; TR additionally charges overnight jumps to the day
    that gapped).  Simple mean rather than Wilder's recursive smoothing
    keeps every published number a pure integer ratio.

    Exactness: cents BIGINT end-to-end; the day close is rn = 1 over
    the (ts, event_id) DESC total order (q97's bucket-close rule), TR
    is integer GREATEST/ABS, the mean is ratio_e4.  Shape: one
    (symbol, day) exchange carries the close row-number pass AND the
    hi/lo agg; the day-over-day lag runs on the day grid (orders of
    magnitude smaller than the tape) partitioned by symbol; the final
    agg is |symbols| rows.  The day rides as a 4-byte DATE (the q109
    rule — never a per-row string)."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        "ts",
        "event_id",
        cents("value").alias("c"),
    )
    w = Window.partitionBy("event_type", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    day = (
        b.withColumn("rn", F.row_number().over(w))
        .groupBy("event_type", "d")
        .agg(
            F.max("c").alias("hi"),
            F.min("c").alias("lo"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("cl"),
        )
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    lagd = day.withColumn("pcl", F.lag("cl").over(wd)).where(
        F.col("pcl").isNotNull()
    )
    tr = lagd.select(
        "event_type",
        F.greatest(
            F.col("hi") - F.col("lo"),
            F.abs(F.col("hi") - F.col("pcl")),
            F.abs(F.col("lo") - F.col("pcl")),
        ).alias("t"),
    )
    return (
        tr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("t").alias("sum_t"),
            (F.max("t") / 100.0).alias("max_tr"),
        )
        .select(
            "event_type",
            "n_days",
            ratio_e4("sum_t", "100 * n_days").alias("atr"),
            "max_tr",
        )
    )
