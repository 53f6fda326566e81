"""Round-6 microstructure / technical-indicator depth (q154-q158):
Amihud illiquidity, order-flow imbalance, Bollinger-band and Donchian-
channel breakout screens, and a multi-lag autocorrelation table.

All five ride the catalog's one natural shuffle (symbol-keyed window or
hash-agg) and decide every published number in exact integer arithmetic
— prices as BIGINT cents (`deterministic.cents`), band/breakout
comparisons as integer cross-multiplications, correlations assembled
from BIGINT moment sums so both engines evaluate the identical float
expression on identical integers.  Reference parity: the reference
stops at OHLC-style scans (`timeseries_db.cpp:170-233`); these are the
market-microstructure layer SURVEY §2.2 scopes on top.

Window discipline: bounded trailing frames (ROWS k PRECEDING) are
O(k)/row and stream within the per-symbol sort; no growing-tail frames
(the repo's UNBOUNDED-PRECEDING-only rule applies to unbounded passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query
from .prefix import hour_bucket, keyed_prefix

# Shared oracle fragment: per-symbol lagged cents in (ts, event_id) order.
_LAGC_SQL = """s AS (
    SELECT event_type, ts, user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS c,
           lag(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS pc
    FROM events)"""


def _lagc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _LAGC_SQL, routed through the keyed two-pass
    prefix (:func:`..prefix.keyed_prefix`) so the lag parallelism
    scales with cores, not min(#symbols, #cores) — the r7 tape-soak
    finding (see tsdb_ext._lagged); results are bit-identical."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", "ts", "event_id", "user_id",
        cents("value").alias("c"),
    )
    return keyed_prefix(
        base, ["event_type"], ["ts", "event_id"],
        bucket=hour_bucket("ts"), lags={"pc": "c"},
    ).select("event_type", "ts", "user_id", "c", "pc")


@query(
    "q154_amihud_illiquidity",
    oracle=f"""
    WITH {_LAGC_SQL},
    agg AS (
      SELECT event_type,
             CAST(SUM(abs(c - pc)) AS BIGINT) AS move_c,
             CAST(SUM(c * user_id) AS BIGINT) AS dollar_u,
             CAST(COUNT(*) AS BIGINT) AS n_ticks
      FROM s WHERE pc IS NOT NULL GROUP BY 1)
    SELECT event_type, n_ticks, move_c, dollar_u,
           (CAST(move_c AS HUGEINT) * 1000000000 * 20000 + dollar_u)
             // (2 * dollar_u) / 10000.0 AS illiq_e4
    FROM agg WHERE dollar_u > 0
    """,
    category="timeseries-microstructure",
)
def q154_amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud-style illiquidity per symbol: total absolute price movement
    per unit of dollar volume traded — the classic price-impact proxy
    (|return| over volume), assembled here as ONE exact ratio per symbol
    instead of a mean of per-tick float ratios: sum|Δprice_cents| and
    sum(price_cents x volume) aggregate as exact BIGINTs and divide once
    (scaled by 1e9 so the 4-decimal output has resolution), so no float
    division ever compounds.  Symbols with zero traded dollar volume are
    excluded (the measure is undefined there).

    Shape: the q86/q88 template — one symbol-keyed window pass, one
    hash-agg with map-side partials, symbol-bounded output."""
    lag = _lagc(spark, sf_dir)
    agg = (
        lag.where(F.col("pc").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(F.abs(F.col("c") - F.col("pc"))).alias("move_c"),
            F.sum(F.col("c") * F.col("user_id")).alias("dollar_u"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .where(F.col("dollar_u") > 0)
    )
    return agg.select(
        "event_type",
        "n_ticks",
        "move_c",
        "dollar_u",
        # widen BEFORE the 1e9 scale-up: BIGINT move_c * 1e9 can pass
        # int64 range on big tapes (ratio_e4's DECIMAL cast happens
        # after its num_sql evaluates)
        ratio_e4(
            "CAST(move_c AS DECIMAL(38,0)) * 1000000000", "dollar_u"
        ).alias("illiq_e4"),
    )


@query(
    "q155_order_flow_imbalance",
    oracle=f"""
    WITH {_LAGC_SQL}
    SELECT event_type, date_trunc('minute', ts) AS minute,
           CAST(SUM(CASE WHEN c > pc THEN user_id
                         WHEN c < pc THEN -user_id ELSE 0 END) AS BIGINT)
             AS ofi,
           CAST(SUM(user_id) AS BIGINT) AS total_volume,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM s WHERE pc IS NOT NULL
    GROUP BY 1, 2
    """,
    category="timeseries-microstructure",
)
def q155_order_flow_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-flow imbalance per (symbol, minute): tick-rule signed volume
    (uptick buys minus downtick sells — q88's classification applied to
    size) next to total volume, the imbalance series execution studies
    regress price impact on.

    Exactness: classification compares exact cents; the signed sum is
    pure BIGINT.  Shape: window pass + hash-agg, both keyed by symbol;
    minute bucketing is in-row; output is symbol x active-minutes."""
    lag = _lagc(spark, sf_dir)
    signed = (
        F.when(F.col("c") > F.col("pc"), F.col("user_id"))
        .when(F.col("c") < F.col("pc"), -F.col("user_id"))
        .otherwise(F.lit(0))
    )
    return (
        lag.where(F.col("pc").isNotNull())
        .groupBy(
            "event_type", F.date_trunc("minute", "ts").alias("minute")
        )
        .agg(
            F.sum(signed).cast("bigint").alias("ofi"),
            F.sum("user_id").cast("bigint").alias("total_volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


# Bollinger window: trailing 20 ticks (inclusive), 2-sigma bands.
_BOLL_N = 20


@query(
    "q156_bollinger_breakouts",
    oracle=f"""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_type, c,
             SUM(c) OVER win AS s,
             SUM(c * c) OVER win AS q,
             COUNT(*) OVER win AS n
      FROM c
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN ({_BOLL_N} * c - s) > 0
                          AND ({_BOLL_N} * c - s) * ({_BOLL_N} * c - s)
                              > 4 * ({_BOLL_N} * q - s * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS upper_breaks,
           CAST(SUM(CASE WHEN ({_BOLL_N} * c - s) < 0
                          AND ({_BOLL_N} * c - s) * ({_BOLL_N} * c - s)
                              > 4 * ({_BOLL_N} * q - s * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS lower_breaks
    FROM w WHERE n = {_BOLL_N}
    GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q156_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout screen: per symbol, how many ticks closed
    outside the 2-sigma band of their own trailing 20-tick window.

    Exactness: the band test |c - mean| > 2·sigma is decided entirely in
    BIGINT — square both sides and cross-multiply by n²:
    (n·c - s)² > 4·(n·q - s²), where s and q are the window's exact
    cents sum and sum of squares.  No float mean, sigma, or sqrt ever
    exists, so the classification cannot drift between engines.

    Shape: ONE bounded trailing frame (ROWS 19 PRECEDING) inside the
    per-symbol sort — O(1) amortized per row, streams at 100 TB; the
    final count is a symbol-bounded hash-agg."""
    ev = table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_BOLL_N - 1), Window.currentRow)
    )
    c = cents("value")
    w = ev.select(
        "event_type",
        c.alias("c"),
        F.sum(c).over(win).alias("s"),
        F.sum(c * c).over(win).alias("q"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).where(F.col("n") == _BOLL_N)
    dev = _BOLL_N * F.col("c") - F.col("s")
    wide = dev * dev > 4 * (_BOLL_N * F.col("q") - F.col("s") * F.col("s"))
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when((dev > 0) & wide, 1).otherwise(0))
        .cast("bigint")
        .alias("upper_breaks"),
        F.sum(F.when((dev < 0) & wide, 1).otherwise(0))
        .cast("bigint")
        .alias("lower_breaks"),
    )


# Donchian window: the 20 ticks BEFORE the current one.
_DON_N = 20


@query(
    "q157_donchian_breakouts",
    oracle=f"""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_type, c,
             MAX(c) OVER win AS hi,
             MIN(c) OVER win AS lo,
             COUNT(*) OVER win AS n
      FROM c
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN {_DON_N} PRECEDING AND 1 PRECEDING))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS new_highs,
           CAST(SUM(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT)
             AS new_lows
    FROM w WHERE n = {_DON_N}
    GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q157_donchian_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian-channel breakout screen: per symbol, ticks printing
    strictly above the high (below the low) of the prior 20 ticks — the
    channel-breakout signal trend systems trade.

    Exactness: pure integer MIN/MAX comparisons on cents.  Shape: one
    bounded trailing frame EXCLUDING the current row (ROWS BETWEEN 20
    PRECEDING AND 1 PRECEDING) in the per-symbol sort; symbol-bounded
    agg."""
    ev = table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_DON_N, -1)
    )
    c = cents("value")
    w = ev.select(
        "event_type",
        c.alias("c"),
        F.max(c).over(win).alias("hi"),
        F.min(c).over(win).alias("lo"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).where(F.col("n") == _DON_N)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_highs"),
        F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_lows"),
    )


# ACF lags published per symbol.
_ACF_LAGS = (1, 2, 3, 5, 10)


@query(
    "q158_price_acf",
    oracle=f"""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events),
    lagged AS (
      SELECT event_type, c AS x,
             {', '.join(
                 f'lag(c, {k}) OVER (PARTITION BY event_type '
                 f'ORDER BY ts, event_id) AS y{k}' for k in _ACF_LAGS)}
      FROM c),
    stacked AS (
      {' UNION ALL '.join(
          f"SELECT event_type, CAST({k} AS BIGINT) AS lag_k, x, y{k} AS y "
          f"FROM lagged WHERE y{k} IS NOT NULL" for k in _ACF_LAGS)}),
    m AS (
      SELECT event_type, lag_k,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM stacked GROUP BY 1, 2)
    SELECT event_type, lag_k, n,
           ROUND((n * sxy - sx * sy) /
                 sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                      * CAST((n * syy - sy * sy) AS DOUBLE)), 4) AS r
    FROM m
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
    category="timeseries-similarity",
)
def q158_price_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation table: per symbol, the price-series Pearson
    autocorrelation at lags 1, 2, 3, 5 and 10 ticks — the
    mean-reversion / momentum fingerprint (and the serial-dependence
    diagnostic behind the q103 Roll-spread estimator).

    Exactness: the five moment sums (n, Σx, Σy, Σxy, Σx², Σy²)
    aggregate as exact BIGINTs — order-independent at any parallelism —
    and the correlation is ONE scalar float expression per output row
    evaluated on those identical integers, so both engines compute the
    identical double (a float corr() aggregate would merge partials in
    engine-specific order instead).  Degenerate series (zero variance on
    either side) are excluded exactly.

    Shape: ONE window pass computes all five lags (shared symbol sort),
    an in-row stack melts them to (symbol, lag) pairs, one hash-agg
    finishes — shuffle count is independent of the lag count."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    c = cents("value")
    lagged = ev.select(
        "event_type",
        c.alias("x"),
        *[F.lag(c, k).over(w).alias(f"y{k}") for k in _ACF_LAGS],
    )
    stack = ", ".join(f"CAST({k} AS BIGINT), y{k}" for k in _ACF_LAGS)
    stacked = lagged.selectExpr(
        "event_type",
        "x",
        f"stack({len(_ACF_LAGS)}, {stack}) AS (lag_k, y)",
    ).where(F.col("y").isNotNull())
    m = stacked.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.where((vx > 0) & (vy > 0))
        .select(
            "event_type",
            "lag_k",
            "n",
            F.round(
                cov / F.sqrt(vx.cast("double") * vy.cast("double")), 4
            ).alias("r"),
        )
    )


@query(
    "q161_kyle_lambda",
    oracle=f"""
    WITH {_LAGC_SQL},
    fl AS (
      SELECT event_type,
             (CASE WHEN c > pc THEN user_id
                   WHEN c < pc THEN -user_id ELSE 0 END) AS x,
             c - pc AS y
      FROM s WHERE pc IS NOT NULL),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM fl GROUP BY 1)
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) /
                 CAST(n * sxx - sx * sx AS DOUBLE), 6) AS lambda_cents
    FROM m WHERE (n * sxx - sx * sx) > 0
    """,
    category="timeseries-microstructure",
)
def q161_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kyle's lambda per symbol: the OLS slope of tick price change
    (cents) on tick-rule signed volume — the price-impact coefficient
    ("how many cents does one unit of net flow move the price"), the
    regression behind execution-cost models and the fourth member of
    the microstructure family (q103 Roll spread = autocovariance,
    q154 Amihud = |move|/dollar, q155 OFI = the regressor itself).

    Exactness: the q158 moment discipline — n, Σx, Σy, Σxy, Σx²
    aggregate as exact BIGINTs (order-independent at any parallelism),
    and the slope is ONE float expression per symbol evaluated on those
    identical integers; zero-variance flow (no signed volume at all) is
    excluded by an integer test.

    Shape: the shared _lagc symbol-keyed window pass + one
    symbol-bounded hash-agg — one shuffle total."""
    lag = _lagc(spark, sf_dir)
    x = (
        F.when(F.col("c") > F.col("pc"), F.col("user_id"))
        .when(F.col("c") < F.col("pc"), -F.col("user_id"))
        .otherwise(F.lit(0))
    )
    y = F.col("c") - F.col("pc")
    m = (
        lag.where(F.col("pc").isNotNull())
        .select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.where(varx > 0)
        .select(
            "event_type",
            "n",
            F.round(cov / varx.cast("double"), 6).alias("lambda_cents"),
        )
    )


# VPIN bucket size (raw units of the size column; smaller than q165's
# 100k so the small fixtures close several buckets per symbol).
_VPIN_V = 20_000


@query(
    "q177_vpin",
    oracle=f"""
    WITH s AS (
      SELECT event_type, ts, event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c,
             lag(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS pc,
             SUM(user_id) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    b AS (
      SELECT event_type, (cum - user_id) // {_VPIN_V} AS bar_id,
             user_id,
             CASE WHEN c > pc THEN user_id
                  WHEN c < pc THEN -user_id ELSE 0 END AS sv
      FROM s),
    bars AS (
      SELECT event_type, bar_id,
             abs(SUM(sv)) AS oi, SUM(user_id) AS vol
      FROM b GROUP BY 1, 2)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(vol) AS BIGINT) AS total_volume,
           (SUM(oi) * 20000 + SUM(vol)) // (2 * SUM(vol)) / 10000.0
             AS vpin,
           CAST(SUM(CASE WHEN oi * 5 > vol * 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS toxic_buckets
    FROM bars GROUP BY 1
    """,
    category="timeseries-microstructure",
)
def q177_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VPIN (volume-synchronized probability of informed trading): the
    tape re-bucketed by cumulative size (q165's volume clock), each
    bucket scoring |tick-rule signed volume| / volume (q155's signing),
    reported per symbol as the volume-weighted toxicity ratio plus the
    count of buckets past the 0.4 toxicity bar — the flow-toxicity
    monitor market makers pull quotes on.

    Exactness: signing compares exact cents (the first tick's NULL lag
    signs 0 via identical CASE/NULL semantics), bucket ids are integer
    division of the BIGINT volume prefix, |OI| and volumes are integer,
    the headline ratio is ratio_e4 over sums, and the toxicity
    threshold is the cross-multiply 5·|oi| > 2·vol.  Shape: ONE
    symbol-keyed sort carries the lag AND the volume prefix (shared
    window frame family), both aggregates ride the same symbol
    partitioning — one exchange end to end, |symbols|-row output."""
    ev = table(spark, sf_dir, "events")
    c = cents("value")
    # lag AND volume prefix from ONE keyed two-pass (shared range sort,
    # core-scaled parallelism — see _lagc / ..prefix.keyed_prefix)
    s = keyed_prefix(
        ev.select(
            "event_type", "ts", "event_id", "user_id", c.alias("c")
        ),
        ["event_type"],
        ["ts", "event_id"],
        bucket=hour_bucket("ts"),
        lags={"pc": "c"},
        cumsums={"cum": "user_id"},
    ).select("event_type", "user_id", "c", "pc", "cum")
    sv = (
        F.when(F.col("c") > F.col("pc"), F.col("user_id"))
        .when(F.col("c") < F.col("pc"), -F.col("user_id"))
        .otherwise(F.lit(0))
    )
    b = s.select(
        "event_type",
        F.expr(f"(cum - user_id) div {_VPIN_V}").alias("bar_id"),
        "user_id",
        sv.alias("sv"),
    )
    bars = b.groupBy("event_type", "bar_id").agg(
        F.abs(F.sum("sv")).alias("oi"),
        F.sum("user_id").alias("vol"),
    )
    return (
        bars.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("oi").alias("sum_oi"),
            F.sum("vol").cast("bigint").alias("total_volume"),
            F.sum(
                F.when(F.col("oi") * 5 > F.col("vol") * 2, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("toxic_buckets"),
        )
        .select(
            "event_type",
            "n_buckets",
            "total_volume",
            ratio_e4("sum_oi", "total_volume").alias("vpin"),
            "toxic_buckets",
        )
    )
