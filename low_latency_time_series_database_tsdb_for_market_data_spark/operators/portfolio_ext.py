"""Portfolio/market-structure depth operators (q117-q120): serial
dependence, venue concentration, price-level clustering, event-study
alignment.

Same determinism discipline as quality_ext: prices live as exact integer
cents from the first map, every reported ratio is the integer-decided
4-decimal helper, and the only doubles crossing an aggregation boundary
are (a) corr's mergeable moments over exact-integer inputs rounded to 4
decimals — the q77 precedent, re-checked by the shuffle-partition
invariance sweep — and (b) one IEEE division both engines perform on the
same exact integers.  Every shuffle keys on the natural 100 TB partition
column (symbol / day / user), and every output is dimension-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query

_HOUR_US = 3_600_000_000


@query(
    "q117_flow_autocorr",
    oracle="""
    WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
                      SUM(CAST(ROUND(value*100) AS BIGINT)) AS s
               FROM events GROUP BY 1, 2),
    p AS (SELECT event_type, s,
                 lag(s) OVER (PARTITION BY event_type ORDER BY h) AS ps
          FROM b)
    SELECT event_type, CAST(COUNT(ps) AS BIGINT) AS n_pairs,
           ROUND(corr(s, ps), 4) AS r
    FROM p WHERE ps IS NOT NULL GROUP BY 1
    """,
    category="timeseries-similarity",
)
def q117_flow_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each symbol's hourly dollar flow — the
    persistence screen (momentum vs mean-reversion at the 1-hour
    horizon) that complements q77's CROSS-symbol correlation matrix and
    q101's directed lead-lag with the symbol's own serial dependence.

    Exactness: hourly flows are exact BIGINT cents sums; corr over those
    integers is single-pass mergeable moments rounded to 4 decimals
    (the q77 precedent — held under the partition-count invariance
    sweep).  Shape: one hash-agg to symbol x hour (map-side partials),
    one symbol-keyed window for the lag, one final agg to |symbols|
    rows.  The window input is already bucket-sized, not tick-sized."""
    ev = table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(cents("value")).alias("s"))
    w = Window.partitionBy("event_type").orderBy("h")
    p = b.select("event_type", "s", F.lag("s").over(w).alias("ps")).where(
        F.col("ps").isNotNull()
    )
    return p.groupBy("event_type").agg(
        F.count("ps").alias("n_pairs"),
        F.round(F.corr("s", "ps"), 4).alias("r"),
    )


@query(
    "q118_turnover_hhi",
    oracle="""
    WITH s AS (SELECT date_trunc('day', ts) AS d, event_type,
                      SUM(CAST(ROUND(value*100) AS BIGINT)) AS su
               FROM events GROUP BY 1, 2),
    sh AS (SELECT d, event_type, su,
                  (su * 20000 + SUM(su) OVER (PARTITION BY d))
                    // (2 * SUM(su) OVER (PARTITION BY d)) AS share_bp
           FROM s)
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n_symbols,
           CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi_e8,
           CAST(MAX(share_bp) AS BIGINT) AS top_share_bp
    FROM sh GROUP BY d
    """,
    category="timeseries-profile",
)
def q118_turnover_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily turnover concentration: the Herfindahl-Hirschman index of
    dollar-volume share across symbols (1e8 = single-symbol monopoly),
    plus the top symbol's share — the is-flow-concentrating screen used
    for venue health and index-rebalance detection.

    Exactness: shares are integer-decided basis-point-of-e4 units
    (floor((su*2e4+tot)/(2*tot)) — the ratio_e4 integer BEFORE its final
    division), so HHI = sum of integer squares is an exact BIGINT on
    both engines.  Shape: one hash-agg to day x symbol, a day-keyed
    window over that dimension-sized table for the total, one final agg
    to |days| rows."""
    ev = table(spark, sf_dir, "events")
    s = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.sum(cents("value")).alias("su"))
    wd = Window.partitionBy("d")
    sh = s.select(
        "d",
        F.sum("su").over(wd).alias("tot"),
        "su",
    ).select(
        "d",
        F.expr(
            "((CAST(su AS DECIMAL(38,0)) * 20000"
            " + CAST(tot AS DECIMAL(38,0)))"
            " div (2 * CAST(tot AS DECIMAL(38,0))))"
        )
        .cast("bigint")
        .alias("share_bp"),
    )
    return sh.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_symbols"),
        F.sum(F.col("share_bp") * F.col("share_bp"))
        .cast("bigint")
        .alias("hhi_e8"),
        F.max("share_bp").cast("bigint").alias("top_share_bp"),
    )


@query(
    "q119_price_ending_digits",
    oracle="""
    WITH c AS (SELECT event_type,
                      CAST(ROUND(value*100) AS BIGINT) % 10 AS digit
               FROM events)
    SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n,
           (COUNT(*) * 20000 + SUM(COUNT(*)) OVER (PARTITION BY event_type))
             // (2 * SUM(COUNT(*)) OVER (PARTITION BY event_type))
             / 10000.0 AS share_e4
    FROM c GROUP BY event_type, digit
    """,
    category="timeseries-quality",
)
def q119_price_ending_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-ending-digit clustering: the distribution of the final
    cents digit per symbol.  Round-number clustering (excess mass on 0
    and 5) is the classic microstructure fingerprint of human limit
    orders and coarse tick grids; a uniform tail is what synthetic or
    sub-penny flow looks like.  Complements q104's leading-digit
    (Benford) screen at the other end of the number.

    Exactness: digits are exact integer cents mod 10 (values are
    nonnegative, so both engines' % agree); shares are integer-decided.
    Shape: narrow map into one hash-agg keyed by (symbol, digit) — at
    most 10 x |symbols| cells — then a symbol-keyed window over those
    cells for the denominator."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.select(
            "event_type", (cents("value") % 10).alias("digit")
        )
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type")
    return g.select(
        "event_type",
        "digit",
        "n",
        F.sum("n").over(wt).alias("tot"),
    ).select(
        "event_type", "digit", "n", ratio_e4("n", "tot").alias("share_e4")
    )


@query(
    "q120_event_study",
    oracle=f"""
    WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events),
    a AS (SELECT *, MIN(CASE WHEN event_type = 'signup' THEN us END)
                      OVER (PARTITION BY user_id) AS t0
          FROM t)
    SELECT CAST(FLOOR((us - t0) / {_HOUR_US}.0) AS BIGINT) AS rel_hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           (SUM(c) * 20000 + 100 * COUNT(*)) // (2 * 100 * COUNT(*))
             / 10000.0 AS avg_value
    FROM a
    WHERE t0 IS NOT NULL
      AND FLOOR((us - t0) / {_HOUR_US}.0) BETWEEN -72 AND 72
    GROUP BY 1
    """,
    category="timeseries-eventstudy",
)
def q120_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study alignment: every user's activity re-indexed to hours
    relative to their FIRST 'signup' event, averaged across users — the
    did-the-treatment-change-behavior curve (abnormal activity around
    an anchor event) that every A/B and announcement study starts from.

    The anchor is a conditional MIN window over the user partition — no
    self-join, one window pass finds each user's t0 and aligns their
    whole history in the same pass.  rel_hour = floor((us-t0)/3.6e9):
    the quotient's granularity (1/3.6e9) exceeds half-ulp at |rel| <=
    72 by four orders of magnitude, so the IEEE division can only land
    on an integer when the quotient IS exact — floor is engine-identical
    (both sides divide the same exact integers in the same double op).

    Shape: one user-keyed window pass (the 100 TB partition key for
    behavioral data) + one hash-agg to <= 145 output rows."""
    ev = table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    us = F.unix_micros("ts")
    a = ev.select(
        "user_id",
        us.alias("us"),
        cents("value").alias("c"),
        F.min(F.when(F.col("event_type") == "signup", us))
        .over(wu)
        .alias("t0"),
    )
    rel = F.floor((F.col("us") - F.col("t0")) / F.lit(float(_HOUR_US)))
    return (
        a.where(F.col("t0").isNotNull() & rel.between(-72, 72))
        .groupBy(rel.cast("bigint").alias("rel_hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("sum_c"))
        .select(
            "rel_hour",
            "n",
            ratio_e4("sum_c", "100 * n").alias("avg_value"),
        )
    )


@query(
    "q133_value_deciles",
    oracle="""
    WITH c AS (SELECT event_type, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events),
    t AS (SELECT event_type, c,
                 NTILE(10) OVER (PARTITION BY event_type
                                 ORDER BY c, event_id) AS decile
          FROM c)
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(c) / 100.0 AS lo,
           MAX(c) / 100.0 AS hi,
           (SUM(c) * 20000 + 100 * COUNT(*)) // (2 * 100 * COUNT(*))
             / 10000.0 AS avg_value
    FROM t GROUP BY 1, 2
    """,
    category="timeseries-profile",
)
def q133_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol decile table of tick prices: bucket boundaries, counts
    and integer-decided means — the distribution summary behind limit
    placement and fee-tier analytics, finishing the rank-function family
    (row_number q31, rank/dense q31, cume/range q33) with NTILE.

    NTILE's remainder rule (earlier buckets one larger) is ANSI on both
    engines, and the (cents, event_id) total order makes every bucket
    assignment deterministic.  Shape: ONE symbol-keyed window sort + one
    (symbol, decile) hash-agg under the same partitioning — a single
    exchange, 10 x |symbols| output rows."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    t = ev.select(
        "event_type", "event_id", cents("value").alias("c")
    ).withColumn("decile", F.ntile(10).over(w).cast("bigint"))
    return (
        t.groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("c") / 100.0).alias("lo"),
            (F.max("c") / 100.0).alias("hi"),
            F.sum("c").alias("sum_c"),
        )
        .select(
            "event_type",
            "decile",
            "n",
            "lo",
            "hi",
            ratio_e4("sum_c", "100 * n").alias("avg_value"),
        )
    )


@query(
    "q134_trimmed_mean",
    oracle="""
    WITH c AS (SELECT event_type, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events),
    r AS (SELECT event_type, c,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY c, event_id) AS i,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM c)
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_ticks,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           (SUM(CASE WHEN 100*i > 5*n AND 100*i <= 95*n THEN c END)
              * 20000
              + 100 * SUM(CASE WHEN 100*i > 5*n AND 100*i <= 95*n
                               THEN 1 ELSE 0 END))
             // (2 * 100 * SUM(CASE WHEN 100*i > 5*n AND 100*i <= 95*n
                                    THEN 1 ELSE 0 END)) / 10000.0
             AS trimmed_avg
    FROM r GROUP BY event_type
    """,
    category="timeseries-robust",
)
def q134_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-95% trimmed mean price per symbol — the robust location
    estimate that ignores fat-finger tails without q93's MAD machinery;
    the keep decision is the integer cross-multiplication
    100·rank ∈ (5·n, 95·n], so no percentile doubles ever exist.

    n_kept counts the trimmed interior; n_ticks the full tape.  Shape:
    one symbol-keyed window pass (rank + count share the sort) and one
    hash-agg under the same key — a single exchange.

    Note the count quirk both engines share: n_kept is COUNT(*) of ALL
    rows (the report keeps one row per symbol), while the average's
    denominator counts only the kept interior — the CASE keeps the two
    separable in one aggregation."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("event_type").orderBy("c", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type", "event_id", cents("value").alias("c")
    ).select(
        "event_type",
        "c",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    keep = (100 * F.col("i") > 5 * F.col("n")) & (
        100 * F.col("i") <= 95 * F.col("n")
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_ticks"),
            F.count(F.lit(1)).alias("n_kept_all"),
            F.sum(F.when(keep, F.col("c"))).alias("kept_c"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("kept_n"),
        )
        .select(
            "event_type",
            "n_ticks",
            F.col("n_kept_all").alias("n_kept"),
            ratio_e4("kept_c", "100 * kept_n").alias("trimmed_avg"),
        )
    )


@query(
    "q141_market_profile",
    oracle="""
    WITH c AS (SELECT event_type,
                      CAST(ROUND(value*100) AS BIGINT) // 1000 AS bin
               FROM events),
    g AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
          FROM c GROUP BY 1, 2),
    r AS (SELECT event_type, bin, n,
                 SUM(n) OVER (PARTITION BY event_type) AS tot,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY n DESC, bin) AS rk
          FROM g)
    SELECT event_type, bin, n,
           (n * 20000 + tot) // (2 * tot) / 10000.0 AS share_e4,
           CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_poc
    FROM r
    """,
    category="timeseries-profile",
)
def q141_market_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market profile: per symbol, the tick-count distribution across
    $10 price bins with the point of control flagged (the modal bin —
    ties to the LOWER bin via the (n DESC, bin) total order) — the
    where-does-this-symbol-trade histogram behind value-area analytics.

    Exactness: bins are integer cents floor-division (values
    nonnegative), shares integer-decided, the POC a deterministic
    row_number.  Shape: narrow bin map, one (symbol, bin) hash-agg,
    then symbol-keyed windows over the bin-bounded cells."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.select(
            "event_type",
            F.expr(
                "CAST(ROUND(value*100) AS BIGINT) div 1000"
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ws = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.desc("n"), "bin")
    return g.select(
        "event_type",
        "bin",
        "n",
        F.sum("n").over(ws).alias("tot"),
        F.row_number().over(wr).alias("rk"),
    ).select(
        "event_type",
        "bin",
        "n",
        ratio_e4("n", "tot").alias("share_e4"),
        F.when(F.col("rk") == 1, 1).otherwise(0).cast("bigint").alias(
            "is_poc"
        ),
    )


@query(
    "q144_flow_concentration",
    oracle="""
    WITH c AS (SELECT event_type, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events),
    r AS (SELECT event_type, c,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY c DESC, event_id) AS i,
                 COUNT(*) OVER (PARTITION BY event_type) AS n,
                 SUM(c) OVER (PARTITION BY event_type) AS tot
          FROM c),
    p AS (SELECT event_type, pct, n, tot,
                 SUM(CASE WHEN 100 * i <= pct * n THEN c ELSE 0 END) AS topc,
                 CAST(SUM(CASE WHEN 100 * i <= pct * n THEN 1 ELSE 0 END)
                      AS BIGINT) AS top_n
          FROM r CROSS JOIN (SELECT unnest([1, 5, 10, 25]) AS pct)
          GROUP BY event_type, pct, n, tot)
    SELECT event_type, CAST(pct AS BIGINT) AS pct, top_n,
           (topc * 20000 + tot) // (2 * tot) / 10000.0 AS share_e4
    FROM p
    """,
    category="timeseries-profile",
)
def q144_flow_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow concentration (Lorenz points): the share of each symbol's
    dollar volume carried by its top 1/5/10/25% largest ticks — the
    does-a-few-big-prints-dominate screen behind block-trade detection
    and q132's Gini, read at fixed quantile ranks.

    Exactness: membership in the top-p% is the integer
    cross-multiplication 100·rank <= p·n over the (value DESC,
    event_id) total order; shares integer-decided.  Shape: ONE
    symbol-keyed window sort (rank + count + total share the
    partitioning), a 4-way in-row threshold explode, one hash-agg to
    4 x |symbols| rows."""
    ev = table(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("c"), "event_id"
    )
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type", "event_id", cents("value").alias("c")
    ).select(
        "event_type",
        "c",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum("c").over(wn).alias("tot"),
    )
    x = r.select(
        "event_type",
        "c",
        "i",
        "n",
        "tot",
        F.explode(F.array(*[F.lit(p) for p in (1, 5, 10, 25)])).alias(
            "pct"
        ),
    )
    keep = 100 * F.col("i") <= F.col("pct") * F.col("n")
    return (
        x.groupBy("event_type", F.col("pct").cast("bigint").alias("pct"),
                  "n", "tot")
        .agg(
            F.sum(F.when(keep, F.col("c")).otherwise(0)).alias("topc"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias(
                "top_n"
            ),
        )
        .select(
            "event_type",
            "pct",
            "top_n",
            ratio_e4("topc", "tot").alias("share_e4"),
        )
    )


@query(
    "q145_interarrival_quartiles",
    oracle="""
    WITH s AS (SELECT event_type,
                      epoch_us(ts) - lag(epoch_us(ts)) OVER (
                          PARTITION BY event_type
                          ORDER BY ts, event_id) AS gap
               FROM events)
    SELECT event_type,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap, 0.25), 4) AS p25_us,
           ROUND(quantile_cont(gap, 0.50), 4) AS p50_us,
           ROUND(quantile_cont(gap, 0.75), 4) AS p75_us,
           CAST(MAX(gap) AS BIGINT) AS max_us
    FROM s WHERE gap IS NOT NULL GROUP BY 1
    """,
    category="timeseries-quality",
)
def q145_interarrival_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-tick arrival-time distribution per symbol: exact
    interpolated quartiles and the worst gap in microseconds — the
    feed-cadence profile that complements q87's threshold counts (how
    MANY gaps breached) with the shape of the whole distribution (what
    NORMAL spacing looks like).

    Exactness: gaps are exact epoch-micros integer differences over the
    (ts, event_id) total order; quartiles interpolate identically on
    both engines (q27/q143 precedent).  Shape: one symbol-keyed lag
    window + one percentile agg under the same key — single exchange."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    s = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    ps = F.percentile(
        "gap", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count("gap").alias("n_gaps"),
            ps.alias("ps"),
            F.max("gap").cast("bigint").alias("max_us"),
        )
        .select(
            "event_type",
            "n_gaps",
            *[
                F.round(F.col("ps")[i], 4).alias(f"p{p}_us")
                for i, p in enumerate((25, 50, 75))
            ],
            "max_us",
        )
    )


@query(
    "q146_weekday_seasonality",
    oracle="""
    WITH c AS (SELECT event_type,
                      CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events)
    SELECT event_type, weekday,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           (SUM(c) * 20000 + 100 * COUNT(*)) // (2 * 100 * COUNT(*))
             / 10000.0 AS avg_value,
           (COUNT(*) * 20000 + SUM(COUNT(*)) OVER (PARTITION BY event_type))
             // (2 * SUM(COUNT(*)) OVER (PARTITION BY event_type))
             / 10000.0 AS share_e4
    FROM c GROUP BY 1, 2
    """,
    category="timeseries-profile",
)
def q146_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per symbol: tick count, share of the
    week, and average price by weekday (0 = Monday on both engines:
    Spark `weekday` vs DuckDB `isodow - 1` — the one calendar function
    pair whose conventions differ and must be explicitly aligned) —
    the weekly complement to q96's hour-of-day profile.

    Shape: narrow weekday map, one (symbol, weekday) hash-agg, symbol
    window over <= 7 cells; all integer-decided."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.select(
            "event_type",
            F.weekday("ts").cast("bigint").alias("weekday"),
            cents("value").alias("c"),
        )
        .groupBy("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("c").alias("sum_c"),
        )
    )
    wt = Window.partitionBy("event_type")
    return g.select(
        "event_type",
        "weekday",
        "n_ticks",
        F.sum("n_ticks").over(wt).alias("tot"),
        "sum_c",
    ).select(
        "event_type",
        "weekday",
        "n_ticks",
        ratio_e4("sum_c", "100 * n_ticks").alias("avg_value"),
        ratio_e4("n_ticks", "tot").alias("share_e4"),
    )
