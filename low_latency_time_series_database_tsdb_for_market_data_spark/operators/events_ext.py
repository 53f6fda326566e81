"""Events-table depth operators (q96-q98): intraday seasonality profile,
the multi-resolution volatility signature, and the user conversion
funnel.

These widen the microstructure block (tsdb_ext, q86-q89/q93) with the
reporting layer a market-data warehouse serves on top of raw ticks:
when-in-the-day liquidity, how measured volatility changes with the
sampling interval, and ordered user-journey counts.  Same determinism
discipline as tsdb_ext: prices as exact integer cents, ratios decided in
integer arithmetic (functions.deterministic), total order (ts, event_id),
and every window keyed by the natural 100 TB partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query


@query(
    "q96_intraday_profile",
    oracle="""
    WITH b AS (SELECT event_type, EXTRACT(HOUR FROM ts) AS hour_of_day,
                      user_id, CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events)
    SELECT event_type, CAST(hour_of_day AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           (SUM(c) * 20000 + 100 * COUNT(*)) // (2 * 100 * COUNT(*))
               / 10000.0 AS avg_value,
           MIN(c) / 100.0 AS min_value,
           MAX(c) / 100.0 AS max_value
    FROM b GROUP BY event_type, hour_of_day
    """,
    category="timeseries-profile",
)
def q96_intraday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday seasonality profile: per symbol x hour-of-day, tick
    count, distinct active users, and the average/min/max price — the
    U-shaped-liquidity report every execution desk keeps, and the
    capacity input for partition sizing (hot hours get more ticks).

    Exactness: prices aggregate as integer cents; the hour average is
    integer-decided 4-decimal (ratio_e4); min/max report through one
    identical IEEE division.  Shape: a narrow map (hour + cents per
    row) into one hash-agg keyed by (symbol, hour) — map-side partials,
    single shuffle, 24 x |symbols| output rows at any corpus size."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.hour("ts").cast("bigint").alias("hour_of_day"),
            "user_id",
            cents("value").alias("c"),
        )
        .groupBy("event_type", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("c").alias("sum_c"),
            (F.min("c") / 100.0).alias("min_value"),
            (F.max("c") / 100.0).alias("max_value"),
        )
        .select(
            "event_type",
            "hour_of_day",
            "n_ticks",
            "n_users",
            ratio_e4("sum_c", "100 * n_ticks").alias("avg_value"),
            "min_value",
            "max_value",
        )
    )


# Volatility-signature sampling intervals (seconds): 1 min / 5 min / 15 min.
_SIG_WIDTHS = (60, 300, 900)


def _sig_block_sql(w: int) -> str:
    """One width's oracle block: bucket-close prices via ROW_NUMBER over
    the (ts, event_id) total order, then squared close-to-close moves."""
    return f"""
    SELECT event_type, CAST({w} AS BIGINT) AS width_s,
           CAST(COUNT(*) AS BIGINT) AS n_returns,
           CAST(SUM((c - pc) * (c - pc)) AS BIGINT) AS rv
    FROM (
        SELECT event_type, c,
               lag(c) OVER (PARTITION BY event_type ORDER BY b) AS pc
        FROM (
            SELECT event_type, b, c,
                   row_number() OVER (PARTITION BY event_type, b
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM (SELECT event_type, ts, event_id,
                         epoch_us(ts) // {w * 1_000_000} AS b,
                         CAST(ROUND(value * 100) AS BIGINT) AS c
                  FROM events)
        ) WHERE rn = 1
    ) WHERE pc IS NOT NULL
    GROUP BY event_type
    """


@query(
    "q97_vol_signature",
    oracle=" UNION ALL ".join(_sig_block_sql(w) for w in _SIG_WIDTHS),
    category="timeseries-microstructure",
)
def q97_vol_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatility signature: realized variance per symbol recomputed at
    1/5/15-minute sampling from bucket CLOSE prices — how measured
    volatility inflates as sampling approaches tick frequency
    (microstructure noise), the standard plot for choosing an RV
    sampling interval.  Complements q86, which samples every tick.

    Exactness: closes are integer cents picked by ROW_NUMBER over the
    (ts, event_id) total order (arg-max by timestamp would need a
    portable composite-key tie rule; row_number pins it identically in
    both engines); bucket ids are INTEGER division of epoch micros
    (double division could misfloor an exact boundary); rv stays in
    cents^2 integers, sqrt-free.

    Shape: ONE scan — the three widths fan out in-row (explode over a
    3-element literal array, 3x row count before the first exchange),
    then one shuffle to (symbol, width, bucket) for the close pick
    (rn = 1 compiles to WindowGroupLimit — map-side heaps below the
    exchange), one to (symbol, width) for the close-to-close lag, and
    the final agg rides the lag partitioning.  Two exchanges total, and
    everything past the pick is |symbols| x buckets rows — the
    per-width-branch alternative scans the corpus three times."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        us.alias("us"),
        cents("value").alias("c"),
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(w).cast("bigint") for w in _SIG_WIDTHS])
        ).alias("width_s"),
    ).select(
        "event_type",
        "ts",
        "event_id",
        "width_s",
        # floor division via pmod (q175's rule): DuckDB `//` floors,
        # Spark `div` truncates toward zero — they diverge pre-epoch
        F.expr(
            "(us - pmod(us, width_s * 1000000)) div (width_s * 1000000)"
        ).alias("b"),
        "c",
    )
    pick = Window.partitionBy("event_type", "width_s", "b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    closes = (
        base.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select("event_type", "width_s", "b", "c")
    )
    lagw = Window.partitionBy("event_type", "width_s").orderBy("b")
    r = closes.select(
        "event_type", "width_s", "c", F.lag("c").over(lagw).alias("pc")
    ).where(F.col("pc").isNotNull())
    dlt = F.col("c") - F.col("pc")
    return (
        r.groupBy("event_type", "width_s")
        .agg(
            F.count(F.lit(1)).alias("n_returns"),
            F.sum(dlt * dlt).cast("bigint").alias("rv"),
        )
        .select("event_type", "width_s", "n_returns", "rv")
    )


# Funnel stage definitions: strictly-later chaining over event micros.
_FUNNEL = ("view", "click", "purchase")


@query(
    "q98_user_funnel",
    oracle=f"""
    WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    a AS (SELECT *, MIN(CASE WHEN event_type = '{_FUNNEL[0]}' THEN us END)
                    OVER (PARTITION BY user_id) AS t1 FROM s),
    b AS (SELECT *, MIN(CASE WHEN event_type = '{_FUNNEL[1]}' AND us > t1
                             THEN us END)
                    OVER (PARTITION BY user_id) AS t2 FROM a),
    c AS (SELECT *, MIN(CASE WHEN event_type = '{_FUNNEL[2]}' AND us > t2
                             THEN us END)
                    OVER (PARTITION BY user_id) AS t3 FROM b),
    u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
          FROM c GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t1) AS BIGINT) AS n_stage1,
           CAST(COUNT(t2) AS BIGINT) AS n_stage2,
           CAST(COUNT(t3) AS BIGINT) AS n_stage3
    FROM u
    """,
    category="events-analytics",
)
def q98_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: per user,
    the earliest view, the earliest click STRICTLY AFTER that view, and
    the earliest purchase strictly after that click (min-chaining — the
    standard funnel semantics that a naive per-type min gets wrong when
    a user purchases before ever viewing).

    Exactness: all comparisons on epoch-microsecond integers.

    Shape: three unpartitioned-ORDER-free window passes all keyed by
    user_id — Spark plans ONE exchange and chains the Window nodes —
    then a per-user agg on the same key (no new shuffle) and a single-row
    global fold.  At 100 TB this is one user-keyed shuffle total, and
    user_id is the natural bucketing key for the events table."""
    return funnel_counts(table(spark, sf_dir, "events"))


def funnel_counts(ev: DataFrame) -> DataFrame:
    """q98 as a reusable transform over any (user_id, event_type, ts)
    frame — the library form the property tests drive with hand-built
    journeys (a user who purchases before ever viewing must not convert)."""
    w = Window.partitionBy("user_id")
    us = F.unix_micros("ts")
    s = ev.select("user_id", "event_type", us.alias("us"))
    t1 = F.min(
        F.when(F.col("event_type") == _FUNNEL[0], F.col("us"))
    ).over(w)
    s = s.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == _FUNNEL[1]) & (F.col("us") > F.col("t1")),
            F.col("us"),
        )
    ).over(w)
    s = s.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == _FUNNEL[2]) & (F.col("us") > F.col("t2")),
            F.col("us"),
        )
    ).over(w)
    s = s.withColumn("t3", t3)
    u = s.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_stage1"),
        F.count("t2").alias("n_stage2"),
        F.count("t3").alias("n_stage3"),
    )


@query(
    "q170_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    t AS (SELECT prev_type, event_type AS next_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, next_type, n,
           (n * 20000 + SUM(n) OVER (PARTITION BY prev_type))
             // (2 * SUM(n) OVER (PARTITION BY prev_type)) / 10000.0
             AS row_share
    FROM t
    """,
    category="sequence-mining",
)
def q170_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behaviour: for every
    (previous event, next event) pair, the transition count and its
    row-normalized probability — the do-users-buy-after-clicking table
    behind recommendation and churn models, and the sequence-mining
    primitive the registry lacked.

    Exactness: counts are integers and the row share is the
    integer-decided e4 ratio over the per-prev row total.  Shape: ONE
    shuffle keyed by user_id (the natural 100 TB partition key) for the
    lag, one hash-agg to the |event_types|² matrix, and the
    row-normalizing window runs on that dim-bounded frame partitioned
    by prev_type — never a global window, never a second pass over the
    tape."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    t = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return t.withColumn("row_tot", F.sum("n").over(wp)).select(
        "prev_type",
        "next_type",
        "n",
        ratio_e4("n", "row_tot").alias("row_share"),
    )


@query(
    "q171_user_paths",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 3 GROUP BY user_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
    category="sequence-mining",
)
def q171_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top onboarding paths: each user's first three events joined into
    a path string, counted across the base, top 20 — the entry-funnel
    report product teams read next to q98's fixed funnel, and the
    second sequence-mining primitive (ordered prefix extraction).

    Exactness: paths are exact strings from the (ts, event_id) total
    order; counts are integers; the top-20 tie-breaks on the path
    string.  Shape: one user_id shuffle for the row numbers, the rn<=3
    filter compiles to a WindowGroupLimit (per-partition heaps keep 3
    rows per user — the tape never re-sorts), one hash-agg per user
    then per path, TakeOrderedAndProject for the top-20."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= 3)
    paths = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@query(
    "q175_user_burst_screen",
    oracle="""
    WITH m AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM events GROUP BY 1, 2),
    w AS (SELECT user_id, hr, c,
                 MAX(c) OVER (PARTITION BY user_id) AS mx
          FROM m),
    u AS (SELECT user_id,
                 SUM(c) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS active_hours,
                 MAX(c) AS peak,
                 MIN(CASE WHEN c = mx THEN hr END) AS peak_hr
          FROM w GROUP BY 1)
    SELECT user_id, CAST(tot AS BIGINT) AS n_events, active_hours,
           CAST(peak AS BIGINT) AS peak_hour_events,
           CAST(peak_hr AS BIGINT) AS peak_hour,
           (peak * active_hours * 20000 + tot) // (2 * tot) / 10000.0
             AS burst_ratio
    FROM u
    WHERE peak * active_hours * 10 > 20 * tot
    """,
    category="data-quality",
)
def q175_user_burst_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity burst screen: users whose busiest hour runs at
    more than 2x their own average active-hour rate — the self-relative
    bot/scraper flag (an absolute threshold breaks at every SF; q106
    screens rate bursts per SYMBOL, this screens them per ACTOR).

    Exactness: the 2x test is the cross-multiply peak·hours·10 > 20·tot
    on exact counts; the reported ratio is integer-decided; the peak
    hour tie-breaks to the EARLIEST hour achieving the max (explicit
    MIN over the argmax set — never an engine-specific arg_max).
    Shape: one hash-agg to the user x hour grid (5 orders below the
    tape at 100 TB), a user-partitioned window on that grid, one agg to
    user grain — user_id is the partition key end to end, so the grid
    never reshuffles."""
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy(
        "user_id",
        # FLOOR division, not `div` (truncation toward zero): the DuckDB
        # oracle's `//` floors, and a pre-epoch ts (negative micros)
        # would bucket differently across engines.  pmod makes the
        # numerator exactly divisible, keeping everything int64 — no
        # double division, so no 2^53 precision cliff.
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))"
            " div 3600000000"
        ).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wu = Window.partitionBy("user_id")
    w = m.withColumn("mx", F.max("c").over(wu))
    u = w.groupBy("user_id").agg(
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).alias("active_hours"),
        F.max("c").alias("peak"),
        F.min(F.when(F.col("c") == F.col("mx"), F.col("hr"))).alias(
            "peak_hr"
        ),
    )
    return u.where(
        F.col("peak") * F.col("active_hours") * 10 > 20 * F.col("tot")
    ).select(
        "user_id",
        F.col("tot").alias("n_events"),
        "active_hours",
        F.col("peak").alias("peak_hour_events"),
        F.col("peak_hr").alias("peak_hour"),
        ratio_e4("peak * active_hours", "tot").alias("burst_ratio"),
    )


@query(
    "q176_minute_coverage",
    oracle="""
    WITH m AS (SELECT event_type,
                      epoch_us(ts) // 60000000 AS minute
               FROM events),
    g AS (SELECT event_type,
                 CAST(COUNT(DISTINCT minute) AS BIGINT) AS active_minutes,
                 MIN(minute) AS mn, MAX(minute) AS mx
          FROM m GROUP BY 1)
    SELECT event_type, active_minutes,
           CAST(mx - mn + 1 AS BIGINT) AS span_minutes,
           CAST(mx - mn + 1 - active_minutes AS BIGINT) AS missing_minutes,
           (active_minutes * 20000 + (mx - mn + 1)) // (2 * (mx - mn + 1))
             / 10000.0 AS coverage
    FROM g
    """,
    category="data-quality",
)
def q176_minute_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed completeness grid: per symbol, active minutes vs the
    first-to-last-activity span, missing-minute count, and the
    integer-decided coverage share — the SLA completeness number next
    to q87's gap durations (q87 measures HOW LONG the holes are, this
    measures HOW MANY grid cells are empty).

    Exactness: minutes are integer epoch buckets, the span is integer
    arithmetic, coverage is ratio_e4.  Shape: one distinct-agg keyed by
    symbol (map-side partial distinct on the minute buckets), 5-row
    output at any scale."""
    ev = table(spark, sf_dir, "events")
    g = ev.select(
        "event_type",
        # floor division via pmod (q175's rule): engine-agnostic for
        # pre-epoch timestamps, pure int64 arithmetic
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 60000000))"
            " div 60000000"
        ).alias("minute"),
    ).groupBy("event_type").agg(
        F.countDistinct("minute").alias("active_minutes"),
        F.min("minute").alias("mn"),
        F.max("minute").alias("mx"),
    )
    span = F.col("mx") - F.col("mn") + 1
    return g.select(
        "event_type",
        "active_minutes",
        span.alias("span_minutes"),
        (span - F.col("active_minutes")).alias("missing_minutes"),
        ratio_e4("active_minutes", "mx - mn + 1").alias("coverage"),
    )


@query(
    "q178_first_touch",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    u AS (SELECT user_id,
                 MIN(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
          FROM r GROUP BY 1)
    SELECT first_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           (SUM(converted) * 20000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0
             AS conv_rate
    FROM u GROUP BY 1
    """,
    category="sequence-mining",
)
def q178_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: users grouped by their very FIRST event
    type, with the share that ever purchases — which entry point
    actually converts (q98 measures the strict view→click→purchase
    ordering; this credits the first touch regardless of path).

    Exactness: the first event is rn = 1 over the (ts, event_id) total
    order (never an engine-specific arg_min), conversion is an integer
    flag, the rate is ratio_e4.  Shape: one user_id shuffle carries the
    row numbers, the per-user collapse rides that partitioning, and
    the final agg is |event_types| rows."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    )
    u = r.groupBy("user_id").agg(
        F.min(
            F.when(F.col("rn") == 1, F.col("event_type"))
        ).alias("first_type"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return (
        u.groupBy("first_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .select(
            "first_type",
            "n_users",
            "n_converted",
            ratio_e4("n_converted", "n_users").alias("conv_rate"),
        )
    )


@query(
    "q181_signup_to_purchase",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'
                      THEN epoch_us(ts) END) AS s_us,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) END) AS p_us
      FROM events GROUP BY 1),
    l AS (SELECT s_us,
                 CASE WHEN p_us >= s_us THEN p_us - s_us END AS lat_us
          FROM u WHERE s_us IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users,
           CAST(COUNT(lat_us) AS BIGINT) AS n_converted,
           (COUNT(lat_us) * 20000 + COUNT(*)) // (2 * COUNT(*))
             / 10000.0 AS conv_share,
           ROUND(quantile_cont(lat_us, 0.25), 4) AS p25_lat_us,
           ROUND(quantile_cont(lat_us, 0.50), 4) AS p50_lat_us,
           ROUND(quantile_cont(lat_us, 0.75), 4) AS p75_lat_us,
           CAST(MAX(lat_us) AS BIGINT) AS max_lat_us
    FROM l
    """,
    category="sequence-mining",
)
def q181_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation latency: for users whose FIRST purchase comes at or
    after their FIRST signup, the quartiles of signup→purchase delay —
    the time-to-value funnel metric next to q98 (strict path counts)
    and q178 (entry-point conversion).  Users who purchased before ever
    signing up (shared devices, imports) count as signed-up but not
    converted — decided by an integer comparison, not dropped silently.

    Exactness: first-touch timestamps are MIN over integer epoch
    micros, the latency set is integer, quartiles are exact
    interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont` on integers — the q27/q143 precedent), the share
    is ratio_e4.  Shape: one user-keyed partial agg collapses the tape
    to |users| rows; the 1-row output aggregates that dim with
    null-skipping percentiles — no second pass, no window."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("s_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "p_us"
        ),
    )
    l = u.where(F.col("s_us").isNotNull()).select(
        F.when(
            F.col("p_us") >= F.col("s_us"), F.col("p_us") - F.col("s_us")
        ).alias("lat_us")
    )
    ps = F.percentile(
        "lat_us", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    return (
        l.agg(
            F.count(F.lit(1)).alias("n_signup_users"),
            F.count("lat_us").alias("n_converted"),
            ps.alias("ps"),
            F.max("lat_us").alias("max_lat_us"),
        )
        .select(
            "n_signup_users",
            "n_converted",
            ratio_e4("n_converted", "n_signup_users").alias("conv_share"),
            *[
                F.round(F.col("ps")[i], 4).alias(n)
                for i, n in enumerate(
                    ("p25_lat_us", "p50_lat_us", "p75_lat_us")
                )
            ],
            "max_lat_us",
        )
    )
