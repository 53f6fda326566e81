"""User-engagement analytics (q125-q126): cohort retention and rolling
active-user counts — the product-analytics pair every event warehouse
serves next to the market-data screens (same events tape, user axis
instead of symbol axis).

Exactness: everything is integer counts of distinct users plus the
integer-decided ratio_e4; week truncation is Monday-anchored on both
engines (checked) and offsets divide exact day counts.  Shapes: both
queries pre-collapse the tape to DISTINCT (period, user) — the only
corpus-scale shuffle, keyed by the user axis — and every later step runs
on period x user cells (bounded by active users, not events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query
from .prefix import global_row_number, ntile_expr


@query(
    "q125_retention_cohorts",
    oracle="""
    WITH wu AS (SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP)
                         AS w,
                       user_id
                FROM events),
    c AS (SELECT user_id, MIN(w) AS cohort_week FROM wu GROUP BY 1),
    m AS (SELECT wu.w, c.cohort_week,
                 date_diff('day', c.cohort_week, wu.w) // 7 AS week_offset,
                 wu.user_id
          FROM wu JOIN c USING (user_id)),
    a AS (SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM m GROUP BY 1, 2)
    SELECT cohort_week, week_offset, n_users,
           (n_users * 20000 + MAX(CASE WHEN week_offset = 0 THEN n_users END)
                                OVER (PARTITION BY cohort_week))
             // (2 * MAX(CASE WHEN week_offset = 0 THEN n_users END)
                   OVER (PARTITION BY cohort_week)) / 10000.0
             AS retention_e4
    FROM a
    """,
    category="engagement",
)
def q125_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by their first active
    week, and each (cohort, week-offset) cell reports how many came back
    — the triangular retention matrix behind every growth dashboard.

    Shape: the tape collapses to DISTINCT (week, user) in ONE user-axis
    shuffle; the cohort anchor is a per-user MIN over those cells (same
    key — no extra exchange under the same hash); the matrix aggregation
    and the offset-0 denominator window both run on |cohorts| x
    |offsets| cells.  At 100 TB the only corpus-scale pass is the first
    distinct; everything after is user-cardinality-bounded."""
    ev = table(spark, sf_dir, "events")
    # weeks stay TIMESTAMP end to end (a DATE column surfaces as python
    # objects in Arrow/pandas while the DuckDB side is datetime64 — a
    # driver-hash dtype hazard the oracle-diff test flags)
    wu = ev.select(
        F.date_trunc("week", "ts").alias("w"), "user_id"
    ).distinct()
    wc = Window.partitionBy("user_id")
    m = wu.select(
        "w",
        "user_id",
        F.min("w").over(wc).alias("cohort_week"),
    ).select(
        "cohort_week",
        (F.datediff("w", "cohort_week") / 7)
        .cast("bigint")
        .alias("week_offset"),
        "user_id",
    )
    a = m.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    wz = Window.partitionBy("cohort_week")
    return a.select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.max(F.when(F.col("week_offset") == 0, F.col("n_users")))
        .over(wz)
        .alias("cohort_size"),
    ).select(
        "cohort_week",
        "week_offset",
        "n_users",
        ratio_e4("n_users", "cohort_size").alias("retention_e4"),
    )


@query(
    "q126_rolling_active_users",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                       user_id
                FROM events),
    mx AS (SELECT MAX(d) AS max_d FROM du),
    x AS (SELECT du.d + off * INTERVAL 1 DAY AS day, off, du.user_id
          FROM du, unnest(generate_series(0, 6)) AS t(off)),
    f AS (SELECT CAST(day AS TIMESTAMP) AS day, off, user_id
          FROM x, mx WHERE day <= mx.max_d)
    SELECT day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
           CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END)
                AS BIGINT) AS dau,
           (COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) * 20000
              + COUNT(DISTINCT user_id))
             // (2 * COUNT(DISTINCT user_id)) / 10000.0 AS stickiness_e4
    FROM f GROUP BY day
    """,
    category="engagement",
)
def q126_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: for every day, the distinct users active in
    the trailing 7 days (WAU), that day alone (DAU), and the DAU/WAU
    stickiness ratio — the standard engagement triple.

    A windowed COUNT DISTINCT has no mergeable partial form, so the
    trailing window is rewritten as a scatter: each DISTINCT (day, user)
    cell contributes itself to the 7 target days it is visible from
    (explode of a 7-element sequence — in-row codegen), and one hash-agg
    per target day counts distinct users.  Cost: 7x the DISTINCT cell
    table — bounded by 7 x |users| x |days|, independent of event count;
    the corpus-scale pass is only the initial distinct.  Target days
    past the tape's end are clipped against a broadcast single-row MAX
    probe (no second data pass)."""
    ev = table(spark, sf_dir, "events")
    # The distinct cell table feeds BOTH the max-day probe and the
    # scatter; localCheckpoint materializes it once so the probe does
    # not re-scan the tape (lazy: the probe's broadcast build is itself
    # a full-materialization job — the q77 reuse discipline)
    du = (
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    mx = du.agg(F.max("d").alias("max_d"))
    x = du.select(
        "d",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).select(
        F.date_add("d", F.col("off")).alias("day"), "off", "user_id"
    )
    f = x.crossJoin(F.broadcast(mx)).where(F.col("day") <= F.col("max_d"))
    # days report as TIMESTAMP (see q125's dtype note)
    f = f.withColumn("day", F.col("day").cast("timestamp"))
    return f.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau"),
        F.countDistinct(F.when(F.col("off") == 0, F.col("user_id"))).alias(
            "dau"
        ),
    ).select(
        "day",
        "wau",
        "dau",
        ratio_e4("dau", "wau").alias("stickiness_e4"),
    )


@query(
    "q138_segment_activity",
    oracle="""
    WITH u AS (SELECT user_id, event_type,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(ROUND(value*100) AS BIGINT)) AS sc
               FROM events GROUP BY 1, 2)
    SELECT c.c_mktsegment, u.event_type,
           CAST(SUM(u.n) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users,
           SUM(u.sc) / 100.0 AS total_value,
           (SUM(u.sc) * 20000 + 100 * SUM(u.n)) // (2 * 100 * SUM(u.n))
             / 10000.0 AS avg_value
    FROM u JOIN customer c ON u.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    category="engagement",
)
def q138_segment_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral activity by CRM segment: the events tape joined to the
    customer dimension (user_id = custkey), reporting volume, reach, and
    spend per market segment x event type — the first query to BRIDGE
    the two halves of the catalog (clickstream x warehouse), i.e. the
    'which segment clicks but does not buy' report.

    Shape: events pre-aggregate to (user, event_type) BEFORE the join —
    the join input shrinks from event-cardinality to user-cardinality,
    so the dim join moves |users| x |types| skinny rows, then one
    segment-level agg.  At 100 TB both sides hash on the user/custkey
    spine; the pre-agg is what keeps the join payload user-bounded.
    Money is exact cents; the average is integer-decided."""
    ev = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    u = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sc"),
    )
    return (
        u.join(c, u.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum("sc") / 100.0).alias("total_value"),
            F.sum("sc").alias("sum_sc"),
            F.sum("n").alias("sum_n"),
        )
        .select(
            "c_mktsegment",
            "event_type",
            "n_events",
            "n_users",
            "total_value",
            ratio_e4("sum_sc", "100 * sum_n").alias("avg_value"),
        )
    )


@query(
    "q182_user_rfm",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MAX(epoch_us(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             COALESCE(SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(ROUND(value * 100) AS BIGINT)
                               END), 0) AS mon_c
      FROM events GROUP BY 1),
    t AS (SELECT *,
                 NTILE(4) OVER (ORDER BY last_us, user_id) AS r_band,
                 NTILE(4) OVER (ORDER BY n_events, user_id) AS f_band,
                 NTILE(4) OVER (ORDER BY mon_c, user_id) AS m_band
          FROM u)
    SELECT CAST(r_band AS BIGINT) AS r_band,
           CAST(f_band AS BIGINT) AS f_band,
           CAST(m_band AS BIGINT) AS m_band,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           SUM(mon_c) / 100.0 AS monetary,
           (SUM(n_events) * 20000 + COUNT(*)) // (2 * COUNT(*))
             / 10000.0 AS avg_events
    FROM t GROUP BY 1, 2, 3
    """,
    category="engagement",
)
def q182_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every user scored into recency / frequency /
    monetary quartiles (1 = most stale / least active / lowest spend),
    cells reporting population, total spend, and mean activity — the
    classic CRM campaign grid (q147 bands customers by one axis; this
    crosses three).

    Exactness: all three metrics are integers (epoch micros, counts,
    purchase cents), and each quartile is ANSI NTILE over a (metric,
    user_id) total order computed via :func:`..prefix.global_row_number`
    + :func:`..prefix.ntile_expr` — the two-pass range-partitioned row
    number in pure integer arithmetic, so NO single-partition window
    ever touches the user dimension (three independent NTILEs = three
    chained range exchanges over the dim, each N-way parallel).  Shape:
    the tape collapses to |users| rows in one user-keyed partial agg;
    everything after runs on the dim.  Output is at most 4^3 cells."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts"))).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", cents("value"))
            ),
            F.lit(0),
        ).alias("mon_c"),
    )
    t = global_row_number(
        u, [F.col("last_us"), F.col("user_id")], "r_rn", total_col="n_tot"
    )
    t = t.withColumn(
        "r_band", ntile_expr(F.col("r_rn"), F.col("n_tot"), 4)
    )
    t = global_row_number(t, [F.col("n_events"), F.col("user_id")], "f_rn")
    t = t.withColumn(
        "f_band", ntile_expr(F.col("f_rn"), F.col("n_tot"), 4)
    )
    t = global_row_number(t, [F.col("mon_c"), F.col("user_id")], "m_rn")
    t = t.withColumn(
        "m_band", ntile_expr(F.col("m_rn"), F.col("n_tot"), 4)
    )
    return (
        t.groupBy("r_band", "f_band", "m_band")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (F.sum("mon_c") / 100.0).alias("monetary"),
            F.sum("n_events").alias("sum_ev"),
        )
        .select(
            "r_band",
            "f_band",
            "m_band",
            "n_users",
            "monetary",
            ratio_e4("sum_ev", "n_users").alias("avg_events"),
        )
    )
