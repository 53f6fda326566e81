"""Extended analytics block (q27-q28, q35, q45-q46): percentiles,
statistical aggregates, window analytics, map functions, pivot.

All absent from the reference (its only aggregate is count,
`timeseries_db.hpp:44-59`); each is a single declarative plan — one
hash-agg or one window exchange — with determinism guaranteed by ROUND
discipline and unique-key orderings (SURVEY.md §2.3 rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q27_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregation",
)
def q27_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group.  Spark `percentile` and
    DuckDB `quantile_cont` share linear-interpolation semantics, so the
    match is exact (mod ROUND).  Exact percentile sorts within the agg —
    at 100 TB prefer approx_percentile (t-digest, mergeable map-side);
    both are surfaced, this one is the oracle-checkable form."""
    li = table(spark, sf_dir, "lineitem")
    # ONE percentile agg with an array of percentages: each percentile
    # aggregate expression buffers every group value, so three separate
    # calls would triple the buffer/sort work for identical output
    ps = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(ps.alias("ps"))
        .select(
            "l_returnflag",
            *[
                F.round(F.col("ps")[i], 4).alias(name)
                for i, name in enumerate(("p25", "p50", "p75"))
            ],
        )
    )


@query(
    "q28_stats_agg",
    oracle="""
    SELECT l_linestatus,
           ROUND(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS covar_pq,
           ROUND(stddev_samp(l_discount), 4) AS sd_disc,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(skewness(l_quantity), 4) AS skew_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    category="aggregation",
)
def q28_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (Pearson corr, sample covariance/stddev/
    variance, skewness) — all single-pass mergeable moments, so map-side
    partials keep the shuffle at one row per group."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_pq"),
        F.round(F.stddev_samp("l_discount"), 4).alias("sd_disc"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
    )


@query(
    "q35_window_analytics",
    oracle="""
    SELECT event_id,
           ntile(4)      OVER w AS quartile,
           ROUND(percent_rank() OVER w, 4) AS pr,
           ROUND(cume_dist()    OVER w, 4) AS cd,
           first_value(event_id) OVER w AS first_id,
           last_value(event_id)  OVER (PARTITION BY event_type
                                       ORDER BY value, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING) AS last_id
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    category="window",
)
def q35_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist /
    first_value / last_value with an explicit full frame).  One window
    exchange on event_type; (value, event_id) ordering is a total order
    so every function is deterministic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
        F.first("event_id").over(w).alias("first_id"),
        F.last("event_id").over(w_full).alias("last_id"),
    )


@query(
    "q45_map_functions",
    oracle="""
    SELECT event_type,
           CAST(SUM(len(json_keys(props))) AS BIGINT) AS n_keys,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(json_extract(props, '$.k')) AS with_k
    FROM events GROUP BY event_type
    """,
    category="function-map",
)
def q45_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse the JSON props into map<string,
    bigint>, then size / element_at / containment aggregates — all
    JVM-side (from_json is codegen), one hash-agg shuffle."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select("event_type", m.alias("m"))
        .groupBy("event_type")
        .agg(
            F.sum(F.size(F.map_keys(F.col("m")))).alias("n_keys"),
            F.sum(F.element_at(F.col("m"), "k")).alias("sum_k"),
            F.count(F.element_at(F.col("m"), "k")).alias("with_k"),
        )
    )


@query(
    "q46_pivot",
    oracle="""
    SELECT user_id % 10 AS cohort,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view
    FROM events GROUP BY 1
    """,
    category="aggregation-pivot",
)
def q46_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no discovery pass — at scale the
    two-job implicit pivot is an extra full scan).  Compiles to one
    hash-agg with 5 conditional counts, same as the CASE oracle."""
    ev = table(spark, sf_dir, "events")
    piv = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "cohort", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
    )
    # pivot emits NULL for empty cells; the CASE oracle emits 0
    return renamed.fillna(0, subset=[f"n_{t}" for t in EVENT_TYPES])


_BUCKET_S = 1800  # 30-min resample grid: sparse enough to have real gaps


@query(
    "q36_resample_locf",
    oracle=f"""
    WITH b AS (SELECT event_type,
                      CAST(to_timestamp(floor(epoch(ts)/{_BUCKET_S})*{_BUCKET_S}) AS TIMESTAMP) AS bucket,
                      (SUM(CAST(ROUND(value * 100) AS BIGINT)) * 200 + COUNT(*))
                       // (2 * COUNT(*)) AS v_e4,
                      COUNT(*) AS n
               FROM events GROUP BY 1, 2),
    bounds AS (SELECT CAST(to_timestamp(floor(epoch(min(ts))/{_BUCKET_S})*{_BUCKET_S}) AS TIMESTAMP) mn,
                      CAST(to_timestamp(floor(epoch(max(ts))/{_BUCKET_S})*{_BUCKET_S}) AS TIMESTAMP) mx
               FROM events),
    grid AS (SELECT t.event_type, gs.bucket
             FROM (SELECT DISTINCT event_type FROM events) t,
                  (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL {_BUCKET_S} SECOND)) AS TIMESTAMP) AS bucket
                   FROM bounds) gs)
    SELECT g.event_type, g.bucket, COALESCE(b.n, 0) AS n,
           last_value(b.v_e4 IGNORE NULLS) OVER (
                 PARTITION BY g.event_type ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0 AS v_locf
    FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.bucket = b.bucket
    """,
    category="timeseries",
)
def q36_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a dense regular grid + forward-fill (LOCF) — the
    classic TSDB downsampling/gap-fill pair the reference cannot express.

    Shape: one hash-agg over the raw events, a generated time grid per
    key (sequence + explode — rows ~ keys x buckets, never events), one
    broadcast-able left join, one window pass for the fill.  The grid is
    driven by the table's own min/max so the query is meaningful at
    every SF."""
    ev = table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / _BUCKET_S) * _BUCKET_S
    )
    # bucket mean rounded to 4 decimals ENTIRELY in integer arithmetic
    # (floor((2a+b)/(2b)) = round-half-up of a/b): double round() diverges
    # between engines on .00005 ties (Spark rounds the shortest decimal
    # rendering, DuckDB the exact binary; 18 tie buckets at sf0.1), so the
    # LOCF carries an exact e4 integer and divides once at the end.  The
    # cents sum is widened to DECIMAL(38,0) before the *200 so the product
    # keeps the same overflow headroom ratio_e4 gives every other
    # integer-decided ratio (DuckDB's bigint SUM is already HUGEINT).
    b = ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.expr(
            "(cast(sum(cast(round(value * 100) as bigint)) as decimal(38,0))"
            " * 200 + count(1)) div (2 * count(1))"
        ).alias("v_e4"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = ev.agg(
        F.min(bucket).alias("mn"), F.max(bucket).alias("mx")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr(f"interval {_BUCKET_S} seconds"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            (F.last("v_e4", ignorenulls=True).over(w) / 10000.0).alias(
                "v_locf"
            ),
        )
    )
