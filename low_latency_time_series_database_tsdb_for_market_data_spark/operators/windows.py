"""Window-function block q30-q34 (SURVEY.md §2.3).

Absent in the reference; the natural consumers are exactly its domain
(moving averages, returns, cumulative volume over tick streams).  All
windows partition by symbol (event_type) so state never crosses the
partition key — the same property that keeps the reference's per-symbol
directories independent keeps these windows shuffle-local at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query

def _order():
    """Deterministic total order (ts, seq) — SURVEY.md §4.3.4."""
    return [F.asc("ts"), F.asc("event_id")]


@query(
    "q30_moving_avg",
    oracle="""
    SELECT event_id, event_type, value,
           (SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w * 20000
            + 100 * COUNT(*) OVER w)
            // (200 * COUNT(*) OVER w) / 10000.0 AS mavg
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
    category="window",
)
def q30_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-row trailing average per symbol — integer-cents sum over the
    frame keeps the value independent of evaluation order, and the
    4-decimal round is integer-decided (functions.ratio_e4, see q21)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(*_order()).rowsBetween(-9, W.currentRow)
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.sum(cents("value")).over(w).alias("sc"),
        F.count(F.lit(1)).over(w).alias("nc"),
    ).select(
        "event_id",
        "event_type",
        "value",
        ratio_e4("sc", "100 * nc").alias("mavg"),
    )


@query(
    "q31_rank",
    oracle="""
    SELECT event_id, event_type, value,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS rn,
           CAST(rank()       OVER (PARTITION BY event_type ORDER BY value DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS BIGINT) AS drnk
    FROM events
    """,
    category="window",
)
def q31_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio: row_number gets a unique tiebreaker; rank/dense_rank
    deliberately rank on value alone so ties are exercised."""
    ev = table(spark, sf_dir, "events")
    w_unique = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    w_ties = W.partitionBy("event_type").orderBy(F.desc("value"))
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w_unique).cast("bigint").alias("rn"),
        F.rank().over(w_ties).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_ties).cast("bigint").alias("drnk"),
    )


@query(
    "q32_lag_returns",
    oracle="""
    SELECT event_id, event_type, ts, value,
           ROUND(value - lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id), 2) AS ret
    FROM events
    """,
    category="window",
)
def q32_lag_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-to-tick return per symbol (NULL on each symbol's first tick)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(*_order())
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("ret"),
    )


@query(
    "q33_cume_range_frame",
    oracle="""
    SELECT event_id, event_type, ts,
           ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER
                 (PARTITION BY event_type ORDER BY ts
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS cume
    FROM events
    """,
    category="window",
)
def q33_cume_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with a RANGE frame — timestamp peers (equal ts) are
    summed together, which is exactly why the cents trick matters: peer
    accumulation order is engine-internal."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.sum(cents("value")).over(w) / 100.0, 2).alias("cume"),
    )


@query(
    "q74_rolling_time_window",
    oracle="""
    SELECT event_id, event_type,
           SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w / 100.0 AS sum_1h,
           COUNT(*) OVER w AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    category="window",
)
def q74_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based rolling window (trailing 1 hour by event time, not 10
    rows like q30) — the frame a market-data rolling stat actually wants
    when ticks arrive unevenly.  Spark's RANGE frame needs a numeric
    ordering: order by unix_micros and bound by -3.6e9 micros; equal-ts
    peers aggregate together, which is why the summed value is integer
    cents (peer order is engine-internal).

    Routed through :func:`..prefix.keyed_time_rolling` (round 9; auto
    segmentation round 10): above the size crossover the tape collapses
    to per-(symbol, us) partials and the trailing frame becomes the
    DIFFERENCE of two growing cumsums — O(1)/row where the classic
    bounded RANGE frame re-aggregates its whole frame per row; when
    symbols are too few to fill the cluster those growing frames
    themselves run segmented by (symbol, span-derived time bucket) with
    keyed_prefix-style bucket carries.  Below the crossover: the
    classic per-symbol RANGE window.  All paths value-identical
    (test_keyed_time_rolling_matches_classic)."""
    from .prefix import keyed_time_rolling

    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("__us"),
        cents("value").alias("__c"),
    )
    rolled = keyed_time_rolling(
        d,
        ["event_type"],
        "__us",
        3_600_000_000,
        sums={"__sum_c": "__c"},
        count_col="n_1h",
    )
    return rolled.select(
        "event_id",
        "event_type",
        (F.col("__sum_c") / 100.0).alias("sum_1h"),
        "n_1h",
    )


@query(
    "q76_max_drawdown",
    oracle="""
    WITH m AS (SELECT event_type,
                      CAST(ROUND(value*100) AS BIGINT) AS v_c,
                      MAX(CAST(ROUND(value*100) AS BIGINT)) OVER (
                          PARTITION BY event_type ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS runmax_c
               FROM events)
    SELECT event_type,
           MIN((v_c * 20000 + runmax_c) // (2 * runmax_c) / 10000.0 - 1)
               AS max_dd,
           COUNT(*) AS n
    FROM m GROUP BY event_type
    """,
    category="window",
)
def q76_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per symbol: running peak (cumulative MAX over the
    (ts, seq) total order), per-tick drawdown v/peak - 1, then the MIN.
    Window and aggregate share the symbol key — ONE exchange; all math
    on integer cents until the final exact division.

    The per-tick ratio is rounded to 4 decimals in integer arithmetic
    BEFORE the -1 shift (round4(x-1) == round4(x)-1 exactly, since the
    shift is an integer at e4 scale) — double round() on the ratio would
    tie-diverge between engines (see q21); MIN then compares exact
    multiples of 1e-4."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(*_order())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    m = ev.select(
        "event_type",
        cents("value").alias("v_c"),
        F.max(cents("value")).over(w).alias("runmax_c"),
    )
    return (
        m.select(
            "event_type", (ratio_e4("v_c", "runmax_c") - 1).alias("dd")
        )
        .groupBy("event_type")
        .agg(F.min("dd").alias("max_dd"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q68_topn_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    category="window",
)
def q68_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority class — the group-wise
    top-N every leaderboard/holdout-selection pipeline needs.  Compiles
    to one window exchange; Spark inserts a WindowGroupLimit (per-
    partition top-N heaps BEFORE the shuffle), so shuffled bytes are
    O(groups x N), not the table."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
    ).where(F.col("rn") <= 3)


@query(
    "q34_sort_limit",
    oracle="SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
    category="sort-limit",
)
def q34_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 — executes as per-partition TakeOrdered + driver-side
    merge of 25-row heaps; cost is O(n) scan, no global shuffle."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )
