"""Relational coverage extensions (q19, q29, q47-q49): decorrelated
scalar subquery, deterministic sampling, unpivot, conditional
aggregates, histogram binning.

All absent from the reference (no expression language at all,
`cli.cpp:43-219`); each compiles to at most one shuffle and follows the
ROUND/cents determinism discipline (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query


@query(
    "q19_above_group_avg",
    oracle="""
    WITH b AS (SELECT p_brand,
                      SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS sum_c,
                      COUNT(*) AS cnt
               FROM part GROUP BY p_brand)
    SELECT p.p_brand, COUNT(*) AS n_above,
           (SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) * 20000
            + 100 * COUNT(*)) // (200 * COUNT(*)) / 10000.0 AS avg_above
    FROM part p JOIN b ON p.p_brand = b.p_brand
    WHERE CAST(ROUND(p_retailprice * 100) AS BIGINT) * b.cnt > b.sum_c
    GROUP BY p.p_brand
    """,
    category="subquery",
)
def q19_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery ("parts above their brand's average
    price"), written as Catalyst would decorrelate it: a tiny per-brand
    aggregate broadcast back onto the fact scan — at 100 TB the brand
    aggregate is KBs while the correlated form would be a rescan per
    row.  The threshold test is integer cross-multiplication
    (cents * count > sum_cents), so the boundary cases cannot drift
    between engines' float averages."""
    p = table(spark, sf_dir, "part")
    b = p.groupBy("p_brand").agg(
        F.sum(cents("p_retailprice")).alias("sum_c"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        p.join(F.broadcast(b), "p_brand")
        .where(cents("p_retailprice") * F.col("cnt") > F.col("sum_c"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.sum(cents("p_retailprice")).alias("sum_above_c"),
        )
        .select(
            "p_brand",
            "n_above",
            ratio_e4("sum_above_c", "100 * n_above").alias("avg_above"),
        )
    )


@query(
    "q29_deterministic_sample",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS sum_price
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY o_orderstatus
    """,
    category="sampling",
)
def q29_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample: keep rows whose md5(key) starts with
    '0' or '1'.  Unlike TABLESAMPLE/rand() this is reproducible across
    engines, runs, and partitionings — the property a training-data
    pipeline needs for holdout splits at 100 TB (same rows sampled on
    every rerun and on every cluster size).  Pure narrow map + one
    hash-agg; no shuffle before the aggregate."""
    o = table(spark, sf_dir, "orders")
    keep = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
        "0", "1"
    )
    return (
        o.where(keep)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents("o_totalprice")) / 100.0, 2).alias("sum_price"),
        )
    )


@query(
    "q47_unpivot",
    oracle="""
    WITH a AS (SELECT l_returnflag,
                      SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
                        AS sum_price,
                      SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0
                        AS sum_qty,
                      SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) / 100.0
                        AS sum_disc
               FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS val FROM a
    UNION ALL SELECT l_returnflag, 'sum_qty',  sum_qty  FROM a
    UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
    """,
    category="reshape",
)
def q47_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): three per-flag measures melted into
    (measure, val) rows.  `DataFrame.unpivot` compiles to a single
    Expand node over the aggregated (tiny) relation — the scan and the
    one hash-agg shuffle happen once, NOT once per measure like the
    UNION ALL oracle would naively suggest."""
    li = table(spark, sf_dir, "lineitem")
    a = li.groupBy("l_returnflag").agg(
        (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_price"),
        (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
        (F.sum(cents("l_discount")) / 100.0).alias("sum_disc"),
    )
    return a.unpivot(
        ["l_returnflag"],
        ["sum_price", "sum_qty", "sum_disc"],
        "measure",
        "val",
    )


@query(
    "q48_conditional_agg",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_neg,
           ROUND(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                 FILTER (WHERE c_acctbal > 0) / 100.0, 2) AS sum_pos,
           (COUNT(*) FILTER (WHERE c_acctbal < 0) * 20000 + COUNT(*))
             // (2 * COUNT(*)) / 10000.0 AS neg_share
    FROM customer GROUP BY c_nationkey
    """,
    category="aggregation",
)
def q48_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (FILTER / count_if): one hash-agg computing
    unconditional and predicated measures side by side — the idiomatic
    replacement for self-joining a table against its own filtered copy
    (which would double the 100 TB scan)."""
    c = table(spark, sf_dir, "customer")
    neg = F.col("c_acctbal") < 0
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(neg).alias("n_neg"),
            F.round(
                F.sum(F.when(F.col("c_acctbal") > 0, cents("c_acctbal")))
                / 100.0,
                2,
            ).alias("sum_pos"),
        )
        .select(
            "c_nationkey",
            "n_total",
            "n_neg",
            "sum_pos",
            ratio_e4("n_neg", "n_total").alias("neg_share"),
        )
    )


@query(
    "q49_histogram",
    oracle="""
    SELECT CAST(LEAST(GREATEST(floor(value / 100.0), 0), 9) AS BIGINT)
             AS bucket,
           COUNT(*) AS n,
           (SUM(CAST(ROUND(value * 100) AS BIGINT)) * 20000 + 100 * COUNT(*))
             // (200 * COUNT(*)) / 10000.0 AS avg_v
    FROM events GROUP BY 1
    """,
    category="aggregation",
)
def q49_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of tick values (10 buckets of width 100,
    clamped): binning is a narrow in-row map, then one hash-agg whose
    key space is 10 — the map-side partial agg collapses everything
    before the shuffle, so bytes shuffled are O(buckets x partitions),
    independent of row count."""
    ev = table(spark, sf_dir, "events")
    bucket = (
        F.least(F.greatest(F.floor(F.col("value") / 100.0), F.lit(0)), F.lit(9))
        .cast("bigint")
        .alias("bucket")
    )
    return (
        ev.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("value")).alias("sum_c"),
        )
        .select("bucket", "n", ratio_e4("sum_c", "100 * n").alias("avg_v"))
    )
