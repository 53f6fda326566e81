"""Join block q10-q17 (SURVEY.md §2.3) — entirely absent in the single-table
reference; first-class here.

Strategy notes (verified via .explain, see tests/test_plans.py):
  * q10: shuffle-side hash/SMJ on the key — AQE picks at runtime;
  * q11: dimension tables broadcast explicitly — zero shuffle of the fact;
  * q13: theta join keeps the equi part (brand) as the join key so it hash
    partitions; only the inequality is a post-join filter — never a pure NLJ;
  * q16: as-of via single-shuffle union+window fill (operators/asof.py);
  * q17: interval self-join via 60s time-bucket equi-keys, turning an
    O(n^2) range condition into an equi-join with fan-out 2 — the standard
    trick that survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .asof import asof_join, asof_join_forward, asof_join_nearest


@query(
    "q10_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    category="join",
)
def q10_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@query(
    "q11_join_broadcast",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    category="join",
)
def q11_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup with explicitly broadcast dimensions — the fact
    side never shuffles for the join."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q12_join_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    category="join",
)
def q12_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (n_orders = 0)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q13_join_theta",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS n_pairs
    FROM part p JOIN part q
      ON p.p_brand = q.p_brand AND p.p_size < q.p_size
    GROUP BY p.p_brand
    """,
    category="join",
)
def q13_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta self-join COUNT: pairs of same-brand parts with strictly
    increasing size.  The naive plan (equi-join on brand + inequality
    filter) materializes O(n^2 / |brands|) pairs only to count them —
    13 s at sf1, and at 100 TB a brand bucket of 1e8 parts would emit
    5e15 pairs; no join strategy survives that.  Counting is
    closed-form over the (brand, size) histogram instead:

        n_pairs(brand) = sum_{s<t} c_s * c_t = (T^2 - sum_s c_s^2) / 2

    — ONE hash-agg to |brands x sizes| rows, one |brands|-row agg, zero
    joins (0.2 s at sf1, 65x).  Values are identical to the join form
    (DuckDB's oracle still runs the quadratic join at sf0.01): brands
    where every part shares one size yield 0 and are filtered, matching
    the inner join's empty group.  T^2 is widened to DECIMAL(38,0)
    before squaring (q162 rule) — at 1e10 parts per brand the BIGINT
    square would wrap."""
    p = table(spark, sf_dir, "part")
    hist = p.groupBy("p_brand", "p_size").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    per = hist.groupBy("p_brand").agg(
        F.sum("c").alias("t"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    n_pairs = (
        (F.col("t") * F.col("t") - F.col("sq")) / F.lit(2)
    ).cast("bigint")
    return (
        per.select("p_brand", n_pairs.alias("n_pairs"))
        .where(F.col("n_pairs") > 0)
    )


@query(
    "q14_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="join",
)
def q14_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one order; the
    right side contributes no columns and dedups inside the join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q15_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="join",
)
def q15_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q16_asof",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           (SELECT max(p.ts) FROM events p
             WHERE p.event_type = 'purchase'
               AND p.user_id = c.user_id AND p.ts <= c.ts) AS asof_ts
    FROM events c WHERE c.event_type = 'click'
    """,
    category="join-asof",
)
def q16_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent purchase at
    or before it (inclusive, like the reference's range bounds).  The
    oracle is an independent formulation (correlated max) — the engine uses
    the single-shuffle union+window fill in operators/asof.py."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_seq"),
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_seq="p_seq",
        payload={"p_ts": "asof_ts"},
    )


@query(
    "q75_asof_forward",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           (SELECT min(p.ts) FROM events p
             WHERE p.event_type = 'purchase'
               AND p.user_id = c.user_id AND p.ts >= c.ts) AS next_ts
    FROM events c WHERE c.event_type = 'click'
    """,
    category="join-asof",
)
def q75_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click matched to the user's NEXT purchase at
    or after it — the look-ahead twin of q16 ("time to conversion").
    Same single-shuffle union + descending window fill
    (operators/asof.py::asof_join_forward); oracle is an independent
    correlated-min formulation."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_seq"),
    )
    return asof_join_forward(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_seq="p_seq",
        payload={"p_ts": "next_ts"},
    )


@query(
    "q17_interval_join",
    oracle="""
    SELECT a.event_type AS event_type, a.event_id AS id_a, b.event_id AS id_b
    FROM events a JOIN events b
      ON a.event_type = b.event_type
     AND a.event_id < b.event_id
     AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND AND a.ts + INTERVAL 60 SECOND
    """,
    category="join-interval",
)
def q17_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: same-symbol event pairs within 60 s.

    Scale path: each left row joins on (type, bucket) where the right side
    is expanded to its bucket and the two neighbours, so every |dt|<=60s
    pair meets in exactly one equi-bucket — an equi-join with fan-out 3
    instead of an O(n^2) range condition."""
    from .prefix import floor_div_exact

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        # exact integer bucket (q175 rule): a DOUBLE-division misfloor
        # past 2^53 us could put a row one bucket off and silently DROP
        # a true pair from the candidate equi-join
        floor_div_exact(F.unix_micros("ts"), 60_000_000).alias("bucket"),
    )
    right = ev.select(
        F.col("event_type").alias("event_type_b"),
        F.col("event_id").alias("id_b"),
        F.col("us").alias("us_b"),
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("jbucket"),
    )
    pairs = ev.join(
        right,
        (F.col("event_type") == F.col("event_type_b"))
        & (F.col("bucket") == F.col("jbucket"))
        & (F.col("event_id") < F.col("id_b"))
        & (F.abs(F.col("us") - F.col("us_b")) <= F.lit(60_000_000)),
    )
    return pairs.select(
        "event_type", F.col("event_id").alias("id_a"), F.col("id_b")
    )


@query(
    "q18_multiway_join",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    category="join",
)
def q18_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway fact-to-dims join + aggregate (TPC-H Q5 flavor): lineitem
    x supplier x nation rolled up to nation revenue.  Both dimension hops
    broadcast (supplier is O(SF*10k) rows, nation is 25), so the plan is
    scan -> two BHJ -> one hash-agg exchange — no fact-table shuffle
    before aggregation at any scale where dims fit in memory."""
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "q135_asof_nearest",
    oracle="""
    WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, epoch_us(ts) AS pus
          FROM events WHERE event_type = 'purchase'),
    x AS (SELECT c.event_id, c.user_id, c.us,
                 (SELECT max(pus) FROM p
                   WHERE p.user_id = c.user_id AND pus <= c.us) AS prev_us,
                 (SELECT min(pus) FROM p
                   WHERE p.user_id = c.user_id AND pus >= c.us) AS next_us
          FROM c)
    SELECT event_id, user_id, us,
           CASE WHEN prev_us IS NOT NULL
                     AND (next_us IS NULL
                          OR us - prev_us <= next_us - us)
                THEN prev_us ELSE next_us END AS near_us,
           CASE WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
                WHEN prev_us IS NOT NULL
                     AND (next_us IS NULL
                          OR us - prev_us <= next_us - us)
                THEN 'prev' ELSE 'next' END AS asof_side
    FROM x
    """,
    category="join-asof",
)
def q135_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each click matched to the user's CLOSEST
    purchase in either direction, ties to the past — completing the
    as-of family (backward q16, forward q75, nearest here).

    Timestamps compare as exact epoch-micros integers (timestamp
    arithmetic differs across engines; integers do not).  The engine is
    `asof.asof_join_nearest`: one union, one user-keyed shuffle, two
    linear window fills (ascending + descending over the SAME
    partitioning — a re-sort, not a second exchange); the oracle is the
    independent correlated max/min formulation."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", us.alias("us")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("pus"),
        F.col("event_id").alias("p_seq"),
    )
    return asof_join_nearest(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="us",
        right_ts="pus",
        right_seq="p_seq",
        payload={"pus": "near_us"},
    )
