"""Round-6 warehouse depth (q148-q153): the remaining classic TPC-H
report shapes expressible over this catalog — cross-nation trade matrix
(Q7), market-share trend (Q8), brand/size supplier distribution (Q16),
large-volume orders (Q18), dormant rich customers (Q22 spirit), and
Pareto ABC revenue classification.

Same disciplines as tpch_ext.py: money in exact BIGINT 1e-4 dollar
units (`_rev_u`), fixed 25/5-row nation/region dims ride F.broadcast,
customer/supplier join on their natural keys (they scale with the fact
tables — never broadcast by assumption), output is dim- or top-k-
bounded, never fact-sized.  Reference parity: the reference engine
(`timeseries_db.cpp`) has no relational surface at all — these queries
are the "analytics engine next to the tick store" half of SURVEY §2.2's
coverage, exercising Catalyst's join planner the way the tick operators
exercise the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import ratio_e4, ratio_round
from ..registry import query
from .prefix import global_cumsum
from .tpch_ext import _REV_U_SQL, _rev_u


@query(
    "q148_nation_trade_matrix",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           (SUM({_REV_U_SQL}) * 200 + 10000) // 20000 / 100.0 AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_name <> nc.n_name
    GROUP BY 1, 2, 3
    """,
    category="warehouse-join",
)
def q148_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border trade matrix (TPC-H Q7 shape): revenue shipped
    between every (supplier nation, customer nation) pair by ship year,
    domestic flows excluded.

    Shape: lineitem⋈orders⋈customer shuffle on the orderkey/custkey
    spine; supplier joins on suppkey; both nation lookups broadcast
    (25 rows).  The <> filter runs after the broadcast joins as a cheap
    codegen predicate.  Output is |nations|² x years — dim-bounded."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    ns = F.broadcast(
        n.select(F.col("n_nationkey").alias("snk"),
                 F.col("n_name").alias("supp_nation"))
    )
    nc = F.broadcast(
        n.select(F.col("n_nationkey").alias("cnk"),
                 F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("snk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, F.col("c_nationkey") == F.col("cnk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_rev_u()).alias("rev_u"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "ship_year",
            "n_items",
            ratio_round("rev_u", "10000", 2).alias("revenue"),
        )
    )


@query(
    "q149_market_share_trend",
    oracle=f"""
    WITH flows AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
             ns.n_name AS supp_nation,
             SUM({_REV_U_SQL}) AS rev_u
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY 1, 2)
    SELECT order_year,
           ((SELECT COALESCE(SUM(rev_u), 0) FROM flows f2
             WHERE f2.order_year = f1.order_year
               AND f2.supp_nation = 'NATION_7') * 20000
            + SUM(rev_u)) // (2 * SUM(rev_u)) / 10000.0 AS focal_share
    FROM flows f1
    GROUP BY order_year
    """,
    category="warehouse-join",
)
def q149_market_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share trend (TPC-H Q8 shape): the share of one focal
    nation's suppliers (NATION_7) in everything ASIA-region customers
    bought, by order year.

    Shape: region restricts nation (broadcast-broadcast), which
    restricts customer BEFORE the fact join — the same pre-fact dim
    pruning q114 uses; one hash-agg to (year, supp_nation) flows, then
    the share is a conditional-sum ratio per year, integer-decided.
    Output is |years| rows."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nc = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cnk")
        )
    )
    ns = F.broadcast(
        n.select(F.col("n_nationkey").alias("snk"),
                 F.col("n_name").alias("supp_nation"))
    )
    flows = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("snk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(nc, c.c_nationkey == F.col("cnk")),
              o.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            "supp_nation",
        )
        .agg(F.sum(_rev_u()).alias("rev_u"))
    )
    per_year = flows.groupBy("order_year").agg(
        F.sum("rev_u").alias("total_u"),
        F.sum(
            F.when(F.col("supp_nation") == "NATION_7", F.col("rev_u")).otherwise(
                F.lit(0)
            )
        ).alias("focal_u"),
    )
    return per_year.select(
        "order_year", ratio_e4("focal_u", "total_u").alias("focal_share")
    )


@query(
    "q150_brand_supplier_counts",
    oracle="""
    SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY 1, 2
    """,
    category="warehouse-join",
)
def q150_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per (brand, small size) — TPC-H Q16's shape
    with lineitem as the part-supplier link (this catalog carries no
    partsupp table).  COUNT(DISTINCT) over two columns in one hash-agg;
    the size predicate prunes part before the join.  At scale the
    distinct expands to (brand, size, suppkey) partial sets map-side —
    Spark's expand+agg plan — and output is brands x sizes."""
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


@query(
    "q151_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 300)
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, b.total_qty,
           (CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * 200 + 100)
             // 200 / 100.0 AS total_price
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY b.total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
    category="warehouse-join",
)
def q151_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): the 20 biggest orders by
    total line quantity above the 300-unit threshold, with their
    customers.

    Shape: the HAVING filter reduces lineitem to a tiny keyset FIRST
    (one hash-agg with map-side partials), and that keyset drives the
    orders/customer joins — at 100 TB the big-order set is thousands of
    rows, so AQE turns both probe joins into broadcasts; the top-20 is
    TakeOrderedAndProject.  Quantities are integral doubles — ROUND
    makes the BIGINT sum exact on both engines."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round("l_quantity").cast("bigint")).alias("total_qty")
        )
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "total_qty",
            ratio_round(
                "CAST(ROUND(o_totalprice * 100) AS DECIMAL(38,0))", "100", 2
            ).alias("total_price"),
        )
    )


@query(
    "q152_dormant_rich_customers",
    oracle="""
    WITH recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01'),
    avg_bal AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer)
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_dormant,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0
             AS dormant_balance
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN avg_bal
    WHERE c.c_custkey NOT IN (SELECT o_custkey FROM recent)
      AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * avg_bal.n > avg_bal.s
    GROUP BY 1
    """,
    category="warehouse-join",
)
def q152_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance customers by nation (TPC-H Q22 spirit over
    this catalog's columns): customers holding an above-average account
    balance with NO order since 2001 — the win-back campaign list.

    Exactness: the above-average comparison is the integer cross-multiply
    bal_cents * n_customers > sum_cents — no float average ever exists.
    Shape: the recent-buyer keyset is order-dim-bounded and drives a
    left-anti join (broadcast at scale — distinct custkeys with recent
    orders is far smaller than customer); the global (sum, count) pair
    joins back as a broadcast 1-row aggregate (bnlj-scalar — the q164
    pattern), so the registry stays fully lazy: no job runs at plan
    construction.  Nation broadcasts.  Output is |nations| rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    recent = (
        o.where(
            F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    bal_c = F.round(F.col("c_acctbal") * 100).cast("bigint")
    tot = c.agg(
        F.sum(bal_c).alias("__bal_sum"),
        F.count(F.lit(1)).alias("__bal_n"),
    )
    return (
        c.join(recent, "c_custkey", "left_anti")
        .crossJoin(F.broadcast(tot))
        .where(bal_c * F.col("__bal_n") > F.col("__bal_sum"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            (F.sum(bal_c) / 100.0).alias("dormant_balance"),
        )
    )


@query(
    "q153_part_revenue_abc",
    oracle=f"""
    WITH pr AS (
      SELECT p.p_partkey, p.p_brand, SUM({_REV_U_SQL}) AS rev_u
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT *,
             SUM(rev_u) OVER (ORDER BY rev_u DESC, p_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_u,
             SUM(rev_u) OVER () AS total_u
      FROM pr),
    classed AS (
      SELECT p_brand,
             CASE WHEN cum_u * 10 <= total_u * 8 THEN 'A'
                  WHEN cum_u * 100 <= total_u * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked)
    SELECT p_brand, abc, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM classed GROUP BY 1, 2
    """,
    category="warehouse-analytics",
)
def q153_part_revenue_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts ranked by lifetime
    revenue; the head covering <=80% of cumulative revenue is class A,
    <=95% B, the tail C — counts per (brand, class).

    Exactness: class boundaries are integer cross-multiplications on
    exact BIGINT revenue units — no percentage float ever exists.
    Shape: the cumulative revenue is :func:`..prefix.global_cumsum` —
    the range-partitioned two-pass prefix sum — so the part dimension
    (2B rows at TPC-H SF10k) is sorted in N parallel range slices, not
    one single-partition window task; the grand total rides the same
    broadcast offsets frame.  Plan-contract-tested: no
    ``Exchange SinglePartition`` feeds a Window anywhere in this plan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    pr = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_brand")
        .agg(F.sum(_rev_u()).alias("rev_u"))
    )
    # size_hint=part (round 13): pr is keyed by p_partkey, so |pr| <=
    # |part| — the join-inflated Catalyst estimate of pr itself would
    # otherwise keep the two-pass machinery on at dim sizes where its
    # fixed cost dominates; at warehouse scale part outgrows the
    # threshold and the range two-pass comes back
    ranked = global_cumsum(
        pr,
        [F.col("rev_u").desc(), F.col("p_partkey")],
        "rev_u",
        "cum_u",
        total_col="total_u",
        size_hint=p,
    )
    classed = ranked.select(
        "p_brand",
        F.when(F.col("cum_u") * 10 <= F.col("total_u") * 8, "A")
        .when(F.col("cum_u") * 100 <= F.col("total_u") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("p_brand", "abc").agg(
        F.count(F.lit(1)).alias("n_parts")
    )


@query(
    "q167_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_REV_U_SQL}) AS rev_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1),
    mx AS (SELECT MAX(rev_u) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name,
           (r.rev_u * 200 + 10000) // 20000 / 100.0 AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey, mx
    WHERE r.rev_u = mx.m
    """,
    category="warehouse-join",
)
def q167_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier of 1996Q1 (TPC-H Q15 shape): the supplier(s) whose
    quarter revenue equals the maximum — Q15's view+max formulated as
    one aggregate plus a broadcast scalar.

    Exactness: revenue compared as exact BIGINT 1e-4 dollar units, so
    the equality join against the max cannot float-miss; the display
    value is the integer-decided 2-decimal ratio.  Shape: the shipdate
    predicate prunes the lineitem scan (quarter partition at scale),
    one hash-agg to supplier grain, the 1-row max rides a broadcast
    cross join (bnlj-scalar), and the supplier dim joins on its key —
    output is the argmax set (1 row absent ties)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_u()).alias("rev_u"))
    )
    mx = rev.agg(F.max("rev_u").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_u") == F.col("m"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            ratio_round("rev_u", "10000", 2).alias("total_revenue"),
        )
    )


@query(
    "q168_small_qty_revenue",
    oracle="""
    WITH j AS (
      SELECT l.l_partkey,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#3'),
    st AS (SELECT l_partkey, SUM(q) AS sq, CAST(COUNT(*) AS BIGINT) AS n
           FROM j GROUP BY 1)
    SELECT (SUM(j.c) * 200 + 700) // 1400 / 100.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM j JOIN st USING (l_partkey)
    WHERE j.q * 5 * st.n < st.sq
    """,
    category="warehouse-analytics",
)
def q168_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity order revenue (TPC-H Q17 shape): for one brand,
    the average yearly revenue lost if orders below 20% of a part's
    average quantity moved to bulk — the classic correlated-subquery
    report.

    Exactness: quantities are integral doubles rounded to BIGINT, and
    the 20%-of-average test is the cross-multiplication
    5·q·n < Σq — no float average exists; the /7 yearly average is the
    integer-decided 2-decimal ratio.  Shape: the brand predicate prunes
    part BEFORE the join (broadcast — one brand is 1/|brands| of a
    dim), and the per-part average comes from a WINDOW over the already
    joined-and-filtered rows, so lineitem is scanned ONCE and shuffled
    once on partkey; a subquery formulation would scan it twice.
    1-row output."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    from pyspark.sql import Window

    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey",
        F.round("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    w = Window.partitionBy("l_partkey")
    stats = j.select(
        "q",
        "c",
        F.sum("q").over(w).alias("sq"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return stats.where(F.col("q") * 5 * F.col("n") < F.col("sq")).agg(
        ratio_round("SUM(c)", "700", 2).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q169_customer_pareto",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT x,
             SUM(x) OVER (ORDER BY x DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(x) OVER () AS tot,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_cust
      FROM spend),
    thr AS (SELECT unnest([50, 80, 95]) AS pct)
    SELECT CAST(thr.pct AS BIGINT) AS pct,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           (COUNT(*) * 20000 + MAX(n_cust)) // (2 * MAX(n_cust))
             / 10000.0 AS base_share
    FROM ranked, thr
    WHERE (ranked.cum - ranked.x) * 100 < ranked.tot * thr.pct
    GROUP BY 1
    """,
    category="warehouse-analytics",
)
def q169_customer_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration ladder: how many customers (and what share
    of the base) it takes to cover 50/80/95% of lifetime revenue — the
    whale curve behind every key-account program, and q153's ABC logic
    read at the customer grain.

    Exactness: "still needed at pct%" is the integer cross-multiply
    (cum − x)·100 < tot·pct on exact cent sums — a customer counts
    while the revenue BEFORE it hasn't reached the threshold; both
    shares are integer-decided.  Shape: the cumulative sum is the
    two-pass range prefix (operators/prefix.py — no single-partition
    window over the customer dim); the 3-row threshold table rides a
    broadcast nested-loop; 3-row output."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x")
    )
    ranked = global_cumsum(
        spend,
        [F.col("x").desc(), F.col("o_custkey")],
        "x",
        "cum",
        total_col="tot",
        count_total_col="n_cust",
    )
    thr = F.broadcast(
        spark.range(1).select(
            F.explode(F.array(F.lit(50), F.lit(80), F.lit(95))).alias("pct")
        )
    )
    return (
        ranked.crossJoin(thr)
        .where((F.col("cum") - F.col("x")) * 100 < F.col("tot") * F.col("pct"))
        .groupBy(F.col("pct").cast("bigint").alias("pct"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.max("n_cust").alias("n_cust"),
        )
        .select(
            "pct",
            "n_customers",
            ratio_e4("n_customers", "n_cust").alias("base_share"),
        )
    )


@query(
    "q173_forecast_revenue",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0
             AS promo_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    category="warehouse-analytics",
)
def q173_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-change forecast (TPC-H Q6 shape): the revenue that would
    have been retained by eliminating small-quantity 5-7% discounts in
    one ship year — the canonical full-predicate-pushdown query.

    Exactness: price x discount multiplies two exact integer scales
    (cents x discount points = 1e-4 dollar units), summed as BIGINT and
    divided once; the raw-double range predicates compare the same IEEE
    values on both engines (fixture decimals are exact 2-decimal
    doubles).  Shape: ALL FOUR predicates reach the parquet scan
    (row-group pruning on shipdate at scale), no join, no shuffle
    beyond the final 2-scalar aggregate — the cheapest possible plan
    for the question."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    * F.round(F.col("l_discount") * 100).cast("bigint")
                )
                / 10000.0
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q174_order_aging",
    oracle="""
    WITH a AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
             date_diff('day', o_orderdate, TIMESTAMP '2001-08-01') AS age
      FROM orders)
    SELECT o_orderpriority,
           CASE WHEN age < 365 THEN 'lt_1y'
                WHEN age < 1095 THEN '1y_3y'
                WHEN age < 1825 THEN '3y_5y'
                ELSE 'ge_5y' END AS age_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_open,
           SUM(c) / 100.0 AS total_value
    FROM a GROUP BY 1, 2
    """,
    category="warehouse-analytics",
)
def q174_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-book aging matrix: orders bucketed by priority x age band
    (relative to the fixture's 2001-08-01 horizon), with open-order
    counts and exact total value — the backlog-health report an ops
    desk reads daily.

    Exactness: ages are integer day differences (identical calendar
    arithmetic both engines), bands are integer CASE cuts, value sums
    exact cents.  Shape: a narrow map into ONE hash-agg; output is
    |priorities| x 4 bands at any scale."""
    o = table(spark, sf_dir, "orders")
    age = F.datediff(
        F.lit("2001-08-01").cast("timestamp"), F.col("o_orderdate")
    )
    band = (
        F.when(age < 365, "lt_1y")
        .when(age < 1095, "1y_3y")
        .when(age < 1825, "3y_5y")
        .otherwise("ge_5y")
    )
    return (
        o.groupBy("o_orderpriority", band.alias("age_band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_open"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                / 100.0
            ).alias("total_value"),
        )
    )


@query(
    "q179_sole_late_supplier",
    oracle="""
    WITH j AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    g AS (SELECT l_orderkey,
                 COUNT(DISTINCT l_suppkey) AS ns,
                 COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
                   AS nlate
          FROM j GROUP BY 1),
    cand AS (SELECT DISTINCT l_orderkey, l_suppkey FROM j WHERE late = 1)
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM cand c
    JOIN g ON g.l_orderkey = c.l_orderkey AND g.ns >= 2 AND g.nlate = 1
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    GROUP BY 1, 2
    """,
    category="warehouse-join",
)
def q179_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who SOLELY held up a multi-supplier order (TPC-H Q21
    shape over this catalog's columns: no commit/receipt dates, so
    "late" is shipping >365 days after the order date): for each
    supplier, the number of orders where it shipped late while every
    other participating supplier shipped on time — the
    who-do-we-fire-from-the-consortium report.

    Exactness: lateness is a pure timestamp comparison (identical NTZ
    interval arithmetic on both engines), everything after it is
    integer counting over DISTINCT keys.  Shape: ONE fact-fact join
    computes the skinny 3-int (orderkey, suppkey, late) projection,
    which a single (orderkey, suppkey) hash-agg collapses to per-pair
    rows (late_s = max(late)); the Q21 EXISTS / NOT-EXISTS pair then
    becomes TWO window aggregates over orderkey on that pair frame
    (ns = count, nlate = sum(late_s)) — no second branch, no second
    scan, no checkpoint pin (the r8 advisor flagged the previous
    localCheckpoint variant for never unpersisting its blocks and for
    being non-recomputable on executor loss; this plan is pure
    lineage).  The pair frame is orders-bounded, so the window
    partitions by orderkey — millions of partitions, no skew (an
    order has a handful of suppliers).  Supplier (|S| rows,
    key-bounded) broadcasts for the name stitch.  Output is
    supplier-bounded."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
            )
            .cast("int")
            .alias("late"),
        )
        # ONE explicit orderkey exchange feeds BOTH the pair aggregation
        # and the orderkey window below (round 14, guide §2.4: two
        # operations keyed compatibly share one exchange) —
        # hash(l_orderkey) satisfies the (l_orderkey, l_suppkey) groupBy's
        # clustered distribution AND the window's partitioning, so the
        # old agg exchange + window exchange collapse to this single one.
        # The map-side partial agg it forgoes collapsed almost nothing
        # here (an order's lineitems rarely repeat a supplier), so the
        # shuffle carries ~the same bytes through one exchange, not two.
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late_s"))
    )
    w = Window.partitionBy("l_orderkey")
    prof = pairs.select(
        "l_orderkey",
        "l_suppkey",
        "late_s",
        F.count(F.lit(1)).over(w).alias("ns"),
        F.sum("late_s").over(w).alias("nlate"),
    )
    per = (
        prof.where(
            (F.col("late_s") == 1)
            & (F.col("ns") >= 2)
            & (F.col("nlate") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return per.join(
        F.broadcast(s), per.l_suppkey == s.s_suppkey
    ).select("s_suppkey", "s_name", "numwait")


@query(
    "q183_price_size_slope",
    oracle="""
    WITH b AS (SELECT p_brand,
                      CAST(p_size AS BIGINT) AS x,
                      CAST(ROUND(p_retailprice * 100) AS BIGINT) AS y
               FROM part),
    m AS (SELECT p_brand,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM b GROUP BY 1)
    SELECT p_brand, n AS n_parts,
           ROUND(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                      AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                        AS DOUBLE), 6) AS slope_cents,
           (sy * 20000 + 100 * n) // (200 * n) / 10000.0 AS avg_price
    FROM m
    WHERE CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
    """,
    category="warehouse-trend",
)
def q183_price_size_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price/size elasticity: the OLS slope of retail price
    (cents) on part size — the catalog-pricing sanity report ("does
    this brand actually charge for size?"), q161's regression
    discipline pointed at the product dimension instead of the tape.

    Exactness: the five moments (n, Σx, Σy, Σxy, Σx²) aggregate as
    exact BIGINTs; the cross-products are widened to DECIMAL(38,0) /
    HUGEINT BEFORE multiplication (the q162 widening rule — n·Σxy
    escapes int64 once brands hold ~1e9 parts), and the slope is ONE
    float division on identical integers.  Degenerate brands (a single
    distinct size) are excluded by the integer variance test, never by
    a float epsilon.  Shape: one brand-keyed partial agg — map-side
    combine reduces the scan to |brands| moment rows; no joins, no
    windows.  25-row output at any scale."""
    p = table(spark, sf_dir, "part")
    b = p.select(
        "p_brand",
        F.col("p_size").cast("bigint").alias("x"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("y"),
    )
    m = b.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * F.col("sxy") - dec("sx") * F.col("sy")
    den = dec("n") * F.col("sxx") - dec("sx") * F.col("sx")
    return (
        m.where(den > 0)
        .select(
            "p_brand",
            F.col("n").alias("n_parts"),
            F.round(
                num.cast("double") / den.cast("double"), 6
            ).alias("slope_cents"),
            ratio_e4("sy", "100 * n").alias("avg_price"),
        )
    )
