"""Round-8 depth additions (q187-q192): shipping-latency quartiles,
supplier concentration HHI, intraday volume profile, duplicate
multiplicity histogram, length/word correlation, weekday x priority
seasonality.

Same discipline as every extension block: exact integer arithmetic for
every published number (cents BIGINT, ratios via the deterministic
round-half-up identity, moments widened to DECIMAL(38,0)/HUGEINT before
any product of aggregates — the q162 rule), exact interpolated
percentiles on integers (Spark ``percentile`` == DuckDB
``quantile_cont``, the q27/q143 precedent), and shuffle shapes that
stay key-bounded at 100 TB.  Reference parity: the reference stops at
scan/count (`timeseries_db.cpp:29-233`); these extend SURVEY §2.2's
warehouse / tape / curation rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query


@query(
    "q187_ship_latency",
    oracle="""
    WITH j AS (
      SELECT o.o_orderpriority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lat_d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(quantile_cont(lat_d, 0.25), 4) AS p25_days,
           ROUND(quantile_cont(lat_d, 0.50), 4) AS p50_days,
           ROUND(quantile_cont(lat_d, 0.75), 4) AS p75_days,
           CAST(MAX(lat_d) AS BIGINT) AS max_days
    FROM j GROUP BY 1
    """,
    category="warehouse-datetime",
)
def q187_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency quartiles per priority class — the
    fulfilment SLA panel (q174 buckets open-order AGE; this measures
    the shipping pipeline's speed on the shipped lines).

    Exactness: latency is an integer day difference (identical DATE
    arithmetic both engines), quartiles are exact interpolated
    percentiles on integers (q27/q143 precedent).  Shape: ONE
    fact-fact join keyed by orderkey (the skinny 2-column projections
    shuffle), then a |priorities|-row agg; the percentile partials
    merge map-side."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority",
                                              "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("lat_d"),
    )
    ps = F.percentile("lat_d", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            ps.alias("ps"),
            F.max("lat_d").alias("max_days"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            *[
                F.round(F.col("ps")[i], 4).alias(n)
                for i, n in enumerate(("p25_days", "p50_days", "p75_days"))
            ],
            "max_days",
        )
    )


@query(
    "q188_supplier_hhi",
    oracle="""
    WITH r AS (
      SELECT s.s_nationkey,
             l.l_suppkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice
                                 * (1 - l.l_discount) * 10000)
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    n AS (
      SELECT s_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             SUM(CAST(rev AS HUGEINT) * rev) AS sq,
             CAST(SUM(rev) AS HUGEINT) AS tot
      FROM r GROUP BY 1)
    SELECT nat.n_name, n_suppliers,
           (sq * 20000 + tot * tot) // (2 * tot * tot) / 10000.0
             AS hhi_e4
    FROM n JOIN nation nat ON nat.n_nationkey = n.s_nationkey
    WHERE tot > 0
    """,
    category="warehouse-concentration",
)
def q188_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation: the Herfindahl index
    sum(share_i^2) of each nation's supplier revenue split — the
    procurement-risk screen beside q118 (turnover HHI on the tape) and
    q144 (flow concentration): HHI near 1/n = competitive supply base,
    near 1 = single-supplier dependency.

    Exactness: revenue aggregates as exact e4-scaled BIGINTs; HHI =
    sum(rev^2)/tot^2 with BOTH products widened to DECIMAL(38,0) /
    HUGEINT BEFORE multiplying (rev ~ 1e13 at 100 TB squares past
    int64 — the q162 rule), rounded by the ratio_e4 identity.  Shape:
    one supplier-keyed fact agg (map-side partials), a |suppliers|-row
    second agg, a 25-row broadcast nation stitch."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.expr("l_extendedprice * (1 - l_discount)") * 10000)
        .cast("bigint")
        .alias("rev_u"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation")
    r = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("rev_u").alias("rev"))
    )
    n = r.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(
            F.col("rev").cast("decimal(38,0)") * F.col("rev")
        ).alias("sq"),
        F.sum("rev").cast("decimal(38,0)").alias("tot"),
    )
    return (
        n.where(F.col("tot") > 0)
        .join(F.broadcast(nat), n.s_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            "n_suppliers",
            ratio_e4("sq", "tot * tot").alias("hhi_e4"),
        )
    )


@query(
    "q189_intraday_volume_profile",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n_ticks,
             CAST(SUM(user_id) AS BIGINT) AS vol
      FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, CAST(SUM(vol) AS BIGINT) AS tot FROM h
          GROUP BY 1)
    SELECT h.event_type, hr, n_ticks, vol,
           (vol * 20000 + tot) // (2 * tot) / 10000.0 AS vol_share
    FROM h JOIN t ON h.event_type = t.event_type
    WHERE tot > 0
    """,
    category="timeseries-profile",
)
def q189_intraday_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday (hour-of-day) volume profile per symbol: each clock
    hour's share of the symbol's total traded size — the U-shape
    seasonality curve execution schedulers (VWAP slicers) calibrate
    against; q96 profiles tick COUNTS, this weights by SIZE.

    Exactness: hour extraction on the NTZ timestamp is identical in
    both engines (the catalog pins UTC), volumes are integer, shares
    integer-decided.  Shape: one (symbol, hour) hash-agg collapses the
    tape to a <= |symbols| x 24 grid; the per-symbol total rides a
    window over that grid (no second scan), the publish is in-row.
    Output is grid-bounded at any scale."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("user_id").cast("bigint").alias("vol"),
    )
    tot = F.sum("vol").over(Window.partitionBy("event_type"))
    return (
        h.withColumn("tot", tot)
        .where(F.col("tot") > 0)
        .select(
            "event_type",
            "hr",
            "n_ticks",
            "vol",
            ratio_e4("vol", "tot").alias("vol_share"),
        )
    )


@query(
    "q190_dup_multiplicity",
    oracle="""
    WITH g AS (SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS sz
               FROM documents GROUP BY 1)
    SELECT sz AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM g GROUP BY 1
    """,
    category="llm-dedup",
)
def q190_dup_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate multiplicity histogram: how many identical-text
    groups exist at each copy count — the dedup PLANNING report (q50
    picks survivors; q100 rates sources; this sizes the problem: a fat
    tail of high-multiplicity groups means boilerplate, a flat 1-spike
    means the corpus is already clean).

    Exactness: md5 is bit-identical across engines, everything else is
    integer counting.  Shape: one hash-agg on the 32-byte digest
    (map-side partials — the corpus never moves, only digests), then a
    histogram agg over the |groups| frame.  Output bounded by the
    largest multiplicity."""
    d = table(spark, sf_dir, "documents")
    g = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    return g.groupBy(F.col("sz").alias("group_size")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("sz").alias("n_docs"),
    )


@query(
    "q191_length_word_corr",
    oracle="""
    WITH b AS (
      SELECT source,
             CAST(LENGTH(text) AS BIGINT) AS x,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))
                  AS BIGINT) AS y
      FROM documents),
    m AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM b GROUP BY 1)
    SELECT source, n AS n_docs,
           ROUND(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                      AS DOUBLE)
                 / sqrt(CAST((CAST(n AS HUGEINT) * sxx
                              - CAST(sx AS HUGEINT) * sx)
                             * (CAST(n AS HUGEINT) * syy
                                - CAST(sy AS HUGEINT) * sy) AS DOUBLE)),
                 6) AS corr_len_words
    FROM m
    WHERE CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
      AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
    """,
    category="llm-curation",
)
def q191_length_word_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation between document length and space
    count (a separator-counting word proxy) — the tokenizer-drift
    screen: a source whose length/word relationship departs from the
    corpus norm is code, tables, or CJK-like text that needs its own
    tokenizer budget (q142 measures fertility; this flags WHERE the
    linear assumption breaks).

    Exactness: x and y are byte-exact integer string measures, the five
    moments aggregate as BIGINTs, cross-products widen to
    DECIMAL(38,0)/HUGEINT BEFORE multiplication (q162/q183 rule), and
    the correlation is ONE float expression on identical integers,
    rounded to 6 — degenerate sources (zero variance on either axis)
    are excluded by integer tests.  Shape: one narrow map + one
    source-keyed hash-agg; |sources|-row output."""
    d = table(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.length("text").cast("bigint").alias("x"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
        )
        .cast("bigint")
        .alias("y"),
    )
    m = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    vx = f"{dec.format('n')} * sxx - {dec.format('sx')} * sx"
    vy = f"{dec.format('n')} * syy - {dec.format('sy')} * sy"
    cov = f"{dec.format('n')} * sxy - {dec.format('sx')} * sy"
    return m.where(F.expr(f"({vx}) > 0 AND ({vy}) > 0")).select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(
            F.expr(f"CAST(({cov}) AS DOUBLE) / sqrt(CAST(({vx}) * ({vy}) AS DOUBLE))"),
            6,
        ).alias("corr_len_words"),
    )


@query(
    "q192_weekday_priority_matrix",
    oracle="""
    SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_dow,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS total
    FROM orders GROUP BY 1, 2
    """,
    category="warehouse-datetime",
)
def q192_weekday_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order placement seasonality: the ISO-weekday x priority matrix of
    order counts and exact cent totals — the staffing/capacity heatmap
    (q146 profiles the tape's weekday volume; this profiles the order
    book's).

    Exactness: ISO weekday (Monday=1..Sunday=7) is Spark's weekday()+1
    == DuckDB's isodow() — pinned explicitly because the engines'
    DEFAULT dayofweek functions disagree on the week origin (Spark
    dayofweek: Sunday=1; DuckDB dayofweek: Sunday=0); money is integer
    cents.  Shape: one narrow map + one 7x|priorities| hash-agg with
    map-side partials; grid-bounded output."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_dow"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(cents("o_totalprice")) / 100.0, 2).alias("total"),
        )
    )
