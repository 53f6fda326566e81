"""Round-9 depth additions (q206-q223): product margin by nation-year
(TPC-H Q9 shape), suppliers-per-order distribution, prospect segments
(TPC-H Q22 shape), moving-average crossover screen, DAU/MAU stickiness
(interval sweep), L28 activity histogram, engulfing-candle screen,
prefix-collision dedup groups, monotone tick runs, session bounce rate,
per-source boilerplate signature, user-type affinity lift, single-source
supply risk, embedding label-balance audit, order fill-days quartiles,
gap-continuation screen, repeat-purchase conversion, cross-language
duplicate audit.

Same discipline as every extension block: exact integer arithmetic for
every published number (cents BIGINT, ratios via the deterministic
round-half-up identity), per-key windows only on keys whose cardinality
scales with the data (user_id, not symbol — the 5-symbol tape ops route
through the q156-precedent bounded frames), and shuffle shapes that stay
key-bounded at 100 TB.  Reference parity: the reference stops at
scan/count (`timeseries_db.cpp:29-233`); these extend SURVEY §2.2's
warehouse / engagement / tape / curation rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents, ratio_e4
from ..registry import query

# ---------------------------------------------------------------------------
# q206: product margin by supplier nation x ship year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

_MARGIN_U_SQL = """
    CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
    - CAST(ROUND(p_retailprice * 100) AS BIGINT) * 100
      * CAST(l_quantity AS BIGINT)
"""


@query(
    "q206_product_margin",
    oracle=f"""
    SELECT n.n_name,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           SUM({_MARGIN_U_SQL}) / 1000000.0 AS margin
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    category="warehouse-join",
)
def q206_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product margin (discounted revenue minus retail cost of goods)
    per supplier nation per ship year — the TPC-H Q9 profit shape on
    this schema (no partsupp, so p_retailprice*quantity stands in for
    supplycost*quantity).

    Exactness: revenue in e4-cents and cost in e4-cents are both exact
    BIGINTs (quantity is integral, retailprice 2-decimal), the signed
    margin sums order-independently, and the single /1e6 at the end is
    one IEEE division of identical integers on both engines — the
    money_sum rule.

    Shape: the fact shuffles twice (partkey, then suppkey — the
    canonical Q9 join order; each probe side projects 2 columns),
    nation broadcasts, and the final agg is |nations x years| — dim-
    sized.  No window, no sort, every join key is data-uniform."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    cost_u = (
        cents("p_retailprice") * 100 * F.col("l_quantity").cast("bigint")
    )
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
            (rev_u - cost_u).alias("margin_u"),
        )
    )
    return j.groupBy("n_name", "ship_year").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum("margin_u") / 1000000.0).alias("margin"),
    )


# ---------------------------------------------------------------------------
# q207: suppliers-per-order distribution
# ---------------------------------------------------------------------------


@query(
    "q207_supplier_span",
    oracle="""
    WITH o AS (SELECT l_orderkey,
                      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
                      CAST(COUNT(*) AS BIGINT) AS n_lines
               FROM lineitem GROUP BY 1)
    SELECT n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines
    FROM o GROUP BY 1
    """,
    category="warehouse-agg",
)
def q207_supplier_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers an order draws from — the
    fulfilment-complexity distribution (1-supplier orders ship in one
    box; 4-supplier orders are the consolidation workload).

    Exactness: pure integer counts.  Shape: one orderkey-keyed hash-agg
    (COUNT DISTINCT over the order's handful of suppliers — partials
    merge map-side), then a histogram agg over the tiny distinct-count
    domain.  Two shuffles, both key-bounded; no window."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return per_order.groupBy("n_suppliers").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n_lines").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q208: prospect segments (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


@query(
    "q208_prospect_segments",
    oracle="""
    WITH oc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_ord
                FROM orders GROUP BY 1),
    pos AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
                   SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_pos
            FROM customer WHERE c_acctbal > 0),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer),
    ot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders),
    c2 AS (SELECT c.c_mktsegment,
                  CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c,
                  COALESCE(oc.n_ord, 0) AS n_ord
           FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_prospects,
           SUM(bal_c) / 100.0 AS total_bal,
           CAST(SUM(n_ord) AS BIGINT) AS orders_held
    FROM c2, pos, tot, ot
    WHERE bal_c * pos.n_pos > pos.sum_pos
      AND n_ord * 2 * tot.n_cust < ot.n_orders
    GROUP BY 1
    """,
    category="warehouse-join",
)
def q208_prospect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-wallet prospects (TPC-H Q22 shape, de-degenerated for
    this data where every customer has ordered): customers holding an
    above-average positive balance whose order count is below HALF the
    average orders-per-customer, per market segment — big wallet,
    small share; where the sales team should dial.

    Exactness: neither threshold ever divides — above-average is
    bal_cents * n_pos > sum_pos_cents and low-engagement is
    n_ord * 2 * n_cust < n_orders, all exact integers on both engines;
    segment totals are exact cents sums divided once by 100.

    Shape: one custkey-keyed order count joined LEFT onto customers
    (zero-order customers keep n_ord=0 — the Q22 anti-join is the
    degenerate case of this), the two scalar probes broadcast into the
    filter (the q53 class), and the output agg is |segments|-sized."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", cents("c_acctbal").alias("bal_c")
    )
    o = table(spark, sf_dir, "orders").select("o_custkey")
    oc = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_ord"))
    pos = c.where(F.col("bal_c") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"), F.sum("bal_c").alias("sum_pos")
    )
    tots = c.agg(F.count(F.lit(1)).alias("n_cust")).crossJoin(
        o.agg(F.count(F.lit(1)).alias("n_orders"))
    )
    c2 = c.join(oc, c.c_custkey == oc.o_custkey, "left").select(
        "c_mktsegment",
        "bal_c",
        F.coalesce(F.col("n_ord"), F.lit(0)).alias("n_ord"),
    )
    prospects = (
        c2.crossJoin(F.broadcast(pos))
        .crossJoin(F.broadcast(tots))
        .where(
            (F.col("bal_c") * F.col("n_pos") > F.col("sum_pos"))
            & (F.col("n_ord") * 2 * F.col("n_cust") < F.col("n_orders"))
        )
    )
    return prospects.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_prospects"),
        (F.sum("bal_c") / 100.0).alias("total_bal"),
        F.sum("n_ord").alias("orders_held"),
    )


# ---------------------------------------------------------------------------
# q209: moving-average crossover screen
# ---------------------------------------------------------------------------

_MA_FAST, _MA_SLOW = 5, 20


@query(
    "q209_ma_crossover",
    oracle=f"""
    WITH c AS (SELECT event_type, ts, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events),
    w AS (SELECT event_type, ts, event_id,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN {_MA_FAST - 1} PRECEDING
                              AND CURRENT ROW) AS s5,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN {_MA_SLOW - 1} PRECEDING
                              AND CURRENT ROW) AS s20,
                 COUNT(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                ROWS BETWEEN {_MA_SLOW - 1} PRECEDING
                                AND CURRENT ROW) AS n
          FROM c),
    st AS (SELECT event_type, ts, event_id,
                  CASE WHEN n < {_MA_SLOW} THEN NULL
                       WHEN {_MA_SLOW // _MA_FAST} * s5 > s20 THEN 1
                       WHEN {_MA_SLOW // _MA_FAST} * s5 < s20 THEN -1
                       ELSE 0 END AS state
           FROM w),
    lg AS (SELECT event_type, state,
                  lag(state) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id) AS prev
           FROM st)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(CASE WHEN state = 1 AND prev IS NOT NULL AND prev <= 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS cross_up,
           CAST(SUM(CASE WHEN state = -1 AND prev IS NOT NULL AND prev >= 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS cross_down
    FROM lg GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q209_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover screen: per symbol, how many times the
    fast SMA(5) crossed the slow SMA(20) upward (golden cross) and
    downward (death cross) — the canonical trend-following signal
    counter over the whole tape.

    Exactness: SMA5 > SMA20 is decided as 4*s5 > s20 in exact BIGINT
    cents sums (the q156 cross-multiplication rule — no float mean
    ever exists); the state is a 3-way integer sign and a cross is an
    integer state transition, so the counts cannot drift.

    Shape: two bounded trailing frames + one lag inside the SAME
    per-symbol sort (one exchange, O(1) amortized per row — the q156
    streaming-frame class), then a symbol-bounded agg."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    c = cents("value")
    s5 = F.sum(c).over(w.rowsBetween(-(_MA_FAST - 1), Window.currentRow))
    s20 = F.sum(c).over(w.rowsBetween(-(_MA_SLOW - 1), Window.currentRow))
    n = F.count(F.lit(1)).over(
        w.rowsBetween(-(_MA_SLOW - 1), Window.currentRow)
    )
    k = _MA_SLOW // _MA_FAST
    state = (
        F.when(n < _MA_SLOW, F.lit(None).cast("int"))
        .when(k * s5 > s20, F.lit(1))
        .when(k * s5 < s20, F.lit(-1))
        .otherwise(F.lit(0))
    )
    st = ev.select("event_type", "ts", "event_id", state.alias("state"))
    lg = st.select(
        "event_type",
        "state",
        F.lag("state").over(w).alias("prev"),
    )
    up = (F.col("state") == 1) & F.col("prev").isNotNull() & (
        F.col("prev") <= 0
    )
    dn = (F.col("state") == -1) & F.col("prev").isNotNull() & (
        F.col("prev") >= 0
    )
    return lg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.when(up, 1).otherwise(0)).cast("bigint").alias("cross_up"),
        F.sum(F.when(dn, 1).otherwise(0)).cast("bigint").alias("cross_down"),
    )


# ---------------------------------------------------------------------------
# q210: DAU/MAU stickiness via interval sweep
# ---------------------------------------------------------------------------

_MAU_DAYS = 28


@query(
    "q210_stickiness",
    oracle=f"""
    WITH ud AS (SELECT DISTINCT user_id,
                       CAST(date_diff('day', DATE '1970-01-01',
                                      CAST(ts AS DATE)) AS BIGINT) AS dno
                FROM events),
    days AS (SELECT DISTINCT dno FROM ud),
    mau AS (SELECT d.dno, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
            FROM days d JOIN ud u
              ON u.dno BETWEEN d.dno - {_MAU_DAYS - 1} AND d.dno
            GROUP BY 1),
    dau AS (SELECT dno, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1)
    SELECT d.dno, dau.dau, mau.mau,
           (dau.dau * 20000 + mau.mau) // (2 * mau.mau) / 10000.0
             AS stickiness_e4
    FROM days d JOIN dau USING (dno) JOIN mau USING (dno)
    """,
    category="engagement",
)
def q210_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the engagement-quality ratio
    (1/28 = every user shows once a month; 1.0 = everyone, daily),
    with MAU the trailing-{_MAU_DAYS}-day distinct-user count.

    The naive MAU (28-way explode or a distinct-over-range window)
    multiplies the activity table or serializes on a global window.
    This runs the q203 sweep instead: per user, distinct activity days
    merge into coverage islands (a new island only when the gap to the
    previous activity day exceeds {_MAU_DAYS - 1} days — overlapping
    [d, d+{_MAU_DAYS - 1}] cover intervals merge, so no user is ever
    counted twice), each island emits one +1/-1 boundary pair, and the
    trailing distinct count at every observed day reads off an integer
    prefix sum over the boundary stream — computed by the two-pass
    range prefix (:func:`..prefix.global_cumsum`, N-way parallel).

    Exactness: day numbers, boundaries, and the running count are all
    integers; query rows sort AFTER the day's boundaries (isq breaks
    the tie), so the count at a query row is order-invariant; the
    stickiness ratio is the integer-decided ratio_e4.  Shape: the only
    data-sized work is the distinct (user, day) agg; islands/boundaries
    are user-keyed windows over that frame, and the sweep runs on the
    boundary dim (2x|islands| + |days| rows)."""
    from .prefix import global_cumsum

    ev = table(spark, sf_dir, "events")
    dno = F.datediff(
        F.to_date("ts"), F.to_date(F.lit("1970-01-01"))
    ).cast("bigint")
    # pinned: ud feeds BOTH the island chain and the per-day DAU agg —
    # without the pin each consumer re-scans events (the single-scan
    # contract's q77/q100/q101 class); the frame is |users x active
    # days|, dim-sized at any scale
    # ud0 kept un-pinned as the dispatch size proxy below (its Catalyst
    # estimate survives; the checkpoint's LogicalRDD reports Long.Max)
    ud0 = ev.select("user_id", dno.alias("dno")).distinct()
    ud = ud0.localCheckpoint(eager=False)

    w = Window.partitionBy("user_id").orderBy("dno")
    gap_new = F.when(
        F.lag("dno").over(w).isNull()
        | (F.col("dno") > F.lag("dno").over(w) + (_MAU_DAYS - 1)),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = (
        ud.withColumn("iid", F.sum(gap_new).over(run))
        .groupBy("user_id", "iid")
        .agg(F.min("dno").alias("s"), F.max("dno").alias("e"))
    )
    # round 13: both boundary rows come out of ONE pass over the
    # islands frame (explode of a 2-struct array) — the old two-branch
    # union recomputed the distinct+window+agg island chain per branch
    bounds = isl.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("dno"),
                    F.lit(0).alias("isq"),
                    F.col("user_id"),
                    F.lit(1).cast("bigint").alias("delta"),
                    F.lit(None).cast("bigint").alias("dau"),
                ),
                F.struct(
                    (F.col("e") + _MAU_DAYS).alias("dno"),
                    F.lit(0).alias("isq"),
                    F.col("user_id"),
                    F.lit(-1).cast("bigint").alias("delta"),
                    F.lit(None).cast("bigint").alias("dau"),
                ),
            )
        ).alias("__b")
    ).select("__b.*")
    queries_ = ud.groupBy("dno").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    ).select(
        "dno",
        F.lit(1).alias("isq"),
        F.lit(-1).cast(ud.schema["user_id"].dataType).alias("user_id"),
        F.lit(0).cast("bigint").alias("delta"),
        "dau",
    )
    # round 13: no pinned partition count — the prefix dispatch picks
    # the classic single sort for this dim-sized boundary frame at
    # bench SF and the N-way two-pass above the size threshold (the
    # hardcoded 8 was a local-mode tuning, the class the optimization
    # guide warns about)
    # size_hint=ud0 (round-14 advice — the old events-relation proxy was
    # a units mismatch: wide event rows inflated the byte estimate and
    # forced the two-pass path even when the boundary frame was tiny):
    # the boundary stream is <= 3·|ud| narrow rows, so the UN-pinned
    # distinct (user, day) frame's own Catalyst estimate is the honest
    # same-width scale proxy (the pinned ud reports Long.Max)
    swept = global_cumsum(
        bounds.unionAll(queries_),
        [F.col("dno"), F.col("isq"), F.col("user_id"), F.col("delta")],
        "delta",
        "mau",
        size_hint=ud0,
    )
    out = swept.where(F.col("isq") == 1).select(
        "dno", "dau", F.col("mau").cast("bigint").alias("mau")
    )
    return out.select(
        "dno", "dau", "mau", ratio_e4("dau", "mau").alias("stickiness_e4")
    )


# ---------------------------------------------------------------------------
# q211: L28 activity histogram
# ---------------------------------------------------------------------------


@query(
    "q211_l28_histogram",
    oracle=f"""
    WITH ud AS (SELECT DISTINCT user_id,
                       CAST(date_diff('day', DATE '1970-01-01',
                                      CAST(ts AS DATE)) AS BIGINT) AS dno
                FROM events),
    anchor AS (SELECT MAX(dno) AS amax FROM ud),
    l AS (SELECT u.user_id, CAST(COUNT(*) AS BIGINT) AS active_days
          FROM ud u, anchor a
          WHERE u.dno BETWEEN a.amax - {_MAU_DAYS - 1} AND a.amax
          GROUP BY 1)
    SELECT active_days, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM l GROUP BY 1
    """,
    category="engagement",
)
def q211_l28_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The L28 curve: how many of the trailing 28 days (anchored at the
    dataset's last active day) each user was active, histogrammed — the
    canonical power-user / casual-user split (a healthy product shows a
    smile: mass at 1-2 and at 27-28).

    Exactness: integer day numbers and counts throughout.  Shape: the
    anchor is a 1-row max probe broadcast into the filter (the q53
    scalar-probe class — events scans twice, both 2-column pruned),
    then one distinct (user, day) agg within the window and a
    |users|-keyed count rolled into a <=28-row histogram."""
    ev = table(spark, sf_dir, "events")
    dno = F.datediff(
        F.to_date("ts"), F.to_date(F.lit("1970-01-01"))
    ).cast("bigint")
    ud = ev.select("user_id", dno.alias("dno")).distinct()
    anchor = ud.agg(F.max("dno").alias("amax"))
    l28 = (
        ud.crossJoin(F.broadcast(anchor))
        .where(F.col("dno") >= F.col("amax") - (_MAU_DAYS - 1))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("active_days"))
    )
    return l28.groupBy("active_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# q212: engulfing-candle screen
# ---------------------------------------------------------------------------


@query(
    "q212_engulfing_candles",
    oracle="""
    WITH t AS (SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events),
    r AS (SELECT event_type, day, c,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts, event_id) AS rn_o,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts DESC, event_id DESC) AS rn_c
          FROM t),
    d AS (SELECT event_type, day,
                 MAX(CASE WHEN rn_o = 1 THEN c END) AS o,
                 MAX(CASE WHEN rn_c = 1 THEN c END) AS cl
          FROM r GROUP BY 1, 2),
    lg AS (SELECT event_type, o, cl,
                  lag(o)  OVER (PARTITION BY event_type ORDER BY day) AS po,
                  lag(cl) OVER (PARTITION BY event_type ORDER BY day) AS pc
           FROM d)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN pc < po AND cl > o AND o <= pc AND cl >= po
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bullish,
           CAST(SUM(CASE WHEN pc > po AND cl < o AND o >= pc AND cl <= po
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bearish
    FROM lg GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q212_engulfing_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engulfing-candle screen over daily bars: per symbol, count the
    bullish engulfing days (yesterday red, today green, today's body
    spans yesterday's) and their bearish mirror — the classic two-bar
    reversal pattern.

    Exactness: open/close are original cent values picked by the
    deterministic (ts, event_id) total order (the q22 OHLC rule), and
    the pattern test is four integer comparisons — nothing can drift.

    Shape: the bar pass is two row_number windows + one hash-agg inside
    the SAME (symbol, day) partitioning — parallelism |symbols x days|,
    no symbol ceiling; the pattern lag runs on the |symbols x days| bar
    dim, and the output agg is symbol-bounded."""
    ev = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    t = ev.select(
        "event_type", day, "ts", "event_id", cents("value").alias("c")
    )
    by_bar = Window.partitionBy("event_type", "day")
    r = t.withColumn(
        "rn_o",
        F.row_number().over(by_bar.orderBy(F.asc("ts"), F.asc("event_id"))),
    ).withColumn(
        "rn_c",
        F.row_number().over(
            by_bar.orderBy(F.desc("ts"), F.desc("event_id"))
        ),
    )
    d = r.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_o") == 1, F.col("c"))).alias("o"),
        F.max(F.when(F.col("rn_c") == 1, F.col("c"))).alias("cl"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lg = d.select(
        "event_type",
        "o",
        "cl",
        F.lag("o").over(w).alias("po"),
        F.lag("cl").over(w).alias("pc"),
    )
    bull = (
        (F.col("pc") < F.col("po"))
        & (F.col("cl") > F.col("o"))
        & (F.col("o") <= F.col("pc"))
        & (F.col("cl") >= F.col("po"))
    )
    bear = (
        (F.col("pc") > F.col("po"))
        & (F.col("cl") < F.col("o"))
        & (F.col("o") >= F.col("pc"))
        & (F.col("cl") <= F.col("po"))
    )
    return lg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(bull, 1).otherwise(0)).cast("bigint").alias("n_bullish"),
        F.sum(F.when(bear, 1).otherwise(0)).cast("bigint").alias("n_bearish"),
    )


# ---------------------------------------------------------------------------
# q213: prefix-collision dedup groups
# ---------------------------------------------------------------------------

_PFX_CHARS = 64


@query(
    "q213_prefix_collisions",
    oracle=f"""
    WITH g AS (SELECT substr(text, 1, {_PFX_CHARS}) AS pfx,
                      CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_texts
               FROM documents GROUP BY 1)
    SELECT n_docs AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n_texts > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_divergent
    FROM g WHERE n_docs > 1 GROUP BY 1
    """,
    category="llm-dedup",
)
def q213_prefix_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-collision groups: documents sharing their first
    {_PFX_CHARS} characters, histogrammed by group size and split into
    exact-duplicate groups vs DIVERGENT groups (same opening,
    different continuation — the truncation / boilerplate-header
    signature that pure exact-hash dedup misses and near-dup passes
    pay full price to find).

    Exactness: the prefix is a plain character substring and text
    identity is md5 (identical hex on both engines) — integer counts
    all the way out.  Shape: one corpus scan; the group agg shuffles
    (prefix, md5) digests — 48 bytes/doc, the text never moves (the
    q50 digest rule); the histogram agg is output-bounded."""
    d = table(spark, sf_dir, "documents")
    g = (
        d.select(
            F.substring("text", 1, _PFX_CHARS).alias("pfx"),
            F.md5("text").alias("h"),
        )
        .groupBy("pfx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_texts"),
        )
        .where(F.col("n_docs") > 1)
    )
    return g.groupBy(F.col("n_docs").alias("group_size")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_texts") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_divergent"),
    )


# ---------------------------------------------------------------------------
# q214: monotone tick runs
# ---------------------------------------------------------------------------


@query(
    "q214_tick_runs",
    oracle="""
    WITH c AS (SELECT event_type, ts, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events),
    d AS (SELECT event_type, ts, event_id,
                 CASE WHEN c > lag(c) OVER w THEN 1
                      WHEN c < lag(c) OVER w THEN -1
                      WHEN lag(c) OVER w IS NULL THEN NULL
                      ELSE 0 END AS dir
          FROM c
          WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    ch AS (SELECT event_type, ts, event_id, dir,
                  CASE WHEN dir IS DISTINCT FROM lag(dir) OVER w
                       THEN 1 ELSE 0 END AS chg
           FROM d
           WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    s AS (SELECT event_type, dir,
                 SUM(chg) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS rid
          FROM ch),
    r AS (SELECT event_type, rid, MAX(dir) AS dir,
                 CAST(COUNT(*) AS BIGINT) AS len
          FROM s GROUP BY 1, 2)
    SELECT event_type,
           CAST(COALESCE(SUM(CASE WHEN dir = 1 THEN 1 END), 0) AS BIGINT)
             AS n_up_runs,
           CAST(COALESCE(SUM(CASE WHEN dir = -1 THEN 1 END), 0) AS BIGINT)
             AS n_down_runs,
           CAST(COALESCE(MAX(CASE WHEN dir = 1 THEN len END), 0) AS BIGINT)
             AS max_up_run,
           CAST(COALESCE(MAX(CASE WHEN dir = -1 THEN len END), 0) AS BIGINT)
             AS max_down_run
    FROM r GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q214_tick_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone tick runs per symbol: counts and maximum lengths of
    strictly-rising and strictly-falling tick streaks — the runs-test
    ingredient (a random walk's longest run grows ~log n; momentum and
    stale feeds both distort it).

    Exactness: the tick direction is a 3-way integer sign on exact
    cents, run ids are an integer prefix sum over direction changes
    (IS DISTINCT FROM handles the first-row NULL identically on both
    engines), and run stats are integer aggs.  Equal ticks (dir 0) and
    the first tick (dir NULL) form their own runs and are excluded by
    the dir filter in the final agg.

    Shape: a lag + a running sum inside ONE per-symbol sort (one
    exchange — the q37 gaps-and-islands shape on the tape), one
    (symbol, run) hash-agg, one symbol-bounded agg."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    c = cents("value")
    lagc = F.lag(c).over(w)
    d = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(lagc.isNull(), F.lit(None).cast("int"))
        .when(c > lagc, F.lit(1))
        .when(c < lagc, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("dir"),
    )
    ch = d.withColumn(
        "chg",
        F.when(
            ~F.col("dir").eqNullSafe(F.lag("dir").over(w)), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ch.withColumn("rid", F.sum("chg").over(run))
    r = s.groupBy("event_type", "rid").agg(
        F.max("dir").alias("dir"), F.count(F.lit(1)).alias("len")
    )
    return r.groupBy("event_type").agg(
        F.coalesce(
            F.sum(F.when(F.col("dir") == 1, 1)), F.lit(0)
        ).cast("bigint").alias("n_up_runs"),
        F.coalesce(
            F.sum(F.when(F.col("dir") == -1, 1)), F.lit(0)
        ).cast("bigint").alias("n_down_runs"),
        F.coalesce(
            F.max(F.when(F.col("dir") == 1, F.col("len"))), F.lit(0)
        ).cast("bigint").alias("max_up_run"),
        F.coalesce(
            F.max(F.when(F.col("dir") == -1, F.col("len"))), F.lit(0)
        ).cast("bigint").alias("max_down_run"),
    )


# ---------------------------------------------------------------------------
# q215: session bounce rate by entry type
# ---------------------------------------------------------------------------

_GAP_S = 1800  # the q37 session gap


@query(
    "q215_bounce_rate",
    oracle=f"""
    WITH g AS (SELECT user_id, ts, event_id, event_type,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {_GAP_S} * 1000000
                           THEN 1 ELSE 0 END AS new_s
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, event_type, new_s,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM g),
    sess AS (SELECT user_id, sid,
                    CAST(COUNT(*) AS BIGINT) AS n_events,
                    MAX(CASE WHEN new_s = 1 THEN event_type END) AS entry
             FROM s GROUP BY 1, 2)
    SELECT entry,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           (SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 20000
              + COUNT(*)) // (2 * COUNT(*)) / 10000.0 AS bounce_e4
    FROM sess GROUP BY 1
    """,
    category="timeseries-session",
)
def q215_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate by entry event type: of the sessions that
    OPENED with a given event type (q37's 30-min-gap sessions), what
    share contained exactly one event — the landing-quality metric
    (an 'error'-entry bounce is a crash; a 'view'-entry bounce is a
    content miss).

    Exactness: the session id is q37's integer gaps-and-islands sum,
    the entry type rides the session-start flag (exactly one new_s=1
    row per session, so MAX(CASE...) picks it without any ordered agg
    — no sort-aggregate, the max_by(struct) trap never appears), and
    the rate is the integer-decided ratio_e4.

    Shape: identical to q37 — one user-keyed exchange shared by the
    lag, the running sum, and the session agg — plus an entry-type-
    bounded output agg."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(
        gap.isNull() | (gap > _GAP_S * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.select(
        "user_id",
        "event_type",
        new_s.alias("new_s"),
        F.sum(new_s).over(run).cast("bigint").alias("sid"),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("new_s") == 1, F.col("event_type"))
        ).alias("entry"),
    )
    return sess.groupBy("entry").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        ratio_e4(
            "SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)", "COUNT(*)"
        ).alias("bounce_e4"),
    )


# ---------------------------------------------------------------------------
# q216: per-source top boilerplate shingle
# ---------------------------------------------------------------------------

_SRC_SHINGLES_SQL = """
    toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT source,
                  unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                        i -> t[i] || ' ' || t[i+1] || ' '
                                             || t[i+2])) AS s
           FROM toks)
"""


@query(
    "q216_top_boilerplate",
    oracle=f"""
    WITH {_SRC_SHINGLES_SQL},
    cnt AS (SELECT source, s, CAST(COUNT(*) AS BIGINT) AS n
            FROM sh GROUP BY 1, 2),
    mx AS (SELECT source, MAX(n) AS mc FROM cnt GROUP BY 1)
    SELECT c.source, MIN(c.s) AS top_shingle, CAST(m.mc AS BIGINT)
             AS occurrences
    FROM cnt c JOIN mx m ON c.source = m.source AND c.n = m.mc
    GROUP BY c.source, m.mc
    """,
    category="llm-curation",
)
def q216_top_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The most repeated word 3-gram per source (deterministic
    tie-break: lexicographically smallest among the most frequent) —
    the boilerplate signature a curation pipeline strips before
    training (navigation chrome, license headers, template scaffolds
    all surface here first).

    Exactness: integer counts and a string MIN — nothing to drift.
    Shape: one shingle explode feeding a (source, shingle) hash-agg
    (map-side partials — the q81 DF-table pass with source instead of
    doc_id), a |sources|-row max probe joined back (the q92
    vocabulary-probe class: two pruned passes beat materializing the
    exploded stream), and a |sources|-row output."""
    from ..functions.texthash import exploded_ngrams, shingles, tokens

    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    rows = exploded_ngrams(d.repartition(par), 3, "s", ["source"])
    cnt = rows.groupBy("source", "s").agg(F.count(F.lit(1)).alias("n"))
    mx = cnt.groupBy("source").agg(F.max("n").alias("mc")).select(
        F.col("source").alias("__src"), "mc"
    )
    top = cnt.join(
        mx, (cnt.source == mx["__src"]) & (cnt.n == mx.mc)
    ).select("source", "s", "mc")
    return top.groupBy("source", "mc").agg(
        F.min("s").alias("top_shingle")
    ).select(
        "source", "top_shingle", F.col("mc").cast("bigint").alias("occurrences")
    )


# ---------------------------------------------------------------------------
# q217: user x event-type affinity lift
# ---------------------------------------------------------------------------

_AFF_MIN_SUPPORT = 5
_AFF_TOPK = 20


@query(
    "q217_type_affinity",
    oracle=f"""
    WITH ut AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS u_t
                FROM events GROUP BY 1, 2),
    uu AS (SELECT user_id, CAST(SUM(u_t) AS BIGINT) AS u_tot FROM ut
           GROUP BY 1),
    gt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS g_t FROM events
           GROUP BY 1),
    gg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g_tot FROM events),
    l AS (SELECT ut.user_id, ut.event_type, ut.u_t,
                 (CAST(ut.u_t AS HUGEINT) * gg.g_tot * 20000
                    + CAST(uu.u_tot AS HUGEINT) * gt.g_t)
                   // (2 * CAST(uu.u_tot AS HUGEINT) * gt.g_t) / 10000.0
                   AS lift_e4
          FROM ut JOIN uu USING (user_id)
                  JOIN gt USING (event_type), gg
          WHERE ut.u_t >= {_AFF_MIN_SUPPORT})
    SELECT user_id, event_type, u_t, lift_e4
    FROM l
    ORDER BY lift_e4 DESC, user_id, event_type
    LIMIT {_AFF_TOPK}
    """,
    category="engagement",
)
def q217_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user x event-type affinity lifts: how over-represented a
    type is in one user's stream vs the population
    (lift = (u_t/u_tot) / (g_t/g_tot)) — the collaborative-filtering
    seed signal, with a minimum-support floor of {_AFF_MIN_SUPPORT}
    events so one-off actions can't fake affinity.

    Exactness: lift never divides by parts — it is the integer-decided
    ratio of the cross-products u_t*g_tot and u_tot*g_t, with one
    operand pre-cast to DECIMAL(38,0) so the MULTIPLY itself happens in
    decimal on the Spark side too (BIGINT products overflow int64 once
    g_tot reaches ~1e13 at 100 TB scale; DuckDB was already safe via
    HUGEINT).  The top-{_AFF_TOPK} total order (lift DESC, user, type)
    is unique.

    Shape: one (user, type) hash-agg; the per-user totals come from a
    window-free second agg over THAT (map-side, |users| keys); the
    |types|-row and 1-row probes broadcast; top-k is TakeOrdered — no
    global sort."""
    ev = table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("u_t")
    )
    uu = ut.groupBy("user_id").agg(F.sum("u_t").alias("u_tot"))
    gt = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("g_t"))
    gg = ev.agg(F.count(F.lit(1)).alias("g_tot"))
    l = (
        ut.where(F.col("u_t") >= _AFF_MIN_SUPPORT)
        .join(uu, "user_id")
        .join(F.broadcast(gt), "event_type")
        .crossJoin(F.broadcast(gg))
        .select(
            "user_id",
            "event_type",
            "u_t",
            ratio_e4(
                "CAST(u_t AS DECIMAL(38,0)) * g_tot",
                "CAST(u_tot AS DECIMAL(38,0)) * g_t",
            ).alias("lift_e4"),
        )
    )
    return l.orderBy(
        F.desc("lift_e4"), F.asc("user_id"), F.asc("event_type")
    ).limit(_AFF_TOPK)


# ---------------------------------------------------------------------------
# q218: single-source supply risk
# ---------------------------------------------------------------------------


@query(
    "q218_single_source_risk",
    oracle="""
    WITH p AS (SELECT l.l_partkey,
                      CAST(COUNT(DISTINCT s.s_nationkey) AS BIGINT)
                        AS n_nations,
                      SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 10000) AS BIGINT)) AS rev_u
               FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
               GROUP BY 1)
    SELECT n_nations,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           SUM(rev_u) / 1000000.0 AS revenue
    FROM p GROUP BY 1
    """,
    category="warehouse-join",
)
def q218_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration: parts bucketed by how many distinct
    supplier NATIONS actually shipped them, with the revenue flowing
    through each bucket — the n_nations=1 row is the single-source
    revenue at risk from one border closing (q188 measures supplier
    concentration within a nation; this measures geographic spread per
    part).

    Exactness: integer nation counts, exact e4-cent revenue, one IEEE
    /1e6 at the end (the q206 rule).  Shape: supplier's 2-column dim
    broadcasts into the fact scan, one partkey hash-agg (distinct over
    the part's handful of nations merges map-side), then an
    output-bounded histogram agg."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
        ).cast("bigint").alias("rev_u"),
    )
    s = F.broadcast(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    p = (
        li.join(s, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.countDistinct("s_nationkey").alias("n_nations"),
            F.sum("rev_u").alias("rev_u"),
        )
    )
    return p.groupBy("n_nations").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("rev_u") / 1000000.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q219: embedding label balance audit
# ---------------------------------------------------------------------------


@query(
    "q219_label_balance",
    oracle="""
    WITH c AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n
               FROM embeddings GROUP BY 1),
    a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_labels,
                 CAST(SUM(n) AS BIGINT) AS n_vecs,
                 CAST(MIN(n) AS BIGINT) AS min_count,
                 CAST(MAX(n) AS BIGINT) AS max_count,
                 SUM(CAST(n AS HUGEINT) * n) AS sum_c2
          FROM c)
    SELECT n_vecs, n_labels, min_count, max_count,
           (max_count * 20000 + min_count) // (2 * min_count) / 10000.0
             AS imbalance_e4,
           ((n_labels * sum_c2 - CAST(n_vecs AS HUGEINT) * n_vecs) * 20000
              + n_vecs) // (2 * CAST(n_vecs AS HUGEINT)) / 10000.0
             AS chi2_e4
    FROM a
    """,
    category="similarity",
)
def q219_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balance audit of the embedding table: class counts,
    max/min imbalance ratio, and the chi-square statistic against the
    uniform distribution — the dataset-health panel a training
    pipeline gates on before fitting anything (a skewed label column
    silently biases every downstream centroid/classifier).

    Exactness: chi2 against uniform expected counts reduces to
    (k·Σc² − N²)/N — numerator and denominator exact integers
    (DECIMAL(38,0)/HUGEINT widening before the product, the q162
    rule), both ratios integer-decided.  Shape: one label hash-agg,
    one 1-row rollup — single scan, output-bounded everywhere."""
    e = table(spark, sf_dir, "embeddings")
    c = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    a = c.agg(
        F.count(F.lit(1)).alias("n_labels"),
        F.sum("n").alias("n_vecs"),
        F.min("n").alias("min_count"),
        F.max("n").alias("max_count"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("sum_c2"),
    )
    return a.select(
        "n_vecs",
        "n_labels",
        "min_count",
        "max_count",
        ratio_e4("max_count", "min_count").alias("imbalance_e4"),
        ratio_e4(
            "n_labels * sum_c2 - CAST(n_vecs AS DECIMAL(38,0)) * n_vecs",
            "n_vecs",
        ).alias("chi2_e4"),
    )


# ---------------------------------------------------------------------------
# q220: order completion latency (fill days) per priority
# ---------------------------------------------------------------------------


@query(
    "q220_order_fill_days",
    oracle="""
    WITH f AS (SELECT l_orderkey, MAX(l_shipdate) AS last_ship
               FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_orderpriority,
                 CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(f.last_ship AS DATE)) AS BIGINT)
                   AS fill_d
          FROM f JOIN orders o ON f.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(quantile_cont(fill_d, 0.25), 4) AS p25_days,
           ROUND(quantile_cont(fill_d, 0.50), 4) AS p50_days,
           ROUND(quantile_cont(fill_d, 0.75), 4) AS p75_days,
           CAST(MAX(fill_d) AS BIGINT) AS max_days
    FROM j GROUP BY 1
    """,
    category="warehouse-datetime",
)
def q220_order_fill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order COMPLETION latency quartiles per priority: days from order
    placement to the LAST line shipping — the customer-visible number
    (q187 measures per-line pipeline speed; an order is done when its
    slowest line ships).

    Exactness: integer day difference on the per-order MAX ship date,
    exact interpolated percentiles on integers (q27/q187 precedent).
    Shape: one orderkey hash-agg collapses lineitem to |orders| rows
    BEFORE the join (the fact-fact join moves one skinny row per
    order, not per line), then a |priorities|-row percentile agg."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    f = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    j = f.join(o, f.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("last_ship"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("fill_d"),
    )
    ps = F.percentile("fill_d", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            ps.alias("ps"),
            F.max("fill_d").alias("max_days"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            *[
                F.round(F.col("ps")[i], 4).alias(c)
                for i, c in enumerate(("p25_days", "p50_days", "p75_days"))
            ],
            "max_days",
        )
    )


# ---------------------------------------------------------------------------
# q221: overnight-gap continuation screen
# ---------------------------------------------------------------------------


@query(
    "q221_gap_continuation",
    oracle="""
    WITH t AS (SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events),
    r AS (SELECT event_type, day, c,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts, event_id) AS rn_o,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts DESC, event_id DESC) AS rn_c
          FROM t),
    d AS (SELECT event_type, day,
                 MAX(CASE WHEN rn_o = 1 THEN c END) AS o,
                 MAX(CASE WHEN rn_c = 1 THEN c END) AS cl
          FROM r GROUP BY 1, 2),
    lg AS (SELECT event_type, o, cl,
                  lag(cl) OVER (PARTITION BY event_type ORDER BY day) AS pc
           FROM d)
    SELECT event_type,
           CAST(SUM(CASE WHEN o > pc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap_up,
           CAST(SUM(CASE WHEN o > pc AND cl > o THEN 1 ELSE 0 END) AS BIGINT)
             AS n_up_continued,
           (SUM(CASE WHEN o > pc AND cl > o THEN 1 ELSE 0 END) * 20000
              + GREATEST(SUM(CASE WHEN o > pc THEN 1 ELSE 0 END), 1))
             // (2 * GREATEST(SUM(CASE WHEN o > pc THEN 1 ELSE 0 END), 1))
             / 10000.0 AS up_cont_e4,
           CAST(SUM(CASE WHEN o < pc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap_down,
           CAST(SUM(CASE WHEN o < pc AND cl < o THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down_continued
    FROM lg WHERE pc IS NOT NULL GROUP BY 1
    """,
    category="timeseries-indicator",
)
def q221_gap_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-and-go screen: of the days a symbol OPENED above the prior
    close (gap up), how many also CLOSED above their open — the
    continuation conditional behind the classic gap-fade/gap-go debate
    (q109 reports the gaps themselves; this measures what happened
    next).

    Exactness: opens/closes are original cents picked by the
    (ts, event_id) total order (q22 rule), every test an integer
    comparison, the rate integer-decided with a GREATEST(n,1)
    zero-gap guard (the q198 rule).  Shape: the q212 bar pass
    (|symbols x days| parallelism), a symbol lag on the bar dim, one
    symbol-bounded agg."""
    ev = table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        cents("value").alias("c"),
    )
    by_bar = Window.partitionBy("event_type", "day")
    r = t.withColumn(
        "rn_o",
        F.row_number().over(by_bar.orderBy(F.asc("ts"), F.asc("event_id"))),
    ).withColumn(
        "rn_c",
        F.row_number().over(by_bar.orderBy(F.desc("ts"), F.desc("event_id"))),
    )
    d = r.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_o") == 1, F.col("c"))).alias("o"),
        F.max(F.when(F.col("rn_c") == 1, F.col("c"))).alias("cl"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lg = d.select(
        "event_type", "o", "cl", F.lag("cl").over(w).alias("pc")
    ).where(F.col("pc").isNotNull())
    up = F.when((F.col("o") > F.col("pc")), 1).otherwise(0)
    upc = F.when(
        (F.col("o") > F.col("pc")) & (F.col("cl") > F.col("o")), 1
    ).otherwise(0)
    dn = F.when((F.col("o") < F.col("pc")), 1).otherwise(0)
    dnc = F.when(
        (F.col("o") < F.col("pc")) & (F.col("cl") < F.col("o")), 1
    ).otherwise(0)
    return lg.groupBy("event_type").agg(
        F.sum(up).cast("bigint").alias("n_gap_up"),
        F.sum(upc).cast("bigint").alias("n_up_continued"),
        ratio_e4(
            "SUM(CASE WHEN o > pc AND cl > o THEN 1 ELSE 0 END)",
            "GREATEST(SUM(CASE WHEN o > pc THEN 1 ELSE 0 END), 1)",
        ).alias("up_cont_e4"),
        F.sum(dn).cast("bigint").alias("n_gap_down"),
        F.sum(dnc).cast("bigint").alias("n_down_continued"),
    )


# ---------------------------------------------------------------------------
# q222: repeat-purchase conversion
# ---------------------------------------------------------------------------


@query(
    "q222_repeat_purchase",
    oracle="""
    WITH p AS (SELECT user_id, epoch_us(ts) AS us,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events WHERE event_type = 'purchase'),
    f AS (SELECT user_id,
                 MAX(CASE WHEN rn = 1 THEN us END) AS first_us,
                 MAX(CASE WHEN rn = 2 THEN us END) AS second_us,
                 CAST(MAX(rn) AS BIGINT) AS n_purchases
          FROM p GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           (SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END) * 20000
              + COUNT(*)) // (2 * COUNT(*)) / 10000.0 AS repeat_e4,
           ROUND(quantile_cont(second_us - first_us, 0.50), 4)
             AS p50_gap_us
    FROM f
    """,
    category="engagement",
)
def q222_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase conversion: of the users who ever purchased, the
    share that purchased AGAIN, and the median time from first to
    second purchase — the retention number subscription pricing is
    built on (q181 times signup→first purchase; this times
    first→second).

    Exactness: purchase ranks ride the (ts, event_id) total order,
    the gap is integer microseconds, the share integer-decided, and
    the median an exact interpolated percentile over integers (NULL
    gaps — single-purchase users — are excluded by both engines'
    percentile semantics).  Shape: one user-keyed window on the
    purchase-filtered slice (filter pushes to the scan), one |users|
    agg, one 1-row rollup."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.row_number().over(w).alias("rn"),
    )
    f = p.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("us"))).alias("first_us"),
        F.max(F.when(F.col("rn") == 2, F.col("us"))).alias("second_us"),
        F.max("rn").cast("bigint").alias("n_purchases"),
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_buyers"),
        F.sum(F.when(F.col("n_purchases") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeat"),
        ratio_e4(
            "SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END)", "COUNT(*)"
        ).alias("repeat_e4"),
        F.round(
            F.percentile(F.col("second_us") - F.col("first_us"), F.lit(0.5)),
            4,
        ).alias("p50_gap_us"),
    )


# ---------------------------------------------------------------------------
# q223: cross-language exact duplicates
# ---------------------------------------------------------------------------


@query(
    "q223_crosslang_dups",
    oracle="""
    WITH g AS (SELECT md5(text) AS h,
                      CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
               FROM documents GROUP BY 1)
    SELECT n_langs,
           n_docs > 1 AS is_dup,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs
    FROM g GROUP BY 1, 2
    """,
    category="llm-dedup",
)
def q223_crosslang_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-identity groups by language span: byte-identical texts
    carrying DIFFERENT lang labels are label noise (a mislabeled copy
    poisons language-conditioned sampling like q58/q85) — the
    (n_langs >= 2, is_dup) rows are the audit finding; the
    (1, false) row is the healthy-unique baseline the finding is read
    against (and keeps the result non-degenerate on corpora with no
    duplicates at all).

    Exactness: md5 identity, integer counts.  Shape: one corpus scan;
    the group agg shuffles (md5, lang) pairs — never text (q50 digest
    rule); histogram agg output-bounded by the language count."""
    d = table(spark, sf_dir, "documents")
    g = (
        d.select(F.md5("text").alias("h"), "lang")
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )
    return g.groupBy(
        "n_langs", (F.col("n_docs") > 1).alias("is_dup")
    ).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_docs").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# q224: vocabulary growth curve (Heaps' law deciles)
# ---------------------------------------------------------------------------

_DOC_SHINGLES_SQL = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                        i -> t[i] || ' ' || t[i+1] || ' '
                                             || t[i+2])) AS s
           FROM toks)
"""


@query(
    "q224_vocab_growth",
    oracle=f"""
    WITH {_DOC_SHINGLES_SQL},
    shd AS (SELECT DISTINCT doc_id, s FROM sh),
    fs AS (SELECT s, MIN(doc_id) AS fd FROM shd GROUP BY 1),
    mx AS (SELECT MAX(doc_id) AS m FROM documents)
    SELECT CAST((fs.fd * 10) // (mx.m + 1) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS new_shingles
    FROM fs, mx GROUP BY 1
    """,
    category="llm-curation",
)
def q224_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law, empirically): how many word
    3-grams appear for the FIRST time in each doc-id decile of the
    corpus — a flattening curve means new data is re-treading old
    vocabulary (diminishing training value); a flat-line-at-high curve
    means the corpus never converges (or is noise).  q107 measures the
    Zipf head at a snapshot; this measures growth along ingestion
    order.

    Exactness: first-occurrence is an integer MIN over doc ids, the
    decile an integer floor division against the max-id probe —
    nothing floats.  Shape: one shingle explode feeding a per-shingle
    MIN hash-agg (map-side partials — the q81 DF pass), a 1-row max
    probe broadcast into the bucket id (q53 class — 2 pruned scans),
    and a 10-row output agg."""
    from ..functions.texthash import exploded_ngrams, shingles, tokens

    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    rows = exploded_ngrams(d.repartition(par), 3, "s", ["doc_id"]).distinct()
    fs = rows.groupBy("s").agg(F.min("doc_id").alias("fd"))
    mx = d.agg(F.max("doc_id").alias("m"))
    bucket = F.expr("(fd * 10) div (m + 1)").cast("bigint")
    return (
        fs.crossJoin(F.broadcast(mx))
        .groupBy(bucket.alias("decile"))
        .agg(F.count(F.lit(1)).alias("new_shingles"))
    )


# ---------------------------------------------------------------------------
# q225: referential-integrity audit
# ---------------------------------------------------------------------------


@query(
    "q225_referential_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem->supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    """,
    category="warehouse-quality",
)
def q225_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphaned foreign keys across the
    star schema's four edges (lineitem→orders/part/supplier,
    orders→customer) with the checked row counts — the load-gate every
    warehouse runs after ingest; ALL ZEROS is the healthy reading and
    any non-zero row is the finding.

    Exactness: anti-join counts, pure integers.  Shape: each edge is
    one LEFT ANTI join counting into a 1-row aggregate — the fact
    shuffles on the key, the dim sides broadcast where small; the
    4-row union is literal-labelled, so column names and order are
    pinned on both engines."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def edge(label: str, fact: DataFrame, fk: str, dim: DataFrame,
             pk: str) -> DataFrame:
        orphans = fact.select(F.col(fk).alias("__fk")).join(
            dim.select(F.col(pk).alias("__pk")),
            F.col("__fk") == F.col("__pk"),
            "left_anti",
        )
        return orphans.agg(
            F.lit(label).alias("relationship"),
            F.count(F.lit(1)).alias("n_orphans"),
        ).crossJoin(
            F.broadcast(fact.agg(F.count(F.lit(1)).alias("n_checked")))
        )

    parts = edge(
        "lineitem->orders", li, "l_orderkey", o.select("o_orderkey"),
        "o_orderkey",
    )
    parts = parts.unionAll(
        edge(
            "lineitem->part", li, "l_partkey",
            table(spark, sf_dir, "part"), "p_partkey",
        )
    )
    parts = parts.unionAll(
        edge(
            "lineitem->supplier", li, "l_suppkey",
            table(spark, sf_dir, "supplier"), "s_suppkey",
        )
    )
    parts = parts.unionAll(
        edge(
            "orders->customer", o, "o_custkey",
            table(spark, sf_dir, "customer"), "c_custkey",
        )
    )
    return parts
