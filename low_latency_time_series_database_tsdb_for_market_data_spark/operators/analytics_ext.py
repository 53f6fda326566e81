"""Analytics extensions (q77-q80): cross-symbol correlation, ordered
string aggregation, regex capture groups, date arithmetic.

q77 is the market-data co-movement matrix (the EDBT'19-style time-series
similarity question posed declaratively): align symbols on time buckets,
then correlate every pair — bucket aggregation keeps the self-join input
at O(symbols x buckets), never ticks^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import cents
from ..registry import query


@query(
    "q77_symbol_correlation",
    oracle="""
    WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
                      SUM(CAST(ROUND(value*100) AS BIGINT)) / 100.0 / COUNT(*)
                        AS v
               FROM events GROUP BY 1, 2)
    SELECT a.event_type AS sym_a, c.event_type AS sym_b,
           ROUND(corr(a.v, c.v), 4) AS r, COUNT(*) AS n_buckets
    FROM b a JOIN b c ON a.h = c.h AND a.event_type < c.event_type
    GROUP BY 1, 2
    """,
    category="timeseries-similarity",
)
def q77_symbol_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix of symbols' hourly mean values — the
    co-movement screen behind pairs trading / similarity search.  The
    hourly pre-aggregation shrinks the self-join to symbols x buckets
    rows (tiny), so the pair generation is broadcast-able; the corr agg
    is single-pass mergeable moments.  The bucket table feeds BOTH join
    branches and broadcast builds run as separate jobs (exchange reuse
    does not apply), so it is localCheckpoint-materialized once — ONE
    scan of the tape instead of two, KB-scale checkpoint."""
    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg((F.sum(cents("value")) / 100.0 / F.count(F.lit(1))).alias("v"))
        .localCheckpoint(eager=False)
    )
    a = b.select(
        F.col("event_type").alias("sym_a"), "h", F.col("v").alias("va")
    )
    c = b.select(
        F.col("event_type").alias("sym_b"), "h", F.col("v").alias("vb")
    )
    return (
        a.join(F.broadcast(c), "h")
        .where(F.col("sym_a") < F.col("sym_b"))
        .groupBy("sym_a", "sym_b")
        .agg(
            F.round(F.corr("va", "vb"), 4).alias("r"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


@query(
    "q78_string_agg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
             AS statuses,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
    category="function-string",
)
def q78_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect_set -> sort_array ->
    concat_ws makes the concatenation order explicit — the only way a
    distributed string_agg can be deterministic (unordered listagg is a
    value-hash coin flip at any parallelism)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(
            "|", F.sort_array(F.collect_set("o_orderstatus"))
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q79_regex_groups",
    oracle=r"""
    SELECT regexp_extract(p_name, '^(\w+) (\w+)$', 2) AS noun,
           CAST(regexp_extract(p_brand, '^Brand#(\d+)$', 1) AS BIGINT)
             AS brand_num,
           COUNT(*) AS n
    FROM part GROUP BY 1, 2
    """,
    category="function-string",
)
def q79_regex_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction (structured fields out of string
    columns — the cheap parse stage of every text pipeline).  Patterns
    stick to \\w/\\d classes where Java and RE2 semantics agree."""
    p = table(spark, sf_dir, "part")
    return p.groupBy(
        F.regexp_extract("p_name", r"^(\w+) (\w+)$", 2).alias("noun"),
        F.regexp_extract("p_brand", r"^Brand#(\d+)$", 1)
        .cast("bigint")
        .alias("brand_num"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q80_date_arithmetic",
    oracle="""
    SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate) // 365
                AS BIGINT) AS yr_off,
           COUNT(*) AS n,
           CAST(CAST(MIN(o_orderdate + INTERVAL 30 DAY) AS DATE) AS VARCHAR)
             AS first_due
    FROM orders GROUP BY 1
    """,
    category="function-datetime",
)
def q80_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: datediff bucketing + interval addition.
    The derived due-date is emitted as a STRING so both engines hash the
    same canonical form (date vs timestamp physical types differ)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(
            F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")) / 365
        )
        .cast("bigint")
        .alias("yr_off")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.date_add("o_orderdate", 30)).cast("string").alias("first_due"),
    )
