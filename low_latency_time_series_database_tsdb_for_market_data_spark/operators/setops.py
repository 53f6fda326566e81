"""Set operations + scalar function block q40-q44 (SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "q40_setops",
    oracle="""
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         high_bal    AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT
      (SELECT COUNT(*) FROM (SELECT k FROM with_orders UNION SELECT k FROM high_bal)) AS n_union,
      (SELECT COUNT(*) FROM (SELECT k FROM with_orders INTERSECT SELECT k FROM high_bal)) AS n_intersect,
      (SELECT COUNT(*) FROM (SELECT k FROM with_orders EXCEPT SELECT k FROM high_bal)) AS n_except
    """,
    category="setop",
)
def q40_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT counts over two customer-key sets.

    All three set-op cardinalities come out of ONE full-outer join of the
    two distinct sets with presence flags — one scan of each input and
    one join, where the naive three-branch form (union.distinct +
    intersect + except as separate subplans) scans both tables three
    times and shuffles eight times.  With both sets distinct on the key,
    |A ∪ B| = rows, |A ∩ B| = both-present, |A \\ B| = left-only —
    exactly the SQL set-op (distinct) semantics of the oracle."""
    o = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("in_a", F.lit(1))
    )
    h = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"), F.lit(1).alias("in_b"))
    )  # c_custkey is the customer PK: already distinct
    f = o.join(h, "k", "full_outer")
    return f.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.count_if(F.col("in_a").isNotNull() & F.col("in_b").isNotNull()).alias(
            "n_intersect"
        ),
        F.count_if(F.col("in_a").isNotNull() & F.col("in_b").isNull()).alias(
            "n_except"
        ),
    )


@query(
    "q41_string",
    oracle="""
    SELECT p_partkey, lower(p_type) AS type_lc,
           CAST(length(p_name) AS BIGINT) AS name_len,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens
    FROM part
    WHERE regexp_matches(p_type, 'ECONOMY|PROMO')
    """,
    category="function-string",
)
def q41_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: lower/length/split/regexp filter (regex kept to a
    literal alternation so Java and RE2 semantics agree)."""
    p = table(spark, sf_dir, "part")
    return p.where(F.col("p_type").rlike("ECONOMY|PROMO")).select(
        "p_partkey",
        F.lower("p_type").alias("type_lc"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_tokens"),
    )


@query(
    "q42_datetime",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    category="function-datetime",
)
def q42_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction + group count."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q43_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    category="function-json",
)
def q43_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events props column, grouped count."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q44_array",
    oracle="""
    SELECT CAST(label AS BIGINT) AS label,
           COUNT(*) AS n,
           CAST(MAX(len(embedding)) AS BIGINT) AS dim,
           ROUND(MIN(CAST(embedding[1] AS DOUBLE)), 4) AS min_first,
           ROUND(MAX(CAST(embedding[1] AS DOUBLE)), 4) AS max_first
    FROM embeddings GROUP BY 1
    """,
    category="function-array",
)
def q44_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over the embedding column: size + element access.
    MIN/MAX (not AVG) keep float results exact-deterministic."""
    e = table(spark, sf_dir, "embeddings")
    first = F.element_at("embedding", 1).cast("double")
    return e.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("embedding")).cast("bigint").alias("dim"),
        F.round(F.min(first), 4).alias("min_first"),
        F.round(F.max(first), 4).alias("max_first"),
    )
