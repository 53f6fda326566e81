"""SQL surface: the reference has no SQL at all (SURVEY.md §3 — argv is
the plan); on Spark the full ANSI surface is free.  Prove the registered
views answer SQL equivalent to the DataFrame operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (
    register_views,
    table,
)


def test_sql_equals_dataframe(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        WHERE l_shipdate IS NOT NULL
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate").isNotNull())
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )
    assert sorted(sql.collect()) == sorted(df.collect())


def test_sql_window_and_join(spark, sf_dir):
    register_views(spark, sf_dir)
    rows = spark.sql(
        """
        WITH ranked AS (
          SELECT o_custkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        SELECT c.c_name, r.o_totalprice
        FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        WHERE r.rn = 1
        ORDER BY r.o_totalprice DESC, c.c_name
        LIMIT 5
        """
    ).collect()
    assert len(rows) == 5
    assert rows[0].o_totalprice >= rows[-1].o_totalprice
