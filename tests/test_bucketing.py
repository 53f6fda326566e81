"""Bucketed co-located join: a join between two tables bucketed on the
join key must run with ZERO shuffle exchanges — the layout contract that
makes repeated fact-table joins affordable at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import table
from low_latency_time_series_database_tsdb_for_market_data_spark.plans import (
    exchanges,
    sort_merge_joins,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.sources.bucketing import (
    drop_table,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    write_bucketed(orders, "b_orders", "o_custkey", 8, sort_col="o_custkey")
    write_bucketed(customer, "b_customer", "c_custkey", 8, sort_col="c_custkey")
    yield
    drop_table(spark, "b_orders")
    drop_table(spark, "b_customer")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_pair):
    # disable broadcast so the join exercises the bucketed layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        j = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        assert sort_merge_joins(j) == 1
        assert exchanges(j) == 0  # co-located: no exchange on either side
        # and the result is correct
        orders = table(spark, sf_dir, "orders")
        customer = table(spark, sf_dir, "customer")
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_no_shuffle(spark, sf_dir, bucketed_pair):
    # aggregation on the bucket key also skips its exchange
    bo = spark.table("b_orders")
    agg = bo.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert exchanges(agg) == 0
    assert agg.count() == spark.table("b_orders").select("o_custkey").distinct().count()
