"""Salting correctness: salted two-phase aggregation and salted join must
equal their direct forms on a heavily skewed key distribution (90% of
rows on one key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.skew import (
    salted_agg,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k rows: 90% 'hot', rest spread over 100 cold keys
    df = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, "hot")
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.col("id"),
    )
    df = df.cache()
    df.count()
    return df


def test_salted_agg_equals_direct(skewed):
    direct = {
        r["k"]: (r["n"], r["mx"], r["s"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("v").alias("mx"),
            F.sum("v").alias("s"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["mx"], r["s"])
        for r in salted_agg(
            skewed,
            "k",
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "mx": (F.max("v"), F.max("mx")),
                "s": (F.sum("v"), F.sum("s")),
            },
        ).collect()
    }
    assert direct == salted


def test_salted_join_equals_direct(spark, skewed):
    dim = spark.range(101).select(
        F.when(F.col("id") == 0, "hot")
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") - 1).cast("string")))
        .alias("dk"),
        F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("payload"),
    )
    direct = (
        skewed.join(dim, skewed.k == dim.dk)
        .groupBy("k", "payload")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    )
    salted = (
        salted_join(skewed, dim, "k", "dk")
        .groupBy("k", "payload")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    )
    assert sorted(direct.collect()) == sorted(salted.collect())
