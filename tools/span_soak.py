"""Span-level dedup soak (q247's scale claim): run the rolling-
fingerprint span pipeline over the sf0.1 documents table replicated
R x with distinct doc_ids, and report docs/s + windows/s at two
replication factors so the scaling is visible (the shuffle carries
(fp, doc_id) digests keyed by fingerprint — span-vocabulary-scale,
never corpus^2: doubling the corpus should ~double the time, not 4x).

Usage:
    python tools/span_soak.py [reps]    # default 20 -> ~100k docs

Prints ONE JSON line per replication factor (reps/2 then reps).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (  # noqa: E402,E501
    table,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.operators.round12_ext import (  # noqa: E402,E501
    span_fingerprints,
)

SF_DIR = "/root/testdata/sf0.1"


def run(spark: SparkSession, reps: int) -> dict:
    par = spark.sparkContext.defaultParallelism
    docs = table(spark, SF_DIR, "documents")
    n_docs = docs.count() * reps

    def build():
        # repartition AFTER the replicate: the sf table ships as ONE
        # parquet split, and without the spread the whole window
        # explode + md5 runs on a single task (the bench ingest
        # lesson) — on a cluster the corpus arrives pre-split
        scaled = (
            docs.crossJoin(
                spark.range(reps).withColumnRenamed("id", "rep")
            )
            .select(
                (F.col("doc_id") + F.col("rep") * 100_000_000).alias(
                    "doc_id"
                ),
                "text",
            )
            .repartition(par)
        )
        x = span_fingerprints(scaled)
        g1 = x.groupBy("fp", "doc_id").agg(
            F.count(F.lit(1)).alias("occ")
        )
        g2 = g1.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
        return g2.where(F.col("n_docs") >= 2).agg(
            F.count(F.lit(1)).alias("dup_spans"),
            F.sum("n_docs").alias("dup_memberships"),
        )

    build().collect()  # warm (JIT + listing)
    best = float("inf")
    out_row = None
    for _ in range(2):
        # a FRESH frame per timed run: re-collecting one plan instance
        # skips its already-materialized shuffle map stages and times
        # only the final reduce — not the pipeline
        t0 = time.perf_counter()
        out_row = build().collect()[0]
        best = min(best, time.perf_counter() - t0)
    n_windows = n_docs and int(
        docs.select(
            F.sum(F.greatest(F.size(F.split("text", " ")) - 7, F.lit(0)))
        ).collect()[0][0]
    ) * reps
    return {
        "reps": reps,
        "docs": n_docs,
        "windows": n_windows,
        "dup_spans": out_row["dup_spans"],
        "soak_sec": round(best, 2),
        "docs_per_sec": round(n_docs / best, 1),
        "windows_per_sec": round(n_windows / best, 1),
    }


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("span-soak")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for r in (max(1, reps // 2), reps):
        print(json.dumps(run(spark, r), separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
