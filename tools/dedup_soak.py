"""Dedup scale soak: the FULL q70 pipeline (exact collapse -> MinHash ->
LSH -> strict-cap candidate edges -> connected components -> survivor
anti-join) over a synthetic template corpus of N million documents.

Usage:
    python tools/dedup_soak.py [n_templates]     # default 1_000_000 -> 10M docs

Corpus shape (the 1M-doc record's recipe, BASELINE.md round-6 notes,
scaled): each template contributes 10 docs on template-disjoint
vocabulary — an exact-dup pair (v0 == v1), a one-token near-dup (v2),
and 7 fully distinct docs (v3..v9).  Expected survivors = 8 per
template (one keeper for the {v0,v1,v2} cluster + the 7 distinct),
plus whatever one-token near-dups the 8-hash/4-band LSH
probabilistically misses (~0.1% of templates).  Generation is pure
JVM expression codegen (range -> concat/transform), so the timed
region measures the DEDUP pipeline, not Python row generation.

The edge list at 10M docs (~3 per template -> millions) exceeds the
512k driver union-find threshold, so this soak exercises the
DISTRIBUTED CC loop — the code path a 100 TB corpus takes — plus the
strict per-bucket cap at full load.

Prints ONE JSON line: docs, gen+persist sec, pipeline sec, docs/s,
edges, survivors, expected minimum survivors, cc mode.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.dedup import (  # noqa: E402,E501
    _SMALL_GRAPH_MAX,
    candidate_edges,
    connected_components,
)

# 60 tokens -> 58 shingles; a one-token change flips 3 of them, so the
# near-dup pair sits at Jaccard 55/61 ~ 0.90 — the Jaccard the planted
# recall math below assumes (8-hash/4-band expected miss ~0.16%); short
# docs would push J toward 0.7 and the miss rate to several percent,
# which is a banding-knob property, not what this soak measures
N_TOKENS = 60
NEAR_POS = 29  # token index replaced in the near-dup variant


def gen_docs(spark: SparkSession, n_templates: int) -> DataFrame:
    """10 docs per template as ONE codegen expression over range()."""
    base = spark.range(n_templates * 10).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 10).cast("bigint").alias("tpl"),
        (F.col("id") % 10).alias("v"),
    )
    tok = F.concat(F.lit("t"), F.col("tpl").cast("string"), F.lit("_"))
    dtok = F.concat(
        F.lit("d"),
        F.col("tpl").cast("string"),
        F.lit("_"),
        F.col("v").cast("string"),
        F.lit("_"),
    )
    shared = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda j: F.when(
                (F.col("v") == 2) & (j == NEAR_POS),
                F.concat(F.lit("x"), F.col("tpl").cast("string")),
            ).otherwise(F.concat(tok, j.cast("string"))),
        ),
        " ",
    )
    distinct = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda j: F.concat(dtok, j.cast("string")),
        ),
        " ",
    )
    return base.select(
        "doc_id", F.when(F.col("v") <= 2, shared).otherwise(distinct).alias("text")
    )


def main() -> int:
    n_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dedup-soak")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    t0 = time.perf_counter()
    docs = gen_docs(spark, n_templates).repartition(par).persist()
    n_docs = docs.count()
    gen_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    edges = candidate_edges(docs, par)
    n_edges = edges.count()
    labels = connected_components(edges)
    losers = (
        labels.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    )
    survivors = (
        docs.select("doc_id")
        .join(F.broadcast(losers), "doc_id", "left_anti")
        .count()
    )
    pipe_sec = time.perf_counter() - t0

    out = {
        "docs": n_docs,
        "gen_persist_sec": round(gen_sec, 1),
        "pipeline_sec": round(pipe_sec, 1),
        "docs_per_sec": round(n_docs / pipe_sec),
        "edges": n_edges,
        "cc_mode": "driver" if n_edges <= _SMALL_GRAPH_MAX else "distributed",
        "survivors": survivors,
        "expected_min_survivors": 8 * n_templates,
        "lsh_missed_neardups": survivors - 8 * n_templates,
    }
    print(json.dumps(out))
    # the planted topology must collapse each {v0,v1,v2} cluster to one
    # keeper; LSH may MISS a few near-dups (extra survivors) but can
    # never remove a distinct doc (fewer would mean a false merge)
    assert survivors >= 8 * n_templates, out
    assert survivors - 8 * n_templates <= n_templates // 200, out  # <=0.5% miss
    return 0


if __name__ == "__main__":
    sys.exit(main())
