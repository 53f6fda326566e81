"""Similarity search over the embeddings table (q51, q64).

Baseline: brute-force cosine top-k — a single scan with a JVM-side
zip_with/aggregate dot product (no Python UDF in the hot path) and a
TakeOrdered top-k (per-partition heaps, driver merge of k rows).

Scale path: LSH-bucketed ANN (q64) — 4-bit random-hyperplane signatures
derived deterministically from fixed reference vectors; the probe scans
only its own bucket.  At 100 TB the bucket assignment is a narrow map, the
per-bucket layout is a partitioned write, and queries touch 1/16th of data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ...catalog import table
from ...registry import query

PROBE_VEC_ID = 0
TOP_K = 10


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _norm2(col: Column) -> Column:
    return F.aggregate(
        F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@query(
    "q51_similarity_topk",
    oracle=f"""
    WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
    idx AS (SELECT unnest(range(1, 65)) AS i),
    dots AS (SELECT e.vec_id,
                    SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(p.p[i] AS DOUBLE)) AS dot,
                    SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) AS nn,
                    SUM(CAST(p.p[i] AS DOUBLE) * CAST(p.p[i] AS DOUBLE)) AS np
             FROM embeddings e, probe p, idx
             GROUP BY e.vec_id)
    SELECT vec_id, ROUND(dot / sqrt(nn * np), 4) AS cos
    FROM dots WHERE vec_id <> {PROBE_VEC_ID}
    ORDER BY dot / sqrt(nn * np) DESC, vec_id
    LIMIT {TOP_K}
    """,
    category="llm-similarity",
)
def q51_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the probe vector (vec_id=0): the
    exact baseline every ANN variant is judged against."""
    e = table(spark, sf_dir, "embeddings")
    probe = F.broadcast(
        e.where(F.col("vec_id") == PROBE_VEC_ID).select(
            _dbl(F.col("embedding")).alias("p")
        )
    )
    cand = e.where(F.col("vec_id") != PROBE_VEC_ID).select(
        "vec_id", _dbl(F.col("embedding")).alias("v")
    )
    j = cand.join(probe)
    cos = _dot(F.col("v"), F.col("p")) / F.sqrt(_norm2(F.col("v")) * _norm2(F.col("p")))
    return (
        j.withColumn("cos_raw", cos)
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cos_raw", 4).alias("cos"))
    )


@query(
    "q64_ann_lsh_bucketed",
    oracle=None,  # ANN recall is checked against q51 in tests, not by SQL
    category="llm-similarity",
)
def q64_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbours for the probe.

    Hyperplanes = the 4 embeddings with the smallest vec_ids > 0 (fixed,
    deterministic).  Every vector gets a 4-bit signature (sign of dot with
    each hyperplane); the probe multi-probes its own bucket plus the four
    Hamming-1 neighbours (5/16 of the data instead of 1/16 — the standard
    recall/cost knob).  Returns the probed cosine top-10 — tests assert
    overlap vs the exact q51 answer (recall), the honest check for ANN.
    """
    e = table(spark, sf_dir, "embeddings")
    planes = F.broadcast(
        e.where(F.col("vec_id").between(1, 4)).select(
            F.col("vec_id").alias("plane_id"), _dbl(F.col("embedding")).alias("h")
        )
    )
    vecs = e.select("vec_id", _dbl(F.col("embedding")).alias("v"))
    signs = (
        vecs.join(planes)
        .select(
            "vec_id",
            "v",
            F.col("plane_id"),
            F.when(_dot(F.col("v"), F.col("h")) >= 0, 1).otherwise(0).alias("bit"),
        )
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.col("bit") * F.pow(F.lit(2.0), F.col("plane_id") - 1).cast("bigint")
            ).alias("bucket"),
            F.first("v").alias("v"),
        )
    )
    probe = F.broadcast(
        signs.where(F.col("vec_id") == PROBE_VEC_ID).select(
            F.explode(
                F.array(
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(m))
                        for m in (0, 1, 2, 4, 8)
                    ]
                )
            ).alias("probe_bucket"),
            F.col("v").alias("p"),
        )
    )
    in_bucket = signs.join(
        probe, (F.col("bucket") == F.col("probe_bucket")) & (F.col("vec_id") != PROBE_VEC_ID)
    )
    cos = _dot(F.col("v"), F.col("p")) / F.sqrt(_norm2(F.col("v")) * _norm2(F.col("p")))
    return (
        in_bucket.withColumn("cos_raw", cos)
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cos_raw", 4).alias("cos"))
    )
