"""Streaming nearest-centroid scoring: a batch-trained model applied to
a live vector stream — the train-offline / score-online loop every
embedding pipeline runs (classify incoming documents, route vectors to
IVF cells, flag drift against known classes).

The model is the per-label integer centroid table (the same
integer-decided e4 components as q99/q130, so the streaming assignment
is bit-identical to the batch confusion-matrix audit), collected to the
driver once (|labels| x dims BIGINTs — KBs) and compiled into literal
arrays.  Scoring is then a PURE NARROW MAP — zip_with/aggregate integer
distance per centroid, array_min over (dist, label) structs for the
deterministic argmin — no state store, no watermark, no shuffle: the
streaming query plan is map-only, so it scales to any input rate and
works identically under micro-batch or continuous triggers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.llm.corpus_ext import _Q_SCALE


def train_centroid_model(
    spark: SparkSession, sf_dir: str
) -> dict[int, list[int]]:
    """{label: [integer e4 centroid components]} from the batch
    embeddings table — the exact q99/q130 arithmetic (floor-quantize,
    BIGINT sums, sign-split integer-decided mean), one corpus pass,
    KB-scale collect."""
    e = table(spark, sf_dir, "embeddings")
    cells = (
        e.select(
            F.col("label").cast("bigint").alias("label"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "v"
            ),
        )
        .select("label", "pos", F.floor(F.col("v") * _Q_SCALE).alias("q"))
        .groupBy("label", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("sum_q"))
        .select(
            "label",
            "pos",
            F.expr(
                "CASE WHEN sum_q < 0"
                " THEN -(((-sum_q) * 20000 + n) div (2 * n))"
                " ELSE ((sum_q * 20000 + n) div (2 * n)) END"
            ).alias("ci"),
        )
        .collect()
    )
    model: dict[int, dict[int, int]] = {}
    for r in cells:
        model.setdefault(int(r["label"]), {})[int(r["pos"])] = int(r["ci"])
    return {
        lbl: [dims[p] for p in sorted(dims)] for lbl, dims in model.items()
    }


def _quantized(col: Column) -> Column:
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(_Q_SCALE))).cast("bigint"),
    )


def _int_dist(q: Column, cent: list[int]) -> Column:
    c = F.array(*[F.lit(v).cast("bigint") for v in cent])
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def score_vector_stream(
    stream: DataFrame, model: dict[int, list[int]]
) -> DataFrame:
    """Append `label_pred` (and the exact integer `dist`) to a stream of
    (vec_id, embedding) rows.  Works identically on batch DataFrames —
    the expression is stateless, which is the point: train/score skew is
    impossible because BOTH paths run this one narrow map against the
    same integer model.  Ties break to the smaller label via the
    (dist, label) struct order — q130's rule."""
    q = _quantized(F.col("embedding"))
    scored = F.array(
        *[
            F.struct(
                _int_dist(q, cent).alias("d"),
                F.lit(lbl).cast("bigint").alias("l"),
            )
            for lbl, cent in sorted(model.items())
        ]
    )
    best = F.array_min(scored)
    return stream.withColumn("label_pred", best["l"]).withColumn(
        "dist", best["d"]
    )
