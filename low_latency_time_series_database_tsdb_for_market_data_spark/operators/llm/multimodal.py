"""Multimodal column plumbing (q63 + the binary-payload pipeline).

Design (BASELINE.json north-star): media travels as an opaque BINARY column
with typed metadata beside it; decode / feature-extraction runs as
Arrow-batched pandas iterators (mapInPandas), so payload bytes stream
through executors in columnar batches and never surface as Python
row objects.  The actual image/audio decode is STUBBED (no codec libs in
this environment, see decode_media) — the Spark-side schema, partitioning,
UDF signature and batch shape are real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ...catalog import table
from ...registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("magic_hex", T.StringType(), True),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: document text bytes as payload.
    Stands in for image/audio blobs so the pipeline is runnable here."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def decode_media(payload: bytes, mime: str) -> bytes:
    """Real decoder entry point — image/audio codecs are not available in
    this environment; the feature extractor uses raw bytes instead."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this build; "
        "extract_features() uses byte-level features instead"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers the binary column as zero-copy buffers per batch; the
    per-batch pandas work is vectorized numpy over byte arrays.  At scale
    this is embarrassingly parallel: no shuffle, batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "byte_mean": payloads.map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                        if b
                        else float("nan")
                    ),
                    "magic_hex": payloads.map(
                        lambda b: b[:4].hex().upper() if b else None
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


@query(
    "q63_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(hex(encode(substr(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
    category="llm-multimodal",
)
def q63_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: payload size + 4-byte magic prefix —
    the cheap JVM-side sniffing stage that routes media to decoders."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias(
            "magic_hex"
        ),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize stage: mapInPandas, one output row per input row.

    The pixel work is STUBBED (no codec libs here): the deterministic
    fake "resizes" by hashing the payload down to width*height bytes, so
    schema, batching, and downstream joins are fully exercisable.  A real
    deployment swaps `_fake_resize` for a PIL/opencv call — the Spark
    plumbing (Arrow batches, no shuffle, bounded memory per batch) is
    unchanged."""
    import hashlib

    def _fake_resize(b: bytes | None) -> bytes | None:
        if b is None:
            return None
        out = bytearray()
        seed = b[:64]
        while len(out) < width * height:
            seed = hashlib.sha256(seed).digest()
            out.extend(seed)
        return bytes(out[: width * height])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(_fake_resize),
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage: mapInPandas, one-to-many (video -> frames).

    The decoder is STUBBED: "frames" are fixed-stride byte slices of the
    payload standing in for decoded video frames.  Demonstrates the
    fan-out shape (explode inside the Arrow batch, not a generator join)
    and the per-frame metadata contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(b[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
