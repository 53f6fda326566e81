"""Multi-format table IO: parquet (canonical), JSONL, ORC, CSV.

The reference's only interchange format is its CSV importer
(`cli.cpp:140-207`); its storage is bespoke binary columns
(`column_storage.cpp`).  Here storage is parquet (columnar, statistics,
atomic commit) and interchange is whatever Spark's datasource API speaks —
each format below is roundtrip-tested (tests/test_sources.py).

Reading always applies an explicit schema: schema inference is a second
full scan at 100 TB (and a correctness hazard for JSONL numerics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "json", "orc", "csv")

# text formats default to millisecond timestamps — that silently truncates
# microsecond ticks on a roundtrip (caught by tests/test_sources.py)
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    w = df.write.mode(mode).format(fmt)
    if fmt in ("csv", "json"):
        w = w.option("timestampFormat", _TS_FMT)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    r = spark.read.format(fmt).schema(schema)
    if fmt in ("csv", "json"):
        r = r.option("timestampFormat", _TS_FMT)
    if fmt == "csv":
        r = r.option("header", True)
    return r.load(path)
