"""Synthesize a larger SF directory from an existing one by key-shifted
replication — the round-9 sf1 bench point (r8 verdict item #6): the
sf0.1 suite is job-floor-dominated (median 0.36 s), so plan differences
only reappear at 10x.

Usage:
    python tools/gen_sf.py [src_sf_dir] [dest_dir] [copies]
    # default: /root/testdata/sf0.1 -> /tmp/sf1, 10 copies

Replication semantics (keys stay join-consistent, dims stay dims):
  region/nation        unchanged (fixed dimensions)
  customer/supplier/
  part/orders/lineitem copy i shifts every entity key by i * (max+1);
                       o_custkey / l_partkey / l_suppkey / l_orderkey
                       shift in lockstep so joins land exactly as in
                       the source; dates/prices untouched (10x daily
                       density, the realistic way a business grows)
  events               event_id shifts; ts gets +i microseconds so the
                       (ts, event_id) total order stays dense but
                       collision-free; user_id unchanged (10x rows per
                       user — the skew direction that stresses windows)
  documents            doc_id shifts; copies i>0 rewrite every 3rd
                       token with a copy-specific suffix, so cross-copy
                       Jaccard/SimHash similarity collapses below every
                       near-dup threshold (an append-only ' v{i}' tag
                       left the copies near-identical and a 10-way
                       near-dup cluster per template blew q95's strict
                       per-bucket cap — correctly, loudly); near-dup
                       structure WITHIN each copy is preserved intact
  embeddings           vec_id shifts, vectors unchanged (10 exact
                       duplicates per point: ties break on vec_id,
                       recall math unchanged)

Deterministic: no RNG anywhere — re-running overwrites byte-stable
content (modulo parquet metadata).
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# per-table: {column: key-space it shifts in}
_SHIFT = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def replicate(
    spark: SparkSession, src: str, dest: str, copies: int
) -> dict[str, int]:
    strides = {
        t: spark.read.parquet(f"{src}/{t}.parquet")
        .agg(F.max(_KEY_OF[t]))
        .collect()[0][0]
        + 1
        for t in _KEY_OF
    }
    out_rows: dict[str, int] = {}
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t in ("region", "nation"):
            out = df
        else:
            parts: list[DataFrame] = []
            for i in range(copies):
                d = df
                for col, space in _SHIFT[t].items():
                    d = d.withColumn(
                        col, F.col(col) + F.lit(i * strides[space])
                    )
                if t == "events" and i:
                    # layout-preserving +i microseconds: events.ts is
                    # TIMESTAMP_NTZ in the current fixture (see verify
                    # skill gotchas) — arithmetic in its own type keeps
                    # the physical layout identical to the source
                    d = d.withColumn(
                        "ts",
                        (
                            F.col("ts")
                            + F.expr(f"INTERVAL {i} MICROSECOND")
                        ).cast(df.schema["ts"].dataType),
                    )
                if t == "documents" and i:
                    d = d.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split("text", " "),
                                lambda w, ix: F.when(
                                    ix % 3 == i % 3,
                                    F.concat(w, F.lit(f"_{i}")),
                                ).otherwise(w),
                            ),
                            " ",
                        ),
                    ).withColumn(
                        # keep the derived-metadata invariant the
                        # curation queries rely on
                        "n_chars",
                        F.length("text").cast("bigint"),
                    )
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        out_rows[t] = spark.read.parquet(f"{dest}/{t}.parquet").count()
    return out_rows


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gen-sf")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    Path(dest).mkdir(parents=True, exist_ok=True)
    rows = replicate(spark, src, dest, copies)
    print({"dest": dest, "copies": copies, "rows": rows})
    spark.stop()


if __name__ == "__main__":
    main()
