"""Persisted partition-pruned IVFPQ probe soak (round-12 verdict item
#4's latency point): build the composite IVF+PQ index over N million
synthetic vectors, write it ``partitionBy(centroid)``, and compare the
ADC probe latency through (a) the in-memory indexed frame (q245's
path) and (b) the PERSISTED partition-pruned scan (q249's path — the
real serving shape once the index no longer fits in executor memory).

Usage:
    python tools/ivfpq_pruned_soak.py [n_millions]   # default 1 -> 1M

Prints ONE JSON line: vectors, build+write sec, probed-partition
fraction, min-of-5 probe sec for both paths, bytes actually scanned by
the pruned probe (sum of the probed directories' file sizes vs the
whole index), and the two paths' top-k agreement (they score identical
codes — the ids must match exactly).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.ann_soak import DIM, K_LISTS, gen_vectors  # noqa: E402

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.similarity import (  # noqa: E402,E501
    ivf_probe_lists,
    ivfpq_index,
    ivfpq_search,
    ivfpq_train,
    read_ivfpq_index,
    write_ivfpq_index,
)

NPROBE = 8
TOPK = 10


def _dir_bytes(paths: list[str]) -> int:
    total = 0
    for p in paths:
        for f in glob.glob(f"{p}/**", recursive=True):
            if os.path.isfile(f):
                total += os.path.getsize(f)
    return total


def main() -> int:
    n = int(float(sys.argv[1]) * 1_000_000) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ivfpq-pruned-soak")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    from pyspark.sql import functions as F

    vecs = gen_vectors(spark, n).repartition(par).persist()
    n_vec = vecs.count()

    # exact lattice centroids (the generator's own formula — see ann_soak)
    cents = []
    for cl in range(K_LISTS):
        row = (
            spark.range(1)
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda d: (
                        ((F.xxhash64(F.lit(cl), d) % 201) - 100) * 10
                    ).cast("double"),
                ).alias("c")
            )
            .collect()[0]["c"]
        )
        cents.append([float(x) for x in row])
    books = ivfpq_train(vecs, cents, m=16, k=16, iters=4, sample=16_384)

    tmp = tempfile.mkdtemp(prefix="ivfpq_pruned_soak_")
    try:
        t0 = time.perf_counter()
        indexed_mem = ivfpq_index(vecs, cents, books).persist()
        indexed_mem.count()
        build_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        write_ivfpq_index(indexed_mem, tmp)
        write_sec = time.perf_counter() - t0
        persisted = read_ivfpq_index(spark, tmp)

        probe = cents[7]
        lists = ivf_probe_lists(cents, probe, NPROBE)

        def best_of(frame):
            sec = float("inf")
            rows = None
            for _ in range(5):
                t0 = time.perf_counter()
                got = ivfpq_search(
                    frame, cents, books, probe, NPROBE, topk=TOPK
                ).collect()
                sec = min(sec, time.perf_counter() - t0)
                rows = got
            return sec, [r["vec_id"] for r in rows]

        mem_sec, mem_ids = best_of(indexed_mem)
        disk_sec, disk_ids = best_of(persisted)
        assert mem_ids == disk_ids, (mem_ids, disk_ids)

        probed_bytes = _dir_bytes(
            [f"{tmp}/centroid={i}" for i in lists]
        )
        total_bytes = _dir_bytes([tmp])
        out = {
            "vectors": n_vec,
            "build_sec": round(build_sec, 2),
            "write_sec": round(write_sec, 2),
            "nprobe": NPROBE,
            "k_lists": K_LISTS,
            "probe_mem_sec": round(mem_sec, 4),
            "probe_pruned_disk_sec": round(disk_sec, 4),
            "probed_bytes": probed_bytes,
            "index_bytes": total_bytes,
            "scanned_fraction": round(probed_bytes / total_bytes, 4),
            "topk_identical": True,
        }
        print(json.dumps(out, separators=(",", ":")))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
