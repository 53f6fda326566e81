"""Operator scale soak: REAL registry queries over a generated
events-shaped tape of N million rows — evidence that the declared
operators (not just raw ingest/scan) keep their per-row cost as the
tape grows 100-1000x past the shipped fixtures.

Usage:
    python tools/tape_soak.py [n_millions] [n_symbols]
    # defaults: 10 -> 10M rows, 5 symbols.  Round-8 cardinality points:
    # 30M x 5 (the low-cardinality floor keyed_prefix removes) and
    # 100M x 500 (realistic cardinality — min(#symbols, #cores) no
    # longer binds, so this pins the family's scan-bound ceiling).

The tape is written as a fixture-schema events.parquet directory
(5 symbols, monotone ts, random-walk cents prices, uniform sizes), so
the measured code path is EXACTLY the registry's: catalog -> query fn
-> collect.  The chosen queries cover the main operator families over
the tick tape: time-bucket OHLC (q22), rolling window (q30),
sessionization (q37), per-minute signed flow (q155), volume-clock bars
(q165), VPIN (q177), realized variance (q86), and minute-rate anomaly
(q106).

Prints ONE JSON line: rows, gen+write sec, then per-query seconds and
rows/s.  Asserts every query returns a non-empty result.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (  # noqa: E402,E501
    load_all,
)

QUERIES = (
    "q22_ohlc",
    "q30_moving_avg",
    "q37_sessionize",
    "q86_realized_variance",
    "q106_minute_rate_anomaly",
    "q155_order_flow_imbalance",
    "q165_volume_clock",
    "q177_vpin",
)


def gen_tape(spark: SparkSession, n: int, out: str, n_sym: int = 5) -> None:
    """Fixture-schema events table: n_sym symbols round-robin, 100ms
    spacing per symbol slot, prices a bounded random walk in exact
    cents, sizes 1..150 (the fixture's user_id-as-volume convention)."""
    sym = F.concat(F.lit("SYM_"), (F.col("id") % n_sym).cast("string"))
    # per-symbol monotone ts: symbol s sees ids s, s+n_sym, s+2*n_sym...
    ts = F.timestamp_micros(
        F.lit(1_600_000_000_000_000)
        + (F.col("id") / n_sym).cast("bigint") * 100_000
        + (F.col("id") % n_sym)
    )
    # bounded walk: cents = 10000 + sum of +-{0..99} steps folded via
    # xxhash; a pure per-row function (no window) so generation stays
    # narrow — the WALK property queries need (lag structure) comes from
    # the hash stream's sign balance, not true integration
    step = (F.xxhash64("id") % 200) - 100
    cents = (10_000 + F.abs(F.xxhash64("id", F.lit(3))) % 2_000 + step).cast(
        "bigint"
    )
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        sym.alias("event_type"),
        ts.alias("ts"),
        (1 + F.abs(F.xxhash64("id", F.lit(7))) % 150).alias("user_id"),
        (cents / 100.0).alias("value"),
    )
    df.coalesce(32).write.mode("overwrite").parquet(f"{out}/events.parquet")


def main() -> int:
    n = int(float(sys.argv[1]) * 1_000_000) if len(sys.argv) > 1 else 10_000_000
    n_sym = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("tape-soak")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="tsdb_tape_soak_")
    out: dict[str, object] = {"rows": n, "symbols": n_sym}
    try:
        t0 = time.perf_counter()
        gen_tape(spark, n, tmp, n_sym)
        out["gen_write_sec"] = round(time.perf_counter() - t0, 1)

        reg = load_all()
        per_q = {}
        for name in QUERIES:
            # min-of-2: single-run numbers on this host swing 2-4x
            # (JIT + GC + page-cache epochs); the min is the plan's cost
            sec = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = reg[name].fn(spark, tmp)
                rows = res.count()
                sec = min(sec, time.perf_counter() - t0)
            per_q[name] = {
                "sec": round(sec, 2),
                "rows_per_sec": round(n / sec),
                "out_rows": rows,
            }
            assert rows > 0, name
        out["queries"] = per_q
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
