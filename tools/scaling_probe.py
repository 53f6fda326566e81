"""8-vs-32-core per-query scaling probe (round 14, r13 verdict item #7).

At sf0.1 the driver's low-core bench re-run measures fixed per-task
scheduling overhead, not parallel work: the 8-core suite BEATS the
32-core one (r13 driver median low/high ratio ~0.75), so sf0.1 core
ratios cannot identify serial queries.  This probe produces the signal
at an SF where it means something: it times the top-N queries (by the
last committed detail record for that SF) at SPARK_GRAFT_CPUS=32 and 8
in two separate child processes (a Spark master is fixed at session
build, so two processes, not two sessions), min-of-2 noop-sink
materializations each — bench.py's exact methodology — and writes the
per-query high/low ratio table to bench_records/scaling_probe_<sf>.json.

Reading the table: speedup_32v8 ~1 at sf1+ marks a genuinely
serial/driver-bound query (a round-15 target); ~2-4x is healthy for
shuffle-light plans at this data size; sub-1 means fixed overhead still
dominates that query even at this SF.

Usage:
    python tools/scaling_probe.py [sf_dir] [n_top]      # default sf1 path, 30
    python tools/scaling_probe.py /tmp/sf1 30
(Regenerate /tmp/sf1 first with tools/gen_sf.py if absent.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _top_names(sf: float, n_top: int) -> list[str]:
    recs = [json.loads(line) for line in open(os.path.join(HERE, "BENCH_DETAIL.jsonl"))]
    cands = [r for r in recs if r.get("sf") == sf]
    last = cands[-1] if cands else recs[-1]
    return [
        k for k, _ in sorted(last["queries"].items(), key=lambda kv: -kv[1])[:n_top]
    ]


def _child(sf_dir: str, names: list[str]) -> None:
    """One core-count leg: min-of-2 noop timings, one JSON line."""
    import gc
    import time

    from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
        load_all,
    )
    from low_latency_time_series_database_tsdb_for_market_data_spark.session import (
        get_spark,
        warm_start,
    )

    reg = load_all()
    spark = get_spark("scaling-probe")
    warm_start(spark, sf_dir)
    out: dict[str, float] = {}
    for name in names:
        qd = reg[name]
        spark.sparkContext.setJobDescription(f"scaling:{name}")
        best = float("inf")
        for _ in range(2):
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    spark.stop()
    sys.stdout.flush()
    print("SCALING_CHILD " + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], json.loads(sys.argv[3]))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    names = _top_names(sf, n_top)
    legs: dict[int, dict[str, float]] = {}
    for cpus in (32, 8):  # high first: page cache warm for both legs
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_SF_DIR=sf_dir)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir,
             json.dumps(names)],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("SCALING_CHILD ")][-1]
        legs[cpus] = json.loads(line[len("SCALING_CHILD "):])
        print(f"cpus={cpus}: suite {round(sum(legs[cpus].values()), 2)} s")
    table = {
        name: {
            "sec_32c": legs[32][name],
            "sec_8c": legs[8][name],
            # >1: the query parallelizes (8c slower); ~1: serial-bound
            "speedup_32v8": round(legs[8][name] / max(legs[32][name], 1e-9), 2),
        }
        for name in names
    }
    rec = {"sf_dir": sf_dir, "sf": sf, "n_top": n_top, "table": table}
    os.makedirs(os.path.join(HERE, "bench_records"), exist_ok=True)
    out_path = os.path.join(
        HERE, "bench_records", f"scaling_probe_sf{sf}.json"
    )
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    for name, row in sorted(table.items(), key=lambda kv: kv[1]["speedup_32v8"]):
        print(f"{row['speedup_32v8']:5.2f}x  32c={row['sec_32c']:7.3f}"
              f"  8c={row['sec_8c']:7.3f}  {name}")
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
