"""sf10 heavy-tail record (round-12 verdict item #6): run the top-N
most expensive queries (ranked by the latest sf1 BENCH_DETAIL record)
at an sf10-scale directory, min-of-M per query, and report per-query
scaling ratios vs that sf1 record.

The sf0.1 suite is job-floor-dominated and even sf1 leaves headroom;
the 100x point (~60M lineitem / ~10M events / 500k docs) is where a
quadratic or shuffle-bound plan can no longer hide.  A query scaling
> 2x-vs-linear (ratio > 20x of its sf1 time) is flagged for the next
round.

Usage:
    python tools/sf10_heavy.py [sf10_dir] [top_n] [reps]
    # default: /tmp/sf10, 20, 2
    # prerequisite: python tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf10 100

Writes bench_records/sf10_heavy.json and prints one JSON line.
Run SOLO (host-noise protocol: min-of-M inside one process; compare
min-of-N across runs when in doubt).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (  # noqa: E402
    load_all,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.session import (  # noqa: E402
    get_spark,
    warm_start,
)


def latest_sf1_queries() -> dict[str, float]:
    here = Path(__file__).resolve().parents[1]
    recs = [
        json.loads(line)
        for line in (here / "BENCH_DETAIL.jsonl").read_text().splitlines()
    ]
    sf1 = [r for r in recs if r.get("sf") == 1.0]
    if not sf1:
        raise SystemExit("no sf1 record in BENCH_DETAIL.jsonl")
    return sf1[-1]["queries"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    base = latest_sf1_queries()
    top = [
        n for n, _ in sorted(base.items(), key=lambda kv: -kv[1])[:top_n]
    ]
    reg = load_all()
    spark = get_spark("sf10-heavy")
    warm_start(spark, sf_dir)
    out: dict[str, dict] = {}
    t_suite = time.time()
    for name in top:
        times = []
        err = None
        for _ in range(reps):
            t0 = time.time()
            # noop sink, NOT count(): bench.py's rule — count() lets
            # Catalyst prune the expensive side of row-preserving
            # left joins (q250's whole aggregate vanished under it)
            try:
                reg[name].fn(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
            except Exception as e:
                # capacity guards raise LOUDLY by design at adversarial
                # densities (q95's 16-bit simhash bands saturate at
                # 500k distinct texts) — record the refusal instead of
                # aborting the whole heavy-tail pass
                err = f"{type(e).__name__}: {str(e)[:200]}"
                break
            times.append(round(time.time() - t0, 3))
        if err is not None:
            out[name] = {
                "sf10_min_sec": None, "runs": times,
                "sf1_sec": base.get(name), "x_vs_sf1": None,
                "flag_superlinear": False, "note": err,
            }
            print(f"{name}: RAISED ({err})", flush=True)
            continue
        best = min(times)
        ratio = round(best / base[name], 2) if base.get(name) else None
        out[name] = {
            "sf10_min_sec": best,
            "runs": times,
            "sf1_sec": base.get(name),
            "x_vs_sf1": ratio,
            # 10x data: ratio > 20 means >2x-vs-linear — flag it
            "flag_superlinear": bool(ratio and ratio > 20),
        }
        print(
            f"{name}: min {best}s ({times}) = {ratio}x sf1"
            + ("  <-- SUPERLINEAR" if out[name]["flag_superlinear"] else ""),
            flush=True,
        )
    # dispatch-leg report (round 14, r13 verdict item #8): for the
    # global-prefix dispatch family, record which leg the size dispatch
    # picked at THIS sf_dir — "two_pass" when the __prefix_pid range
    # machinery is in the physical plan, else "classic".  At sf10 sizes
    # the family must flip to two_pass; at fixture SFs classic is right.
    legs: dict[str, str] = {}
    for name in (
        "q147_customer_value_bands", "q153_part_revenue_abc",
        "q169_customer_pareto", "q182_user_rfm", "q203_peak_concurrency",
        "q210_stickiness", "q230_eventid_gaps",
    ):
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            legs[name] = (
                "two_pass" if "__prefix_pid" in plan else "classic"
            )
        except Exception as e:  # pragma: no cover - report, don't die
            legs[name] = f"error: {e}"
    print("dispatch_legs:", json.dumps(legs), flush=True)
    rec = {
        "sf_dir": sf_dir,
        "top_n": top_n,
        "reps": reps,
        "wall_sec": round(time.time() - t_suite, 1),
        "dispatch_legs": legs,
        "queries": out,
    }
    here = Path(__file__).resolve().parents[1]
    (here / "bench_records").mkdir(exist_ok=True)
    (here / "bench_records" / "sf10_heavy.json").write_text(
        json.dumps(rec, indent=1)
    )
    print(json.dumps({k: v["sf10_min_sec"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
