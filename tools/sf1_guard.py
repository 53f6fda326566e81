"""sf1 regression gate (round-9 judge item #6): compare the last two
BENCH_DETAIL.jsonl records at a given scale factor and flag any query
whose time grew more than RATIO round-over-round.

Usage:
    python tools/sf1_guard.py [--sf 1.0] [--ratio 1.5] [--floor 1.0]
                              [--file BENCH_DETAIL.jsonl]

Flags only queries that are BOTH >= ratio x the previous record AND
>= floor seconds in the new record — sub-second timings on this host
swing 2x run-to-run (the round-5 jitter note), so the floor keeps the
gate about plans, not scheduler noise.  Exit code 1 when anything is
flagged; queries present in only one record are listed informationally
(registry growth is expected) but never flagged.

The per-round protocol: after the solo sf1 bench run appends its record,
run this guard; a flag means a plan regressed at 10x data — find it
BEFORE the round closes (the q13/q95 quadratics of round 9 would have
been flagged at 30x and 7x).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load_records(path: str, sf: float) -> list[dict]:
    recs = []
    for ln in Path(path).read_text().strip().splitlines():
        d = json.loads(ln)
        if abs(float(d.get("sf", -1)) - sf) < 1e-9 and d.get("queries"):
            recs.append(d)
    return recs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=1.0)
    ap.add_argument("--file", default=str(Path(__file__).resolve()
                                          .parents[1] / "BENCH_DETAIL.jsonl"))
    args = ap.parse_args()

    recs = load_records(args.file, args.sf)
    if len(recs) < 2:
        print(
            f"sf1_guard: {len(recs)} record(s) at sf={args.sf} in "
            f"{args.file} — need 2 to compare; nothing to gate."
        )
        return 0
    old, new = recs[-2], recs[-1]
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    only_new = sorted(set(qn) - set(qo))
    only_old = sorted(set(qo) - set(qn))

    flagged = []
    improved = 0
    for name in shared:
        t0, t1 = float(qo[name]), float(qn[name])
        if t1 >= args.floor and t0 > 0 and t1 / t0 >= args.ratio:
            flagged.append((name, t0, t1, t1 / t0))
        elif t0 > 0 and t1 / t0 <= 1 / args.ratio and t0 >= args.floor:
            improved += 1

    so, sn = sum(map(float, (qo[n] for n in shared))), sum(
        map(float, (qn[n] for n in shared))
    )
    if not shared or so == 0:
        # No shared names (registry divergence) or a zero-time old
        # record (corrupt/degenerate): nothing meaningful to ratio —
        # report the actual cause, don't crash.
        cause = (
            "registry diverged between records"
            if not shared
            else "old record has zero shared time (degenerate/corrupt)"
        )
        print(
            f"sf1_guard sf={args.sf}: {len(shared)} shared queries, "
            f"old-record shared time {so:.1f}s — suite ratio undefined; "
            f"{cause}, no gate applied."
        )
        if only_new:
            print(f"  new queries (not gated): {len(only_new)}")
        if only_old:
            print(f"  removed queries: {only_old}")
        return 0
    print(
        f"sf1_guard sf={args.sf}: {len(shared)} shared queries, "
        f"equal-set suite {so:.1f}s -> {sn:.1f}s "
        f"({sn / so:.2f}x); {improved} improved >= {args.ratio}x"
    )
    if only_new:
        print(f"  new queries (not gated): {len(only_new)}")
    if only_old:
        print(f"  removed queries: {only_old}")
    if flagged:
        print(f"  REGRESSIONS (>= {args.ratio}x and >= {args.floor}s):")
        for name, t0, t1, r in sorted(
            flagged, key=lambda x: -x[3]
        ):
            print(f"    {name}: {t0:.2f}s -> {t1:.2f}s ({r:.1f}x)")
        return 1
    print(f"  no regression >= {args.ratio}x at >= {args.floor}s — gate green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
