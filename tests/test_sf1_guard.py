"""tools/sf1_guard.py — the standing sf1 regression gate (r9 verdict
item #6): record selection, flag rule (ratio AND floor), new-query
exemption, exit codes."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
GUARD = REPO / "tools" / "sf1_guard.py"


def _run(detail: Path, *args: str) -> tuple[int, str]:
    p = subprocess.run(
        [sys.executable, str(GUARD), "--file", str(detail), *args],
        capture_output=True,
        text=True,
    )
    return p.returncode, p.stdout


def _write(detail: Path, records: list[dict]) -> None:
    detail.write_text("\n".join(json.dumps(r) for r in records) + "\n")


def _rec(sf: float, queries: dict) -> dict:
    return {"sf": sf, "queries": queries}


def test_green_when_stable(tmp_path):
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(1.0, {"q1": 2.0, "q2": 0.5}),
            _rec(1.0, {"q1": 2.2, "q2": 0.6}),
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 0
    assert "gate green" in out


def test_flags_ratio_and_floor_breach(tmp_path):
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(1.0, {"q1": 2.0, "q2": 0.2}),
            # q1 trips (3x, above floor); q2 is 3x too but under the
            # 1s floor -> jitter, not flagged
            _rec(1.0, {"q1": 6.0, "q2": 0.6}),
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 1
    assert "q1" in out and "3.0x" in out
    assert "q2:" not in out


def test_new_and_removed_queries_never_flag(tmp_path):
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(1.0, {"q1": 1.0, "gone": 9.0}),
            _rec(1.0, {"q1": 1.1, "brand_new": 99.0}),
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 0
    assert "new queries (not gated): 1" in out
    assert "removed queries: ['gone']" in out


def test_sf_selection_and_insufficient_records(tmp_path):
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(0.1, {"q1": 1.0}),
            _rec(0.1, {"q1": 9.0}),
            _rec(1.0, {"q1": 1.0}),
        ],
    )
    # only ONE sf=1.0 record -> nothing to gate, green
    code, out = _run(detail, "--sf", "1.0")
    assert code == 0 and "need 2 to compare" in out
    # the two sf=0.1 records DO trip at their own sf
    code, _ = _run(detail, "--sf", "0.1")
    assert code == 1


def test_compares_last_two_only(tmp_path):
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(1.0, {"q1": 99.0}),  # ancient bad record must be ignored
            _rec(1.0, {"q1": 2.0}),
            _rec(1.0, {"q1": 2.1}),
        ],
    )
    code, _ = _run(detail, "--sf", "1.0")
    assert code == 0


def test_no_shared_queries_reports_divergence_not_crash(tmp_path):
    """Round-11 advice fix: disjoint query sets between the two records
    (or a zero-time old record) must report divergence, not raise
    ZeroDivisionError."""
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(1.0, {"q1": 2.0}),
            _rec(1.0, {"q9": 1.0}),
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 0
    assert "diverged" in out and "Traceback" not in out


def test_zero_shared_time_reports_degenerate_record_not_crash(tmp_path):
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(1.0, {"q1": 0.0}),
            _rec(1.0, {"q1": 1.0}),
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 0
    # shared names exist here — the cause is the degenerate old record,
    # NOT registry divergence (round-11 review wording fix)
    assert "zero shared time" in out and "diverged" not in out


def _rec_load(sf: float, queries: dict, load: float) -> dict:
    return {"sf": sf, "queries": queries, "load_factor": load}


def test_contended_record_classified_not_gated(tmp_path):
    """Round-12 item #5: a record whose CPU-spin load_factor exceeds
    the bound is CONTENDED — uniform per-query inflation is host
    noise and must not exit 1 (the r10/r11 judge-adjudication loop,
    now closed by the machine)."""
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec_load(1.0, {"q1": 2.0, "q2": 1.5}, 1.1),
            _rec_load(1.0, {"q1": 6.0, "q2": 4.5}, 3.2),  # 3x everywhere
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 0
    assert "CONTENDED" in out
    assert "not gated" in out.lower()


def test_clean_loads_still_gate(tmp_path):
    """Two records with load_factor UNDER the bound gate exactly as
    before — a real plan regression still exits 1."""
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec_load(1.0, {"q1": 2.0, "q2": 1.5}, 1.1),
            _rec_load(1.0, {"q1": 6.0, "q2": 1.5}, 1.2),
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 1
    assert "REGRESSIONS" in out and "q1" in out


def test_pre_round12_records_without_load_factor_gate_as_before(tmp_path):
    detail = tmp_path / "d.jsonl"
    _write(
        detail,
        [
            _rec(1.0, {"q1": 2.0}),
            _rec(1.0, {"q1": 6.0}),
        ],
    )
    code, out = _run(detail, "--sf", "1.0")
    assert code == 1


def test_classify_pure_function_statuses():
    sys.path.insert(0, str(REPO))
    from tools.sf1_guard import LOAD_CONTENDED_BOUND, classify

    old = _rec_load(1.0, {"q1": 2.0}, 1.0)
    assert classify(old, _rec_load(1.0, {"q1": 2.1}, 1.0), 1.5, 1.0)[0] == "green"
    assert (
        classify(old, _rec_load(1.0, {"q1": 9.0}, 1.0), 1.5, 1.0)[0]
        == "regressions"
    )
    assert (
        classify(old, _rec_load(1.0, {"q1": 9.0}, 9.9), 1.5, 1.0)[0]
        == "contended"
    )
    # the OLD record being contended also poisons the ratio
    assert (
        classify(
            _rec_load(1.0, {"q1": 2.0}, 9.9),
            _rec_load(1.0, {"q1": 9.0}, 1.0),
            1.5,
            1.0,
        )[0]
        == "contended"
    )
    assert classify(_rec(1.0, {}), _rec(1.0, {"q1": 1.0}), 1.5, 1.0)[0] == "no-gate"
    # bench.py's bound and the guard's stay in sync
    import bench

    assert bench.LOAD_CONTENDED_BOUND == LOAD_CONTENDED_BOUND
