"""Driver-contract invariants for __spark_entry__.py: the head-50
correctness window must stay well-formed (the driver records only the
first 50 queries() entries, so a typo'd or rows-only name here silently
burns a rotation slot for a whole round)."""

from __future__ import annotations

import __spark_entry__ as E
from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)


def test_head_window_is_50_known_oracle_backed_names():
    reg = load_all()
    head = E._HEAD_R14
    assert len(head) == 50
    assert len(set(head)) == 50
    unknown = [n for n in head if n not in reg]
    assert not unknown, unknown
    # every slot must produce a full rows+schema+hash row, so the
    # rows-only sketches (q25/q73) may never occupy one
    no_oracle = [n for n in head if reg[n].oracle is None]
    assert not no_oracle, no_oracle


def test_ordered_covers_whole_registry_once():
    reg = load_all()
    names = E._ordered()
    assert sorted(names) == sorted(reg)
    assert names[:50] == E._HEAD_R14


def test_oracle_sql_keys_subset_of_queries():
    qs, oras = E.queries(), E.oracle_sql()
    assert set(oras) <= set(qs)
    # the rows-only set stays minimal and intentional
    rows_only = sorted(set(qs) - set(oras))
    assert rows_only == ["q25_approx_distinct", "q73_approx_percentile"]


def test_every_registry_query_is_declared_in_survey():
    """SURVEY.md's own rule (§2.3 footer): do not register names not
    present there.  Rounds 6 and 7 both drifted (q160-q165, q179-q184
    landed in the registry without their §2.3 rows); this pins the
    declaration so the drift fails HERE, in the same commit."""
    import pathlib
    import re

    survey = pathlib.Path(__file__).resolve().parents[1] / "SURVEY.md"
    text = survey.read_text()
    declared = set(re.findall(r"`(q\d{2,3}_\w+)`", text))
    reg = load_all()
    missing = sorted(set(reg) - declared)
    assert not missing, f"registered but not declared in SURVEY.md: {missing}"
