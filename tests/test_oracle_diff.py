"""Differential test: every registered query vs its DuckDB oracle, at the
SF chosen by $TEST_SF_DIR (default sf0.001 for speed; CI-style full run:
TEST_SF_DIR=/root/testdata/sf0.01)."""

from __future__ import annotations

import pytest

from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
    load_all,
)

from .oracle_diff import run_diff

REG = load_all()


@pytest.mark.parametrize("name", sorted(REG))
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    run_diff(spark, ddb, sf_dir, name, REG[name])
