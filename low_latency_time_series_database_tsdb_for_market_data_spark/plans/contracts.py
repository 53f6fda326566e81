"""Physical-plan contracts: introspection helpers used by tests to pin the
plans we *want*, not merely the first ones that pass.

The reference's entire "optimizer" is a hand-built B+ tree range descent
(`bplus_tree.hpp:70-106`); on Spark the equivalent guarantees are plan
properties — a time predicate must reach the parquet scan as a pushed
filter (row-group pruning = the index's job), a small dimension must
broadcast, a top-k must compile to TakeOrderedAndProject rather than a
global sort.  tests/test_plan_contracts.py asserts each of these, so a
future edit that silently loses pushdown or flips a broadcast join to a
shuffle join fails CI, the same way a wrong result would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final physical plan string (post-AQE initial plan).

    Raises the scan-metadata truncation limit first: the default 100
    chars elides long PushedFilters lists mid-bracket ("...", no closing
    ]), which would make pushed_filters() silently return [] for plans
    with verbose literals (e.g. sub-second timestamp bounds)."""
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "4000")
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in re.split(r",\s*(?![^()]*\))", body))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (column pruning contract)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c
        ]
        schemas.append(cols)
    return schemas


def _count(df: DataFrame, token: str) -> int:
    return physical_plan(df).count(token)


def file_scans(df: DataFrame) -> int:
    return _count(df, "FileScan")


def exchanges(df: DataFrame) -> int:
    """Shuffle exchanges (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    ) + plan.count("Exchange RoundRobinPartitioning")


def broadcast_hash_joins(df: DataFrame) -> int:
    return _count(df, "BroadcastHashJoin")


def sort_merge_joins(df: DataFrame) -> int:
    return _count(df, "SortMergeJoin")
