"""Retention / downsampling policy: age raw ticks into OHLC bars.

The TSDB lifecycle step the reference's roadmap stops short of
(`README.md:88-93` gestures at continuous aggregates only): raw ticks
older than a cutoff are reduced ONCE to final per-bucket partial bars
(the rollup algebra of `streaming/rollup.py` — count/sum/min/max plus
(ts, seq, price) structs for the open/close endpoints), appended to the
bars table, and expired from the raw table; queries keep seeing the full
history through :func:`unified_bars`, which folds archived partials and
live raw ticks with the same monoid merge, so the retention boundary —
even one that lands mid-bucket — is invisible.

Scale shape: the expiry aggregation is one (symbol, bucket) hash agg
over only the expiring slice (the ts predicate prunes row groups — the
same pushdown contract every range scan here rides), the bars append is
bucket-scale, and the raw rewrite is a partitioned write of the
surviving slice.  On a real deployment the swap step is a table-format
metadata commit (Iceberg/Delta REPLACE); on plain parquet directories it
is stage-then-rename, which this module implements with a full
materialization barrier before anything is deleted.
"""

from __future__ import annotations

import datetime as _dt
import shutil as _shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.rollup import _partial_bars, fold_bars
from .writer import read_ticks, write_ticks


def _tick_partials(ticks: DataFrame, bucket: str) -> DataFrame:
    return _partial_bars(
        ticks.select("symbol", "ts", "price", "seq"), bucket
    )


def _has_parquet(path: str) -> bool:
    p = Path(path)
    return p.exists() and any(p.glob("**/*.parquet"))


def apply_retention(
    spark: SparkSession,
    raw_dir: str,
    bars_dir: str,
    cutoff: _dt.datetime,
    bucket: str = "1 minute",
) -> dict:
    """Expire raw ticks with ts < cutoff into partial bars.

    Idempotent: a re-run with the same (or an earlier) cutoff finds no
    expiring rows and changes nothing — including on a raw table already
    expired down to nothing (a fully-archived table stays queryable
    through unified_bars).  The surviving raw slice is fully
    materialized into a staging directory BEFORE the old table is
    removed, so no crash point loses data: the survivors always exist
    complete in the stage or the final directory (a crash between the
    remove and the rename leaves them in the stage path, recoverable by
    finishing the rename by hand; a table format with atomic REPLACE
    commits closes even that window).  Returns an audit dict
    {expired_rows, retained_rows, bars_appended}."""
    if not _has_parquet(raw_dir):  # everything already archived
        return {"expired_rows": 0, "retained_rows": 0, "bars_appended": 0}
    raw = read_ticks(spark, raw_dir)
    lit = F.lit(cutoff)
    old = raw.where(F.col("ts") < lit)
    expired = old.count()
    if expired == 0:
        return {
            "expired_rows": 0,
            "retained_rows": raw.count(),
            "bars_appended": 0,
        }
    partials = _tick_partials(old, bucket)
    partials.write.mode("append").parquet(bars_dir)
    n_bars = spark.read.parquet(bars_dir).count()

    # stage -> swap: materialize survivors fully, then replace the dir
    # (an empty survivor set swaps in an empty directory — Spark writes
    # no part files for an empty partitioned frame, and every reader
    # here goes through the _has_parquet guard)
    stage = f"{raw_dir.rstrip('/')}__retain_stage"
    recent = raw.where(F.col("ts") >= lit)
    retained = recent.count()
    if retained:
        write_ticks(recent, stage, mode="overwrite")
        assert read_ticks(spark, stage).count() == retained  # barrier
    else:
        Path(stage).mkdir(parents=True, exist_ok=True)
    _shutil.rmtree(raw_dir)
    _shutil.move(stage, raw_dir)
    return {
        "expired_rows": expired,
        "retained_rows": retained,
        "bars_appended": n_bars,
    }


def unified_bars(
    spark: SparkSession,
    raw_dir: str,
    bars_dir: str,
    bucket: str = "1 minute",
) -> DataFrame:
    """Full-history OHLC bars over archived partials + live raw ticks.

    Both sides reduce to the same partial-bar shape and fold in ONE
    monoid merge, so a bucket straddling a retention cutoff (part
    archived, part raw) — or split across several retention passes —
    still yields exactly the bar a never-retained table would.  Either
    side may be empty (brand-new table: no archive; fully-retained
    table: no raw files)."""
    have_raw = _has_parquet(raw_dir)
    have_bars = _has_parquet(bars_dir)
    if not have_raw and not have_bars:
        raise ValueError(
            f"unified_bars: neither {raw_dir} nor {bars_dir} holds data"
        )
    parts = (
        _tick_partials(read_ticks(spark, raw_dir), bucket)
        if have_raw
        else None
    )
    if have_bars:
        archived = spark.read.parquet(bars_dir)
        parts = archived if parts is None else parts.unionByName(archived)
    return fold_bars(parts)
