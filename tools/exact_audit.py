"""Multi-SF exact-value audit: every oracle-backed query vs DuckDB with
ZERO float tolerance (the driver's hash compare is exact; isclose-style
checks hide engine round-tie divergences — q21/q36 were found exactly
this way at sf0.1).

Usage:
    python tools/exact_audit.py [sf_dir] [q1,q2,...]

Defaults to /root/testdata/sf0.1 and all oracle-backed queries.  Heavy
recursive-CTE oracles (q39 at sf0.1) can be excluded by listing the rest.
Exit 0 iff every checked query matches rows+cols+values exactly.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __spark_entry__ as E  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("exact-audit")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oras = E.queries(), E.oracle_sql()
    if names is None:
        names = [n for n in qs if n in oras]
        # q39's recursive-CTE oracle is O(rows^2)-ish in DuckDB and
        # infeasible beyond sf0.01 — auto-skip on bigger fixtures instead
        # of hanging the default run (name it explicitly to force it)
        if "sf0.001" not in sf and "sf0.01" not in sf and "q39_ewma" in names:
            names.remove("q39_ewma")
            print("q39_ewma SKIP recursive oracle infeasible at this sf "
                  "(audit it at sf0.01 or pass it explicitly)", flush=True)
    bad = 0
    for name in names:
        if name not in oras:
            print(f"{name} SKIP no-oracle", flush=True)
            continue
        try:
            s = qs[name](spark, sf).toPandas()
            o = con.execute(oras[name]).df()
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            print(f"{name} ERR {str(e)[:160]}", flush=True)
            bad += 1
            continue
        ok = len(s) == len(o) and sorted(s.columns) == sorted(o.columns)
        if ok:
            a = s.reindex(sorted(s.columns), axis=1)
            b = o.reindex(sorted(o.columns), axis=1)
            for c in a.columns:
                if pd.api.types.is_datetime64_any_dtype(a[c]):
                    a[c] = pd.to_datetime(a[c]).dt.tz_localize(None)
                if pd.api.types.is_datetime64_any_dtype(b[c]):
                    b[c] = pd.to_datetime(b[c]).dt.tz_localize(None)
            a = a.sort_values(by=list(a.columns), ignore_index=True)
            b = b.sort_values(by=list(b.columns), ignore_index=True)
            for c in a.columns:
                if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(
                    b[c]
                ):
                    ok &= bool(
                        np.isclose(
                            pd.to_numeric(a[c], errors="coerce"),
                            pd.to_numeric(b[c], errors="coerce"),
                            rtol=0,
                            atol=0,
                            equal_nan=True,
                        ).all()
                    )
                else:
                    ok &= bool(
                        (a[c].astype(str) == b[c].astype(str)).all()
                    )
        print(f"{name} {'EXACT' if ok else 'MISMATCH'} ({len(s)} rows)", flush=True)
        bad += 0 if ok else 1
    print(f"{'ALL EXACT' if bad == 0 else f'{bad} FAILURES'} over {len(names)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
