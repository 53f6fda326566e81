"""Local mirror of the driver's DuckDB-oracle differential check.

Compares a Spark DataFrame against DuckDB SQL on: row count, column-name
set, and order-insensitive values (sorted by all columns, floats compared
with tolerance after the queries' own ROUND discipline).
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # lists/arrays -> tuples so they sort/compare
            pdf[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(
        drop=True
    )
    return pdf


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used to mimic the driver's value-hash typing.

    DuckDB types integer SUM(...) as HUGEINT (int128), which pandas maps
    to float64/object — a silent divergence from Spark's int64 that the
    driver's hash compare flags even when every value is equal (round-1
    q20/q45 failures).  Comparing kinds pre-normalization catches it."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def assert_df_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = ""):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    for c in sorted(spark_pdf.columns):
        ka = _dtype_kind(spark_pdf[c])
        kb = _dtype_kind(oracle_pdf[c])
        # empty frames surface as object on both sides; only flag real data
        if len(spark_pdf) and ka != kb:
            raise AssertionError(
                f"{name}: col {c} dtype-kind mismatch spark={ka}"
                f"({spark_pdf[c].dtype}) oracle={kb}({oracle_pdf[c].dtype})"
                " — driver hash would fail; align the oracle SQL cast"
            )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
            fa = sa.astype("float64").to_numpy()
            fb = sb.astype("float64").to_numpy()
            for i, (x, y) in enumerate(zip(fa, fb)):
                if math.isnan(x) and math.isnan(y):
                    continue
                # the driver hashes values, so require bit-identical floats
                # (the ROUND/integer-cents discipline makes this achievable)
                assert x == y, (
                    f"{name}: col {c} row {i}: {x!r} != {y!r}"
                )
        else:
            eq = sa.fillna("\x00NULL").eq(sb.fillna("\x00NULL"))
            if not eq.all():
                i = int(eq.idxmin())
                raise AssertionError(
                    f"{name}: col {c} first mismatch at row {i}: "
                    f"{sa.iloc[i]!r} != {sb.iloc[i]!r}"
                )


def run_diff(spark, ddb, sf_dir: str, name: str, qd) -> None:
    sdf = qd.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if qd.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only smoke
        return
    oracle_pdf = ddb.execute(qd.oracle).df()
    assert_df_equal(spark_pdf, oracle_pdf, name)
