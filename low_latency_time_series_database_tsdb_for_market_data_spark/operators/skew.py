"""Skew mitigation: salted aggregation and salted broadcast-fallback join.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these are the explicit forms for the cases AQE cannot fix —
a single hot GROUP BY key whose partial aggregate still lands on one
reducer, and a shuffle join whose hot key exceeds what one task can hold.

Both are pure DataFrame compositions (no custom partitioner):

  salted_agg:  groupBy(key, salt) partial -> groupBy(key) final.
               Two exchanges, but the first spreads the hot key over
               `salt` reducers; correct for any algebraic aggregate
               expressed as (partial, merge) pairs.
  salted_join: replicate the SMALL side `salt` times (explode), salt the
               big side's key with a deterministic hash-mod — the hot
               key's rows spread over `salt` tasks while every row still
               meets its match exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def _salt_col(cols: list[str], n: int) -> Column:
    # deterministic row spreading: hash of the full row tuple mod n
    # (pmod keeps it non-negative)
    return F.pmod(F.xxhash64(*cols), F.lit(n)).alias("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Column]],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase aggregation spreading each key over `salt` reducers.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr over
    the partial column).  Example:
        {"n": (F.count(F.lit(1)), F.sum("n")),
         "mx": (F.max("v"), F.max("mx"))}
    """
    partial = df.groupBy(F.col(key), _salt_col(df.columns, salt)).agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join resilient to a hot key on the big side.

    The small side is replicated `salt` ways (explode of a literal
    range), the big side salts deterministically by row hash; the join
    key becomes (key, salt_id), so the hot key's rows split across
    `salt` tasks.  Inner-join semantics; output columns = big ++ small
    (minus the duplicate key)."""
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    salted_big = big.withColumn("__salt", _salt_col(big.columns, salt))
    return salted_big.join(
        salted_small,
        (F.col(big_key) == F.col(small_key)) & (salted_big["__salt"] == salted_small["__salt"]),
    ).drop("__salt", small_key)
