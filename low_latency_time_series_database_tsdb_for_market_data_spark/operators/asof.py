"""Generic as-of join — THE canonical market-data join, absent in both the
reference and stock Spark (SURVEY.md §2.2).

Semantics: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key group (inclusive, like the
reference's inclusive range bounds, `bplus_tree.hpp:80-86`).  Ties inside
the right side resolve by the (ts, seq) total order (SURVEY.md §4.3.4).

Implementation is the union + ordered window fill:

    1. tag right rows (side=0) and left rows (side=1);
    2. union and order within key by (ts, side, seq) — side=0 first so a
       right row at exactly left.ts is visible to that left row;
    3. last(right payload, ignorenulls) over rows unbounded..current
       carries the latest right row forward;
    4. keep left rows.

Scale: ONE shuffle on the join key (same as any sort-merge join), then a
linear per-partition window pass.  No range explosion, no per-group pandas
— this beats a naive range-join + argmax (which shuffles the candidate
cross product) by the fan-out factor, and it is skew-safe as long as the
key distribution is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_seq: str,
    payload: dict[str, str],
) -> DataFrame:
    """As-of join left<-right on key columns ``on``.

    ``payload`` maps right-side column -> output alias.  Left and right
    column names must be disjoint apart from ``on``.  Output = all left
    columns + aliased payload columns (NULL when no right row precedes).
    """
    lcols = left.columns
    aliases = list(payload.values())

    l_u = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__seq"),
        *[
            F.lit(None).cast(right.schema[rc].dataType).alias(a)
            for rc, a in payload.items()
        ],
    )
    r_u = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.col(right_seq).cast("long").alias("__seq"),
        *[F.col(rc).alias(a) for rc, a in payload.items()],
    )
    u = l_u.unionByName(r_u)

    w = (
        W.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__side"), F.asc_nulls_first("__seq"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = [F.last(F.col(a), ignorenulls=True).over(w).alias(a) for a in aliases]
    return u.select(*lcols, "__side", *filled).where(F.col("__side") == 1).drop("__side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_seq: str,
    payload: dict[str, str],
) -> DataFrame:
    """Forward as-of join: attach the EARLIEST right row with
    ``right.ts >= left.ts`` (inclusive) per key — the look-ahead twin of
    `asof_join` (e.g. "next fill after each order").

    Same union shape, window ordered DESCENDING by (ts, then right rows
    before left at equal ts, then seq descending) so `last(ignorenulls)`
    carries the nearest following right row backward.  Among right ties
    at one timestamp the smallest seq wins — the same (ts, seq) total
    order as the backward join.  Cost is identical: one shuffle + one
    linear window pass."""
    lcols = left.columns
    aliases = list(payload.values())

    l_u = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__seq"),
        *[
            F.lit(None).cast(right.schema[rc].dataType).alias(a)
            for rc, a in payload.items()
        ],
    )
    r_u = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.col(right_seq).cast("long").alias("__seq"),
        *[F.col(rc).alias(a) for rc, a in payload.items()],
    )
    u = l_u.unionByName(r_u)

    w = (
        W.partitionBy(*on)
        .orderBy(F.desc("__ts"), F.asc("__side"), F.desc_nulls_first("__seq"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = [F.last(F.col(a), ignorenulls=True).over(w).alias(a) for a in aliases]
    return u.select(*lcols, "__side", *filled).where(F.col("__side") == 1).drop("__side")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_seq: str,
    payload: dict[str, str],
) -> DataFrame:
    """Nearest as-of join: attach the right row minimizing
    ``|right.ts - left.ts|`` per key, ties resolved to the PAST side
    (the backward row wins — never look-ahead on a coin flip).  This is
    pandas' ``merge_asof(direction='nearest')`` for the cluster.

    Requires a NUMERIC ts on both sides (epoch micros; timestamp
    arithmetic differs across engines, integers do not).  Output: all
    left columns + aliased payload from the chosen side + ``asof_side``
    ('prev'/'next', NULL when the key has no right rows at all).

    Cost: the same single shuffle as `asof_join`, then TWO linear window
    passes over the union — one ascending fill (latest right at or
    before) and one descending fill (earliest right at or after).  The
    second pass re-sorts within the SAME partitioning, so no extra
    exchange appears (contract-tested)."""
    lcols = left.columns
    # the right ts rides along under its own internal alias (it may ALSO
    # appear in payload — a dict merge would silently drop one of the two)
    aliases = ["__rts", *payload.values()]

    l_u = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__seq"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[
            F.lit(None).cast(right.schema[rc].dataType).alias(a)
            for rc, a in payload.items()
        ],
    )
    r_u = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.col(right_seq).cast("long").alias("__seq"),
        F.col(right_ts).alias("__rts"),
        *[F.col(rc).alias(a) for rc, a in payload.items()],
    )
    u = l_u.unionByName(r_u)

    w_b = (
        W.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__side"), F.asc_nulls_first("__seq"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_f = (
        W.partitionBy(*on)
        .orderBy(F.desc("__ts"), F.asc("__side"), F.desc_nulls_first("__seq"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    both = u.select(
        *lcols,
        "__side",
        "__ts",
        *[F.last(F.col(a), ignorenulls=True).over(w_b).alias(f"__p_{a}") for a in aliases],
        *[F.last(F.col(a), ignorenulls=True).over(w_f).alias(f"__n_{a}") for a in aliases],
    ).where(F.col("__side") == 1)

    prev_ts, next_ts = F.col("__p___rts"), F.col("__n___rts")
    use_prev = prev_ts.isNotNull() & (
        next_ts.isNull()
        | ((F.col("__ts") - prev_ts) <= (next_ts - F.col("__ts")))
    )
    side = (
        F.when(prev_ts.isNull() & next_ts.isNull(), F.lit(None).cast("string"))
        .when(use_prev, F.lit("prev"))
        .otherwise(F.lit("next"))
    )
    chosen = [
        F.when(use_prev, F.col(f"__p_{a}")).otherwise(F.col(f"__n_{a}")).alias(a)
        for a in payload.values()
    ]
    return both.select(*lcols, *chosen, side.alias("asof_side"))
