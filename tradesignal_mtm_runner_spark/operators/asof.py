"""Distributed as-of join.

Spark lacks a native ASOF JOIN (DuckDB/pandas have one). The scalable
formulation — no pandas merge_asof, no broadcast of the right side —
is the union trick:

    tag left rows (side=1) and right rows (side=0), union them,
    window per join-key ordered by (time, side), carry the last
    right-side payload forward with last(ignorenulls), keep left rows.

One shuffle on the join key, whole-stage codegen, no skew worse than
the key distribution itself. This is the standard pattern for
point-in-time joins at scale (backward direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (strict: <) within the same ``by`` key.

    value_cols are the right-side columns to carry; they appear on the
    output as-is (left columns preserved).
    """
    lcols = left.columns
    # side=0 sorts before side=1 at equal timestamps -> right row at the
    # same instant is visible to the left row (non-strict); strict mode
    # flips the tiebreak so it is not.
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != by],
        F.col(by),
        F.col(right_ts).alias("_t"),
        F.lit(2 if strict else 0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("_side"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
