"""Sessionization: split per-key event streams on inactivity gaps.

Classic gaps-and-islands: flag rows whose gap from the previous event
exceeds the threshold, cumulative-sum the flags into session ids.
One shuffle (partition by key), whole-stage codegen; at 100 TB this
is the standard formulation — state never leaves the window operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Adds ``session_id`` (1-based per key) to the events."""
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    gap_sec = F.unix_millis(F.col(ts_col)) / 1000.0 - F.unix_millis(
        F.lag(ts_col, 1).over(w)
    ) / 1000.0
    new_session = (
        F.when(gap_sec.isNull() | (gap_sec > gap_minutes * 60.0), 1).otherwise(0)
    )
    df = events.withColumn("_new_session", new_session)
    return df.withColumn(
        "session_id",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_session")


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session aggregate: bounds, event count, duration seconds."""
    s = sessionize(events, key_col, ts_col, gap_minutes, order_cols)
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col))) / 1000.0
        ).alias("duration_sec"),
    )
