"""Watermarked windowed aggregation over the event stream.

The second streaming operator class next to the stateful MTM engine
(mtm_stream.py): a tumbling-window groupBy with a watermark. On an
unbounded stream the watermark bounds state — windows older than
(max event time - delay) are finalized and dropped, so state size is
(#keys x #open windows), not #events: the property that keeps a
100 TB/day stream's aggregation memory constant.

Semantics contract: replaying a finite stream must equal the batch
group-by on the same bars (the oracle is plain SQL over the events
table). The driver-facing query runs in COMPLETE output mode so the
tail windows still open at end-of-stream are emitted too — append
mode would hold them back and replay != batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "1 minute"
WATERMARK = "10 minutes"
R_VALUE = 4


def windowed_json_rollup(
    events: DataFrame,
    window: str = WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Tumbling-window rollup of a field EXTRACTED FROM THE JSON
    ``props`` column — the streaming twin of the batch
    ``events_json_extract`` query (B35). ``from_json`` with an
    explicit schema is one JVM-side parse per row and works
    identically on a stream and a batch frame, so schema-on-read
    costs nothing extra under ``readStream``; the watermark bounds
    state exactly as in windowed_event_counts."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        src.withColumn("_k", k)
        .groupBy(F.window(F.col("ts"), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("_k").cast("long").alias("n_with_k"),
            F.sum("_k").cast("long").alias("sum_k"),
        )
        .select(
            (F.unix_millis(F.col("w.start")) / 1000).cast("long").alias(
                "window_start_epoch"
            ),
            "event_type",
            "n_events",
            "n_with_k",
            "sum_k",
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Tumbling-window event counts + value sums per (user, type).
    Works on a stream (with watermark state eviction) and, unchanged,
    on a batch frame — the parity test runs the SAME function both
    ways."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window(F.col("ts"), window).alias("w"),
            "user_id",
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), R_VALUE).alias("total_value"),
        )
        .select(
            (F.unix_millis(F.col("w.start")) / 1000).cast("long").alias(
                "window_start_epoch"
            ),
            "user_id",
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
        )
    )
