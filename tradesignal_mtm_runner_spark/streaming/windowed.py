"""Watermarked windowed aggregation over the event stream.

The second streaming operator class next to the stateful MTM engine
(mtm_stream.py): a tumbling-window groupBy with a watermark. On an
unbounded stream the watermark bounds state — windows older than
(max event time - delay) are finalized and dropped, so state size is
(#keys x #open windows), not #events: the property that keeps a
100 TB/day stream's aggregation memory constant.

Semantics contract: replaying a finite stream must equal the batch
group-by on the same bars (the oracle is plain SQL over the events
table). The driver-facing queries run in UPDATE output mode — the
one mode where the claim above is actually true end-to-end: watermark
state eviction is INERT in complete mode (state would grow with
stream lifetime; r9 finding), and append mode holds back the tail
windows still open at end-of-stream (replay != batch). Update mode
evicts closed windows AND emits every counter revision; the final
counters are recovered at read with :func:`latest_window_counts`
(last revision per key — valid because a window's event count
strictly increases across its revisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WINDOW = "1 minute"
WATERMARK = "10 minutes"
R_VALUE = 4


def latest_window_counts(
    sink: DataFrame, key_cols: list[str], count_col: str = "n_events"
) -> DataFrame:
    """Final counters from an UPDATE-mode sink table: the sink holds
    one row per counter REVISION; the final state of each key is the
    revision with the highest count (a window's count strictly
    increases across its revisions, so the argmax is unique and
    deterministic). This read-side extraction is what lets the
    driver-facing windowed queries run in update mode — the only
    output mode where the watermark actually bounds state."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(count_col))
    return (
        sink.withColumn("_rev", F.row_number().over(w))
        .filter(F.col("_rev") == 1)
        .drop("_rev")
    )


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
