"""A10: streaming MTM must reproduce the batch engine bar-for-bar when
the same bars are replayed through multiple micro-batches (state
carry across batch boundaries is the thing under test)."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE


def _signals_pdf(spark):
    from tradesignal_mtm_runner_spark.sources import load_table, signals_from_events

    return (
        signals_from_events(load_table(spark, SF_SMOKE, "events"))
        .toPandas()
        .sort_values(["timestamp", "event_id"])
        .reset_index(drop=True)
    )


def test_streaming_matches_batch(spark, tmp_path):
    from tradesignal_mtm_runner_spark.config import PnlCalcConfig
    from tradesignal_mtm_runner_spark.operators.mtm import signal_mtm_timeline
    from tradesignal_mtm_runner_spark.streaming.mtm_stream import (
        streaming_mtm_timeline,
    )

    cfg = PnlCalcConfig(
        roi={0: float("inf")}, stoploss=float("-inf"),
        fee_rate=0.001, laid_back_tax=0.0001,
    )
    pdf = _signals_pdf(spark)

    # 3 time-ordered chunks -> 3 parquet files -> 3 micro-batches
    # (maxFilesPerTrigger=1; file source picks oldest mtime first)
    src = tmp_path / "stream_src"
    os.makedirs(src)
    cuts = np.array_split(np.arange(len(pdf)), 3)
    for i, idx in enumerate(cuts):
        p = str(src / f"chunk-{i:03d}.parquet")
        chunk = pdf.iloc[idx].copy()
        chunk["timestamp"] = chunk["timestamp"].astype("datetime64[us]")
        chunk.to_parquet(p, index=False)
        t = time.time() - 100 + i * 10
        os.utime(p, (t, t))

    schema = spark.createDataFrame(pdf.head(1)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = "mtm_stream_parity"
    q = (
        streaming_mtm_timeline(stream, cfg)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.table(sink)
        .toPandas()
        .sort_values(["symbol", "timestamp", "event_id"])
        .reset_index(drop=True)
    )

    want = (
        signal_mtm_timeline(
            spark.createDataFrame(pdf), cfg, order_cols=["timestamp", "event_id"]
        )
        .toPandas()
        .sort_values(["symbol", "timestamp", "event_id"])
        .reset_index(drop=True)
    )

    assert len(got) == len(want) > 0
    for col in ["position", "opened", "closed"]:
        assert (got[col].values == want[col].values).all(), col
    for col in ["entry_price", "mtm_ratio", "pnl_ratio"]:
        a = got[col].astype(float).fillna(np.inf).values
        b = want[col].astype(float).fillna(np.inf).values
        assert np.isclose(a, b, rtol=0, atol=1e-9).all(), col


def test_windowed_agg_matches_batch_across_microbatches(spark, tmp_path):
    """A11: the watermarked window aggregation must merge partial
    windows across micro-batch boundaries — a time-ordered 3-way split
    cuts through windows mid-flight, so getting this right exercises
    the window state store, not just a single-batch group-by."""
    from tradesignal_mtm_runner_spark.sources import load_table
    from tradesignal_mtm_runner_spark.streaming.windowed import (
        windowed_event_counts,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)

    src = tmp_path / "win_src"
    os.makedirs(src)
    cuts = np.array_split(np.arange(len(pdf)), 3)
    for i, idx in enumerate(cuts):
        p = str(src / f"chunk-{i:03d}.parquet")
        chunk = pdf.iloc[idx].copy()
        chunk["ts"] = chunk["ts"].astype("datetime64[us]")
        chunk.to_parquet(p, index=False)
        t = time.time() - 100 + i * 10
        os.utime(p, (t, t))

    schema = spark.createDataFrame(pdf.head(1)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = "win_stream_parity"
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    key = ["window_start_epoch", "user_id", "event_type"]
    got = spark.table(sink).toPandas().sort_values(key).reset_index(drop=True)
    want = (
        windowed_event_counts(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["n_events"].values == want["n_events"].values).all()
    assert np.isclose(
        got["total_value"].values, want["total_value"].values, rtol=0, atol=1e-9
    ).all()
