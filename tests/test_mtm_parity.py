"""Cross-engine parity: the declarative window-algebra MTM (operators.mtm)
and the full bookkeeper state machine (operators.bookkeeper) must agree
exactly on the restricted config both can express — this is the proof
that the window formulation implements the reference loop."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE
from tradesignal_mtm_runner_spark.config import PnlCalcConfig
from tradesignal_mtm_runner_spark.operators.bookkeeper import run_mtm_bookkeeper
from tradesignal_mtm_runner_spark.operators.mtm import signal_mtm_timeline
from tradesignal_mtm_runner_spark.sources import load_table, signals_from_events


def _cfg():
    return PnlCalcConfig(
        roi={0: float("inf")},
        stoploss=float("-inf"),
        fee_rate=0.001,
        laid_back_tax=0.0001,
    )


def test_declarative_equals_bookkeeper_on_events(spark):
    sig = signals_from_events(load_table(spark, SF_SMOKE, "events"))
    decl = (
        signal_mtm_timeline(sig, _cfg(), order_cols=["timestamp", "event_id"])
        .select("symbol", "timestamp", "mtm_ratio", "pnl_ratio")
        .toPandas()
        .sort_values(["symbol", "timestamp"])
        .reset_index(drop=True)
    )
    book = (
        run_mtm_bookkeeper(sig, _cfg(), output="timeline")
        .select("symbol", "timestamp", "mtm_ratio", "pnl_ratio")
        .toPandas()
        .sort_values(["symbol", "timestamp"])
        .reset_index(drop=True)
    )
    assert len(decl) == len(book) > 0
    assert (decl["symbol"].values == book["symbol"].values).all()
    np.testing.assert_allclose(
        decl["mtm_ratio"].values, book["mtm_ratio"].values, rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        decl["pnl_ratio"].values, book["pnl_ratio"].values, rtol=0, atol=1e-9
    )


def test_bookkeeper_trades_output(spark):
    sig = signals_from_events(load_table(spark, SF_SMOKE, "events"))
    trades = run_mtm_bookkeeper(sig, _cfg(), output="trades").toPandas()
    assert len(trades) > 0
    assert set(trades["direction"]) == {"LONG"}
    closed = trades[trades["is_closed"]]
    assert (closed["close_reason"] == "SIGNAL").all()
    # closed trades: pnl_normalized = +/-(exit-entry)/entry - 2*fee
    expect = (
        (closed["exit_price"] - closed["entry_price"]) / closed["entry_price"]
        - 2 * 0.001
    )
    np.testing.assert_allclose(closed["pnl_normalized"].values, expect.values, atol=1e-12)


def test_bookkeeper_full_config_runs(spark):
    """roi + stoploss + shorts + maxpos=3 on real data: engine runs,
    trades consistent (every close_reason valid, exits after entries)."""
    cfg = PnlCalcConfig(
        roi={0: 0.05, 60: 0.02},
        stoploss=-0.03,
        enable_short_position=True,
        max_position_per_symbol=3,
        fee_rate=0.001,
        laid_back_tax=0.0001,
    )
    sig = signals_from_events(load_table(spark, SF_SMOKE, "events"))
    tl = run_mtm_bookkeeper(sig, cfg, output="timeline").toPandas()
    tr = run_mtm_bookkeeper(sig, cfg, output="trades").toPandas()
    assert len(tl) == 1000
    assert tl["mtm_ratio"].notna().all()
    closed = tr[tr["is_closed"]]
    assert set(closed["close_reason"]) <= {"SIGNAL", "ROI", "STOP_LOSS"}
    assert (closed["exit_datetime"] > closed["entry_datetime"]).all()
    assert {"ROI", "STOP_LOSS"} & set(closed["close_reason"]), "expected roi/sl closes on this data"
