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


def test_degenerate_buy_sell_bar_is_hold_in_all_engines(spark):
    """buy=1, sell=1, close<=0 on one bar: the buy branch consumes the
    bar and the close<=0 price gate turns it into HOLD — the bar must
    NOT fall through to the sell branch and close the open long
    (cross-engine corner from ADVICE r1; bookkeeper step 4 if/elif)."""
    rows = pd.DataFrame(
        {
            "symbol": "X",
            "timestamp": pd.date_range("2024-01-01", periods=5, freq="1min"),
            "close": [100.0, 101.0, 0.0, 103.0, 104.0],
            "buy": [1, 0, 1, 0, 0],
            "sell": [0, 0, 1, 0, 1],
        }
    )
    sig = spark.createDataFrame(rows)
    cfg = _cfg()
    decl = (
        signal_mtm_timeline(sig, cfg)
        .orderBy("timestamp")
        .select("position", "mtm_ratio", "pnl_ratio")
        .toPandas()
    )
    book = (
        run_mtm_bookkeeper(sig, cfg, output="timeline")
        .orderBy("timestamp")
        .select("mtm_ratio", "pnl_ratio")
        .toPandas()
    )
    # long stays open across the degenerate bar, closes at the final sell
    assert decl["position"].tolist() == [1, 1, 1, 1, 0]
    np.testing.assert_allclose(
        decl["mtm_ratio"].values, book["mtm_ratio"].values, atol=1e-12
    )
    np.testing.assert_allclose(
        decl["pnl_ratio"].values, book["pnl_ratio"].values, atol=1e-9
    )
