"""The drop-in runner facade must honor the reference calling
convention (pandas buy/sell frames in, Mtm_Result-shaped object out)
and agree with the engine it wraps."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tradesignal_mtm_runner_spark.config import PnlCalcConfig
from tradesignal_mtm_runner_spark.runner import MtmResult, TradeMtmRunner

DIM = 120
STEP = 100.0


def frames(kind: str, buys=(), sells=()):
    idx = pd.date_range("2024-01-01", periods=DIM, freq="h")
    if kind == "asc":
        close = np.arange(DIM, dtype=float) * STEP + 1000
    elif kind == "desc":
        close = (DIM - 1 - np.arange(DIM, dtype=float)) * STEP + 1000
    else:
        close = np.full(DIM, 1000.0)
    buy = np.zeros(DIM, dtype=int)
    sell = np.zeros(DIM, dtype=int)
    buy[list(buys)] = 1
    sell[list(sells)] = 1
    buy_df = pd.DataFrame({"close": close, "buy": buy}, index=idx)
    sell_df = pd.DataFrame({"close": close, "sell": sell}, index=idx)
    return buy_df, sell_df


def cfg(**kw) -> PnlCalcConfig:
    base = dict(roi={0: math.inf}, stoploss=float("-inf"), laid_back_tax=0.0)
    base.update(kw)
    return PnlCalcConfig(**base)


@pytest.fixture(scope="module")
def runner(spark):
    return TradeMtmRunner(cfg(), spark=spark)


def test_long_hold_pnl_matches_buy_and_hold(runner):
    buy_df, sell_df = frames("asc", buys=[5])
    res = runner.calculate("ETHUSD", buy_df, sell_df)
    entry = buy_df["close"].iloc[5]
    expect = (buy_df["close"].iloc[-1] - entry) / entry
    assert res.pnl == pytest.approx(expect, abs=1e-9)
    assert res.max_drawdown == pytest.approx(0.0, abs=1e-12)
    assert len(res.long_trades_outstanding) == 1
    assert not res.long_trades_archive
    assert res.long_trades_outstanding[0].entry_price == entry


def test_round_trip_trade_archived(runner):
    buy_df, sell_df = frames("asc", buys=[5], sells=[50])
    res = runner.calculate("ETHUSD", buy_df, sell_df)
    entry = buy_df["close"].iloc[5]
    exit_ = buy_df["close"].iloc[50]
    assert len(res.long_trades_archive) == 1
    t = res.long_trades_archive[0]
    assert t.is_closed and t.close_reason == "SIGNAL"
    assert t.pnl_normalized == pytest.approx((exit_ - entry) / entry, abs=1e-9)
    assert res.pnl == pytest.approx((exit_ - entry) / entry, abs=1e-9)
    assert not res.long_trades_outstanding


def test_descending_market_drawdown(runner):
    buy_df, sell_df = frames("desc", buys=[5])
    res = runner.calculate("ETHUSD", buy_df, sell_df)
    assert res.pnl < 0
    assert res.max_drawdown == pytest.approx(-res.pnl, abs=1e-9)


def test_timeline_dict_layout(runner):
    buy_df, sell_df = frames("asc", buys=[5], sells=[50])
    res = runner.calculate("ETHUSD", buy_df, sell_df)
    tl = res.pnl_timeline
    keys = {"timestamp", "close_price", "buy_signal", "sell_signal",
            "mtm_ratio", "pnl_ratio"}
    assert keys == set(tl)
    assert all(len(v) == DIM for v in tl.values())
    assert tl["pnl_ratio"][-1] == pytest.approx(res.pnl, abs=1e-9)
    assert res.mkt_start_epoch == tl["timestamp"][0]
    assert res.mkt_end_epoch == tl["timestamp"][-1]


def test_short_round_trip(spark):
    r = TradeMtmRunner(cfg(enable_short_position=True), spark=spark)
    buy_df, sell_df = frames("desc", sells=[5], buys=[50])
    res = r.calculate("ETHUSD", buy_df, sell_df)
    entry = sell_df["close"].iloc[5]
    exit_ = sell_df["close"].iloc[50]
    assert len(res.short_trades_archive) == 1
    assert res.short_trades_archive[0].pnl_normalized == pytest.approx(
        -(exit_ - entry) / entry, abs=1e-9
    )
    assert res.pnl > 0  # short in a falling market profits


def test_distributed_many_symbols(runner, spark):
    buy_df, sell_df = frames("asc", buys=[5])
    pdf = pd.DataFrame(
        {
            "symbol": "A",
            "timestamp": buy_df.index,
            "close": buy_df["close"].values,
            "buy": buy_df["buy"].values,
            "sell": sell_df["sell"].values,
        }
    )
    many = pd.concat([pdf, pdf.assign(symbol="B")], ignore_index=True)
    out = runner.calculate_distributed(spark.createDataFrame(many))
    summary = out["summary"].toPandas().set_index("symbol")
    assert set(summary.index) == {"A", "B"}
    assert summary.loc["A", "pnl"] == pytest.approx(summary.loc["B", "pnl"])


def test_empty_symbol_returns_default(runner):
    buy_df, sell_df = frames("flat")
    res = runner.calculate("NOSIGNALS", buy_df, sell_df)
    assert isinstance(res, MtmResult)
    assert res.pnl == pytest.approx(0.0)
    assert not res.long_trades_archive and not res.long_trades_outstanding


def test_hyperopt_adapter_penalizes_do_nothing(runner):
    from tradesignal_mtm_runner_spark.models import (
        MAX_NUMERIC_VALUE,
        MIN_NUMERIC_VALUE,
    )
    from tradesignal_mtm_runner_spark.runner import HyperOptPnlCalculatorAdapter

    adapter = HyperOptPnlCalculatorAdapter(runner)

    # flat market, no signals -> pnl ~ 0 -> penalized
    buy_df, sell_df = frames("flat")
    res = adapter.calculate("NOSIGNALS", buy_df, sell_df)
    assert res.pnl == MIN_NUMERIC_VALUE
    assert res.max_drawdown == MAX_NUMERIC_VALUE

    # a real trade passes through untouched
    buy_df, sell_df = frames("asc", buys=[5])
    res = adapter.calculate("A", buy_df, sell_df)
    assert res.pnl != MIN_NUMERIC_VALUE
    assert abs(res.pnl) > 1e-12


def test_ms_converters_roundtrip():
    from datetime import datetime

    from tradesignal_mtm_runner_spark.helper import (
        convert_datetime_to_ms,
        convert_ms_to_datetime,
    )

    dt = datetime(2024, 3, 1, 12, 30, 15)
    assert convert_ms_to_datetime(convert_datetime_to_ms(dt)) == dt


def test_runner_satisfies_reference_protocol():
    """Both runner entry points are structurally ITradeSignalRunner
    (reference interfaces.py:5), so reference-typed user code accepts
    them unchanged."""
    from tradesignal_mtm_runner_spark import ITradeSignalRunner, TradeMtmRunner

    assert isinstance(TradeMtmRunner(), ITradeSignalRunner)
    from tradesignal_mtm_runner_spark.runner import HyperOptPnlCalculatorAdapter

    assert isinstance(
        HyperOptPnlCalculatorAdapter(TradeMtmRunner()), ITradeSignalRunner
    )
