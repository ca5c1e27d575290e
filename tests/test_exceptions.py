"""Reference exception-surface parity (reference exceptions.py:1-21).

The reference's engine loop silently skips disallowed opens
(trade_reward.py:277-279); its exception types are public API raised
from ProxyTrade (models.py:130,151) or reserved for callers. Here:
  - ProxyTrade raises the two trade-state errors exactly like the
    reference;
  - TradeMtmRunner(strict=True) opts into raising the position-limit
    types from the engine (default stays silent-skip for parity);
  - MtmResult serializers match the reference's key sets.
"""

from __future__ import annotations

import json
import sys

import pandas as pd
import pytest

from tradesignal_mtm_runner_spark import (
    InvalidTradeStateError,
    MaxPositionPerSymbolExceededException,
    MtmResult,
    NoShortPositionAllowedException,
    PnlCalcConfig,
    ProxyTrade,
    RoiHelper,
    TradeMtmRunner,
    TradeNotYetClosedForPnlError,
    UnSupportedException,
)

REF_SRC = "/root/reference/src"


def _have_ref() -> bool:
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    try:
        import tradesignal_mtm_runner  # noqa: F401

        return True
    except Exception:
        return False


HAVE_REF = _have_ref()

TS0 = pd.Timestamp("2024-01-01 00:00:00")


def _open_trade(direction="LONG", fee_rate=0.001) -> ProxyTrade:
    return ProxyTrade(
        symbol="BTC",
        direction=direction,
        entry_datetime=TS0,
        entry_price=100.0,
        fee_rate=fee_rate,
    )


# --- ProxyTrade raise behavior (reference models.py:130,151) -----------------


def test_pnl_of_open_trade_raises():
    with pytest.raises(TradeNotYetClosedForPnlError):
        _ = _open_trade().pnl


def test_double_close_raises():
    t = _open_trade()
    t.close_position(110.0, TS0 + pd.Timedelta(minutes=5), "SIGNAL")
    with pytest.raises(InvalidTradeStateError):
        t.close_position(120.0, TS0 + pd.Timedelta(minutes=6), "SIGNAL")


def test_closed_trade_pnl_formula():
    # pnl = (exit - entry) - 2 * fee_rate * entry  (entry + close leg)
    t = _open_trade(fee_rate=0.001)
    t.close_position(110.0, TS0 + pd.Timedelta(minutes=5), "SIGNAL")
    assert t.pnl == pytest.approx(10.0 - 2 * 0.001 * 100.0)
    assert t.pnl_normalized == pytest.approx((10.0 - 0.2) / 100.0)


@pytest.mark.skipif(not HAVE_REF, reason="reference package not available")
def test_proxytrade_pnl_matches_reference():
    from tradesignal_mtm_runner.models import (
        Inventory_Mode,
        LongShort_Enum,
        ProxyTrade as RefTrade,
    )

    ref = RefTrade(
        symbol="BTC",
        entry_price=100.0,
        unit=100.0,
        direction=LongShort_Enum.LONG,
        entry_datetime=TS0.to_pydatetime(),
        inventory_mode=Inventory_Mode.FIFO,
        fee_rate=0.001,
    )
    ours = _open_trade(fee_rate=0.001)
    for price in (90.0, 100.0, 137.5):
        assert ours.calculate_pnl(price) == pytest.approx(ref.calculate_pnl(price))
        assert ours.calculate_pnl_normalized(
            price, fee_included=True
        ) == pytest.approx(ref.calculate_pnl_normalized(price, fee_included=True))
        assert ours.calculate_mtm_normalized(price - 100.0) == pytest.approx(
            ref.calculate_mtm_normalized(price - 100.0)
        )


# --- strict engine mode ------------------------------------------------------


def _frames(rows: list[tuple[float, int, int]]):
    idx = pd.date_range("2024-01-01", periods=len(rows), freq="1min")
    close = [r[0] for r in rows]
    buy = pd.DataFrame({"close": close, "buy": [r[1] for r in rows]}, index=idx)
    sell = pd.DataFrame({"sell": [r[2] for r in rows]}, index=idx)
    return buy, sell


def test_strict_no_short_raises(spark):
    cfg = PnlCalcConfig(roi={0: float("inf")}, enable_short_position=False)
    runner = TradeMtmRunner(cfg, spark=spark, strict=True)
    buy, sell = _frames([(100.0, 0, 0), (101.0, 0, 1), (102.0, 0, 0)])
    with pytest.raises(NoShortPositionAllowedException):
        runner.calculate("BTC", buy, sell)


def test_strict_max_position_raises(spark):
    cfg = PnlCalcConfig(roi={0: float("inf")}, max_position_per_symbol=1)
    runner = TradeMtmRunner(cfg, spark=spark, strict=True)
    buy, sell = _frames([(100.0, 1, 0), (101.0, 1, 0), (102.0, 0, 0)])
    with pytest.raises(MaxPositionPerSymbolExceededException):
        runner.calculate("BTC", buy, sell)


def test_default_mode_silently_skips_like_reference(spark):
    # same signals as the strict cases: default mode must not raise
    cfg = PnlCalcConfig(roi={0: float("inf")}, max_position_per_symbol=1)
    runner = TradeMtmRunner(cfg, spark=spark)
    buy, sell = _frames([(100.0, 1, 0), (101.0, 1, 0), (102.0, 0, 1)])
    res = runner.calculate("BTC", buy, sell)
    # one long opened at bar 0, closed by the sell at bar 2; the extra
    # buy and the would-be short open are silently skipped
    assert len(res.long_trades_archive) == 1
    assert not res.short_trades_outstanding


def test_unsupported_output_mode_raises(spark):
    from tradesignal_mtm_runner_spark.operators.bookkeeper import run_mtm_bookkeeper

    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "symbol": ["A"],
                "timestamp": [TS0],
                "close": [1.0],
                "buy": [0],
                "sell": [0],
            }
        )
    )
    with pytest.raises(UnSupportedException):
        run_mtm_bookkeeper(sdf, PnlCalcConfig.get_default(), output="bogus")


# --- MtmResult serializer parity ---------------------------------------------


def test_query_dict_keys_match_reference_shape():
    res = MtmResult(symbol="BTC", strategy_id="s1", batch_id="b1")
    qd = res.to_query_dict()
    expected = {
        "batch_id",
        "data_key",
        "strategy_name",
        "strategy_id",
        "pnl",
        "max_drawdown",
        "sharpe_ratio",
        "mkt_start_epoch",
        "mkt_end_epoch",
        "run_start_epoch",
        "run_end_epoch",
        "long_trades_archive_size",
        "short_trades_archive_size",
        "long_trades_outstanding_size",
        "short_trades_outstanding_size",
    }
    assert set(qd) == expected


@pytest.mark.skipif(not HAVE_REF, reason="reference package not available")
def test_query_dict_keys_match_reference_exactly():
    from tradesignal_mtm_runner.models import Mtm_Result

    ours = MtmResult(symbol="BTC").to_query_dict()
    theirs = Mtm_Result().to_query_dict()
    assert set(ours) == set(theirs)


def test_json_str_covers_reference_jsonl_fields():
    res = MtmResult(
        symbol="BTC",
        strategy_id="sid",
        batch_id="bid",
        data_key="dk",
        strategy_name="sn",
        pnl=0.1,
        pnl_timeline={"pnl_ratio": [0.0, 0.1]},
    )
    d = json.loads(res.to_json_str())
    # field-for-field with the reference's JSONL result rows
    # (reference samples/sample_pnlresult.jsonl)
    for key in (
        "strategy_id",
        "batch_id",
        "data_key",
        "strategy_name",
        "pnl",
        "max_drawdown",
        "sharpe_ratio",
        "pnl_timeline",
        "mkt_start_epoch",
        "mkt_end_epoch",
        "run_start_epoch",
        "run_end_epoch",
        "params",
        "long_trades_archive",
        "short_trades_archive",
        "long_trades_outstanding",
        "calc_log_folder",
    ):
        assert key in d, key
    assert d["pnl_timeline"]["pnl_ratio"] == [0.0, 0.1]


def test_misspelled_outstanding_alias():
    res = MtmResult(symbol="BTC")
    t = _open_trade("SHORT")
    res.short_trades_outstanding.append(t)
    # reference field name is misspelled 'oustanding' (models.py:218)
    assert res.short_trades_oustanding == [t]


def test_roi_helper_accepts_float_minute_keys():
    # {0.5 min: 1%} — key*60 = 30s; must not KeyError or mismap
    h = RoiHelper({0.5: 0.01, 0: 0.04})
    entry = TS0.to_pydatetime()
    later = (TS0 + pd.Timedelta(seconds=45)).to_pydatetime()
    assert h.get_all_take_profit_pnl(entry, later) == [0.04, 0.01]
    assert h.can_take_profit(entry, later, normalized_pnl=0.02)
    assert not h.can_take_profit(entry, later, normalized_pnl=0.005)
