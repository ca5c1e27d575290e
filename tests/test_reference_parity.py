"""Head-to-head parity against the actual reference engine.

The full bookkeeper (SURVEY A7) is the one operator whose feedback
loop no SQL oracle can express — the driver only row-counts it. This
test closes that gap: when the reference package is importable (read
from /root/reference/src, never copied), the SAME random signals run
through the reference's pandas loop and our applyInPandas engine, and
pnl / max_drawdown / sharpe / per-bar timelines must agree to 1e-9
across every config family (roi tiers, stoploss, shorts, max
position, fees, tax). Skipped cleanly when the reference isn't
present, so the repo stays standalone.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

REF_SRC = "/root/reference/src"


def _ref_modules():
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from tradesignal_mtm_runner.config import PnlCalcConfig as RefCfg
    from tradesignal_mtm_runner.runner_mtm import Trade_Mtm_Runner

    return RefCfg, Trade_Mtm_Runner


try:
    _ref_modules()
    HAVE_REF = True
except Exception:  # pragma: no cover - reference not installed
    HAVE_REF = False

pytestmark = pytest.mark.skipif(
    not HAVE_REF, reason="reference package not available"
)

CONFIGS = {
    "plain": dict(
        roi={0: float("inf")}, stoploss=float("-inf"),
        fee_rate=0.001, laid_back_tax=0.0002,
    ),
    "roi_tiers": dict(
        roi={0: 0.04, 30: 0.01}, stoploss=float("-inf"),
        fee_rate=0.001, laid_back_tax=0.0001,
    ),
    "stoploss": dict(
        roi={0: float("inf")}, stoploss=-0.02,
        fee_rate=0.001, laid_back_tax=0.0001,
    ),
    "shorts": dict(
        roi={0: 0.05}, stoploss=-0.03, enable_short_position=True,
        fee_rate=0.001, laid_back_tax=0.0001,
    ),
    "maxpos": dict(
        roi={0: float("inf")}, stoploss=float("-inf"),
        max_position_per_symbol=3, fee_rate=0.0, laid_back_tax=0.0001,
    ),
}


def _series(seed: int, n: int = 80):
    rng = np.random.default_rng(seed)
    idx = pd.date_range("2024-01-01", periods=n, freq="1min")
    close = 100 * np.exp(np.cumsum(rng.normal(0, 0.02, n)))
    buy = (rng.random(n) < 0.2).astype(int)
    sell = (rng.random(n) < 0.2).astype(int)
    return idx, close, buy, sell


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_full_engine_matches_reference(name, spark):
    from tradesignal_mtm_runner_spark.config import PnlCalcConfig
    from tradesignal_mtm_runner_spark.operators.bookkeeper import (
        run_mtm_bookkeeper,
        summarize_timeline,
    )

    RefCfg, TradeMtmRunnerRef = _ref_modules()
    kw = CONFIGS[name]

    seeds = [7, 21]
    frames = []
    expected = {}
    for seed in seeds:
        idx, close, buy, sell = _series(seed)
        rc = RefCfg.get_default()
        for k, v in kw.items():
            setattr(rc, k, v)
        ref = TradeMtmRunnerRef(pnl_config=rc).calculate(
            f"S{seed}",
            pd.DataFrame({"close": close, "buy": buy}, index=idx),
            pd.DataFrame({"sell": sell}, index=idx),
        )
        expected[f"S{seed}"] = ref
        frames.append(
            pd.DataFrame(
                {
                    "symbol": f"S{seed}",
                    "timestamp": idx,
                    "close": close,
                    "buy": buy,
                    "sell": sell,
                }
            )
        )

    sig = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    tl = run_mtm_bookkeeper(sig, PnlCalcConfig(**kw), output="timeline")
    summary = {
        r["symbol"]: r for r in summarize_timeline(tl).collect()
    }
    tl_pdf = tl.toPandas().sort_values(["symbol", "timestamp"])

    for sym, ref in expected.items():
        s = summary[sym]
        assert s["pnl"] == pytest.approx(ref.pnl, abs=1e-9), sym
        assert s["max_drawdown"] == pytest.approx(ref.max_drawdown, abs=1e-9), sym
        assert s["sharpe_ratio"] == pytest.approx(
            ref.sharpe_ratio, rel=1e-6, abs=1e-6
        ), sym
        # bar-for-bar: cumulative pnl_ratio must track the reference
        ours = tl_pdf[tl_pdf["symbol"] == sym]["pnl_ratio"].values
        theirs = np.asarray(ref.pnl_timeline["pnl_ratio"], dtype=float)
        assert len(ours) == len(theirs)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-9)


def test_trade_archives_match_reference(spark):
    """Beyond the timeline: the trade LISTS must match — same number
    of closed/outstanding trades per direction, same entry/exit
    prices and datetimes (sorted by entry time)."""
    from tradesignal_mtm_runner_spark.config import PnlCalcConfig
    from tradesignal_mtm_runner_spark.operators.bookkeeper import (
        run_mtm_bookkeeper,
    )

    RefCfg, TradeMtmRunnerRef = _ref_modules()
    kw = CONFIGS["shorts"]
    idx, close, buy, sell = _series(7)

    rc = RefCfg.get_default()
    for k, v in kw.items():
        setattr(rc, k, v)
    ref = TradeMtmRunnerRef(pnl_config=rc).calculate(
        "S7",
        pd.DataFrame({"close": close, "buy": buy}, index=idx),
        pd.DataFrame({"sell": sell}, index=idx),
    )

    sig = spark.createDataFrame(
        pd.DataFrame(
            {"symbol": "S7", "timestamp": idx, "close": close, "buy": buy, "sell": sell}
        )
    )
    ours = run_mtm_bookkeeper(sig, PnlCalcConfig(**kw), output="trades").toPandas()

    for direction, ref_closed, ref_open in [
        ("LONG", ref.long_trades_archive, ref.long_trades_outstanding),
        ("SHORT", ref.short_trades_archive, ref.short_trades_oustanding),
    ]:
        got_closed = ours[(ours["direction"] == direction) & ours["is_closed"]]
        got_open = ours[(ours["direction"] == direction) & ~ours["is_closed"]]
        assert len(got_closed) == len(ref_closed), direction
        assert len(got_open) == len(ref_open), direction

        for got, want in [(got_closed, ref_closed), (got_open, ref_open)]:
            g = got.sort_values("entry_datetime").reset_index(drop=True)
            w = sorted(want, key=lambda t: t.entry_datetime)
            for i, rt in enumerate(w):
                assert g.loc[i, "entry_price"] == pytest.approx(
                    rt.entry_price, abs=1e-12
                )
                assert g.loc[i, "entry_datetime"].to_pydatetime() == rt.entry_datetime
                # reference marks "no exit yet" with +/-inf sentinels,
                # we use null — only compare real exits
                if rt.exit_price is not None and np.isfinite(rt.exit_price):
                    assert g.loc[i, "exit_price"] == pytest.approx(
                        rt.exit_price, abs=1e-12
                    )


def test_worst_price_pick_matches_reference_sort():
    """The reference's WORST_PRICE close order is sorted(trades)[0]
    under ProxyTrade.__lt__ (highest entry first for longs, lowest
    for shorts; trade_reward.py:380 _get_trade_to_close). Our
    _pick_to_close must select the same trade for random entry-price
    sets in both directions."""
    from datetime import datetime

    import numpy as np

    from tradesignal_mtm_runner.models import (
        Inventory_Mode,
        LongShort_Enum,
        ProxyTrade as RefTrade,
    )
    from tradesignal_mtm_runner_spark.models import InventoryMode
    from tradesignal_mtm_runner_spark.operators.bookkeeper import (
        _LONG,
        _SHORT,
        _Trade,
        _pick_to_close,
    )

    rng = np.random.default_rng(3)
    for direction in ("LONG", "SHORT"):
        for trial in range(20):
            prices = rng.uniform(50.0, 150.0, size=5).round(4)
            ref_trades = [
                RefTrade(
                    symbol="X",
                    entry_price=float(p),
                    unit=1.0,
                    direction=LongShort_Enum[direction],
                    entry_datetime=datetime(2024, 1, 1, 0, i),
                    inventory_mode=Inventory_Mode.WORST_PRICE,
                    fee_rate=0.0,
                )
                for i, p in enumerate(prices)
            ]
            ref_pick = sorted(ref_trades)[0].entry_price
            ours = [
                _Trade(i, float(i * 60), float(p),
                       _LONG if direction == "LONG" else _SHORT)
                for i, p in enumerate(prices)
            ]
            idx = _pick_to_close(ours, InventoryMode.WORST_PRICE)
            assert ours[idx].entry_price == ref_pick, (direction, trial, prices)
