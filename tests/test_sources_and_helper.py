"""CSV/JSONL signal connectors round-trip, and RoiHelper parity with
the reference ROI semantics (reference helper.py / test_helper)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from tradesignal_mtm_runner_spark.helper import RoiHelper
from tradesignal_mtm_runner_spark.sources import (
    load_signals_csv,
    load_signals_jsonl,
)


def _signal_pdf() -> pd.DataFrame:
    idx = pd.date_range("2024-01-01", periods=24, freq="h")
    return pd.DataFrame(
        {
            "symbol": "ETHUSD",
            "timestamp": idx,
            "close": [1000.0 + i for i in range(24)],
            "buy": [1 if i == 2 else 0 for i in range(24)],
            "sell": [1 if i == 20 else 0 for i in range(24)],
        }
    )


def test_csv_round_trip(spark, tmp_path):
    pdf = _signal_pdf()
    p = str(tmp_path / "signals.csv")
    pdf.to_csv(p, index=False)
    got = load_signals_csv(spark, p).toPandas().sort_values("timestamp")
    assert len(got) == 24
    assert got["close"].tolist() == pdf["close"].tolist()
    assert got["buy"].sum() == 1 and got["sell"].sum() == 1


def test_jsonl_round_trip(spark, tmp_path):
    pdf = _signal_pdf()
    p = str(tmp_path / "signals.jsonl")
    pdf.assign(timestamp=pdf["timestamp"].dt.strftime("%Y-%m-%dT%H:%M:%S")).to_json(
        p, orient="records", lines=True
    )
    got = load_signals_jsonl(spark, p).toPandas().sort_values("timestamp")
    assert len(got) == 24
    assert got["close"].tolist() == pdf["close"].tolist()


def test_roi_helper_active_tiers():
    # {0: 10%, 30min: 5%, 60min: 1%} — thresholds loosen with age
    h = RoiHelper({0: 0.10, 30: 0.05, 60: 0.01})
    t0 = datetime(2024, 1, 1)

    def at(minutes):
        return t0 + timedelta(minutes=minutes)

    assert h.get_all_take_profit_pnl(t0, at(0)) == [0.10]
    assert h.get_all_take_profit_pnl(t0, at(45)) == [0.10, 0.05]
    assert h.get_all_take_profit_pnl(t0, at(90)) == [0.10, 0.05, 0.01]
    # pnl must beat the MIN active threshold (exceeds ANY)
    assert not h.can_take_profit(t0, at(0), 0.08)
    assert h.can_take_profit(t0, at(0), 0.11)
    assert h.can_take_profit(t0, at(45), 0.08)
    assert not h.can_take_profit(t0, at(45), 0.04)
    assert h.can_take_profit(t0, at(90), 0.02)
    assert not h.can_take_profit(t0, at(90), 0.005)


def test_roi_helper_matches_bookkeeper_roi_close():
    """A trade the helper says to close is closed by the engine on the
    same bar (restricted: single long, roi only)."""
    import numpy as np

    from tradesignal_mtm_runner_spark.config import PnlCalcConfig
    from tradesignal_mtm_runner_spark.operators.bookkeeper import simulate_symbol

    roi = {0: 0.10, 1: 0.02}
    h = RoiHelper(roi)
    ts = np.arange(10, dtype=np.float64) * 60.0
    close = np.array([100, 101, 103, 104, 105, 106, 107, 108, 109, 110], dtype=float)
    buy = np.zeros(10, dtype=np.int64)
    sell = np.zeros(10, dtype=np.int64)
    buy[0] = 1
    cfg = PnlCalcConfig(roi=roi, stoploss=float("-inf"), laid_back_tax=0.0)
    _, trades = simulate_symbol(ts, close, buy, sell, cfg)
    (t,) = trades
    assert t.close_reason == "ROI"
    t0 = datetime(2024, 1, 1)
    # helper agrees bar-for-bar: first bar it fires == engine's exit
    for i in range(1, 10):
        pnl = (close[i] - close[0]) / close[0]
        if h.can_take_profit(t0, t0 + timedelta(seconds=ts[i]), pnl):
            assert t.exit_ts == ts[i]
            break
    else:
        raise AssertionError("helper never fired but engine closed on ROI")


def test_load_signals_csv_custom_ts_format(spark, tmp_path):
    """Review r12: ts_format must reach the CSV READER (the old
    post-hoc to_timestamp ran after the typed schema had already
    nulled every non-default-format cell — the column silently
    vanished)."""
    p = tmp_path / "sig.csv"
    p.write_text(
        "symbol,timestamp,close,buy,sell\n"
        "AAA,15/08/2026 10:30,12.5,1,0\n"
        "BBB,16/08/2026 11:00,13.0,0,1\n"
    )
    from tradesignal_mtm_runner_spark.sources import load_signals_csv

    df = load_signals_csv(spark, str(p), ts_format="dd/MM/yyyy HH:mm")
    rows = {r["symbol"]: r["timestamp"] for r in df.collect()}
    assert rows["AAA"] is not None and rows["AAA"].month == 8
    assert rows["AAA"].day == 15 and rows["BBB"].day == 16
