"""Property-style engine parity: on randomized price paths and
adversarial signal patterns the declarative window-algebra engine and
the bookkeeper state machine must still agree bar-for-bar on the
restricted config. All 20 generated symbols ride ONE Spark job, so
the stress stays cheap."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tradesignal_mtm_runner_spark.config import PnlCalcConfig
from tradesignal_mtm_runner_spark.operators.bookkeeper import run_mtm_bookkeeper
from tradesignal_mtm_runner_spark.operators.mtm import signal_mtm_timeline

SEED = 20260813


def _random_frame() -> pd.DataFrame:
    rng = np.random.default_rng(SEED)
    frames = []
    ts0 = pd.Timestamp("2024-06-01")
    for s in range(20):
        n = int(rng.integers(3, 120))
        style = s % 5
        if style == 0:  # random walk
            close = 100 * np.exp(np.cumsum(rng.normal(0, 0.02, n)))
        elif style == 1:  # flat
            close = np.full(n, 50.0)
        elif style == 2:  # monotone up
            close = np.linspace(10, 20, n)
        elif style == 3:  # crash then recover
            close = np.concatenate([np.linspace(100, 40, n // 2 + 1), np.linspace(40, 90, n - n // 2 - 1)])[:n]
        else:  # jumpy with repeated prices
            close = rng.choice([10.0, 10.0, 11.0, 9.0, 30.0], size=n)
        buy = rng.random(n) < 0.25
        sell = rng.random(n) < 0.25
        # adversarial edges: signal on first/last bar, buy+sell same bar
        buy[0] = True
        sell[-1] = True
        if n > 4:
            buy[2] = sell[2] = True
        frames.append(
            pd.DataFrame(
                {
                    "symbol": f"S{s:02d}",
                    "timestamp": ts0 + pd.to_timedelta(np.arange(n), unit="min"),
                    "close": close.astype(float),
                    "buy": buy.astype(int),
                    "sell": sell.astype(int),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def test_random_paths_declarative_equals_bookkeeper(spark):
    cfg = PnlCalcConfig(
        roi={0: float("inf")},
        stoploss=float("-inf"),
        fee_rate=0.002,
        laid_back_tax=0.0003,
    )
    sig = spark.createDataFrame(_random_frame())
    key = ["symbol", "timestamp"]
    decl = (
        signal_mtm_timeline(sig, cfg, order_cols=["timestamp"])
        .select(*key, "mtm_ratio", "pnl_ratio")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    book = (
        run_mtm_bookkeeper(sig, cfg, output="timeline")
        .select(*key, "mtm_ratio", "pnl_ratio")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(decl) == len(book) > 0
    np.testing.assert_allclose(
        decl["mtm_ratio"].values, book["mtm_ratio"].values, rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        decl["pnl_ratio"].values, book["pnl_ratio"].values, rtol=0, atol=1e-9
    )
