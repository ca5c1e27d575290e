"""The strategy-grid sweep must equal running each config separately —
same engine, one pass, per-(symbol, config) groups."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tradesignal_mtm_runner_spark.config import PnlCalcConfig
from tradesignal_mtm_runner_spark.operators.bookkeeper import (
    run_mtm_bookkeeper,
    run_mtm_param_sweep,
    summarize_timeline,
)

CONFIGS = {
    "base": PnlCalcConfig(roi={0: math.inf}, stoploss=float("-inf")),
    "roi": PnlCalcConfig(roi={0: 0.05, 60: 0.02}, stoploss=float("-inf"), fee_rate=0.001),
    "shorts": PnlCalcConfig(
        roi={0: math.inf}, stoploss=-0.03, enable_short_position=True, fee_rate=0.001
    ),
}


@pytest.fixture(scope="module")
def signals(spark):
    rng = np.random.default_rng(7)
    frames = []
    for sym in ["AAA", "BBB", "CCC"]:
        n = 240
        idx = pd.date_range("2024-01-01", periods=n, freq="h")
        close = 1000 * np.cumprod(1 + rng.normal(0, 0.01, n))
        buy = (rng.random(n) < 0.08).astype(int)
        sell = (rng.random(n) < 0.08).astype(int)
        frames.append(
            pd.DataFrame(
                {"symbol": sym, "timestamp": idx, "close": close, "buy": buy, "sell": sell}
            )
        )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def test_sweep_matches_individual_runs(signals):
    sweep = summarize_timeline(
        run_mtm_param_sweep(signals, CONFIGS), group_cols=["symbol", "config_id"]
    ).toPandas().set_index(["symbol", "config_id"]).sort_index()

    assert len(sweep) == 3 * len(CONFIGS)
    for cid, cfg in CONFIGS.items():
        single = (
            summarize_timeline(run_mtm_bookkeeper(signals, cfg, output="timeline"))
            .toPandas()
            .set_index("symbol")
            .sort_index()
        )
        for sym in single.index:
            for col in ["pnl", "max_drawdown", "sharpe_ratio"]:
                assert sweep.loc[(sym, cid), col] == pytest.approx(
                    single.loc[sym, col], rel=1e-12, abs=1e-12
                ), (sym, cid, col)


def test_sweep_timeline_tagged(signals):
    tl = run_mtm_param_sweep(signals, CONFIGS).toPandas()
    assert set(tl["config_id"]) == set(CONFIGS)
    per_cell = tl.groupby(["symbol", "config_id"]).size()
    assert (per_cell == 240).all()


def test_blocked_sweep_matches_per_config_sweep(signals):
    """The config-block variant (bars replicated once per BLOCK, each
    cell looping k state machines over one copy) must be value-
    identical to the per-config explode — block boundaries mid-grid
    included (3 configs, block=2 -> blocks of 2 and 1)."""
    from tradesignal_mtm_runner_spark.operators.bookkeeper import (
        run_mtm_param_sweep_blocked,
    )

    per_cfg = (
        summarize_timeline(
            run_mtm_param_sweep(signals, CONFIGS),
            group_cols=["symbol", "config_id"],
        )
        .toPandas()
        .set_index(["symbol", "config_id"])
        .sort_index()
    )
    blocked = (
        summarize_timeline(
            run_mtm_param_sweep_blocked(signals, CONFIGS, block_size=2),
            group_cols=["symbol", "config_id"],
        )
        .toPandas()
        .set_index(["symbol", "config_id"])
        .sort_index()
    )
    assert list(per_cfg.index) == list(blocked.index)
    for col in ("pnl", "max_drawdown", "sharpe_ratio"):
        assert np.allclose(per_cfg[col], blocked[col], atol=1e-9), col
