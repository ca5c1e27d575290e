"""Drop-in runner facade: the reference's public API on the Spark engine.

A user of the reference calls ``Trade_Mtm_Runner(pnl_config).calculate(
symbol, buy_signal_dataframe, sell_signal_dataframe)`` with pandas
frames (timestamp index; ``close``+``buy`` on the buy frame, ``sell``
on the sell frame) and receives an ``Mtm_Result`` (reference:
src/tradesignal_mtm_runner/runner_mtm.py:71-204, models.py:203).
``TradeMtmRunner`` keeps that contract — same inputs, same result
fields — while executing on Spark, and adds the distributed entry
point ``calculate_distributed`` for many symbols at once (the 100 TB
axis: symbols x strategies run as independent groups of one
applyInPandas pass; the single-symbol pandas path is just a
one-group special case of it).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PnlCalcConfig
from .models import InventoryMode
from .operators.bookkeeper import run_mtm_bookkeeper, summarize_timeline


@dataclass
class ProxyTrade:
    """A trade record (reference ProxyTrade, models.py:42)."""

    symbol: str
    direction: str
    entry_datetime: Any
    entry_price: float
    exit_datetime: Any = None
    exit_price: float | None = None
    is_closed: bool = False
    close_reason: str | None = None
    pnl_normalized: float | None = None


@dataclass
class MtmResult:
    """Result container (reference Mtm_Result, models.py:203)."""

    symbol: str
    pnl: float = float("nan")
    max_drawdown: float = float("nan")
    sharpe_ratio: float = float("nan")
    mkt_start_epoch: int = 0
    mkt_end_epoch: int = 0
    pnl_timeline: dict = field(default_factory=dict)
    long_trades_archive: list[ProxyTrade] = field(default_factory=list)
    short_trades_archive: list[ProxyTrade] = field(default_factory=list)
    long_trades_outstanding: list[ProxyTrade] = field(default_factory=list)
    short_trades_outstanding: list[ProxyTrade] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "symbol": self.symbol,
            "pnl": self.pnl,
            "max_drawdown": self.max_drawdown,
            "sharpe_ratio": self.sharpe_ratio,
            "mkt_start_epoch": self.mkt_start_epoch,
            "mkt_end_epoch": self.mkt_end_epoch,
            "long_trades_archive_size": len(self.long_trades_archive),
            "short_trades_archive_size": len(self.short_trades_archive),
            "long_trades_outstanding_size": len(self.long_trades_outstanding),
            "short_trades_outstanding_size": len(self.short_trades_outstanding),
        }


class HyperOptPnlCalculatorAdapter:
    """Hyperopt guard (reference HyperOptPnlCalculator_Adapter,
    runner_mtm.py:207): wraps any runner and, when a strategy did
    essentially nothing (|pnl| < 1e-12), replaces pnl with the engine
    minimum and max_drawdown with the maximum so an optimizer never
    prefers a do-nothing parameter set."""

    def __init__(self, calculator) -> None:
        self._calculator = calculator

    def calculate(
        self,
        symbol: str,
        buy_signal_dataframe: pd.DataFrame,
        sell_signal_dataframe: pd.DataFrame,
    ) -> "MtmResult":
        from .models import MAX_NUMERIC_VALUE, MIN_NUMERIC_VALUE

        result = self._calculator.calculate(
            symbol=symbol,
            buy_signal_dataframe=buy_signal_dataframe,
            sell_signal_dataframe=sell_signal_dataframe,
        )
        if abs(result.pnl) < 1e-12:
            result.pnl = MIN_NUMERIC_VALUE
            result.max_drawdown = MAX_NUMERIC_VALUE
        return result


class TradeMtmRunner:
    """Signal-to-MTM runner with the reference's calling convention."""

    def __init__(
        self,
        pnl_config: PnlCalcConfig | None = None,
        spark: SparkSession | None = None,
        inventory_mode: InventoryMode = InventoryMode.FIFO,
    ) -> None:
        self.pnl_config = pnl_config or PnlCalcConfig.get_default()
        self.inventory_mode = inventory_mode
        self._spark = spark

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            from .session import get_spark

            self._spark = get_spark()
        return self._spark

    # -- reference-compatible single-symbol path ---------------------------

    def calculate(
        self,
        symbol: str,
        buy_signal_dataframe: pd.DataFrame,
        sell_signal_dataframe: pd.DataFrame,
    ) -> MtmResult:
        """Merge buy+sell signal frames and run the full bookkeeper
        (reference runner_mtm.py:71: calculate -> _prepare_df_for_analysis
        -> _iterate_each_timeframe)."""
        merged = buy_signal_dataframe[["close", "buy"]].copy()
        merged["sell"] = sell_signal_dataframe["sell"]
        merged["timestamp"] = pd.to_datetime(merged.index)
        merged["symbol"] = symbol
        signals = self.spark.createDataFrame(
            merged[["symbol", "timestamp", "close", "buy", "sell"]]
        )
        out = self.calculate_distributed(signals)
        return self._assemble(symbol, out)

    # -- distributed many-symbol path --------------------------------------

    def calculate_distributed(self, signals: DataFrame) -> dict[str, DataFrame]:
        """Run the engine over a (symbol, timestamp, close, buy, sell)
        frame of ANY number of symbols. Returns lazy DataFrames —
        nothing collects until the caller decides."""
        timeline = run_mtm_bookkeeper(
            signals, self.pnl_config, self.inventory_mode, output="timeline"
        )
        trades = run_mtm_bookkeeper(
            signals, self.pnl_config, self.inventory_mode, output="trades"
        )
        summary = summarize_timeline(timeline)
        return {"timeline": timeline, "trades": trades, "summary": summary}

    # -- result assembly ----------------------------------------------------

    def _assemble(self, symbol: str, out: dict[str, DataFrame]) -> MtmResult:
        srow = out["summary"].filter(F.col("symbol") == symbol).collect()
        result = MtmResult(symbol=symbol)
        if not srow:
            return result
        s = srow[0].asDict()
        result.pnl = s["pnl"]
        result.max_drawdown = s["max_drawdown"]
        result.sharpe_ratio = s["sharpe_ratio"]
        result.mkt_start_epoch = int(s["mkt_start_epoch"])
        result.mkt_end_epoch = int(s["mkt_end_epoch"])

        tl = (
            out["timeline"]
            .filter(F.col("symbol") == symbol)
            .orderBy("timestamp")
            .toPandas()
        )
        # reference pnl_timeline dict layout (runner_mtm.py:137-185)
        result.pnl_timeline = {
            "timestamp": (tl["timestamp"].astype("int64") // 1_000_000).tolist(),
            "close_price": tl["close"].tolist(),
            "buy_signal": tl["buy"].tolist(),
            "sell_signal": tl["sell"].tolist(),
            "mtm_ratio": tl["mtm_ratio"].tolist(),
            "pnl_ratio": tl["pnl_ratio"].tolist(),
        }

        for r in out["trades"].filter(F.col("symbol") == symbol).collect():
            t = ProxyTrade(**r.asDict())
            bucket = {
                ("LONG", True): result.long_trades_archive,
                ("LONG", False): result.long_trades_outstanding,
                ("SHORT", True): result.short_trades_archive,
                ("SHORT", False): result.short_trades_outstanding,
            }[(t.direction, t.is_closed)]
            bucket.append(t)
        return result
