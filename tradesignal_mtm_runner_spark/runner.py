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

import json
import time
from dataclasses import asdict, dataclass, field
from datetime import datetime
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PnlCalcConfig
from .exceptions import (
    InvalidTradeStateError,
    TradeNotYetClosedForPnlError,
    reraise_typed,
)
from .models import InventoryMode
from .operators.bookkeeper import run_mtm_bookkeeper, summarize_timeline


@dataclass
class ProxyTrade:
    """A trade record (reference ProxyTrade, models.py:42-151): same
    fields, pnl/mtm formulas and raise behavior, minus pydantic."""

    symbol: str
    direction: str
    entry_datetime: Any
    entry_price: float
    exit_datetime: Any = None
    exit_price: float | None = None
    is_closed: bool = False
    close_reason: str | None = None
    pnl_normalized: float | None = None
    unit: float = 100.0
    fee_rate: float = 0.0
    inventory_mode: InventoryMode = InventoryMode.FIFO

    @property
    def check_closed(self) -> bool:
        return self.is_closed

    def calculate_pnl(self, price: float, fee_included: bool = False) -> float:
        """±(price − entry); fee on entry price per leg (reference
        models.py:60-83)."""
        pnl_value = (
            price - self.entry_price
            if self.direction == "LONG"
            else self.entry_price - price
        )
        if fee_included:
            pnl_value -= self.fee_rate * self.entry_price
            if self.is_closed:
                pnl_value -= self.fee_rate * self.entry_price
        return pnl_value

    def calculate_pnl_normalized(
        self, price: float, fee_included: bool = False
    ) -> float:
        return self.calculate_pnl(price=price, fee_included=fee_included) / self.entry_price

    def calculate_mtm_normalized(self, price_diff: float) -> float:
        if price_diff != price_diff:  # NaN bar-to-bar diff contributes 0
            return 0.0
        mtm = price_diff if self.direction == "LONG" else -price_diff
        return mtm / self.entry_price

    @property
    def fee_normalized(self) -> float:
        return self.fee_rate

    @property
    def pnl(self) -> float:
        """pnl of a CLOSED trade; raises like the reference
        (models.py:130) when the trade is still open."""
        if not self.is_closed:
            raise TradeNotYetClosedForPnlError(
                "Trade is not yet closed... Invalid PNL"
            )
        return self.calculate_pnl(price=self.exit_price, fee_included=True)

    def close_position(
        self, exit_price: float, exit_datetime: Any, close_reason: str
    ) -> None:
        """Close the trade; raises like the reference (models.py:151)
        when already closed."""
        if self.is_closed:
            raise InvalidTradeStateError(f"Trade is already closed: {self.is_closed}")
        self.exit_price = exit_price
        self.exit_datetime = exit_datetime
        self.is_closed = True
        self.close_reason = close_reason
        self.pnl_normalized = self.calculate_pnl_normalized(
            price=exit_price, fee_included=True
        )


def _json_default(obj: Any) -> Any:
    if isinstance(obj, datetime):
        return obj.isoformat()
    if hasattr(obj, "isoformat"):  # numpy/pandas timestamps
        return obj.isoformat()
    return str(obj)


@dataclass
class MtmResult:
    """Result container (reference Mtm_Result, models.py:203-260):
    full metadata surface — strategy/batch identifiers, run epochs,
    params — plus the to_Dict/to_query_dict/to_json_str serializers
    whose output shape matches the reference's JSONL results
    (reference samples/sample_pnlresult.jsonl)."""

    symbol: str
    strategy_id: str | None = None
    batch_id: str | None = None
    data_key: str | None = None
    strategy_name: str | None = None
    pnl: float = float("nan")
    max_drawdown: float = float("nan")
    sharpe_ratio: float = float("nan")
    mkt_start_epoch: int = 0
    mkt_end_epoch: int = 0
    run_start_epoch: int = 0
    run_end_epoch: int = 0
    params: dict = field(default_factory=dict)
    pnl_timeline: dict = field(default_factory=dict)
    long_trades_archive: list[ProxyTrade] = field(default_factory=list)
    short_trades_archive: list[ProxyTrade] = field(default_factory=list)
    long_trades_outstanding: list[ProxyTrade] = field(default_factory=list)
    short_trades_outstanding: list[ProxyTrade] = field(default_factory=list)
    calc_log_folder: str | None = None

    @property
    def short_trades_oustanding(self) -> list[ProxyTrade]:
        """Alias for the reference's misspelled field name
        (models.py:218 ``short_trades_oustanding``) so attribute
        access from reference user code keeps working."""
        return self.short_trades_outstanding

    def to_Dict(self) -> dict:
        pdict = asdict(self)
        pdict["long_trades_archive_size"] = len(self.long_trades_archive)
        pdict["short_trades_archive_size"] = len(self.short_trades_archive)
        pdict["long_trades_outstanding_size"] = len(self.long_trades_outstanding)
        pdict["short_trades_outstanding_size"] = len(self.short_trades_outstanding)
        return pdict

    # pep8 alias kept from round 1
    def to_dict(self) -> dict:
        return self.to_Dict()

    def to_query_dict(self) -> dict:
        """Flat queryable projection, same keys as the reference
        (models.py:235-256)."""
        fields_queryable = [
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
        ]
        _d = self.to_Dict()
        return {k: _d[k] for k in fields_queryable}

    def to_json_str(self) -> str:
        return json.dumps(self.to_Dict(), default=_json_default)

    def __repr__(self) -> str:
        return (
            "Id:{}, pnl: {:.4f}, sharpe_ratio: {:.4f}, max_drawdown:{:.4f}, "
            "Parameters{}".format(
                self.strategy_id,
                self.pnl,
                self.sharpe_ratio,
                self.max_drawdown,
                self.params,
            )
        )


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
        # NaN pnl (no summary row — e.g. an empty signal frame) must
        # ALSO be penalized: abs(nan) < eps is False, so the raw guard
        # let NaN through to the optimizer (review r12)
        if result.pnl != result.pnl or abs(result.pnl) < 1e-12:
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
        strict: bool = False,
        strategy_id: str | None = None,
        batch_id: str | None = None,
        data_key: str | None = None,
        strategy_name: str | None = None,
        params: dict | None = None,
        calc_log_folder: str | None = None,
    ) -> None:
        self.pnl_config = pnl_config or PnlCalcConfig.get_default()
        self.inventory_mode = inventory_mode
        self.strict = strict
        self.strategy_id = strategy_id
        self.batch_id = batch_id
        self.data_key = data_key
        self.strategy_name = strategy_name
        self.params = params or {}
        self.calc_log_folder = calc_log_folder
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
        run_start = int(time.time())
        merged = buy_signal_dataframe[["close", "buy"]].copy()
        merged["sell"] = sell_signal_dataframe["sell"]
        # pandas index alignment writes NaN where the frames disagree
        # on bars; the reference's `row.sell == 1` treats NaN as HOLD,
        # but NaN would upcast the column to double and crash the
        # bookkeeper's int64 cast executor-side (review r12) — make
        # the no-signal semantics explicit here
        for c in ("buy", "sell"):
            merged[c] = (
                pd.to_numeric(merged[c], errors="coerce")
                .fillna(0)
                .astype("int64")
            )
        merged["timestamp"] = pd.to_datetime(merged.index)
        merged["symbol"] = symbol
        signals = self.spark.createDataFrame(
            merged[["symbol", "timestamp", "close", "buy", "sell"]]
        )
        out = self.calculate_distributed(signals)
        # one persisted timeline serves BOTH the summary collect and
        # the pnl_timeline toPandas (review r12: unpersisted, the
        # per-symbol simulation ran once per consumer)
        out = {**out, "timeline": out["timeline"].persist()}
        try:
            result = self._assemble(symbol, out)
        except Exception as err:  # surface typed strict-mode exceptions
            reraise_typed(err)
        finally:
            out["timeline"].unpersist()
        result.run_start_epoch = run_start
        result.run_end_epoch = int(time.time())
        return result

    # -- distributed many-symbol path --------------------------------------

    def calculate_distributed(self, signals: DataFrame) -> dict[str, DataFrame]:
        """Run the engine over a (symbol, timestamp, close, buy, sell)
        frame of ANY number of symbols. Returns lazy DataFrames —
        nothing collects until the caller decides."""
        timeline = run_mtm_bookkeeper(
            signals, self.pnl_config, self.inventory_mode, output="timeline",
            strict=self.strict,
        )
        trades = run_mtm_bookkeeper(
            signals, self.pnl_config, self.inventory_mode, output="trades",
            strict=self.strict,
        )
        summary = summarize_timeline(timeline)
        return {"timeline": timeline, "trades": trades, "summary": summary}

    # -- result assembly ----------------------------------------------------

    def _assemble(self, symbol: str, out: dict[str, DataFrame]) -> MtmResult:
        srow = out["summary"].filter(F.col("symbol") == symbol).collect()
        result = MtmResult(
            symbol=symbol,
            strategy_id=self.strategy_id,
            batch_id=self.batch_id,
            data_key=self.data_key,
            strategy_name=self.strategy_name,
            params=dict(self.params),
            calc_log_folder=self.calc_log_folder,
        )
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
        # reference pnl_timeline dict layout (runner_mtm.py:137-185);
        # normalize to ns first — under Arrow-backed pandas the column
        # can be datetime64[us] and a raw int64 view would be off 1000x
        result.pnl_timeline = {
            "timestamp": (
                tl["timestamp"].astype("datetime64[ns]").astype("int64") // 1_000_000
            ).tolist(),
            "close_price": tl["close"].tolist(),
            "buy_signal": tl["buy"].tolist(),
            "sell_signal": tl["sell"].tolist(),
            "mtm_ratio": tl["mtm_ratio"].tolist(),
            "pnl_ratio": tl["pnl_ratio"].tolist(),
        }

        for r in out["trades"].filter(F.col("symbol") == symbol).collect():
            t = ProxyTrade(
                **r.asDict(),
                unit=self.pnl_config.fixed_stake_unit_amount,
                fee_rate=abs(self.pnl_config.fee_rate),
                inventory_mode=self.inventory_mode,
            )
            bucket = {
                ("LONG", True): result.long_trades_archive,
                ("LONG", False): result.long_trades_outstanding,
                ("SHORT", True): result.short_trades_archive,
                ("SHORT", False): result.short_trades_outstanding,
            }[(t.direction, t.is_closed)]
            bucket.append(t)
        return result
