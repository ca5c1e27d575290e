"""Runner protocol — the reference's public typing surface
(reference interfaces.py:5 ``ITradeSignalRunner``): anything with a
``calculate(symbol, buy_signal_dataframe, sell_signal_dataframe) ->
MtmResult``. ``TradeMtmRunner`` and the HyperOpt adapter both satisfy
it, so user code typed against the reference protocol type-checks
unchanged against this package."""

from __future__ import annotations

from typing import TYPE_CHECKING, Protocol, runtime_checkable

import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    from .runner import MtmResult


@runtime_checkable
class ITradeSignalRunner(Protocol):
    """Pnl calculator protocol (structural: no inheritance needed)."""

    def calculate(
        self,
        symbol: str,
        buy_signal_dataframe: pd.DataFrame,
        sell_signal_dataframe: pd.DataFrame,
    ) -> "MtmResult":
        """Calculate PnL from aligned buy/sell signal frames."""
        ...
