"""PySpark-native trade-signal MTM engine + large-scale data-pipeline ops.

Spark-first re-expression of the capabilities of
dexterchan/tradesignal_mtm_runner (see SURVEY.md).
"""

__version__ = "0.1.0"

from .config import PnlCalcConfig  # noqa: F401
from .exceptions import (  # noqa: F401
    InvalidTradeStateError,
    MaxPositionPerSymbolExceededException,
    NoShortPositionAllowedException,
    TradeNotYetClosedForPnlError,
    UnSupportedException,
)
from .helper import RoiHelper  # noqa: F401
from .interfaces import ITradeSignalRunner  # noqa: F401
from .runner import MtmResult, ProxyTrade, TradeMtmRunner  # noqa: F401
