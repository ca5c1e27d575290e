"""Public exception surface, name-for-name with the reference
(reference: src/tradesignal_mtm_runner/exceptions.py:1-21) so user
code that catches these types keeps working against this engine.

Reference raise sites replicated here:
  - ``TradeNotYetClosedForPnlError`` — pnl of a not-yet-closed trade
    (reference models.py:130, mirrored by ``ProxyTrade.pnl``).
  - ``InvalidTradeStateError`` — closing an already-closed trade
    (reference models.py:151, mirrored by ``ProxyTrade.close_position``).

The remaining three are part of the reference's public API but are
never raised by its own engine loop (the loop silently skips a buy at
max position, trade_reward.py:277-279, and a short open when shorts
are disabled). This engine keeps the silent-skip semantics by default
for drop-in parity and raises them only in the opt-in strict mode of
``TradeMtmRunner`` (``strict=True``):
  - ``MaxPositionPerSymbolExceededException`` — an open signal arrives
    while the symbol is already at ``max_position_per_symbol``.
  - ``NoShortPositionAllowedException`` — a sell signal would open a
    short while ``enable_short_position`` is False.
  - ``UnSupportedException`` — an unsupported API mode/argument.
"""

from __future__ import annotations


class UnSupportedException(Exception):
    pass


class NoShortPositionAllowedException(Exception):
    pass


class TradeNotYetClosedForPnlError(Exception):
    pass


class InvalidTradeStateError(Exception):
    pass


class MaxPositionPerSymbolExceededException(Exception):
    pass


#: exception types that can surface from inside an executor task (the
#: strict bookkeeper raises them in the applyInPandas loop); Spark
#: wraps executor failures, so the facade re-raises the typed original
#: by matching the class name in the wrapped message.
_EXECUTOR_RAISED = (
    MaxPositionPerSymbolExceededException,
    NoShortPositionAllowedException,
)


def reraise_typed(err: BaseException) -> None:
    """Re-raise a typed engine exception hidden inside a Spark
    executor-failure wrapper, else re-raise ``err`` unchanged."""
    msg = str(err)
    for exc_type in _EXECUTOR_RAISED:
        token = exc_type.__name__ + ": "
        if token in msg:
            detail = msg.split(token, 1)[1].splitlines()[0]
            raise exc_type(detail) from err
    raise err
