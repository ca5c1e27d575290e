"""Pure-Column time-series helpers (JVM-side, whole-stage codegen).

These are the declarative building blocks of the MTM engine — no
Python executes per row. Every function takes/returns Columns so
Catalyst sees the full expression tree (pushdown, pruning, codegen).

Reference semantics: src/tradesignal_mtm_runner/runner_mtm.py:114
(price diff), trade_reward.py:423-450 (sharpe), runner_mtm.py:168-173
(max drawdown).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def symbol_window(symbol_col: str = "symbol", order_cols: list[str] | None = None) -> WindowSpec:
    """Per-symbol ordered window — the partitioning axis that scales:
    at 100 TB the data has ~1e5-1e6 symbol(+strategy) groups, each
    bounded in size, so window state never exceeds one partition."""
    order_cols = order_cols or ["timestamp"]
    return Window.partitionBy(symbol_col).orderBy(*[F.col(c) for c in order_cols])


def cum_window(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def price_diff(close: Column, w: WindowSpec) -> Column:
    """price_movement = close(t) - close(t-1)  (reference runner_mtm.py:114)."""
    return close - F.lag(close, 1).over(w)


def cumulative_pnl(mtm: Column, w: WindowSpec) -> Column:
    """pnl_ratio(t) = cumsum of per-bar mtm (reference runner_mtm.py:168)."""
    return F.sum(mtm).over(cum_window(w))


def running_max_drawdown(cum_pnl: Column, w: WindowSpec) -> Column:
    """drawdown(t) = max(0, running_max(cum_pnl)) - cum_pnl.

    The reference seeds max_pnl at 0 (runner_mtm.py:144), hence the
    greatest(0, ...).
    """
    running_max = F.max(cum_pnl).over(cum_window(w))
    return F.greatest(F.lit(0.0), running_max) - cum_pnl
