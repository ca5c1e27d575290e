"""Declarative signal-MTM engine — the flagship operator.

Re-expresses the reference's per-bar bookkeeping loop
(reference: src/tradesignal_mtm_runner/trade_reward.py:81-168 and
runner_mtm.py:118-204) as pure window/aggregate algebra for the
common configuration:

    long-only, max_position_per_symbol=1, no ROI take-profit,
    no stoploss, with fee_rate and laid_back_tax.

Under that configuration the position process is feedback-free and
collapses to carry-forward state + islands:

    sig(t)        = B if buy else S if sell else null   (buy wins, trade_reward.py:144)
    pos(t)        = [last non-null sig <= t] == B        (state AFTER bar t)
    opened(t)     = pos(t) & !pos(t-1)
    closed(t)     = !pos(t) & pos(t-1)
    entry(t)      = close at the opened-bar of the current island
    mtm(t)        = pos(t-1) * (close(t)-close(t-1)) / entry(t-1)   [step 1 runs
                    before closes, so the closing bar still accrues]
                    - fee_rate * (opened(t)+closed(t))               [steps 2-4]
                    - laid_back_tax * !pos(t)                        [step 5]
    pnl_ratio(t)  = cumsum(mtm)

Everything stays JVM-side (whole-stage codegen); partitioning is per
symbol so the plan scales with the number of symbols, the real axis
at 100 TB. Configurations with ROI/stoploss/shorts/max_position>1
introduce price-feedback and are handled by
``operators.bookkeeper.run_mtm_bookkeeper`` (applyInPandas).

pytest cross-checks this module against the full bookkeeper engine on
random data (tests/test_mtm_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PnlCalcConfig
from ..functions.timeseries import (
    cum_window,
    cumulative_pnl,
    running_max_drawdown,
    symbol_window,
)
from ..models import MIN_NUMERIC_VALUE, PROFIT_SLIPPAGE


def _require_declarative_config(config: PnlCalcConfig) -> None:
    if config.has_roi or config.has_stoploss:
        raise ValueError(
            "signal_mtm_timeline handles the feedback-free config only "
            "(no ROI / no stoploss); use operators.bookkeeper for the full engine"
        )
    if config.enable_short_position or config.max_position_per_symbol != 1:
        raise ValueError(
            "signal_mtm_timeline is long-only with max_position=1; "
            "use operators.bookkeeper for the full engine"
        )


def signal_mtm_timeline(
    signals: DataFrame,
    config: PnlCalcConfig | None = None,
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    close_col: str = "close",
    buy_col: str = "buy",
    sell_col: str = "sell",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-bar MTM timeline. Input: one row per (symbol, bar).

    Returns the input plus ``position, opened, closed, entry_price,
    mtm_ratio, pnl_ratio`` columns.
    """
    config = config or PnlCalcConfig.get_default()
    _require_declarative_config(config)

    order_cols = order_cols or [ts_col]
    w = symbol_window(symbol_col, order_cols)
    wc = cum_window(w)

    # domain rule: a position cannot OPEN at a non-positive price (the
    # normalized mtm divides by the entry price). Degenerate buy bars
    # are treated as HOLD; sells (closes) remain valid at any price.
    # The price gate is NESTED under the buy branch so a buy=1 bar
    # never falls through to the sell branch — the bookkeeper's
    # if/elif consumes the buy the same way (bookkeeper.py step 4),
    # keeping all three engines aligned on buy=sell=1 at close<=0.
    sig = F.when(
        F.col(buy_col) == 1,
        F.when(F.col(close_col) > 0, F.lit("B")),
    ).when(F.col(sell_col) == 1, F.lit("S"))
    df = signals.withColumn("_sig", sig)
    df = df.withColumn(
        "position",
        (F.last("_sig", ignorenulls=True).over(wc) == F.lit("B"))
        .cast("int")
        .alias("position"),
    )
    df = df.withColumn("position", F.coalesce("position", F.lit(0)))
    prev_pos = F.coalesce(F.lag("position", 1).over(w), F.lit(0))
    df = (
        df.withColumn("opened", ((F.col("position") == 1) & (prev_pos == 0)).cast("int"))
        .withColumn("closed", ((F.col("position") == 0) & (prev_pos == 1)).cast("int"))
    )
    # carry-forward the entry close of the current long island
    df = df.withColumn(
        "entry_price",
        F.last(
            F.when(F.col("opened") == 1, F.col(close_col)), ignorenulls=True
        ).over(wc),
    )
    price_diff = F.col(close_col) - F.lag(close_col, 1).over(w)
    mtm_gross = (
        F.coalesce(F.lag("position", 1).over(w), F.lit(0))
        * price_diff
        / F.lag("entry_price", 1).over(w)
    )
    fee = F.lit(float(abs(config.fee_rate))) * (F.col("opened") + F.col("closed"))
    tax = F.lit(float(abs(config.laid_back_tax))) * (1 - F.col("position"))
    df = df.withColumn("mtm_ratio", F.coalesce(mtm_gross, F.lit(0.0)) - fee - tax)
    df = df.withColumn("pnl_ratio", cumulative_pnl(F.col("mtm_ratio"), w))
    return df.drop("_sig")


def mtm_summary(
    timeline: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-symbol Mtm_Result summary: pnl, max_drawdown, sharpe_ratio.

    Mirrors reference runner_mtm.py:168-190 + trade_reward.py:423-450:
      max_drawdown over running max of pnl_ratio seeded at 0;
      sharpe = (sum(mtm-slip)/hours) / std_pop(mtm-slip) * sqrt(365*24).
    """
    w = symbol_window(symbol_col, [ts_col])
    dd = running_max_drawdown(F.col("pnl_ratio"), w)
    slipped = F.col("mtm_ratio") - F.lit(PROFIT_SLIPPAGE)
    enriched = timeline.withColumn("_dd", dd).withColumn("_slip", slipped)

    hours = (
        (F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col)))
        / F.lit(1000.0)
        / F.lit(3600.0)
    )
    std = F.stddev_pop("_slip")
    sharpe = F.when(
        std == 0, F.lit(MIN_NUMERIC_VALUE)
    ).otherwise(F.sum("_slip") / hours / std * F.sqrt(F.lit(365.0 * 24.0)))

    return enriched.groupBy(symbol_col).agg(
        F.sum("mtm_ratio").alias("pnl"),
        F.max("_dd").alias("max_drawdown"),
        sharpe.alias("sharpe_ratio"),
        F.unix_millis(F.min(ts_col)).alias("mkt_start_epoch"),
        F.unix_millis(F.max(ts_col)).alias("mkt_end_epoch"),
        F.sum("closed").cast("int").alias("long_trades_closed"),
        (F.sum("opened") - F.sum("closed")).cast("int").alias("long_trades_outstanding"),
    )


def extract_trades(
    timeline: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    close_col: str = "close",
) -> DataFrame:
    """Open/close trade pairs (reference trade archive, models.py:42).

    Islands of position=1 become trades: entry at the opened bar,
    exit at the first closed bar after it (if any).
    """
    w = symbol_window(symbol_col, [ts_col])
    # island id: cumulative count of opens; valid for bars in/after an island
    df = timeline.withColumn("_trade_id", F.sum("opened").over(cum_window(w)))
    events = df.filter((F.col("opened") == 1) | (F.col("closed") == 1))
    entries = (
        events.filter(F.col("opened") == 1)
        .select(
            symbol_col,
            F.col("_trade_id").alias("trade_id"),
            F.col(ts_col).alias("entry_datetime"),
            F.col(close_col).alias("entry_price"),
        )
    )
    exits = (
        events.filter(F.col("closed") == 1)
        .select(
            symbol_col,
            F.col("_trade_id").alias("trade_id"),
            F.col(ts_col).alias("exit_datetime"),
            F.col(close_col).alias("exit_price"),
        )
    )
    trades = entries.join(exits, on=[symbol_col, "trade_id"], how="left")
    return trades.select(
        symbol_col,
        "trade_id",
        F.lit("LONG").alias("direction"),
        "entry_datetime",
        "entry_price",
        "exit_datetime",
        "exit_price",
        F.col("exit_datetime").isNotNull().alias("is_closed"),
        F.when(F.col("exit_datetime").isNotNull(), F.lit("SIGNAL")).alias("close_reason"),
        ((F.col("exit_price") - F.col("entry_price")) / F.col("entry_price")).alias(
            "pnl_normalized_gross"
        ),
    )
