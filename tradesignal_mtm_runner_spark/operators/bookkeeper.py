"""Full MTM bookkeeping engine — the general-configuration path.

Re-implements the reference's per-bar bookkeeping loop (reference:
src/tradesignal_mtm_runner/trade_reward.py:81-168, runner_mtm.py:118)
for ALL configurations: ROI take-profit tiers, stoploss, short
positions, max_position_per_symbol > 1, FIFO/LIFO/WORST_PRICE
inventory.

Price-dependent closes (ROI/stoploss) feed back into position state,
so the process is inherently sequential WITHIN a symbol — no window
algebra can express it. The Spark plan is therefore
``groupBy(symbol).applyInPandas(simulate)``: Arrow-batched transfer,
one numpy state machine per group, embarrassingly parallel ACROSS
symbols. That is the axis that scales: at 100 TB the input is ~1e5-1e6
symbol×strategy groups of bounded length (a year of 1-minute bars is
~526k rows), each fitting comfortably in one task.

Per-bar semantics replicated exactly (order matters):
  1. mtm(t) = sum over open trades entered strictly before t of
     ±(close[t]-close[t-1]) / entry_price
  2. ROI close, longs then shorts: close when normalized pnl exceeds
     the MINIMUM roi threshold whose minute-offset <= holding age
     (reference helper.py:37-67: max(pnl - thresholds) > 0)
  3. stoploss close, longs then shorts: pnl < -|stoploss|
  4. signal: BUY -> at-max-long? no-op; else close oldest short if
     any (no simultaneous open!), else open long. SELL symmetric;
     short opens gated by enable_short_position. Fee |fee_rate| per
     open/close.
  5. laid_back_tax charged when no position remains open.
  6. mtm_history[t] = mtm(t) - fees(t)

Known deviations from the reference (documented, intentional):

1. Multi-close skip: the reference mutates its live-position list
   while iterating it (trade_reward.py:198,236 + list.remove in the
   close helper), which silently SKIPS the element after each close
   when two trades are eligible in the same bar. We close every
   eligible trade by default. The skip DOES bite with
   max_position_per_symbol > 1 under dense signals (found by the
   hypothesis head-to-head); ``compat_multi_close_skip=True``
   reproduces the reference's behavior bar-for-bar for drop-in users
   who need bit-parity (property-tested against the reference).
2. LIFO inventory: the reference's ProxyTrade.__lt__ FIFO/LIFO
   branches compare a trade to ITSELF (models.py:178-186), so its
   heap pop degenerates to list insertion order — reference "LIFO" is
   effectively FIFO. Our LIFO is true last-in-first-out. Head-to-head
   reference parity therefore holds for FIFO and WORST_PRICE only;
   with inventory_mode=LIFO and max_position_per_symbol > 1 the trade
   archives can legitimately differ from the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PnlCalcConfig
from ..models import InventoryMode

_LONG, _SHORT = 1, -1

TIMELINE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("buy", T.IntegerType(), True),
        T.StructField("sell", T.IntegerType(), True),
        T.StructField("mtm_ratio", T.DoubleType(), True),
        T.StructField("pnl_ratio", T.DoubleType(), True),
    ]
)

TRADES_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("direction", T.StringType(), False),
        T.StructField("entry_datetime", T.TimestampType(), False),
        T.StructField("entry_price", T.DoubleType(), False),
        T.StructField("exit_datetime", T.TimestampType(), True),
        T.StructField("exit_price", T.DoubleType(), True),
        T.StructField("is_closed", T.BooleanType(), False),
        T.StructField("close_reason", T.StringType(), True),
        T.StructField("pnl_normalized", T.DoubleType(), True),
    ]
)


class _Trade:
    __slots__ = ("entry_i", "entry_ts", "entry_price", "direction",
                 "exit_ts", "exit_price", "close_reason")

    def __init__(self, entry_i: int, entry_ts: float, entry_price: float, direction: int):
        self.entry_i = entry_i
        self.entry_ts = entry_ts
        self.entry_price = entry_price
        self.direction = direction
        self.exit_ts = None
        self.exit_price = None
        self.close_reason = None


def _pick_to_close(live: list[_Trade], mode: InventoryMode) -> int:
    """Index of the trade to close on an opposing signal.

    FIFO = earliest entry; LIFO = latest; WORST_PRICE = highest entry
    for longs / lowest for shorts (reference models.py:158-186).
    """
    if mode == InventoryMode.FIFO:
        return min(range(len(live)), key=lambda i: live[i].entry_i)
    if mode == InventoryMode.LIFO:
        return max(range(len(live)), key=lambda i: live[i].entry_i)
    # WORST_PRICE
    if live[0].direction == _LONG:
        return max(range(len(live)), key=lambda i: live[i].entry_price)
    return min(range(len(live)), key=lambda i: live[i].entry_price)


def simulate_symbol(
    ts_sec: np.ndarray,
    close: np.ndarray,
    buy: np.ndarray,
    sell: np.ndarray,
    config: PnlCalcConfig,
    inventory_mode: InventoryMode = InventoryMode.FIFO,
    strict: bool = False,
    compat_multi_close_skip: bool = False,
) -> tuple[np.ndarray, list[_Trade]]:
    """Single-symbol state machine. ts_sec: float seconds since epoch,
    MUST be sorted ascending. Returns (mtm per bar, all trades).

    strict=False (default) keeps the reference's silent-skip semantics
    for disallowed opens; strict=True raises the reference's public
    exception types instead (see exceptions.py).
    compat_multi_close_skip=True replicates the reference's
    mutate-while-iterating skip in the roi/stoploss close sweeps (see
    module docstring, deviation 1)."""
    n = len(close)
    mtm = np.zeros(n, dtype=np.float64)
    fee = abs(config.fee_rate)
    tax = abs(config.laid_back_tax)
    stop = abs(config.stoploss) if config.has_stoploss else np.inf
    max_pos = config.max_position_per_symbol

    # roi tiers: offsets ascending (seconds) with prefix-min thresholds;
    # active minimum threshold = prefix_min[rightmost offset <= age].
    # Offsets pair with their values directly (never reconstruct the
    # dict key from seconds — non-integer minute keys would mismap).
    roi_items = sorted((float(k) * 60.0, float(v)) for k, v in config.roi.items())
    roi_off = np.array([k for k, _ in roi_items], dtype=np.float64)
    roi_min = np.minimum.accumulate(
        np.array([v for _, v in roi_items], dtype=np.float64)
    )
    roi_live = config.has_roi

    longs: list[_Trade] = []
    shorts: list[_Trade] = []
    done: list[_Trade] = []

    def close_trade(live: list[_Trade], idx: int, i: int, reason: str) -> float:
        tr = live.pop(idx)
        tr.exit_ts = ts_sec[i]
        tr.exit_price = close[i]
        tr.close_reason = reason
        done.append(tr)
        return fee

    # vectorized idle skip: while FLAT, bars without a signal are pure
    # tax charges (mtm = -tax, no roi/sl checks possible), so whole
    # flat stretches fill in one numpy slice instead of Python bars.
    # sig_idx holds the bar indices that can change position state.
    sig_idx = np.flatnonzero((buy == 1) | (sell == 1))

    i = 0
    while i < n:
        p = close[i]
        fees = 0.0
        # 1. mtm over trades opened strictly before this bar
        if i > 0 and (longs or shorts):
            diff = close[i] - close[i - 1]
            acc = 0.0
            for tr in longs:
                if tr.entry_i < i:
                    acc += diff / tr.entry_price
            for tr in shorts:
                if tr.entry_i < i:
                    acc -= diff / tr.entry_price
            mtm[i] = acc
        # 2. ROI close (longs then shorts)
        if roi_live:
            for live, sgn in ((longs, 1.0), (shorts, -1.0)):
                j = 0
                while j < len(live):
                    tr = live[j]
                    pnl = sgn * (p - tr.entry_price) / tr.entry_price
                    k = np.searchsorted(roi_off, ts_sec[i] - tr.entry_ts, side="right") - 1
                    if k >= 0 and pnl > roi_min[k]:
                        fees += close_trade(live, j, i, "ROI")
                        # compat: the reference's for-loop index still
                        # advances after the remove, skipping the
                        # element that shifted into this slot
                        if compat_multi_close_skip:
                            j += 1
                    else:
                        j += 1
        # 3. stoploss close (longs then shorts)
        if stop != np.inf:
            for live, sgn in ((longs, 1.0), (shorts, -1.0)):
                j = 0
                while j < len(live):
                    tr = live[j]
                    pnl = sgn * (p - tr.entry_price) / tr.entry_price
                    if pnl < -stop:
                        fees += close_trade(live, j, i, "STOP_LOSS")
                        if compat_multi_close_skip:
                            j += 1
                    else:
                        j += 1
        # 4. signal (buy wins when both set — reference runner_mtm.py:156)
        # opens are gated on p > 0: normalized mtm divides by the entry
        # price, so a zero-price open is degenerate (treated as HOLD);
        # closes remain valid at any price.
        if buy[i] == 1:
            if len(longs) < max_pos:
                if shorts:
                    fees += close_trade(shorts, _pick_to_close(shorts, inventory_mode), i, "SIGNAL")
                elif p > 0:
                    longs.append(_Trade(i, ts_sec[i], p, _LONG))
                    fees += fee
            elif strict:
                from ..exceptions import MaxPositionPerSymbolExceededException

                raise MaxPositionPerSymbolExceededException(
                    f"buy signal at bar {i} with {len(longs)} open longs"
                    f" >= max_position_per_symbol={max_pos}"
                )
        elif sell[i] == 1:
            if len(shorts) < max_pos:
                if longs:
                    fees += close_trade(longs, _pick_to_close(longs, inventory_mode), i, "SIGNAL")
                elif config.enable_short_position and p > 0:
                    shorts.append(_Trade(i, ts_sec[i], p, _SHORT))
                    fees += fee
                elif strict and not config.enable_short_position:
                    from ..exceptions import NoShortPositionAllowedException

                    raise NoShortPositionAllowedException(
                        f"sell signal at bar {i} would open a short but"
                        " enable_short_position is False"
                    )
            elif strict:
                from ..exceptions import MaxPositionPerSymbolExceededException

                raise MaxPositionPerSymbolExceededException(
                    f"sell signal at bar {i} with {len(shorts)} open shorts"
                    f" >= max_position_per_symbol={max_pos}"
                )
        # 5. laid back tax
        if not longs and not shorts:
            fees += tax
        # 6.
        mtm[i] -= fees
        # advance; signal-free stretches vectorize when no per-bar
        # close is possible there:
        #   flat            -> every bar is just the tax charge
        #   no roi/stoploss -> open trades only accrue mtm (closes
        #      happen on signal bars only); accumulate per trade in
        #      the SAME order as the scalar loop, so bit-identical
        if not longs and not shorts:
            k = np.searchsorted(sig_idx, i, side="right")
            nxt = int(sig_idx[k]) if k < len(sig_idx) else n
            if nxt > i + 1:
                mtm[i + 1 : nxt] = -tax
            i = nxt
        elif not roi_live and stop == np.inf:
            k = np.searchsorted(sig_idx, i, side="right")
            nxt = int(sig_idx[k]) if k < len(sig_idx) else n
            if nxt > i + 1:
                seg = np.diff(close[i:nxt])
                acc = np.zeros(nxt - i - 1, dtype=np.float64)
                for tr in longs:
                    acc += seg / tr.entry_price
                for tr in shorts:
                    acc -= seg / tr.entry_price
                mtm[i + 1 : nxt] = acc
            i = nxt
        else:
            i += 1

    return mtm, done + longs + shorts


def _make_apply_fn(
    config: PnlCalcConfig,
    inventory_mode: InventoryMode,
    output: str,
    strict: bool = False,
    compat_multi_close_skip: bool = False,
):
    fee = abs(config.fee_rate)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["timestamp", "event_id"] if "event_id" in pdf.columns else ["timestamp"])
        ts = pdf["timestamp"].to_numpy()
        ts_sec = ts.astype("datetime64[us]").astype(np.int64) / 1e6
        close = pdf["close"].to_numpy(dtype=np.float64)
        buy = pdf["buy"].to_numpy(dtype=np.int64)
        sell = pdf["sell"].to_numpy(dtype=np.int64)
        mtm, trades = simulate_symbol(
            ts_sec, close, buy, sell, config, inventory_mode, strict=strict,
            compat_multi_close_skip=compat_multi_close_skip,
        )
        symbol = pdf["symbol"].iloc[0]
        if output == "timeline":
            return pd.DataFrame(
                {
                    "symbol": symbol,
                    "timestamp": ts,
                    "close": close,
                    "buy": buy.astype(np.int32),
                    "sell": sell.astype(np.int32),
                    "mtm_ratio": mtm,
                    "pnl_ratio": np.cumsum(mtm),
                }
            )
        # trades output; pnl_normalized includes entry+exit fee like the
        # reference's ProxyTrade.pnl (models.py:117-131, fee on entry price)
        rows = []
        for tr in trades:
            closed = tr.exit_ts is not None
            sgn = 1.0 if tr.direction == _LONG else -1.0
            pnl = None
            if closed:
                pnl = (sgn * (tr.exit_price - tr.entry_price) / tr.entry_price) - 2 * fee
            rows.append(
                {
                    "symbol": symbol,
                    "direction": "LONG" if tr.direction == _LONG else "SHORT",
                    "entry_datetime": np.datetime64(int(round(tr.entry_ts * 1e6)), "us"),
                    "entry_price": tr.entry_price,
                    "exit_datetime": np.datetime64(int(round(tr.exit_ts * 1e6)), "us") if closed else None,
                    "exit_price": tr.exit_price if closed else None,
                    "is_closed": closed,
                    "close_reason": tr.close_reason,
                    "pnl_normalized": pnl,
                }
            )
        cols = [f.name for f in TRADES_SCHEMA.fields]
        return pd.DataFrame(rows, columns=cols)

    return apply_fn


def _batched_group_stream(key_cols: list[str], group_fn):
    """mapInPandas generator that re-chunks a (key-sorted, key-hash-
    partitioned) batch stream into COMPLETE key groups and applies
    ``group_fn(key_tuple, pdf)`` per group.

    Why not groupBy().applyInPandas: that path pays per-GROUP plan and
    Arrow overhead (~2 ms/group measured), which dominates when groups
    are small and numerous — 1500 symbol groups cost ~3 s of pure
    overhead for 0.3 s of engine work at sf0.1. Streaming whole
    partitions and splitting on key boundaries in pandas keeps the
    task count = partition count while preserving exactly-one-call-
    per-group semantics. Rows of the partition's current LAST key are
    buffered until the next batch proves the group complete."""

    def fn(batches):
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf.iloc[-1]
            tail = np.ones(len(pdf), dtype=bool)
            for c in key_cols:
                tail &= (pdf[c] == last[c]).to_numpy()
            complete, pending = pdf[~tail], pdf[tail]
            for key, g in complete.groupby(key_cols, sort=False):
                yield group_fn(key if isinstance(key, tuple) else (key,), g)
        if pending is not None and len(pending):
            for key, g in pending.groupby(key_cols, sort=False):
                yield group_fn(key if isinstance(key, tuple) else (key,), g)

    return fn


def run_mtm_bookkeeper(
    signals: DataFrame,
    config: PnlCalcConfig | None = None,
    inventory_mode: InventoryMode = InventoryMode.FIFO,
    output: str = "timeline",
    strict: bool = False,
    compat_multi_close_skip: bool = False,
) -> DataFrame:
    """Distributed full-engine MTM run.

    signals: DataFrame(symbol, timestamp[, event_id], close, buy, sell).
    output: "timeline" (per-bar mtm/pnl) or "trades" (archive +
    outstanding, reference Mtm_Result trade lists).
    strict: raise the reference's public exception types on disallowed
    opens instead of the reference engine's silent skip (the raise
    happens inside the executor task; TradeMtmRunner re-raises the
    typed original driver-side via exceptions.reraise_typed).

    Plan shape: one hash shuffle on symbol + in-partition sort, then
    ONE mapInPandas pass that splits partitions back into symbol
    groups (_batched_group_stream) — same per-group semantics as
    groupBy().applyInPandas without its per-group Arrow overhead.
    """
    config = config or PnlCalcConfig.get_default()
    if output not in ("timeline", "trades"):
        from ..exceptions import UnSupportedException

        raise UnSupportedException("output must be 'timeline' or 'trades'")
    schema = TIMELINE_SCHEMA if output == "timeline" else TRADES_SCHEMA
    cols = [c for c in ["symbol", "timestamp", "event_id", "close", "buy", "sell"] if c in signals.columns]
    order = [c for c in ["symbol", "timestamp", "event_id"] if c in cols]
    per_group = _make_apply_fn(
        config, inventory_mode, output, strict=strict,
        compat_multi_close_skip=compat_multi_close_skip,
    )
    # explicit partition count: AQE's byte-based coalescing would fold
    # this Python-CPU-bound stage into ~2 tasks (the engine costs CPU
    # per row, not bytes); a user-specified count is exempt from
    # coalescing and keeps every core busy
    n_part = int(signals.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        signals.select(*cols)
        .repartition(n_part, "symbol")
        .sortWithinPartitions(*order)
        .mapInPandas(
            _batched_group_stream(["symbol"], lambda _key, g: per_group(g)),
            schema=schema,
        )
    )


SWEEP_TIMELINE_SCHEMA = T.StructType(
    [T.StructField("config_id", T.StringType(), False)] + TIMELINE_SCHEMA.fields
)


def run_mtm_param_sweep(
    signals: DataFrame,
    configs: dict[str, PnlCalcConfig],
    inventory_mode: InventoryMode = InventoryMode.FIFO,
) -> DataFrame:
    """One engine pass over the full strategy grid: every (symbol,
    config) pair becomes an independent applyInPandas group.

    This is the shape of the real 100 TB workload — backtests run as
    symbols x strategies x parameter sets, and each cell is an
    embarrassingly parallel state-machine run. The bar rows are
    replicated per config through the one shuffle (explode before
    groupBy), which is exactly the data each group needs and keeps
    every cell schedulable on any executor. Returns the per-bar
    timeline tagged with config_id; feed to summarize_timeline(...,
    group_cols=["symbol", "config_id"]) for the grid summary."""
    ids = sorted(configs)
    cols = [c for c in ["symbol", "timestamp", "event_id", "close", "buy", "sell"] if c in signals.columns]
    order = [c for c in ["symbol", "timestamp", "event_id"] if c in cols]
    sweep = signals.select(*cols).withColumn(
        "config_id", F.explode(F.array(*[F.lit(i) for i in ids]))
    )

    fns = {
        cid: _make_apply_fn(cfg, inventory_mode, "timeline")
        for cid, cfg in configs.items()
    }

    def group_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        config_id = key[1]
        out = fns[config_id](pdf)
        out.insert(0, "config_id", config_id)
        return out

    n_part = int(signals.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        sweep.repartition(n_part, "symbol", "config_id")
        .sortWithinPartitions("symbol", "config_id", *order[1:])
        .mapInPandas(
            _batched_group_stream(["symbol", "config_id"], group_fn),
            schema=SWEEP_TIMELINE_SCHEMA,
        )
    )


def run_mtm_param_sweep_blocked(
    signals: DataFrame,
    configs: dict[str, PnlCalcConfig],
    block_size: int = 8,
    inventory_mode: InventoryMode = InventoryMode.FIFO,
) -> DataFrame:
    """Config-BLOCK variant of run_mtm_param_sweep (VERDICT r5 item 5).

    The per-config explode replicates every bar row once per config
    THROUGH the shuffle — at C configs the shuffle volume is bars x C.
    Here bars are replicated once per block of k configs instead
    (shuffle volume bars x ceil(C/k)); each (symbol, block) cell then
    loops its k state machines over ONE in-memory copy of the bars,
    emitting k tagged timelines from the same Arrow batch. Parallelism
    drops from symbols x C cells to symbols x ceil(C/k) — pick k so
    that grid/k still saturates the cluster (k=8 at C=32 keeps 4
    blocks per symbol). Output schema and values are identical to the
    per-config sweep (pinned in tests/test_param_sweep.py)."""
    ids = sorted(configs)
    blocks = [ids[i : i + block_size] for i in range(0, len(ids), block_size)]
    cols = [c for c in ["symbol", "timestamp", "event_id", "close", "buy", "sell"] if c in signals.columns]
    order = [c for c in ["symbol", "timestamp", "event_id"] if c in cols]
    sweep = signals.select(*cols).withColumn(
        "_blk", F.explode(F.array(*[F.lit(b) for b in range(len(blocks))]))
    )

    fns = {
        cid: _make_apply_fn(cfg, inventory_mode, "timeline")
        for cid, cfg in configs.items()
    }

    def group_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bars = pdf.drop(columns=["_blk"])
        outs = []
        for cid in blocks[int(key[1])]:
            out = fns[cid](bars)
            out.insert(0, "config_id", cid)
            outs.append(out)
        return pd.concat(outs, ignore_index=True)

    n_part = int(signals.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        sweep.repartition(n_part, "symbol", "_blk")
        .sortWithinPartitions("symbol", "_blk", *order[1:])
        .mapInPandas(
            _batched_group_stream(["symbol", "_blk"], group_fn),
            schema=SWEEP_TIMELINE_SCHEMA,
        )
    )


def summarize_timeline(
    timeline: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group pnl / max_drawdown / sharpe from any MTM timeline
    (works for the declarative, bookkeeper, and sweep engines)."""
    from ..functions.timeseries import running_max_drawdown, symbol_window
    from ..models import MIN_NUMERIC_VALUE, PROFIT_SLIPPAGE

    group_cols = group_cols or ["symbol"]
    w = symbol_window(group_cols, ["timestamp"])
    dd = running_max_drawdown(F.col("pnl_ratio"), w)
    enriched = timeline.withColumn("_dd", dd).withColumn(
        "_slip", F.col("mtm_ratio") - F.lit(PROFIT_SLIPPAGE)
    )
    hours = (
        (F.unix_millis(F.max("timestamp")) - F.unix_millis(F.min("timestamp")))
        / F.lit(1000.0)
        / F.lit(3600.0)
    )
    std = F.stddev_pop("_slip")
    sharpe = F.when(std == 0, F.lit(MIN_NUMERIC_VALUE)).otherwise(
        F.sum("_slip") / hours / std * F.sqrt(F.lit(365.0 * 24.0))
    )
    return enriched.groupBy(*group_cols).agg(
        F.sum("mtm_ratio").alias("pnl"),
        F.max("_dd").alias("max_drawdown"),
        sharpe.alias("sharpe_ratio"),
        F.unix_millis(F.min("timestamp")).alias("mkt_start_epoch"),
        F.unix_millis(F.max("timestamp")).alias("mkt_end_epoch"),
    )
