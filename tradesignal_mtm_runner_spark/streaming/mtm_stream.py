"""Incremental signal-MTM over Structured Streaming (SURVEY §2 A10).

Re-expresses ``operators.mtm.signal_mtm_timeline`` (the feedback-free
long-only / max_position=1 configuration — reference
trade_reward.py:81-168 restricted) as a stateful streaming operator:
``groupBy(symbol).applyInPandasWithState``. Per-symbol state is a
5-tuple (position, entry_price, prev_close, pnl_cum, has_prev) — a
few bytes per key, so state size scales with #symbols, not #bars:
exactly the property an unbounded 100 TB stream needs. Batch parity
is pytest-enforced: replaying the same bars through N micro-batches
must reproduce the batch engine bar-for-bar (tests/test_streaming.py).

Bars are processed in (timestamp, event_id) order within each
micro-batch; cross-batch order is the stream's append order (file
source: one file per trigger). Late/out-of-order bars across batches
are out of scope here — the batch engine is the replay/repair path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import PnlCalcConfig

OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("event_id", LongType()),
        StructField("close", DoubleType()),
        StructField("buy", IntegerType()),
        StructField("sell", IntegerType()),
        StructField("position", IntegerType()),
        StructField("opened", IntegerType()),
        StructField("closed", IntegerType()),
        StructField("entry_price", DoubleType()),
        StructField("mtm_ratio", DoubleType()),
        StructField("pnl_ratio", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("position", IntegerType()),
        StructField("entry_price", DoubleType()),
        StructField("prev_close", DoubleType()),
        StructField("pnl_cum", DoubleType()),
        StructField("has_prev", IntegerType()),
    ]
)


def _run_machine(
    symbol, bars: pd.DataFrame, fee: float, tax: float, st: tuple
) -> tuple[dict, tuple]:
    """One single-config state machine over one micro-batch's sorted
    bars: returns (output columns dict, updated 5-tuple state). Shared
    by the per-key streaming engine and the config-BLOCKED sweep (k
    machines over ONE copy of the bars)."""
    pos, entry, prev_close, pnl_cum, has_prev = st
    out = {c.name: [] for c in OUTPUT_SCHEMA.fields}
    for ts, event_id, close, buy, sell in zip(
        bars["timestamp"], bars["event_id"], bars["close"], bars["buy"], bars["sell"]
    ):
        prev_pos = pos
        # signal resolution — buy wins and CONSUMES the bar even
        # when the close<=0 price gate makes it a HOLD (same
        # nesting as operators/mtm.py and bookkeeper.py step 4)
        if buy == 1:
            if close > 0:
                pos = 1
        elif sell == 1:
            pos = 0
        opened = int(pos == 1 and prev_pos == 0)
        closed = int(pos == 0 and prev_pos == 1)
        # mtm step 1 runs before closes: the closing bar still
        # accrues against the PREVIOUS entry/close
        if prev_pos and has_prev and prev_close is not None and entry:
            gross = (close - prev_close) / entry
        else:
            gross = 0.0
        if opened:
            entry = float(close)
        mtm = gross - fee * (opened + closed) - tax * (1 - pos)
        pnl_cum += mtm
        out["symbol"].append(symbol)
        out["timestamp"].append(ts)
        out["event_id"].append(event_id)
        out["close"].append(close)
        out["buy"].append(buy)
        out["sell"].append(sell)
        out["position"].append(pos)
        out["opened"].append(opened)
        out["closed"].append(closed)
        out["entry_price"].append(entry)
        out["mtm_ratio"].append(mtm)
        out["pnl_ratio"].append(pnl_cum)
        prev_close = float(close)
        has_prev = 1
    return out, (pos, entry, prev_close, pnl_cum, has_prev)


def _make_state_fn(fee_rate: float, laid_back_tax: float):
    fee = abs(float(fee_rate))
    tax = abs(float(laid_back_tax))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
        else:
            st = (0, None, None, 0.0, 0)

        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update(tuple(st))
            return
        bars = pd.concat(chunks, ignore_index=True).sort_values(
            ["timestamp", "event_id"], kind="stable"
        )
        out, st = _run_machine(key[0], bars, fee, tax, st)
        state.update(st)
        yield pd.DataFrame(out)

    return fn


def streaming_mtm_timeline(
    signals: DataFrame, config: PnlCalcConfig | None = None
) -> DataFrame:
    """Stateful per-bar MTM over a streaming signal frame
    (symbol, timestamp, event_id, close, buy, sell).

    ``event_id`` is the deterministic same-timestamp tiebreak. Frames
    from the 5-column SIGNAL_COLUMNS contract (signal_stream's default
    schema, the CSV/JSONL loaders) don't carry one — synthesize a
    constant so the sort degrades to timestamp-only, exactly the
    reference's pandas ordering (review r12: composing the connector
    with this engine as documented died with KeyError('event_id')
    executor-side)."""
    config = config or PnlCalcConfig.get_default()
    if "event_id" not in signals.columns:
        signals = signals.withColumn("event_id", F.lit(0).cast("long"))
    return signals.groupBy("symbol").applyInPandasWithState(
        _make_state_fn(config.fee_rate, config.laid_back_tax),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SWEEP_OUTPUT_SCHEMA = StructType(
    [StructField("config_id", StringType())] + OUTPUT_SCHEMA.fields
)


def _make_sweep_state_fn(fee_tax: dict[str, tuple[float, float]]):
    """Dispatch per-(symbol, config_id) state groups to the matching
    single-config state machine; the group key's second element picks
    the (fee, tax) parameters."""
    inner = {
        cid: _make_state_fn(fee, tax) for cid, (fee, tax) in fee_tax.items()
    }

    def fn(key, pdfs, state):
        cid = key[1]
        for out in inner[cid]((key[0],), pdfs, state):
            out.insert(0, "config_id", cid)
            yield out

    return fn


def streaming_mtm_sweep(
    signals: DataFrame, fee_tax: dict[str, tuple[float, float]]
) -> DataFrame:
    """Strategy-grid MTM over a STREAM, EXPLODED form: each bar is
    replicated across the config grid and every (symbol, config_id)
    pair becomes an independent state-store key. State per key is the
    same 5-tuple as the single-config engine. Kept as the parity
    reference for the BLOCKED form below (which ships in the query
    registry): shuffle volume here is bars x C, there bars x 1."""
    from pyspark.sql import functions as F

    ids = sorted(fee_tax)
    sweep = signals.withColumn(
        "config_id", F.explode(F.array(*[F.lit(i) for i in ids]))
    )
    return sweep.groupBy("symbol", "config_id").applyInPandasWithState(
        _make_sweep_state_fn(fee_tax),
        outputStructType=SWEEP_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _blocked_state_schema(n: int) -> StructType:
    """The C-config blocked state: C independent 5-tuples flattened
    into one state row (position_i, entry_price_i, prev_close_i,
    pnl_cum_i, has_prev_i per config slot i in sorted-config order)."""
    fields = []
    for i in range(n):
        fields += [
            StructField(f"position_{i}", IntegerType()),
            StructField(f"entry_price_{i}", DoubleType()),
            StructField(f"prev_close_{i}", DoubleType()),
            StructField(f"pnl_cum_{i}", DoubleType()),
            StructField(f"has_prev_{i}", IntegerType()),
        ]
    return StructType(fields)


def _make_sweep_state_fn_blocked(fee_tax: dict[str, tuple[float, float]]):
    ids = sorted(fee_tax)
    params = [
        (abs(float(fee_tax[c][0])), abs(float(fee_tax[c][1]))) for c in ids
    ]
    n = len(ids)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        flat = list(state.get) if state.exists else [0, None, None, 0.0, 0] * n
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update(tuple(flat))
            return
        bars = pd.concat(chunks, ignore_index=True).sort_values(
            ["timestamp", "event_id"], kind="stable"
        )
        outs = []
        for i, cid in enumerate(ids):
            st = tuple(flat[5 * i : 5 * i + 5])
            out, st = _run_machine(key[0], bars, *params[i], st)
            flat[5 * i : 5 * i + 5] = list(st)
            pdf = pd.DataFrame(out)
            pdf.insert(0, "config_id", cid)
            outs.append(pdf)
        state.update(tuple(flat))
        yield pd.concat(outs, ignore_index=True)

    return fn


def streaming_mtm_sweep_blocked(
    signals: DataFrame, fee_tax: dict[str, tuple[float, float]]
) -> DataFrame:
    """Strategy-grid MTM over a STREAM, config-BLOCKED form (the
    streaming twin of run_mtm_param_sweep_blocked, r7): bars are NOT
    exploded — each symbol is ONE state-store key whose state row
    carries all C per-config 5-tuples, and the state fn runs the C
    machines over a single copy of the micro-batch's bars. Shuffle
    volume into the state operator is bars x 1 instead of bars x C,
    and the state-store key count is #symbols instead of
    #symbols x C (fewer, larger entries — same total bytes). Output
    (and the SQL oracle) are identical to the exploded form;
    value-parity is pytest-pinned like the batch pair."""
    return signals.groupBy("symbol").applyInPandasWithState(
        _make_sweep_state_fn_blocked(fee_tax),
        outputStructType=SWEEP_OUTPUT_SCHEMA,
        stateStructType=_blocked_state_schema(len(fee_tax)),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
