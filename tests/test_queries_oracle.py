"""Every declared query must match its DuckDB oracle at sf0.001 —
the same harness the driver runs at sf0.01 (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, assert_frames_match
from tradesignal_mtm_runner_spark.queries import EXTRA_ORACLES, EXTRA_QUERIES

# driver-facing registry (first 50 are CORRECTNESS-checked) plus the
# pytest-only extras — everything gets the same oracle treatment here
QUERIES = {**entrymod.queries(), **EXTRA_QUERIES}
ORACLES = {**entrymod.oracle_sql(), **EXTRA_ORACLES}


def test_driver_registry_fits_correctness_window():
    # the driver evaluates only the first 50 queries() entries; every
    # registered query must land inside that window (VERDICT r1 item 1)
    assert len(entrymod.queries()) <= 50


def test_every_query_has_oracle_or_is_declared():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_SMOKE).toPandas()
        assert len(df) >= 0  # rows-only check
        return
    got = QUERIES[name](spark, SF_SMOKE).toPandas()
    want = duck.execute(ORACLES[name]).df()
    assert_frames_match(got, want, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "pnl" in df.columns


def test_rotation_invariants():
    """Each round's window rotation must keep the registries a clean
    partition: exactly 50 driver slots, rotated keys on the declared
    sides (latest rotation wins for keys touched twice), no key on
    both sides, and every driver key oracled or declared no-oracle."""
    from tradesignal_mtm_runner_spark import queries as q

    assert len(q.QUERIES) == 50
    assert set(q.QUERIES).isdisjoint(q.EXTRA_QUERIES)
    rounds = [
        (q.ROTATED_OUT_R5, q.ROTATED_IN_R5),
        (q.ROTATED_OUT_R6, q.ROTATED_IN_R6),
        (q.ROTATED_OUT_R7, q.ROTATED_IN_R7),
        (q.ROTATED_OUT_R8, q.ROTATED_IN_R8),
        (q.ROTATED_OUT_R9, q.ROTATED_IN_R9),
        (q.ROTATED_OUT_R10, q.ROTATED_IN_R10),
        (q.ROTATED_OUT_R11, q.ROTATED_IN_R11),
        (q.ROTATED_OUT_R12, q.ROTATED_IN_R12),
        (q.ROTATED_OUT_R13, q.ROTATED_IN_R13),
        (q.ROTATED_OUT_R14, q.ROTATED_IN_R14),
        (q.ROTATED_OUT_R15, q.ROTATED_IN_R15),
        (q.ROTATED_OUT_R16, q.ROTATED_IN_R16),
    ]
    # replay the rotations generation by generation: a key's FINAL
    # side is decided by the last round that touched it
    side: dict[str, str] = {}
    for outs, ins in rounds:
        assert set(outs).isdisjoint(ins)
        for k in outs:
            side[k] = "extra"
        for k in ins:
            side[k] = "driver"
    for k, s in side.items():
        if s == "driver":
            assert k in q.QUERIES, f"{k} rotated in but not in the window"
        else:
            assert k in q.EXTRA_QUERIES, f"{k} rotated out but still in window"
    assert set(q.ALL_QUERIES) == set(q.QUERIES) | set(q.EXTRA_QUERIES)


@pytest.mark.parametrize(
    "name", ["mtm_sweep_stream", "mtm_streaming", "mtm_timeline"]
)
def test_no_negative_zero_in_either_engine(name, spark, duck):
    """Pin the r7 driver-hash regression class: the driver hashes the
    VALUE REPRESENTATION, so IEEE -0.0 vs +0.0 is a mismatch even
    though every numeric comparison calls them equal. The declarative
    oracle's `prev_pos * price_diff` emits -0.0 exactly where a Python
    state machine's `gross = 0.0` branch emits +0.0 — visible only in
    zero-fee/zero-tax grid cells (mtm_sweep_stream's fee0_tax0 /
    fee_only configs). Both engines must canonicalize after rounding
    (`round(x, 9) + 0.0`, mtm_shared.r9 / the oracle SELECTs), so
    NEITHER output may contain a negative zero anywhere."""
    import numpy as np

    def neg_zero_cells(df, side):
        bad = {}
        for col in df.columns:
            vals = df[col]
            if vals.dtype.kind != "f":
                continue
            arr = vals.to_numpy()
            n = int((np.signbit(arr) & (arr == 0.0)).sum())
            if n:
                bad[col] = n
        assert not bad, f"{name}/{side}: negative zeros {bad}"

    got = QUERIES[name](spark, SF_SMOKE).toPandas()
    want = duck.execute(ORACLES[name]).df()
    neg_zero_cells(got, "spark")
    neg_zero_cells(want, "oracle")
    # and the zero-fee cells genuinely exercise the class: the sweep
    # must contain exact zeros in mtm_ratio (else this pin is vacuous)
    if name == "mtm_sweep_stream":
        assert (got["mtm_ratio"].to_numpy() == 0.0).any()
