"""Round-15 pins: iterate-to-fixpoint forms of the peeling/LPA kernels
(VERDICT r14 item 3) and the reliable-checkpoint lineage-cut option
(VERDICT r14 item 4). The fixed-unroll query keys stay oracle-checked
via the registry; here we pin that the CONVERGED forms (a) equal the
fixed unrolls wherever those are converged, (b) keep iterating past a
fixed unroll's horizon on a planted deeper graph, and (c) fail loud
instead of returning mid-iteration state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _planted_deep_edges(spark, tail_len: int = 12):
    """Support-cut edge relation for a triangle {1,2,3} with a
    ``tail_len``-node pendant path hanging off node 3. Simultaneous
    2-core peeling removes exactly ONE tail node per round (only the
    free end ever has degree < 2), so the peel DEPTH equals
    ``tail_len`` — strictly deeper than KCORE_PEELS=8 for the default
    12 — while the 2-core is exactly the triangle."""
    edges = [(1, 2), (1, 3), (2, 3)]
    prev = 3
    for i in range(tail_len):
        node = 100 + i
        edges.append((min(prev, node), max(prev, node)))
        prev = node
    return spark.createDataFrame(
        [(a, b, 2) for a, b in edges],
        "part_a long, part_b long, pair_cnt long",
    )


def test_kcore_converged_peels_past_fixed_unroll(spark):
    """The planted deeper-than-KCORE_PEELS graph: the fixed 8-round
    unroll provably UNDER-peels (tail remnants survive with the wrong
    membership), while the converged form keeps going and returns
    exactly the triangle 2-core — the silent-under-convergence gap the
    production entry exists to close."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        kcore_members,
        kcore_members_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r14 import KCORE_K, KCORE_PEELS

    edges = _planted_deep_edges(spark, tail_len=12)
    fixed = {
        r["part"]: r["core_deg"]
        for r in kcore_members(edges, KCORE_K, KCORE_PEELS).collect()
    }
    conv = {
        r["part"]: r["core_deg"]
        for r in kcore_members_converged(edges, KCORE_K).collect()
    }
    assert conv == {1: 2, 2: 2, 3: 2}
    # the fixed unroll is NOT converged here: tail survivors remain
    assert set(fixed) > set(conv), fixed


def test_kcore_converged_equals_fixed_unroll_at_test_sf(spark):
    """Convergence-equivalence pin: on the real co-purchase graph the
    fixed unroll IS converged (tests/test_r14.py pins that), so the
    fixpoint form must return the identical membership and degrees."""
    from tests.conftest import assert_frames_match
    from tradesignal_mtm_runner_spark.operators.graph import (
        kcore_members,
        kcore_members_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r14 import KCORE_K, KCORE_PEELS

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    edges = pairs.select("part_a", "part_b")
    assert_frames_match(
        kcore_members_converged(edges, KCORE_K).toPandas(),
        kcore_members(edges, KCORE_K, KCORE_PEELS).toPandas(),
        "kcore_converged_vs_fixed",
    )


def test_kcore_converged_fails_loud_on_exhaustion(spark):
    """max_peels exhaustion must RAISE, not return the mid-peel state
    — returning it would be exactly the silent under-convergence the
    converged entry exists to prevent."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        kcore_members_converged,
    )

    edges = _planted_deep_edges(spark, tail_len=6)
    with pytest.raises(RuntimeError, match="no fixpoint within"):
        kcore_members_converged(edges, 2, max_peels=2)


def test_lpa_converged_equals_fixed_unroll_at_test_sf(spark):
    """Convergence-equivalence pin for LPA: the fixed LPA_ROUNDS
    unroll is converged on the test graph (tests/test_r14b.py pins
    that), so the fixpoint form must return the identical labeling."""
    from tests.conftest import assert_frames_match
    from tradesignal_mtm_runner_spark.operators.graph import (
        community_labels,
        community_labels_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r14b import LPA_ROUNDS

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    edges = pairs.select("part_a", "part_b")
    assert_frames_match(
        community_labels_converged(edges).toPandas(),
        community_labels(edges, LPA_ROUNDS).toPandas(),
        "lpa_converged_vs_fixed",
    )


def test_lpa_converged_fails_loud_on_exhaustion(spark):
    """max_rounds exhaustion must RAISE: a labeling still flipping at
    the bound is mid-propagation (or oscillating) state."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        community_labels_converged,
    )

    # a long path needs ~len/2 rounds for the min label to propagate
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "part_a long, part_b long"
    )
    with pytest.raises(RuntimeError, match="still flipping"):
        community_labels_converged(path, max_rounds=2)


def test_reliable_lineage_cuts_option(spark, tmp_path):
    """VERDICT r14 item 4: the reliable-checkpoint lineage-cut option.
    (1) Default unchanged: conf unset → localCheckpoint path, results
    as before. (2) Flag set WITHOUT a checkpoint dir → fail loud (a
    silent fallback to the non-recoverable cut would defeat the flag).
    (3) Flag set WITH a checkpoint dir → same results through reliable
    checkpoint()s that land in the dir."""
    import os

    from tradesignal_mtm_runner_spark.operators.graph import (
        RELIABLE_CUTS_CONF,
        kcore_members_converged,
    )

    edges = _planted_deep_edges(spark, tail_len=4)
    want = {
        r["part"]: r["core_deg"]
        for r in kcore_members_converged(edges, 2).collect()
    }
    assert want == {1: 2, 2: 2, 3: 2}

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # suite never sets one
    spark.conf.set(RELIABLE_CUTS_CONF, "true")
    try:
        with pytest.raises(ValueError, match="no checkpoint dir"):
            kcore_members_converged(edges, 2).collect()

        ckpt = str(tmp_path / "ckpt")
        sc.setCheckpointDir(ckpt)
        got = {
            r["part"]: r["core_deg"]
            for r in kcore_members_converged(edges, 2).collect()
        }
        assert got == want
        # the reliable cuts actually landed in the durable dir
        assert any(os.scandir(ckpt))
    finally:
        spark.conf.set(RELIABLE_CUTS_CONF, "false")
