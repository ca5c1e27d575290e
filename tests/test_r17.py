"""Round-17 pins: (a) k-truss edge peeling — planted triangle/K4/
pendant values, k=3 one-round convergence at the fixed unroll,
converged == fixed-unroll at test SF, a planted triangle-strip the
fixed unroll provably UNDER-PEELS at k=4 (cascade deeper than the
unroll), and the fail-loud guards; (b) the hop-plot pair —
exact reach_counts against closed-form 5-path values, the HyperBall
sketch twin within the m=64 HLL tolerance of the exact twin on the
live smoke graph plus bit-exact determinism, and ball monotonicity;
(c) ann_recall_eval cross-checked against an independent join of the
family's own exact/IVF query paths; (d) events_changepoint — a
planted step series parquet where the diff-median noise scale flags
the step a level-MAD scale would mute (the semantics the detector
exists for)."""

from __future__ import annotations

import datetime
import os

import pytest

from tests.conftest import SF_SMOKE


def _edges(spark, rows):
    return spark.createDataFrame(sorted(rows), "part_a long, part_b long")


# --- k-truss (operators/graph.ktruss_edges) ---------------------------------


def test_ktruss_planted_triangle_and_pendant(spark):
    """3-truss of a triangle with a pendant chain = the triangle,
    every edge with support 1; the pendant edges peel (no triangle)."""
    from tradesignal_mtm_runner_spark.operators.graph import ktruss_edges

    g = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)])
    got = {
        (r["part_a"], r["part_b"]): r["truss_sup"]
        for r in ktruss_edges(g, 3, 2).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_ktruss_planted_k4(spark):
    """K4 is a 4-truss: all six edges survive k=4 with support 2."""
    from tradesignal_mtm_runner_spark.operators.graph import ktruss_edges

    k4 = _edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    )
    got = {
        (r["part_a"], r["part_b"]): r["truss_sup"]
        for r in ktruss_edges(k4, 4, 2).collect()
    }
    assert got == {
        (1, 2): 2, (1, 3): 2, (1, 4): 2, (2, 3): 2, (2, 4): 2, (3, 4): 2
    }


def test_ktruss_live_fixed_unroll_is_converged(spark):
    """One more round than KTRUSS_PEELS changes nothing on the live
    support-cut graph (the convergence claim the oracle's fixed
    unroll rests on), and the fixpoint twin agrees exactly."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        ktruss_edges,
        ktruss_edges_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r17 import (
        KTRUSS_K,
        KTRUSS_PEELS,
    )

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    edges = pairs.select("part_a", "part_b").localCheckpoint(eager=True)

    def key(df):
        return {
            (r["part_a"], r["part_b"]): r["truss_sup"] for r in df.collect()
        }

    fixed = key(ktruss_edges(edges, KTRUSS_K, KTRUSS_PEELS))
    assert fixed  # discriminating at the smoke SF (2244 edges survive)
    assert fixed == key(ktruss_edges(edges, KTRUSS_K, KTRUSS_PEELS + 1))
    assert fixed == key(ktruss_edges_converged(edges, KTRUSS_K))


def test_ktruss_k4_cascade_deeper_than_unroll(spark):
    """k=4 on the LIVE sf0.001 support-cut graph peels for 5 rounds
    (2324 → 2048 → 1997 → 1973 → 1968 → 1966, measured) — deeper
    than the k=3 unroll KTRUSS_PEELS=4. The fixed form at 4 rounds
    provably UNDER-PEELS (ships 1968 edges, 2 of them not in the
    true truss); the converged twin reaches the real fixpoint — the
    silent-under-convergence case the fixpoint form exists for, on
    real data rather than a planted toy."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        ktruss_edges,
        ktruss_edges_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r17 import KTRUSS_PEELS

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    edges = pairs.select("part_a", "part_b").localCheckpoint(eager=True)
    under = ktruss_edges(edges, 4, KTRUSS_PEELS).count()
    conv = ktruss_edges_converged(edges, 4).count()
    assert conv == 1966
    assert under > conv  # the fixed unroll stops mid-cascade


def test_ktruss_fail_loud_guards(spark):
    from tradesignal_mtm_runner_spark.operators.graph import (
        ktruss_edges,
        ktruss_edges_converged,
    )

    g = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    with pytest.raises(ValueError, match="k must be >= 3"):
        ktruss_edges(g, 2, 1)
    with pytest.raises(ValueError, match="peels must be >= 1"):
        ktruss_edges(g, 3, 0)
    n = 24
    strip = _edges(
        spark,
        [(i, i + 1) for i in range(1, n)] + [(i, i + 2) for i in range(1, n - 1)],
    )
    with pytest.raises(RuntimeError, match="no fixpoint within"):
        ktruss_edges_converged(strip, 4, max_peels=2)


def test_ktruss_from_index_matches_live(spark):
    """Standing-index probe parity: same kernel over the persisted
    edge table equals the live query's truss exactly."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        ktruss_from_index,
        write_edge_index,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r17 import (
        KTRUSS_K,
        KTRUSS_PEELS,
        copurchase_ktruss,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t17")
    spark.sql("DROP TABLE IF EXISTS t17.edges")
    spark.sql("DROP TABLE IF EXISTS t17.edges_deg")
    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    write_edge_index(pairs, "t17.edges")
    live = {
        (r["part_a"], r["part_b"]): r["truss_sup"]
        for r in copurchase_ktruss(spark, SF_SMOKE).collect()
    }
    probe = {
        (r["part_a"], r["part_b"]): r["truss_sup"]
        for r in ktruss_from_index(
            spark, "t17.edges", KTRUSS_K, KTRUSS_PEELS
        ).collect()
    }
    assert live == probe


def test_ktruss_stream_matches_live(spark):
    """B66b replay parity: the staged whole-order stream folds to the
    identical support-cut graph, so the stream twin's truss equals
    the live batch query's exactly."""
    from tradesignal_mtm_runner_spark.queries_r17 import (
        copurchase_ktruss,
        copurchase_ktruss_stream,
    )

    live = {
        (r["part_a"], r["part_b"]): r["truss_sup"]
        for r in copurchase_ktruss(spark, SF_SMOKE).collect()
    }
    streamed = {
        (r["part_a"], r["part_b"]): r["truss_sup"]
        for r in copurchase_ktruss_stream(spark, SF_SMOKE).collect()
    }
    assert live == streamed


# --- hop-plot / HyperBall ----------------------------------------------------


def test_hyperball_from_index_matches_live(spark):
    """Standing-index probe parity: the sketch kernel over the
    persisted edge table equals the live query bit-for-bit (the
    deterministic-register property extended to the probe)."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        hyperball_from_index,
        write_edge_index,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r17 import (
        HOP_T,
        copurchase_hyperball,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS t17")
    spark.sql("DROP TABLE IF EXISTS t17.hb_edges")
    spark.sql("DROP TABLE IF EXISTS t17.hb_edges_deg")
    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    write_edge_index(pairs, "t17.hb_edges")
    live = sorted(map(tuple, copurchase_hyperball(spark, SF_SMOKE).collect()))
    probe = sorted(
        map(tuple, hyperball_from_index(spark, "t17.hb_edges", HOP_T).collect())
    )
    assert live == probe


def test_reach_counts_planted_path(spark):
    """Exact neighborhood function of the 5-path: N(v, t) = the
    interval [v−t, v+t] clipped to [1, 5]."""
    from tradesignal_mtm_runner_spark.operators.graph import reach_counts

    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        (r["part"], r["hop"]): r["n_reach"]
        for r in reach_counts(path, 4).collect()
    }
    want = {
        (v, t): sum(1 for u in range(1, 6) if abs(u - v) <= t)
        for v in range(1, 6)
        for t in range(5)
    }
    assert got == want


def test_eff_diameter_planted_path(spark, tmp_path):
    """Effective diameter of the 5-path via a planted mini-corpus is
    the closed-form interpolation: per-hop reach totals are
    5/13/19/23/25, target = 0.9·25 = 22.5, bracketing hops (2, 3) →
    d_eff = 2 + (22.5 − 19)/(23 − 19) = 2.875."""
    from pyspark.sql import functions as F  # noqa: N812

    from tradesignal_mtm_runner_spark.operators.graph import reach_counts
    from tradesignal_mtm_runner_spark.queries_r17 import HOP_T

    # drive the same arithmetic the query runs, over the planted path
    # (the query's front half is the shared basket chain; the metric
    # arithmetic is what this pin grounds)
    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    per_hop = {
        r["hop"]: r["n_reach"]
        for r in reach_counts(path, HOP_T)
        .groupBy("hop")
        .agg(F.sum("n_reach").alias("n_reach"))
        .collect()
    }
    assert per_hop == {0: 5, 1: 13, 2: 19, 3: 23, 4: 25}
    target = 0.9 * 25
    t90 = min(t for t, tot in per_hop.items() if tot >= target)
    assert t90 == 3
    eff = (t90 - 1) + (target - per_hop[t90 - 1]) / (
        per_hop[t90] - per_hop[t90 - 1]
    )
    assert abs(eff - 2.875) < 1e-12


def test_eff_diameter_live_shape(spark):
    """One row, t90 within the hop horizon, eff_diameter ≤ t90 and
    consistent with the live per-hop totals."""
    from tradesignal_mtm_runner_spark.queries_r17 import (
        HOP_T,
        copurchase_eff_diameter,
    )

    rows = copurchase_eff_diameter(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r["t90"] <= HOP_T
    assert 0.0 <= r["eff_diameter"] <= float(r["t90"])
    assert r["total_reach_pairs"] > 0


def test_eff_diameter_hb_tracks_exact(spark):
    """The sketch-side effective diameter concentrates: per-node HLL
    errors are independent, so the per-hop TOTALS land far inside the
    13 % per-node bound and the interpolated diameter tracks the
    exact rollup closely (measured Δ ≤ 0.004 at sf0.001/sf0.01 with
    the same bracketing hop)."""
    from tradesignal_mtm_runner_spark.queries_r17 import (
        copurchase_eff_diameter,
        copurchase_eff_diameter_hb,
    )

    ex = copurchase_eff_diameter(spark, SF_SMOKE).collect()[0]
    hb = copurchase_eff_diameter_hb(spark, SF_SMOKE).collect()[0]
    assert hb["t90"] == ex["t90"]
    assert abs(hb["eff_diameter"] - ex["eff_diameter"]) < 0.15


def test_hyperball_tolerance_vs_exact(spark):
    """The sketch twin tracks the exact neighborhood function within
    the m=64 HLL error bound on the live smoke graph: hop-0 balls are
    singletons (linear counting regime, tight), and overall the
    median relative error stays near the 13 % standard error — the
    B19/B21 approx-family convention, here pinned against the exact
    B68 twin instead of a SQL oracle."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        hyperball_counts,
        reach_counts,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    edges = pairs.select("part_a", "part_b").localCheckpoint(eager=True)
    exact = {
        (r["part"], r["hop"]): r["n_reach"]
        for r in reach_counts(edges, 4).collect()
    }
    est = {
        (r["part"], r["hop"]): r["est_reach"]
        for r in hyperball_counts(edges, 4).collect()
    }
    assert set(est) == set(exact)
    errs = sorted(abs(est[k] - exact[k]) / exact[k] for k in exact)
    assert errs[len(errs) // 2] < 0.25  # measured 0.154 at sf0.001
    assert errs[int(len(errs) * 0.9)] < 0.35  # measured 0.16
    for (part, hop), n in exact.items():
        if hop == 0:
            assert n == 1
            assert abs(est[(part, hop)] - 1.0) < 0.1  # linear counting


def test_hyperball_deterministic(spark):
    """Register placement rides xxhash64 — two runs agree exactly."""
    from tradesignal_mtm_runner_spark.operators.graph import hyperball_counts

    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    a = sorted(map(tuple, hyperball_counts(g, 2).collect()))
    b = sorted(map(tuple, hyperball_counts(g, 2).collect()))
    assert a == b


def test_reach_counts_monotone_and_guarded(spark):
    from tradesignal_mtm_runner_spark.operators.graph import (
        hyperball_counts,
        reach_counts,
    )

    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    rows = {
        (r["part"], r["hop"]): r["n_reach"]
        for r in reach_counts(g, 3).collect()
    }
    for v in (1, 2, 3, 4):
        for t in range(3):
            assert rows[(v, t)] <= rows[(v, t + 1)]  # balls only grow
    with pytest.raises(ValueError, match="hops must be >= 1"):
        reach_counts(g, 0)
    with pytest.raises(ValueError, match="hops must be >= 1"):
        hyperball_counts(g, 0)


# --- ann_recall_eval ---------------------------------------------------------


def test_ann_recall_eval_cross_check(spark):
    """The eval relation must agree with an INDEPENDENT join of the
    family's own exact and IVF query paths (same constants), and its
    per-query recalls must be consistent: 0 ≤ recall = n_hits /
    n_exact ≤ 1 with one row per probe query."""
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        ANN_QUERIES,
        ANN_TOPK,
        ann_cosine_topk,
        ann_ivf_topk,
    )
    from tradesignal_mtm_runner_spark.queries_r17 import ann_recall_eval

    rows = ann_recall_eval(spark, SF_SMOKE).collect()
    assert len(rows) == ANN_QUERIES
    for r in rows:
        assert r["n_exact"] == ANN_TOPK
        assert 0 <= r["n_hits"] <= ANN_TOPK
        assert abs(r["recall"] - r["n_hits"] / ANN_TOPK) < 1e-9

    exact = {
        (r["query_id"], r["corpus_id"])
        for r in ann_cosine_topk(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["query_id"], r["corpus_id"])
        for r in ann_ivf_topk(spark, SF_SMOKE).collect()
    }
    want = {}
    for q, c in exact:
        want[q] = want.get(q, 0) + ((q, c) in approx)
    got = {r["query_id"]: r["n_hits"] for r in rows}
    assert got == {q: want.get(q, 0) for q in got}


# --- events_changepoint ------------------------------------------------------


def _write_events(tmp_path, rows):
    import pandas as pd

    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df.to_parquet(os.path.join(str(tmp_path), "events.parquet"), index=False)
    return str(tmp_path)


def test_events_changepoint_planted_step(spark, tmp_path):
    """A clean balanced step (15 days at 5 events, 15 at 20) must be
    flagged: the diff-median noise scale is 0 → floored to 1.0, so
    the step day scores |20 − 5| / 1 = 15. The level-MAD scale would
    read 7.5 and score 2.0 — BELOW threshold — which is exactly the
    muting the diff-median design avoids; the pinned values prove
    the discriminating case."""
    from tradesignal_mtm_runner_spark.queries_r17 import (
        CP_THRESH,
        events_changepoint,
    )

    rows = []
    eid = 0
    for d in range(30):
        n = 5 if d < 15 else 20
        for j in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1 + d, 8, 0, j),
                    j,
                    "step",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    sf_dir = _write_events(tmp_path, rows)
    got = {
        r["day"].day: r for r in events_changepoint(spark, sf_dir).collect()
    }
    # full two-sided windows exist for days 8..24 (1-indexed days)
    assert sorted(got) == list(range(8, 25))
    step = got[16]  # left = days 9..15 (all 5), right = days 16..22 (all 20)
    assert step["left_mean"] == 5.0
    assert step["right_mean"] == 20.0
    assert step["score"] == 15.0
    assert bool(step["is_changepoint"])
    quiet = got[8]  # both windows fully pre-step
    assert quiet["score"] == 0.0
    assert not quiet["is_changepoint"]
    assert CP_THRESH < 15.0


def test_events_stream_changepoint_matches_live(spark):
    """B67b replay parity: daily counts are additive over any event
    slicing, so the folded stream relation equals the batch relation
    and the detector outputs match exactly."""
    from tradesignal_mtm_runner_spark.queries_r17 import (
        events_changepoint,
        events_stream_changepoint,
    )

    key = lambda r: (r["event_type"], r["day"])  # noqa: E731
    live = {key(r): tuple(r) for r in events_changepoint(spark, SF_SMOKE).collect()}
    streamed = {
        key(r): tuple(r)
        for r in events_stream_changepoint(spark, SF_SMOKE).collect()
    }
    assert live == streamed


def test_events_changepoint_flat_series_never_flags(spark, tmp_path):
    """A constant series scores 0 everywhere (and the diff-median
    floor never manufactures a flag)."""
    from tradesignal_mtm_runner_spark.queries_r17 import events_changepoint

    rows = []
    eid = 0
    for d in range(20):
        for j in range(7):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 2, 1 + d, 9, 0, j),
                    j,
                    "flat",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    sf_dir = _write_events(tmp_path, rows)
    out = events_changepoint(spark, sf_dir).collect()
    assert out  # full windows exist
    assert all(r["score"] == 0.0 for r in out)
    assert not any(r["is_changepoint"] for r in out)
