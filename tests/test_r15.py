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


def test_components_converged_at_fixed_iters(spark):
    """COMP_ITERS min-label rounds must be ENOUGH on the real graph:
    one more round may not change any label (the kcore/LPA convergence
    pin applied to B62), and the iterate-to-fixpoint twin must return
    the identical labeling."""
    from tests.conftest import assert_frames_match
    from tradesignal_mtm_runner_spark.operators.graph import (
        component_labels,
        component_labels_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r15 import COMP_ITERS

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    edges = pairs.select("part_a", "part_b")
    a = component_labels(edges, COMP_ITERS).toPandas()
    b = component_labels(edges, COMP_ITERS + 1).toPandas()
    assert len(a) > 0
    assert_frames_match(a, b, "components_fixed_plus_one")
    assert_frames_match(
        component_labels_converged(edges).toPandas(),
        a,
        "components_converged_vs_fixed",
    )


def test_components_planted_and_deeper_than_fixed(spark):
    """Semantics on a planted graph: two disjoint pieces label to
    their min node; a path LONGER than COMP_ITERS hops under-labels at
    the fixed unroll (labels still split mid-path) while the converged
    form reaches the true single component — the 100×-diameter gap the
    fixpoint twin closes."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        component_labels,
        component_labels_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r15 import COMP_ITERS

    two = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "part_a long, part_b long"
    )
    got = {
        r["part"]: r["component"]
        for r in component_labels_converged(two).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    # a 40-node path: min-label needs 39 rounds to reach the far end
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "part_a long, part_b long"
    )
    fixed = component_labels(path, COMP_ITERS).select("component").distinct()
    conv = component_labels_converged(path).select("component").distinct()
    assert conv.count() == 1
    assert fixed.count() > 1  # the fixed unroll provably under-labels here


def test_communities_stream_equals_batch(spark):
    """B58b: the staged whole-order replay must fold to the SAME
    support-cut graph and therefore the SAME LPA labeling as the batch
    B58 (the oracle equality is also enforced via the registry; this
    pins it Spark-vs-Spark without DuckDB in the loop)."""
    from tests.conftest import assert_frames_match
    from tradesignal_mtm_runner_spark.queries_r14b import (
        copurchase_communities,
    )
    from tradesignal_mtm_runner_spark.queries_r15 import (
        copurchase_communities_stream,
    )

    assert_frames_match(
        copurchase_communities_stream(spark, SF_SMOKE).toPandas(),
        copurchase_communities(spark, SF_SMOKE).toPandas(),
        "communities_stream_vs_batch",
    )


def test_degree_histogram_planted(spark, tmp_path):
    """B63 semantics on planted degrees: a star with hub degree 5 and
    5 leaves of degree 1 buckets to {0: five deg-1 leaves, 2: the
    deg-5 hub} — bucket = length(bin(deg)) − 1, integer-exact."""
    from tradesignal_mtm_runner_spark.queries_r15 import (
        copurchase_degree_histogram,
    )

    rows = []
    oid = 0
    for leaf in (2, 3, 4, 5, 6):  # star around part 1, each pair 2 orders
        for _ in range(2):
            oid += 1
            rows += [(oid, 1), (oid, leaf)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        r["bucket"]: (r["min_deg"], r["max_deg"], r["n_nodes"], r["node_share"])
        for r in copurchase_degree_histogram(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (1, 1, 5, round(5 / 6, 9)),
        2: (5, 5, 1, round(1 / 6, 9)),
    }


def test_pagerank_converged(spark):
    """The converged PageRank twin: (1) on a symmetric ring the
    stationary distribution IS uniform, so the uniform start is the
    fixpoint and the loop exits on its first delta check with exactly
    1/n everywhere; (2) on the real co-purchase graph the converged
    form agrees with a LONG fixed unroll to within the tolerance;
    (3) max_iters exhaustion FAILS LOUD."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        node_degrees,
        pagerank_scores,
        pagerank_scores_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import (
        PR_DAMP,
        _basket_pair_counts,
    )

    ring = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 1)],
        "part_a long, part_b long, pair_cnt long",
    )
    wdeg = node_degrees(ring).select("pk", "wdeg")
    got = {
        r["p_partkey"]: r["pagerank"]
        for r in pagerank_scores_converged(ring, wdeg, PR_DAMP).collect()
    }
    assert got == {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    wdeg = node_degrees(pairs).select("pk", "wdeg")
    tol = 1e-7
    conv = pagerank_scores_converged(pairs, wdeg, PR_DAMP, tol=tol).toPandas()
    long_fixed = pagerank_scores(pairs, wdeg, PR_DAMP, 60).toPandas()
    merged = conv.merge(long_fixed, on="p_partkey", suffixes=("_c", "_f"))
    assert len(merged) == len(conv) > 0
    assert (merged["pagerank_c"] - merged["pagerank_f"]).abs().max() < 1e-5

    with pytest.raises(RuntimeError, match="still >="):
        pagerank_scores_converged(
            pairs, wdeg, PR_DAMP, tol=1e-12, max_iters=2
        )


def test_edge_embeddedness_planted(spark):
    """B64 kernel semantics on the triangle-plus-pendant graph
    (deg: 1→2, 2→2, 3→3, 4→1): edge (1,2) has common neighbor {3} and
    full overlap 1/(2+2−2−1)=1.0; edge (1,3) overlaps 1/(2+3−2−1)=0.5;
    the pendant edge (3,4) is a local bridge — n_common 0, overlap 0.0
    (and NOT dropped: the LEFT join keeps triangle-free edges)."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        edge_embeddedness,
        node_degrees,
    )

    edges = spark.createDataFrame(
        [(1, 2, 2), (1, 3, 2), (2, 3, 2), (3, 4, 2)],
        "part_a long, part_b long, pair_cnt long",
    )
    got = {
        (r["part_a"], r["part_b"]): (r["n_common"], r["overlap"])
        for r in edge_embeddedness(edges, node_degrees(edges)).collect()
    }
    assert got == {
        (1, 2): (1, 1.0),
        (1, 3): (1, 0.5),
        (2, 3): (1, 0.5),
        (3, 4): (0, 0.0),
    }
    # isolated-edge zero denominator: both endpoints degree 1
    iso = spark.createDataFrame(
        [(7, 8, 2)], "part_a long, part_b long, pair_cnt long"
    )
    row = edge_embeddedness(iso, node_degrees(iso)).collect()[0]
    assert (row["n_common"], row["overlap"]) == (0, 0.0)


def test_ngram_novelty_planted(spark, tmp_path):
    """C72 semantics on planted docs: doc 1 introduces its 2 distinct
    3-grams (novelty 1.0); doc 2 repeats doc 1's text verbatim
    (novelty 0.0 — the near-dup signature); doc 3 shares one 3-gram
    with doc 1 and introduces one of its own (novelty 0.5); doc 4 is
    too short for any 3-gram and keeps (0, 0, 0.0) via the LEFT
    join."""
    from tradesignal_mtm_runner_spark.queries_r15 import ngram_novelty

    docs = [
        (1, "a b c d"),        # grams: "a b c", "b c d"
        (2, "a b c d"),        # same grams, later doc_id -> 0 novel
        (3, "a b c x"),        # "a b c" seen, "b c x" novel
        (4, "a b"),            # too short: zero grams
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_distinct"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (2, 2, 1.0),
        2: (2, 0, 0.0),
        3: (2, 1, 0.5),
        4: (0, 0, 0.0),
    }


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
    # SparkContext has no public un-set for the checkpoint dir, so
    # this test mutates session state that later tests could observe;
    # gate the no-dir branch on the dir actually being unset (instead
    # of asserting it) so the test is order-independent either way
    spark.conf.set(RELIABLE_CUTS_CONF, "true")
    try:
        if sc.getCheckpointDir() is None:
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
