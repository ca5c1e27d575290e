"""Round-14 pins: k-core decomposition over the co-purchase graph
(B56). Oracle equality runs in tests/test_queries_oracle.py via the
registry; here we pin the SEMANTIC claims the fixed unroll rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_kcore_converged_at_fixed_peels(spark):
    """KCORE_PEELS simultaneous-peel rounds must be ENOUGH: one more
    round may not change the membership or the in-core degrees
    (otherwise the Spark loop and the fixed SQL unroll are both
    under-iterated — they'd still agree with each other, which is
    exactly why convergence needs its own pin)."""
    from tradesignal_mtm_runner_spark.operators.graph import kcore_members
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r14 import KCORE_K, KCORE_PEELS

    _, pairs = _basket_pair_counts(spark, SF_SMOKE)
    edges = pairs.select("part_a", "part_b")
    a = (
        kcore_members(edges, KCORE_K, KCORE_PEELS)
        .toPandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    b = (
        kcore_members(edges, KCORE_K, KCORE_PEELS + 1)
        .toPandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    assert len(a) > 0  # vacuous convergence would pin nothing
    assert (a["part"].values == b["part"].values).all()
    assert (a["core_deg"].values == b["core_deg"].values).all()
    # every member holds the defining property: in-core degree >= k
    assert int(a["core_deg"].min()) >= KCORE_K


def test_kcore_planted_graph(spark, tmp_path):
    """B56 semantics on a planted graph: a 4-cycle (every adjacent
    pair co-purchased twice — past the support cut) is a 2-core where
    each member has in-core degree exactly 2; a pendant 3-node chain
    peels away completely (leaf 10 drops round 1, exposing 11, then
    12 — the iterated peel, not a one-shot degree filter)."""
    from tradesignal_mtm_runner_spark.queries_r14 import copurchase_kcore

    rows = []
    oid = 0
    for a, b in ((1, 2), (2, 3), (3, 4), (1, 4)):  # the ring
        for _ in range(2):
            oid += 1
            rows += [(oid, a), (oid, b)]
    for a, b in ((10, 11), (11, 12)):  # the pendant chain
        for _ in range(2):
            oid += 1
            rows += [(oid, a), (oid, b)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        r["part"]: r["core_deg"]
        for r in copurchase_kcore(spark, str(tmp_path)).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_plan_shape(spark):
    """Plan pins: graph-sized equi-joins only (no cartesian), and no
    explicit broadcast hints (the family bounded-dims-only
    convention — AQE decides from measured sizes)."""
    from tradesignal_mtm_runner_spark import plans as P
    from tradesignal_mtm_runner_spark.queries_r14 import copurchase_kcore

    df = copurchase_kcore(spark, SF_SMOKE)
    plan = P.explain_str(df)
    assert "CartesianProduct" not in plan
    assert P.broadcast_hint_count(df) == 0


def test_kcore_stream_replay_equals_batch_and_retry_idempotent(spark):
    """B56b pins: (1) the staged whole-order replay folds to the SAME
    k-core as the batch query (stream == batch — the oracle equality
    is also enforced via the registry at sf0.001); (2) a RETRIED
    micro-batch overwrites its batch_id-derived partials with
    byte-identical content instead of double-counting (the C67
    exactly-once convention)."""
    import os

    from tests.conftest import assert_frames_match
    from tradesignal_mtm_runner_spark.cache_registry import tracked_mkdtemp
    from tradesignal_mtm_runner_spark.queries_r14 import (
        copurchase_kcore,
        copurchase_kcore_stream,
        kcore_stream_batch,
    )
    from tradesignal_mtm_runner_spark.sources import load_table

    got = copurchase_kcore_stream(spark, SF_SMOKE)
    want = copurchase_kcore(spark, SF_SMOKE)
    assert_frames_match(got.toPandas(), want.toPandas(), "kcore_stream_vs_batch")

    # retry: run the same handler twice with the same batch_id — the
    # fold must count the batch ONCE
    items = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_partkey").cast("long").alias("l_partkey"),
    )
    root = tracked_mkdtemp("kcore_retry_")
    handler = kcore_stream_batch(root)
    handler(items, 0)
    once = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("part_a long, part_b long, pair_cnt long")
        .parquet(root)
        .agg(F.sum("pair_cnt").alias("t"))
        .collect()[0]["t"]
    )
    handler(items, 0)  # the retry
    twice = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("part_a long, part_b long, pair_cnt long")
        .parquet(root)
        .agg(F.sum("pair_cnt").alias("t"))
        .collect()[0]["t"]
    )
    assert once == twice
    assert os.path.isdir(os.path.join(root, "b00000"))


def test_kcore_matches_python_reference_on_random_graphs(spark):
    """Semantic pin beyond the SQL oracle (which unrolls the SAME
    rounds and so cannot catch an algorithmic error shared by both
    sides): on seeded random graphs, the distributed simultaneous
    peel at enough rounds must equal a trivially-correct sequential
    Python peel — the true k-core by definition."""
    import random

    from tradesignal_mtm_runner_spark.operators.graph import kcore_members

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(40, 160))
            }
        )
        k = rng.randint(2, 4)

        # sequential reference peel
        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        alive = {v for v in adj if adj[v]}
        depth = 0
        while True:
            drop = {v for v in alive if sum(1 for u in adj[v] if u in alive) < k}
            if not drop:
                break
            alive -= drop
            depth += 1
        want = {
            v: sum(1 for u in adj[v] if u in alive) for v in sorted(alive)
        }

        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "part_a long, part_b long"
        )
        # the reference's measured peel depth + spare rounds suffices
        # (each localCheckpoint round is a Spark job — keep it bounded)
        got = {
            r["part"]: r["core_deg"]
            for r in kcore_members(df, k, peels=depth + 2).collect()
        }
        assert got == want, f"seed={seed} k={k} depth={depth}"


def test_kcore_rejects_zero_peels(spark):
    """peels < 1 must fail with a clear error, not an unresolved-
    column AnalysisException from the un-run loop (review r14)."""
    import pytest

    from tradesignal_mtm_runner_spark.operators.graph import kcore_members

    edges = spark.createDataFrame([(1, 2)], "part_a long, part_b long")
    with pytest.raises(ValueError, match="peels"):
        kcore_members(edges, 2, peels=0)


def test_triangles_and_pagerank_match_python_reference_on_random_graphs(
    spark,
):
    """Independent-reference pins for the other two graph kernels on
    seeded random graphs. Triangles already has an algorithm-diverse
    oracle (a<b<c self-join), but random graphs exercise the
    degree-TIE orientation paths a planted K4 never hits; PageRank's
    oracle unrolls the same iteration, so — like k-core — only an
    independent implementation can catch a shared algorithmic error.
    The Python PageRank mirrors the per-iteration 9-dp rounding
    loosely (tolerance compare; the pin is the fixed point's value,
    not the rounding mechanics)."""
    import random

    from tradesignal_mtm_runner_spark.operators.graph import (
        node_degrees,
        pagerank_scores,
        triangle_counts,
    )

    for seed in (5, 17):
        rng = random.Random(seed)
        n = 40
        raw = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(60, 140))
            }
        )
        edges_py = [(a, b, rng.randint(1, 5)) for a, b in raw]
        df = spark.createDataFrame(
            edges_py, "part_a long, part_b long, pair_cnt long"
        )
        deg = node_degrees(df)

        # --- triangles: reference = brute-force closed-wedge count
        adj = {}
        for a, b, _ in edges_py:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want_tri: dict[int, int] = {}
        for a, b in raw:
            for c in adj[a] & adj[b]:
                for v in (a, b, c):
                    want_tri[v] = want_tri.get(v, 0) + 1
        # each triangle found 3 times (once per edge) above
        want_tri = {v: c // 3 for v, c in want_tri.items() if c // 3 > 0}
        got_tri = {
            r["part"]: r["n_triangles"]
            for r in triangle_counts(df, deg.select("pk", "deg")).collect()
        }
        assert got_tri == want_tri, f"seed={seed}"

        # --- pagerank: reference = dense weighted power iteration
        from tradesignal_mtm_runner_spark.queries_r10b import (
            PR_DAMP,
            PR_ITERS,
        )

        wdeg: dict[int, float] = {}
        for a, b, w in edges_py:
            wdeg[a] = wdeg.get(a, 0) + w
            wdeg[b] = wdeg.get(b, 0) + w
        nodes = sorted(wdeg)
        nn = len(nodes)
        rank = {v: 1.0 / nn for v in nodes}
        for _ in range(PR_ITERS):
            mass = {v: 0.0 for v in nodes}
            for a, b, w in edges_py:
                mass[b] += rank[a] * w / wdeg[a]
                mass[a] += rank[b] * w / wdeg[b]
            rank = {
                v: (1 - PR_DAMP) / nn + PR_DAMP * mass[v] for v in nodes
            }
        got_pr = {
            r["p_partkey"]: r["pagerank"]
            for r in pagerank_scores(
                df, deg.select("pk", "wdeg"), PR_DAMP, PR_ITERS
            ).collect()
        }
        assert set(got_pr) == set(rank)
        for v in nodes:
            assert abs(got_pr[v] - rank[v]) < 1e-6, f"seed={seed} node={v}"
