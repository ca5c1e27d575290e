"""Measurement harness (optimization r16, guide §1): time the fixed
unrolls vs the iterate-to-fixpoint twins of the graph kernels over
the sf0.1 support-cut co-purchase graph, and check value parity.
Not part of the bench contract.

Run AFTER the bench on an idle host: python scripts/microbench_graph_kernels.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tradesignal_mtm_runner_spark.cache_registry import (
        persist_tracked,
        release_caches,
    )
    from tradesignal_mtm_runner_spark.operators.graph import (
        community_labels,
        community_labels_converged,
        component_labels,
        component_labels_converged,
        kcore_members,
        kcore_members_converged,
        ktruss_edges,
        ktruss_edges_converged,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import _basket_pair_counts
    from tradesignal_mtm_runner_spark.queries_r14 import KCORE_K, KCORE_PEELS
    from tradesignal_mtm_runner_spark.queries_r14b import LPA_ROUNDS
    from tradesignal_mtm_runner_spark.queries_r15 import COMP_ITERS
    from tradesignal_mtm_runner_spark.queries_r17 import KTRUSS_K, KTRUSS_PEELS
    from tradesignal_mtm_runner_spark.session import get_spark

    spark = get_spark(
        app_name="microbench_graph",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t(label, mk):
        best = None
        for _ in range(3):
            release_caches()
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        release_caches()
        print(f"{best:8.3f}  {label}", flush=True)
        return best

    def edges():
        _, pairs = _basket_pair_counts(spark, sf_dir)
        return persist_tracked(pairs.select("part_a", "part_b"))

    variants = [
        ("components fixed x14", lambda: component_labels(edges(), COMP_ITERS)),
        ("components converged", lambda: component_labels_converged(edges())),
        ("kcore fixed x8", lambda: kcore_members(edges(), KCORE_K, KCORE_PEELS)),
        ("kcore converged", lambda: kcore_members_converged(edges(), KCORE_K)),
        ("lpa fixed x9", lambda: community_labels(edges(), LPA_ROUNDS)),
        ("lpa converged", lambda: community_labels_converged(edges())),
        ("ktruss fixed x4", lambda: ktruss_edges(edges(), KTRUSS_K, KTRUSS_PEELS)),
        ("ktruss converged", lambda: ktruss_edges_converged(edges(), KTRUSS_K)),
    ]
    for label, mk in variants:
        t(label, mk)

    # value parity at this SF (the pytest pins cover the small SFs)
    for name, fixed, conv in [
        (
            "components",
            lambda: component_labels(edges(), COMP_ITERS),
            lambda: component_labels_converged(edges()),
        ),
        (
            "kcore",
            lambda: kcore_members(edges(), KCORE_K, KCORE_PEELS),
            lambda: kcore_members_converged(edges(), KCORE_K),
        ),
        (
            "lpa",
            lambda: community_labels(edges(), LPA_ROUNDS),
            lambda: community_labels_converged(edges()),
        ),
        (
            "ktruss",
            lambda: ktruss_edges(edges(), KTRUSS_K, KTRUSS_PEELS),
            lambda: ktruss_edges_converged(edges(), KTRUSS_K),
        ),
    ]:
        a, b = fixed(), conv()
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"parity {name}: symmetric-difference rows = {diff}", flush=True)
        release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
