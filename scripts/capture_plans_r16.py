"""Capture .explain("formatted") snapshots for the optimization-round
deliverable (plans/r16/<query>_{before,after}.txt).

Run: python scripts/capture_plans_r16.py before|after [query ...]
Defaults to the full touched-query list when no names are given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose plans this optimization round touches (kept in sync
#: with OPTIMIZATION_r16.md "Changes")
DEFAULT = [
    "dedup_cc_probe",
    "dedup_cc_refresh",
    "dedup_keep_best",
    "dedup_connected",
    "dedup_cluster_stats",
    "simhash_pairs",
    "copurchase_components",
    "copurchase_components_refresh",
    "copurchase_communities",
    "copurchase_pagerank",
    "copurchase_kcore",
    "copurchase_ktruss",
    "copurchase_hopplot",
    "copurchase_hyperball",
    "copurchase_eff_diameter",
    "copurchase_eff_diameter_hb",
    "embedding_pca_power",
    "embedding_pca_topk",
    "minhash_calibration",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tradesignal_mtm_runner_spark.cache_registry import release_caches
    from tradesignal_mtm_runner_spark.queries import EXTRA_QUERIES, QUERIES
    from tradesignal_mtm_runner_spark.session import get_spark

    registry = {**QUERIES, **EXTRA_QUERIES}
    spark = get_spark(app_name="capture_plans", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        release_caches()
        print(f"captured {name}_{tag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
