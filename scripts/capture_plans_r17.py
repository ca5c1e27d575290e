"""Capture .explain("formatted") snapshots for the optimization-round
deliverable (plans/r17/<query>_{before,after}.txt).

Run: python scripts/capture_plans_r17.py before|after [query ...]
Defaults to the full touched-query list when no names are given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose plans this optimization round touches (kept in sync
#: with OPTIMIZATION_r17.md "Changes")
DEFAULT = [
    # r17 item 1: work-size-capped media fan-out
    "multimodal_pixels",
    "multimodal_gif",
    "multimodal_audio",
    "multimodal_frames",
    "multimodal_mpeg1",
    "multimodal_resize",
    "image_dhash",
    "image_dhash_pairs",
    "audio_fingerprint",
    "audio_fp_pairs",
    # r17 item 3: batch-sized stage width in the components refresh
    "copurchase_components_refresh",
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
        "plans", "r17",
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
