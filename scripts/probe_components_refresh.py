"""Isolated A/B probe for the index_probe_components bench key
(VERDICT r16 item 3): replicate bench.py's build + probe exactly,
time the probe best-of-3 with the noop sink, and report job/stage
counts so the stage-width claim is checkable.

Run: SPARK_GRAFT_CPUS=32 python scripts/probe_components_refresh.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F  # noqa: N812

    from tradesignal_mtm_runner_spark.cache_registry import release_caches
    from tradesignal_mtm_runner_spark.operators.graph import (
        append_to_edge_partials,
        component_labels_converged,
        components_refresh_probe,
        edges_from_partials,
        write_component_labels,
        write_edge_partials,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import BASKET_MIN_SUP
    from tradesignal_mtm_runner_spark.session import get_spark
    from tradesignal_mtm_runner_spark.sinks import write_bucketed
    from tradesignal_mtm_runner_spark.sources import load_table

    spark = get_spark(app_name="probe_components", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    import shutil

    spark.sql("DROP DATABASE IF EXISTS bench_idx CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(os.path.join(wh.removeprefix("file:"), "bench_idx.db"),
                  ignore_errors=True)
    spark.sql("CREATE DATABASE bench_idx")

    PROBE_BATCH_MOD = 16
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    batch_li = li.filter(F.col("l_orderkey") % PROBE_BATCH_MOD == 0)
    write_edge_partials(
        li.filter(F.col("l_orderkey") % PROBE_BATCH_MOD != 0),
        "bench_idx.comp_partials",
    )
    base_edges = edges_from_partials(
        spark, "bench_idx.comp_partials", BASKET_MIN_SUP
    ).select("part_a", "part_b")
    write_bucketed(base_edges, "bench_idx.comp_base_edges",
                   bucket_cols=["part_a"], num_buckets=32,
                   sort_cols=["part_a", "part_b"], mode="overwrite")
    write_component_labels(
        component_labels_converged(spark.table("bench_idx.comp_base_edges")),
        "bench_idx.comp_labels",
    )
    append_to_edge_partials(batch_li, "bench_idx.comp_partials")
    spark.sql("DROP TABLE IF EXISTS bench_idx.comp_batch_items")
    batch_li.write.mode("overwrite").saveAsTable("bench_idx.comp_batch_items")
    release_caches()

    st = spark.sparkContext.statusTracker()
    best = None
    jobs0 = None
    for _ in range(3):
        j0 = max(st.getJobIdsForGroup() or [0])
        t0 = time.time()
        components_refresh_probe(
            spark,
            "bench_idx.comp_partials",
            "bench_idx.comp_base_edges",
            "bench_idx.comp_labels",
            spark.table("bench_idx.comp_batch_items"),
            BASKET_MIN_SUP,
        ).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        j1 = max(st.getJobIdsForGroup() or [0])
        if best is None or dt < best:
            best, jobs0 = dt, j1 - j0
    print(json.dumps({"cpus": int(cpus), "probe_sec_best3": best,
                      "jobs_per_probe": jobs0}))
    spark.stop()


if __name__ == "__main__":
    main()
