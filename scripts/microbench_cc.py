"""Measurement harness (optimization r16, guide §1): decompose the
connected_canonical cost seen in profile_dedup (sig+pairs 6.3 s vs
sig+pairs+cc3 20.0 s at sf0.1) and compare variants on the SAME
pre-materialized pair relation. Not part of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def cc_union_form(
    ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id", iters: int = 3
) -> DataFrame:
    """Variant: per iteration ONE join + ONE union + ONE aggregate
    (labels_next = min over {own label} ∪ {neighbors' labels}) instead
    of join + aggregate + left-join."""
    from tradesignal_mtm_runner_spark.cache_registry import persist_tracked

    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = persist_tracked(
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    )
    labels = ids.select(F.col(id_col), F.col(id_col).alias("lab"))
    for _ in range(iters):
        nbr = edges.join(
            labels.select(F.col(id_col).alias("dst"), "lab"), "dst"
        ).select(F.col("src").alias(id_col), "lab")
        labels = persist_tracked(
            labels.unionByName(nbr).groupBy(id_col).agg(F.min("lab").alias("lab"))
        )
    return labels.select(
        F.col(id_col),
        F.col("lab").alias("canonical_id"),
        (F.col(id_col) == F.col("lab")).alias("keep"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tradesignal_mtm_runner_spark.cache_registry import release_caches
    from tradesignal_mtm_runner_spark.operators.dedup import (
        connected_canonical,
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tradesignal_mtm_runner_spark.operators.graph import cut_lineage
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        DEDUP_CC_ITERS,
        SIMHASH_MAX_BUCKET,
        SIMHASH_MAX_HAMMING,
        _docs,
    )
    from tradesignal_mtm_runner_spark.session import get_spark

    spark = get_spark(
        app_name="microbench_cc",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    d = _docs(spark, sf_dir)

    # PRE-MATERIALIZE the inputs once so every variant times ONLY the
    # CC loop (localCheckpoint = executor-local blocks)
    sig0 = simhash_signatures(d)
    pairs_m = cut_lineage(
        simhash_near_dup_pairs(
            sig0, max_hamming=SIMHASH_MAX_HAMMING, max_bucket=SIMHASH_MAX_BUCKET
        )
    )
    ids_m = cut_lineage(sig0.select("doc_id"))
    release_caches()
    print(f"inputs: {pairs_m.count()} pairs, {ids_m.count()} ids", flush=True)

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

    t(
        "cc3 current (persist/iter)",
        lambda: connected_canonical(ids_m, pairs_m, iters=DEDUP_CC_ITERS),
    )
    t(
        "cc3 union+groupBy form",
        lambda: cc_union_form(ids_m, pairs_m, iters=DEDUP_CC_ITERS),
    )

    # parity
    a = connected_canonical(ids_m, pairs_m, iters=DEDUP_CC_ITERS)
    b = cc_union_form(ids_m, pairs_m, iters=DEDUP_CC_ITERS)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"parity union-form: symmetric-difference rows = {diff}", flush=True)
    release_caches()

    # and the full in-query shape: sig persisted, everything live
    from tradesignal_mtm_runner_spark.cache_registry import persist_tracked

    def full_chain(cc_fn):
        sig = persist_tracked(simhash_signatures(d))
        pairs = simhash_near_dup_pairs(
            sig, max_hamming=SIMHASH_MAX_HAMMING, max_bucket=SIMHASH_MAX_BUCKET
        )
        return cc_fn(sig.select("doc_id"), pairs)

    t(
        "FULL sig+pairs+cc3 current",
        lambda: full_chain(
            lambda i, p: connected_canonical(i, p, iters=DEDUP_CC_ITERS)
        ),
    )
    t(
        "FULL sig+pairs+cc3 union form",
        lambda: full_chain(
            lambda i, p: cc_union_form(i, p, iters=DEDUP_CC_ITERS)
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
