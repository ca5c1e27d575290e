"""Stage-level profiling of the dedup CC chain (optimization r16 §1:
measure first). Times each piece of the shared simhash -> banded-pairs
-> min-label-CC chain in isolation with the noop sink, so the heavy
queries' cost decomposes into named parts. Not part of the bench
contract — a measurement harness only.

Run: python scripts/profile_dedup.py [sf_dir]
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

    from tradesignal_mtm_runner_spark.cache_registry import release_caches
    from tradesignal_mtm_runner_spark.session import get_spark

    spark = get_spark(app_name="profile_dedup", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    from tradesignal_mtm_runner_spark.operators.dedup import (
        connected_canonical,
        simhash_cross_pairs,
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        DEDUP_CC_ITERS,
        SIMHASH_MAX_BUCKET,
        SIMHASH_MAX_HAMMING,
        _docs,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline_extras import INC_MOD

    def t(label, df):
        best = None
        for _ in range(3):
            release_caches()
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}  {label}", flush=True)
        release_caches()
        return best

    d = _docs(spark, sf_dir)

    # 1. raw scan + tokens
    from tradesignal_mtm_runner_spark.functions.text import tokens

    t("scan+tokens(size)", d.select("doc_id", F.size(tokens(F.col("text"))).alias("n")))

    # 2. signatures alone
    t("simhash_signatures", simhash_signatures(d))

    # 3. signatures -> near-dup pairs (includes hot-bucket guard)
    sig_fn = lambda: simhash_signatures(d)  # noqa: E731
    t(
        "sig+near_dup_pairs",
        simhash_near_dup_pairs(
            sig_fn(), max_hamming=SIMHASH_MAX_HAMMING,
            max_bucket=SIMHASH_MAX_BUCKET,
        ),
    )

    # 4. sig -> pairs -> CC labels (the dedup_connected core)
    def cc_chain():
        sig = sig_fn()
        pairs = simhash_near_dup_pairs(
            sig, max_hamming=SIMHASH_MAX_HAMMING, max_bucket=SIMHASH_MAX_BUCKET
        )
        return connected_canonical(sig.select("doc_id"), pairs, iters=DEDUP_CC_ITERS)

    t("sig+pairs+cc3", cc_chain())

    # 5. cross pairs on top (the probe half)
    from tradesignal_mtm_runner_spark.cache_registry import persist_tracked

    def probe_chain():
        sig = persist_tracked(sig_fn())
        base = sig.filter(F.col("doc_id") % INC_MOD != 0)
        new = sig.filter(F.col("doc_id") % INC_MOD == 0)
        return simhash_cross_pairs(
            new, base, max_hamming=SIMHASH_MAX_HAMMING,
            max_bucket=SIMHASH_MAX_BUCKET,
        )

    t("sig+cross_pairs", probe_chain())

    # 6. full queries for reference
    from tradesignal_mtm_runner_spark.queries_r10 import (
        dedup_cc_probe,
        dedup_cc_refresh,
    )
    from tradesignal_mtm_runner_spark.queries_r9 import dedup_keep_best

    t("FULL dedup_cc_probe", dedup_cc_probe(spark, sf_dir))
    t("FULL dedup_cc_refresh", dedup_cc_refresh(spark, sf_dir))
    t("FULL dedup_keep_best", dedup_keep_best(spark, sf_dir))

    spark.stop()


if __name__ == "__main__":
    main()
