"""Measurement harness (optimization r16, guide §1): compare the
self-join form of simhash_near_dup_pairs against a capped-bucket
collect_list + row-local expansion form, and check they produce the
IDENTICAL pair relation. Not part of the bench contract.

Run AFTER the bench on an idle host: python scripts/microbench_simhash_pairs.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def near_dup_pairs_expand(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate variant: group band rows per (band, val) bucket,
    expand i<j pairs ROW-LOCALLY from the sorted member array (the
    lsh_candidate_pairs shape), hamming-filter, distinct."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        _drop_hot_buckets,
        simhash_band_rows,
    )

    bands = simhash_band_rows(signatures, id_col)
    if max_bucket is not None:
        bands = _drop_hot_buckets(bands, ["band", "val"], max_bucket)
    buckets = bands.groupBy("band", "val").agg(
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("id"),
                        F.col("simhash_hi").alias("hi"),
                        F.col("simhash_lo").alias("lo"),
                    )
                )
            )
        ).alias("_ms")
    )
    ids = F.col("_ms")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.filter(
                F.transform(
                    F.slice(ids, i + 2, F.size(ids)),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        (
                            F.bit_count(x["hi"].bitwiseXOR(y["hi"]))
                            + F.bit_count(x["lo"].bitwiseXOR(y["lo"]))
                        ).cast("long").alias("hamming"),
                    ),
                ),
                lambda p: p["hamming"] <= max_hamming,
            ),
        )
    )
    return (
        buckets.filter(F.size("_ms") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tradesignal_mtm_runner_spark.cache_registry import release_caches
    from tradesignal_mtm_runner_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        SIMHASH_MAX_BUCKET,
        SIMHASH_MAX_HAMMING,
        _docs,
    )
    from tradesignal_mtm_runner_spark.session import get_spark

    spark = get_spark(
        app_name="microbench_simhash",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    d = _docs(spark, sf_dir)

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
        "self-join form",
        lambda: simhash_near_dup_pairs(
            simhash_signatures(d),
            max_hamming=SIMHASH_MAX_HAMMING,
            max_bucket=SIMHASH_MAX_BUCKET,
        ),
    )
    t(
        "bucket-expand form",
        lambda: near_dup_pairs_expand(
            simhash_signatures(d),
            max_hamming=SIMHASH_MAX_HAMMING,
            max_bucket=SIMHASH_MAX_BUCKET,
        ),
    )

    a = simhash_near_dup_pairs(
        simhash_signatures(d),
        max_hamming=SIMHASH_MAX_HAMMING,
        max_bucket=SIMHASH_MAX_BUCKET,
    )
    b = near_dup_pairs_expand(
        simhash_signatures(d),
        max_hamming=SIMHASH_MAX_HAMMING,
        max_bucket=SIMHASH_MAX_BUCKET,
    )
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"parity: symmetric-difference rows = {diff}")
    release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
