"""Binned range (interval) join.

A pure range predicate (``r.ts in (l.ts+lower, l.ts+upper]``) has no
equality key, so Catalyst can only plan it as a broadcast
nested-loop / cartesian join — O(|L| x |R|), fatal at scale. The
standard fix is BINNING: quantize time into buckets at least as wide
as the interval, give every right row its bucket as a synthetic
equality key, explode every left row onto the (few) buckets its
interval can touch, hash-join on the bucket, and re-apply the exact
range predicate. Cost drops to O(|L| x buckets_per_interval + pairs
that are actually close) with an ordinary shuffled hash join — the
same trick DuckDB's IEJoin and Spark's interval-join literature use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US = 1_000_000


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_sec: float,
    upper_sec: float,
    bin_sec: float | None = None,
) -> DataFrame:
    """All (left, right) pairs with
    ``right_ts in (left_ts + lower_sec, left_ts + upper_sec]``.

    ``bin_sec`` defaults to the interval width so each right row lands
    in exactly ONE bucket and each left row probes at most two —
    widen it to trade fewer left duplicates for more post-filtering.
    Comparisons run on integer epoch microseconds, exact in both
    engines. Column name collisions are the caller's responsibility.
    """
    bin_us = int((bin_sec or max(upper_sec - lower_sec, 1e-6)) * US)
    lo_us = int(lower_sec * US)
    hi_us = int(upper_sec * US)

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    l2 = left.withColumn("_l_us", l_us).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((F.col("_l_us") + F.lit(lo_us)) / F.lit(bin_us)),
                F.floor((F.col("_l_us") + F.lit(hi_us)) / F.lit(bin_us)),
            )
        ),
    )
    r2 = right.withColumn("_r_us", r_us).withColumn(
        "_bkt", F.floor(F.col("_r_us") / F.lit(bin_us))
    )
    return (
        l2.join(r2, "_bkt")
        .filter(
            (F.col("_r_us") > F.col("_l_us") + F.lit(lo_us))
            & (F.col("_r_us") <= F.col("_l_us") + F.lit(hi_us))
        )
        .drop("_bkt", "_l_us", "_r_us")
    )
