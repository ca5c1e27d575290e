"""Z-order layout demo at sf0.1: before/after file-skip counts.

Writes the events table (sf0.1, 1M rows) three ways —
(a) unsorted ingest order, (b) linear sort on user_id,
(c) Z-order on (user_id, value) — then counts how many parquet row
groups a min-max-pruning reader skips for point/range predicates on
each dimension. Demonstrates the layout story docs/PLANS.md §layout
pins with tests: linear sort prunes one dimension perfectly and the
other not at all; the z-curve prunes both.

Run: python scripts/zorder_demo.py  (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tradesignal_mtm_runner_spark.operators.layout import (  # noqa: E402
    file_skip_stats,
    quantile_bounds,
    write_zordered,
)
from tradesignal_mtm_runner_spark.session import get_spark  # noqa: E402
from tradesignal_mtm_runner_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 32


def main() -> None:
    spark = get_spark(app_name="zorder-demo")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    uid_hi = events.agg(F.max("user_id")).first()[0]
    val_hi = events.agg(F.max("value")).first()[0]
    bounds = {"user_id": (0.0, float(uid_hi)), "value": (0.0, float(val_hi))}

    tmp = tempfile.mkdtemp(prefix="zorder_demo_")
    layouts = {}
    try:
        p = f"{tmp}/unsorted"
        events.repartition(N_FILES).write.mode("overwrite").parquet(p)
        layouts["unsorted ingest"] = p

        p = f"{tmp}/linear_uid"
        (
            events.repartitionByRange(N_FILES, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(p)
        )
        layouts["linear sort user_id"] = p

        p = f"{tmp}/zorder"
        write_zordered(events, p, ["user_id", "value"], bounds, N_FILES)
        layouts["z-order (user_id, value)"] = p

        # same curve, grid clipped to the quantile body: restores
        # resolution that value's heavy tail wastes under min/max
        p = f"{tmp}/zorder_q"
        qb = quantile_bounds(events, ["user_id", "value"])
        write_zordered(events, p, ["user_id", "value"], qb, N_FILES)
        layouts["z-order, quantile bounds"] = p

        # narrow predicates: ~1% of each dimension's range
        uid_pred = (100, 100 + max(1, int(uid_hi * 0.01)))
        val_pred = (10.0, 10.0 + val_hi * 0.01)

        print(f"# events sf0.1 ({events.count()} rows, {N_FILES} files/layout)")
        print(f"predicates: user_id BETWEEN {uid_pred[0]} AND {uid_pred[1]}; "
              f"value BETWEEN {val_pred[0]:.2f} AND {val_pred[1]:.2f}")
        print()
        print("| layout | user_id pred: skipped/total row groups | value pred: skipped/total |")
        print("|---|---|---|")
        for name, path in layouts.items():
            su, tu = file_skip_stats(path, "user_id", *uid_pred)
            sv, tv = file_skip_stats(path, "value", *val_pred)
            print(f"| {name} | {su}/{tu} | {sv}/{tv} |")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
