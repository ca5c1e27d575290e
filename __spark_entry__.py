"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship per-symbol MTM summary on sf0.001
queries()     -> name -> callable(spark, sf_dir) -> DataFrame
oracle_sql()  -> name -> DuckDB SQL equivalent (views pre-registered)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tradesignal_mtm_runner_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: signal-driven MTM summary per symbol at sf0.001."""
    return _q.q_mtm_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
