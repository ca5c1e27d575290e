from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from tradesignal_mtm_runner_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_SMOKE}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: sort columns by name, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # int width-insensitive compare
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = ""):
    a, b = normalize(spark_df), normalize(oracle_df)
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = np.isclose(
                av.fillna(np.inf).values, bv.fillna(np.inf).values, rtol=0, atol=1e-9
            ).all()
        else:
            ok = (av.fillna("<NA>").values == bv.fillna("<NA>").values).all()
        assert ok, f"{name}: column {c} mismatch\n{av.head()}\nvs\n{bv.head()}"
