"""Driver-contract simulator: vanilla session, sf0.01, DuckDB oracles.

Recreates the /verify harness per .claude/skills/verify/SKILL.md.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def frames_match(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    a, b = normalize(a), normalize(b)
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    if list(a.columns) != list(b.columns):
        return f"cols {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = np.isclose(
                av.fillna(np.inf).values, bv.fillna(np.inf).values,
                rtol=0, atol=1e-9,
            ).all()
        else:
            ok = (av.fillna("<NA>").values == bv.fillna("<NA>").values).all()
        if not ok:
            return f"column {c} values mismatch"
    return None


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("driver_sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    t_start = time.time()
    # entry smoke
    try:
        rows = entrymod.entry(spark).collect()
        print(f"entry: OK rows={len(rows)}")
    except Exception:
        traceback.print_exc()
        print("entry: FAIL")
        return 1

    duck = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # SIM_KEYS=<comma-separated keys>: pre-verify SPECIFIC registry
    # keys (window or pytest-extra) under this vanilla-session harness
    # — the rotation de-risking discipline: every key headed for a
    # future window crosses this harness at sf0.01 BEFORE it rotates in
    sim_keys = os.environ.get("SIM_KEYS")
    if sim_keys:
        from tradesignal_mtm_runner_spark import queries as qreg

        want_keys = [k.strip() for k in sim_keys.split(",") if k.strip()]
        unknown = [k for k in want_keys if k not in qreg.ALL_QUERIES]
        if unknown:
            print(f"SIM_KEYS unknown: {unknown}")
            return 1
        qs = {k: qreg.ALL_QUERIES[k] for k in want_keys}
        oracles = {
            k: qreg.ALL_ORACLES[k] for k in want_keys if k in qreg.ALL_ORACLES
        }
    print(f"n_queries={len(qs)}")
    n_pass = n_rows_only = 0
    fails: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            fails.append(name)
            print(f"{name}: SPARK-ERROR {type(exc).__name__}: {exc}"[:300])
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"{name}: rows-only rows={len(got)} ({time.time()-t0:.1f}s)")
            continue
        try:
            want = duck.execute(oracles[name]).df()
        except Exception as exc:
            fails.append(name)
            print(f"{name}: ORACLE-ERROR {type(exc).__name__}: {exc}"[:300])
            continue
        err = frames_match(got, want)
        if err:
            fails.append(name)
            print(f"{name}: MISMATCH {err} ({time.time()-t0:.1f}s)")
        else:
            n_pass += 1
            print(f"{name}: ok rows={len(got)} ({time.time()-t0:.1f}s)")
    print(
        f"SUMMARY pass={n_pass} rows_only={n_rows_only} "
        f"fail={len(fails)} {fails} total={time.time()-t_start:.0f}s"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
