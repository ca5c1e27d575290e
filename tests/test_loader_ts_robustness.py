"""Loader contract under physical-timestamp-encoding drift.

The testdata parquet has shipped as TIMESTAMP(NANOS) (round 1-2) and as
timestamp[us] / NTZ (round 3 — which silently broke 12 operators because
the loader guard sniffed for the bigint encoding only). This pins the
contract explicitly: whatever the file stores — nanos, µs-NTZ, ms-NTZ,
or tz-aware µs — ``load_table``/``stream_table`` yield plain TIMESTAMP
(LTZ, session tz = UTC) with identical epoch values across encodings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tradesignal_mtm_runner_spark.sources import load_table, stream_table

# deterministic µs-precision instants (2024-01-01T00:00:00Z + offsets)
_EPOCH_US = [1704067200_000000 + i * 61_003_001 for i in range(50)]


def _write_events(path: str, unit: str, tz: str | None = None) -> None:
    ts = pa.array(
        [u // (1000 if unit == "ms" else 1) * (1000 if unit == "ns" else 1)
         for u in _EPOCH_US],
        type=pa.timestamp(unit, tz=tz),
    )
    table = pa.table(
        {
            "event_id": pa.array(range(len(_EPOCH_US)), type=pa.int64()),
            "ts": ts,
            "value": pa.array([float(i) for i in range(len(_EPOCH_US))]),
        }
    )
    # version 2.6 keeps ns as TIMESTAMP(NANOS) instead of coercing to µs
    pq.write_table(table, path, version="2.6", coerce_timestamps=None)


ENCODINGS = {
    "nanos": ("ns", None),      # legacy: Spark reads as bigint (nanosAsLong)
    "us_ntz": ("us", None),     # round-3 regression: TIMESTAMP_NTZ
    "ms_ntz": ("ms", None),     # same family, ms precision
    "us_ltz": ("us", "UTC"),    # tz-aware: already plain TIMESTAMP
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    dirs = {}
    for label, (unit, tz) in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"enc_{label}")
        _write_events(str(d / "events.parquet"), unit, tz)
        dirs[label] = str(d)
    return dirs


def test_load_table_normalizes_every_encoding(spark, encoded_dirs):
    epochs = {}
    for label, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"{label}: ts surfaced as {dict(df.dtypes)['ts']}"
        )
        rows = (
            df.select("event_id", F.unix_micros("ts").alias("us"))
            .orderBy("event_id")
            .collect()
        )
        epochs[label] = [r["us"] for r in rows]
    # ms files lose sub-ms precision by construction; compare at ms grain
    want_us = _EPOCH_US
    for label, got in epochs.items():
        if label == "ms_ntz":
            assert got == [u // 1000 * 1000 for u in want_us], label
        else:
            assert got == want_us, label


def test_load_table_epoch_matches_duckdb(spark, encoded_dirs):
    import duckdb

    for label, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        spark_min = df.select(F.min(F.unix_micros("ts"))).first()[0]
        duck_min = duckdb.sql(
            f"SELECT epoch_us(min(ts)) FROM read_parquet('{d}/events.parquet')"
        ).fetchone()[0]
        assert spark_min == duck_min, label


def test_stream_table_normalizes_every_encoding(spark, encoded_dirs):
    for label, d in encoded_dirs.items():
        sdf = stream_table(spark, d, "events")
        assert dict(sdf.dtypes)["ts"] == "timestamp", label
        # watermark must be legal on the normalized column (the r03
        # failure mode for every streaming query)
        sdf.withWatermark("ts", "10 minutes")


def test_generic_ntz_column_normalized_for_unknown_table(spark, tmp_path):
    # a table name with no _NANOS_TS_COLUMNS entry still gets NTZ->LTZ
    _write_events(str(tmp_path / "mystery.parquet"), "us", None)
    df = load_table(spark, str(tmp_path), "mystery")
    assert dict(df.dtypes)["ts"] == "timestamp"
