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


def test_embedding_element_type_drift(spark, tmp_path):
    """The embeddings column has the same encoding-drift exposure as
    the timestamp columns: a regeneration could switch list<float> to
    list<double>. The ANN queries must produce identical results for
    both (the operators cast to array<double> at the boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (30, 8))
    dirs = {}
    for label, typ in [("f32", pa.float32()), ("f64", pa.float64())]:
        d = tmp_path / label
        d.mkdir()
        table = pa.table(
            {
                "vec_id": pa.array(range(30), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], type=pa.list_(typ)
                ),
                "label": pa.array([i % 3 for i in range(30)], type=pa.int32()),
            }
        )
        pq.write_table(table, str(d / "embeddings.parquet"))
        dirs[label] = str(d)

    from tradesignal_mtm_runner_spark.queries_pipeline import ann_cosine_topk

    outs = {}
    for label, d in dirs.items():
        pdf = (
            ann_cosine_topk(spark, d)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        outs[label] = pdf
    a, b = outs["f32"], outs["f64"]
    assert len(a) == len(b) > 0
    assert (a["corpus_id"].values == b["corpus_id"].values).all()
    # f32 storage quantizes the inputs; scores agree to float32 eps
    assert np.allclose(a["cosine"].values, b["cosine"].values, atol=1e-6)
