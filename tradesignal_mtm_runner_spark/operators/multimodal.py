"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode /
feature-extract as Arrow-batched Python over ``mapInPandas`` — the
executor-parallel, no-shuffle shape. Everything Spark-side here
(schema, partitioning, batch iteration, UDF signature) is real and
tested; only the codec step is stubbed because no media libraries
ship in this container: ``decode_media`` raises ``NotImplementedError``
with the integration point, and the default feature extractor is a
deterministic byte-level fake (length + md5) that a DuckDB oracle can
reproduce bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ["image", "audio", "video"]

#: output schema of extract_features — stable driver-facing contract
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
    ]
)


def attach_payloads(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulate a multimodal asset table from ``documents``: the text
    bytes become the opaque payload; media_type cycles deterministically
    by id; metadata is a typed struct (what a real ingest would carry)."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col),
        mt.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("size_bytes"),
            (F.col(id_col) % 640 + 1).cast("int").alias("width"),
            (F.col(id_col) % 480 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str):
    """Real codec hook — plug PIL / soundfile / av here.

    Not available in this container; the Spark plumbing around it
    (attach_payloads -> mapInPandas batches) is the tested surface."""
    raise NotImplementedError(
        f"no {media_type} codec installed; integrate PIL/soundfile/pyav "
        "in decode_media and switch extract_features(feature_mode='decoded')"
    )


def extract_features(
    assets: DataFrame, feature_mode: str = "hash"
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` keeps batches columnar end-to-end and scales with
    input partitions — no shuffle. ``feature_mode='hash'`` computes
    deterministic byte features (oracle-checkable); ``'decoded'``
    routes through decode_media (raises until a codec is installed).
    """
    if feature_mode not in ("hash", "decoded"):
        raise ValueError(f"unknown feature_mode {feature_mode!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if feature_mode == "decoded":
                pdf.apply(
                    lambda r: decode_media(r["payload"], r["media_type"]), axis=1
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)
