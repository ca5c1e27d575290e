"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode /
feature-extract as Arrow-batched Python over ``mapInPandas`` — the
executor-parallel, no-shuffle shape.

The default decode path is REAL: image payloads carry genuine
PNG/JPEG container headers and ``parse_media_header`` reads the
format and pixel dimensions straight from the bytes (pure Python, no
codec libraries). Only full pixel decode (``decode_pixels``) is
stubbed behind ``NotImplementedError`` because no media codec ships
in this container; swapping it for PIL/pyav changes nothing about the
Spark plumbing around it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ["image", "audio", "video"]

_PNG_SIG_IHDR_HEX = "89504E470D0A1A0A0000000D49484452"  # signature + IHDR
_PNG_IHDR_TAIL_HEX = "0806000000"  # bit depth 8, RGBA, default methods
# SOI + APP0/JFIF (16-byte segment) + SOF0 marker with length 0x11
_JPEG_PREFIX_HEX = "FFD8FFE000104A46494600010100000100010000FFC0001108"
_JPEG_SOF_TAIL_HEX = "03012200021101031101"  # 3 components, std sampling

#: output schema of extract_features — stable driver-facing contract
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("img_format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payloads(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulate a multimodal asset table from ``documents``: media_type
    cycles deterministically by id; metadata is a typed struct (what a
    real ingest would carry). Image payloads are REAL containers —
    alternating PNG / JPEG (baseline JFIF) with the metadata's
    width x height written into the actual header bytes and the text
    bytes as body — so the decode step is a genuine byte-level parse,
    not a lookup. Audio/video payloads stay opaque bytes (no container
    synthesized), exercising the parse-miss path.
    """
    width = (F.col(id_col) % 640 + 1).cast("int")
    height = (F.col(id_col) % 480 + 1).cast("int")
    text_bytes = F.encode(F.col(text_col), "UTF-8")
    png = F.concat(
        F.unhex(F.lit(_PNG_SIG_IHDR_HEX)),
        F.unhex(F.lpad(F.hex(width), 8, "0")),
        F.unhex(F.lpad(F.hex(height), 8, "0")),
        F.unhex(F.lit(_PNG_IHDR_TAIL_HEX)),
        text_bytes,
    )
    jpeg = F.concat(
        F.unhex(F.lit(_JPEG_PREFIX_HEX)),
        F.unhex(F.lpad(F.hex(height), 4, "0")),
        F.unhex(F.lpad(F.hex(width), 4, "0")),
        F.unhex(F.lit(_JPEG_SOF_TAIL_HEX)),
        text_bytes,
        F.unhex(F.lit("FFD9")),
    )
    # media_type = MEDIA_TYPES[doc_id % 3]; image ids split PNG/JPEG by
    # doc_id % 6 (0 -> png, 3 -> jpeg) so both parsers are exercised
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = (
        F.when(F.col(id_col) % 6 == 0, png)
        .when(F.col(id_col) % 6 == 3, jpeg)
        .otherwise(text_bytes)
    )
    return docs.select(
        F.col(id_col),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("size_bytes"),
            width.alias("width"),
            height.alias("height"),
        ).alias("meta"),
    )


def parse_media_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) parsed from container header bytes.

    Pure Python, dependency-free: PNG IHDR (big-endian dims at offset
    16), JPEG SOF0-SOF15 scan (marker walk; height then width,
    big-endian), GIF87a/89a logical screen (little-endian). Returns
    (None, None, None) for anything unrecognized — never raises on
    arbitrary bytes.
    """
    b = bytes(payload)
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + seg_len
        return ("jpeg", None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    return (None, None, None)


def decode_pixels(payload: bytes, media_type: str):
    """Full pixel/sample decode hook — plug PIL / soundfile / pyav
    here. Not available in this container; header-level decode
    (parse_media_header) is the real default path."""
    raise NotImplementedError(
        f"no {media_type} codec installed; integrate PIL/soundfile/pyav "
        "in decode_pixels for pixel-level features"
    )


def extract_features(assets: DataFrame, feature_mode: str = "decoded") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` keeps batches columnar end-to-end and scales with
    input partitions — no shuffle. ``feature_mode='decoded'`` (default)
    parses real container headers per payload in addition to the byte
    features; ``'hash'`` computes byte features only (format/dims
    null); ``'pixels'`` routes through decode_pixels (raises until a
    codec is installed).
    """
    if feature_mode not in ("decoded", "hash", "pixels"):
        raise ValueError(f"unknown feature_mode {feature_mode!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if feature_mode == "pixels":
                pdf.apply(
                    lambda r: decode_pixels(r["payload"], r["media_type"]), axis=1
                )
            if feature_mode == "hash":
                parsed = [(None, None, None)] * len(pdf)
            else:
                parsed = [parse_media_header(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    # fingerprint over the UPPERCASE HEX of the bytes:
                    # equally content-addressing, and portable to SQL
                    # oracles whose md5 is VARCHAR-only (md5(hex(blob)))
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(
                            bytes(b).hex().upper().encode()
                        ).hexdigest()
                    ),
                    "img_format": pd.array(
                        [p[0] for p in parsed], dtype="string"
                    ),
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                }
            )

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)
