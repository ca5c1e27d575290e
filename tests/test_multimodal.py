"""Header-level media decode: the dependency-free parser must read
real container bytes (and refuse garbage) independent of the Spark
plumbing that test_queries_oracle covers end-to-end."""

from __future__ import annotations

import pytest

from tradesignal_mtm_runner_spark.operators.multimodal import (
    decode_pixels,
    parse_media_header,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
    )


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0\x00\x11\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"body" + b"\xff\xd9"


def test_png_header():
    assert parse_media_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_media_header(_png(1, 100000)) == ("png", 1, 100000)


def test_jpeg_header_walks_past_app_segments():
    assert parse_media_header(_jpeg(123, 45)) == ("jpeg", 123, 45)


def test_jpeg_progressive_sof2():
    b = bytearray(_jpeg(320, 200))
    # flip SOF0 (C0) to SOF2 (C2, progressive): still a frame header
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2
    assert parse_media_header(bytes(b)) == ("jpeg", 320, 200)


def test_gif_header_little_endian():
    assert parse_media_header(b"GIF89a" + (300).to_bytes(2, "little") + (200).to_bytes(2, "little")) == ("gif", 300, 200)


def test_garbage_and_truncated_bytes_are_null_not_error():
    assert parse_media_header(b"") == (None, None, None)
    assert parse_media_header(b"plain text payload") == (None, None, None)
    assert parse_media_header(b"\x89PNG\r\n\x1a\n tru") == (None, None, None)
    # truncated JPEG: recognized container, unknown dims
    assert parse_media_header(b"\xff\xd8\xff\xe0\x00\x10JF") == ("jpeg", None, None)


def test_pixel_decode_remains_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_pixels(_png(2, 2), "image")
