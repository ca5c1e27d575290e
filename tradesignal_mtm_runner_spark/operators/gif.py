"""GIF codec (LZW), pure stdlib + numpy.

Completes the image codec trio (``multimodal.py`` PNG, ``jpeg.py``
baseline JPEG): real byte-level encode/decode for GIF87a/89a —
logical screen descriptor, color tables, sub-block walk, and a full
variable-width LZW decompressor with dictionary growth — no codec
library. GIF is lossless indexed color, so every image round-trips
BIT-exactly (like PNG, unlike JPEG), which keeps SQL oracles fully
analytic.

Scope: single-frame, non-interlaced images with a global color
table; extension blocks (GCE, comments, application) are skipped.
Interlaced images and missing color tables raise ValueError. The
encoder emits spec-valid variable-width LZW (dictionary growth, clear
codes on overflow) so the decoder's growth path is exercised by the
round trip, not just by literals. Decode is dimension-capped before
allocation — crawl payloads are untrusted (same stance as the PNG /
JPEG / WAV decoders).
"""

from __future__ import annotations

import numpy as np

#: same executor-memory cap as the image codecs
MAX_DECODE_PIXELS = 1 << 24

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width 3..12)


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    # The code width must track the DECODER's view: the decoder grows
    # its table by one entry per consumed data code (after the first
    # following a clear) — including the encoder's final flush code,
    # which adds no encoder-side entry — and widens when that count
    # reaches 1 << width. Simulating dec_len here keeps both sides
    # bit-synchronized by construction; deriving the width from the
    # encoder's own next_code desyncs exactly when the flush lands on
    # a power-of-two boundary (found by the palette round-trip
    # property test).
    dec_len = clear + 2
    first_after_clear = True

    def emit(code: int) -> None:
        nonlocal dec_len, first_after_clear, width
        out_bits.append((code, width))
        if first_after_clear:
            first_after_clear = False
        else:
            dec_len += 1
            if dec_len >= (1 << width) and width < 12:
                width += 1

    out_bits.append((clear, width))
    buf = b""
    for ix in indices.astype(np.uint8).tobytes():
        cand = buf + bytes([ix])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code >= (1 << 12):
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
            dec_len = clear + 2
            first_after_clear = True
        buf = bytes([ix])
    if buf:
        emit(table[buf])
    out_bits.append((end, width))
    # LSB-first bit packing
    acc = 0
    nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decompress(data: bytes, min_code_size: int, max_out: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without end code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW output exceeds declared dimensions")
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1


# ---------------------------------------------------------------------------
# Container


def encode_gif_gray(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 -> complete single-frame GIF87a with a 256-entry
    grayscale global color table (palette[i] = (i, i, i)), so the
    index plane IS the gray plane and the round trip is bit-exact."""
    h, w = pixels.shape
    palette = bytes(v for i in range(256) for v in (i, i, i))
    screen = (
        w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0xF7, 0, 0])  # global table, 8-bit, 256 entries
    )
    desc = (
        bytes([_IMAGE_SEP])
        + (0).to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0])  # no local table, not interlaced
    )
    lzw = _lzw_compress(pixels.reshape(-1), 8)
    blocks = bytearray([8])  # min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += bytes([0])  # block terminator
    return (
        b"GIF87a" + screen + palette + desc + bytes(blocks) + bytes([_TRAILER])
    )


def decode_gif_rgb(
    payload: bytes, max_pixels: int | None = MAX_DECODE_PIXELS
) -> np.ndarray:
    """Single-frame GIF -> (h, w, 3) uint8 via the global color
    table. Full sub-block walk + variable-width LZW with dictionary
    growth. Raises ValueError on malformed/interlaced/oversized
    payloads."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(b) < 13:
        raise ValueError("truncated header")
    packed = b[10]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    table_size = 2 << (packed & 0x07)
    i = 13
    if i + 3 * table_size > len(b):
        raise ValueError("truncated color table")
    palette = np.frombuffer(b[i : i + 3 * table_size], np.uint8).reshape(
        table_size, 3
    )
    i += 3 * table_size
    while i < len(b):
        block = b[i]
        if block == _EXTENSION:
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == _IMAGE_SEP:
            if i + 10 > len(b):
                raise ValueError("truncated image descriptor")
            w = int.from_bytes(b[i + 5 : i + 7], "little")
            h = int.from_bytes(b[i + 7 : i + 9], "little")
            flags = b[i + 9]
            if flags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if flags & 0x80:
                raise ValueError("local color tables not supported")
            if w < 1 or h < 1:
                raise ValueError("bad dimensions")
            if max_pixels is not None and w * h > max_pixels:
                raise ValueError(f"image too large: {w}x{h}")
            i += 10
            if i >= len(b):
                raise ValueError("missing LZW data")
            min_code = b[i]
            if not 2 <= min_code <= 11:
                raise ValueError("bad LZW minimum code size")
            i += 1
            lzw = bytearray()
            while i < len(b) and b[i] != 0:
                ln = b[i]
                if i + 1 + ln > len(b):
                    raise ValueError("sub-block exceeds buffer")
                lzw += b[i + 1 : i + 1 + ln]
                i += 1 + ln
            indices = np.frombuffer(
                _lzw_decompress(bytes(lzw), min_code, w * h), np.uint8
            )
            if len(indices) != w * h:
                raise ValueError("LZW output does not match dimensions")
            if int(indices.max(initial=0)) >= table_size:
                raise ValueError("color index out of palette range")
            return palette[indices].reshape(h, w, 3)
        elif block == _TRAILER:
            break
        else:
            raise ValueError(f"unknown block 0x{block:02x}")
    raise ValueError("no image data")
