"""AVI (RIFF) container for MJPEG video, pure stdlib.

Upgrades the video rung of the multimodal ladder from bare
concatenated JPEG frames to a real container with an index (VERDICT
r5 item 7): RIFF 'AVI ' with an hdrl header list (avih + one video
stream's strh/strf), a movi list of '00dc' frame chunks, and an idx1
index — the classic AVI 1.0 layout per the public Microsoft RIFF/AVI
spec. Same design rules as the other codecs (wav.py shares the RIFF
chunk-walk idiom): byte-level encode/decode, strict validation,
bounds-capped for untrusted crawl payloads, and bit-exact frame round
trips so a SQL oracle can restate sampled-frame statistics in closed
form.

Scope: single video stream, MJPG fourcc, '00dc'/'00db' frame chunks,
even-byte chunk padding per RIFF. Anything else (multiple streams,
audio interleave, OpenDML extensions) raises ValueError — a declared
boundary, like the compressed-codec hook in multimodal.py.
"""

from __future__ import annotations

#: frame-count ceiling for untrusted payloads (mirrors the other
#: codecs' decode caps; each sampled frame is still pixel-capped by
#: the JPEG decoder's own MAX_DECODE_PIXELS at decode time).
MAX_FRAMES = 1 << 16


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + len(body).to_bytes(4, "little") + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads -> complete single-stream AVI: hdrl
    (avih + strl[strh 'vids'/'MJPG' + strf BITMAPINFOHEADER]), movi
    ('00dc' chunks, even-padded), idx1 (one keyframe entry per frame,
    offsets relative to the 'movi' fourcc per convention)."""
    if not frames:
        raise ValueError("no frames")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    if not (1 <= width <= 65535 and 1 <= height <= 65535):
        raise ValueError(
            f"width/height must be in [1, 65535] (rcFrame is 16-bit), "
            f"got {width}x{height}"
        )
    n = len(frames)
    max_bytes = max(len(f) for f in frames)

    avih = b"".join(
        v.to_bytes(4, "little")
        for v in (
            1_000_000 // fps,  # microseconds per frame
            max_bytes * fps,   # max bytes per second
            0,                 # padding granularity
            0x10,              # AVIF_HASINDEX
            n,                 # total frames
            0,                 # initial frames
            1,                 # streams
            max_bytes,         # suggested buffer size
            width,
            height,
            0, 0, 0, 0,        # reserved
        )
    )
    strh = (
        b"vids"
        + b"MJPG"
        + b"".join(
            v.to_bytes(4, "little")
            for v in (
                0,          # flags
                0,          # priority + language
                0,          # initial frames
                1,          # scale
                fps,        # rate (rate/scale = fps)
                0,          # start
                n,          # length (frames)
                max_bytes,  # suggested buffer size
                0xFFFFFFFF, # quality (default)
                0,          # sample size (varies per frame)
            )
        )
        + (0).to_bytes(4, "little")  # rcFrame left/top
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
    )
    strf = b"".join(
        v.to_bytes(4, "little")
        for v in (40, width, height)
    ) + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"MJPG" + b"".join(
        v.to_bytes(4, "little")
        for v in (width * height * 3, 0, 0, 0, 0)
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    offsets = []
    for f in frames:
        offsets.append(4 + len(movi_body))  # relative to 'movi' fourcc
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)

    idx1 = b"".join(
        b"00dc"
        + (0x10).to_bytes(4, "little")  # AVIIF_KEYFRAME
        + off.to_bytes(4, "little")
        + len(f).to_bytes(4, "little")
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi_mjpeg(
    payload: bytes, max_frames: int | None = MAX_FRAMES
) -> list[bytes]:
    """AVI -> list of JPEG frame payloads, in stream order. Walks the
    RIFF tree strictly: sizes validated against the buffer, '00dc'/
    '00db' chunks collected from the movi list — RECURSING into
    nested 'rec ' grouping lists (interleave convention) so their
    frames are never silently dropped — RIFF pad bytes honored, and,
    when an idx1 is present, the index's entry count cross-checked
    against the frames actually walked. Raises ValueError on
    malformed structure, non-'rec ' nested lists, or more than
    ``max_frames`` declared frames."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    declared = int.from_bytes(b[4:8], "little")
    if declared + 8 > len(b) + 1:  # +1: RIFF allows a final pad byte
        raise ValueError("RIFF size exceeds buffer")
    frames: list[bytes] = []
    idx1_entries: int | None = None

    def _walk_frames(j: int, stop: int, depth: int = 0) -> None:
        # spec-conforming writers nest 'rec ' at most once inside movi,
        # but the format admits rec-inside-rec, and ~12 bytes buys each
        # extra level — bound the depth explicitly or a few-KB payload
        # turns a ValueError contract into a RecursionError
        if depth > 4:
            raise ValueError("'rec ' lists nested deeper than 4")
        while j + 8 <= stop:
            fcc = b[j : j + 4]
            fln = int.from_bytes(b[j + 4 : j + 8], "little")
            if fln > stop - j - 8:
                raise ValueError("frame chunk exceeds movi list")
            if fcc[2:4] in (b"dc", b"db"):
                if max_frames is not None and len(frames) >= max_frames:
                    raise ValueError("too many frames")
                frames.append(b[j + 8 : j + 8 + fln])
            elif fcc == b"LIST":
                if b[j + 8 : j + 12] != b"rec ":
                    raise ValueError(
                        f"unsupported nested list {b[j + 8 : j + 12]!r} "
                        "in movi (only 'rec ' grouping lists)"
                    )
                _walk_frames(j + 12, j + 8 + fln, depth + 1)
            else:
                raise ValueError(
                    f"unsupported movi chunk {fcc!r} (single video "
                    "stream only)"
                )
            j += 8 + fln + (fln & 1)

    i = 12
    end = min(len(b), 8 + declared)
    while i + 8 <= end:
        cid = b[i : i + 4]
        ln = int.from_bytes(b[i + 4 : i + 8], "little")
        if ln > end - i - 8:
            raise ValueError("chunk size exceeds buffer")
        body_at = i + 8
        if cid == b"LIST" and b[body_at : body_at + 4] == b"movi":
            _walk_frames(body_at + 4, body_at + ln)
        elif cid == b"idx1":
            if ln % 16:
                raise ValueError("idx1 size not a multiple of 16")
            # count only FRAME entries: files using 'rec ' grouping
            # also index the lists themselves (AVIIF_LIST entries),
            # which must not skew the frame-count cross-check
            idx1_entries = sum(
                1
                for k in range(body_at, body_at + ln, 16)
                if b[k + 2 : k + 4] in (b"dc", b"db")
            )
        i = body_at + ln + (ln & 1)
    if not frames:
        raise ValueError("no video frames in movi list")
    if idx1_entries is not None and idx1_entries != len(frames):
        raise ValueError(
            f"idx1 declares {idx1_entries} frames, movi holds {len(frames)}"
        )
    return frames
