"""WAV / PCM audio codec, pure stdlib.

Third rung of the multimodal ladder (images: ``multimodal.py`` PNG,
``jpeg.py`` baseline JPEG): real byte-level encode/decode for RIFF
WAVE containers with integer PCM samples — the canonical uncompressed
audio interchange format. Replaces the audio ``NotImplementedError``
stub with an actual parse: chunk walk, fmt validation, and sample
extraction, so the audio column in a training corpus is real data,
not opaque bytes.

Scope: PCM (format tag 1) at 8/16/32-bit depth, any channel count
and sample rate, chunk order per spec (fmt before data, unknown
chunks skipped). Compressed formats (float, ADPCM, MP3-in-WAV…)
raise ValueError. Decode is bounds-capped like the image codecs —
payloads are untrusted crawl bytes.

Exactness contract: PCM is integer samples verbatim — encode→decode
round-trips EVERY payload bit-exactly (no transform, no float), so a
SQL oracle can state expected sample statistics in closed form for
synthesized deterministic waveforms.
"""

from __future__ import annotations

import numpy as np

#: decode ceiling: 2^26 samples x int32 ≈ 256 MB — executor-worker cap
#: for untrusted payloads (mirrors multimodal.MAX_DECODE_PIXELS).
MAX_DECODE_SAMPLES = 1 << 26

_DEPTH_DTYPE = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav_pcm(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """(n,) or (n, channels) integer array -> complete RIFF/WAVE PCM
    payload. 8-bit WAV is unsigned per spec; 16/32-bit signed LE."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    dtype = _DEPTH_DTYPE[bits]
    data = np.ascontiguousarray(samples.astype(dtype)).tobytes()
    block_align = ch * bits // 8
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav_pcm(
    payload: bytes, max_samples: int | None = MAX_DECODE_SAMPLES
) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> ((n, channels) int array, sample_rate).
    8-bit payloads return unsigned 0..255 (spec semantics); 16/32-bit
    signed. Raises ValueError on non-PCM formats, malformed chunk
    layout, or declared sizes past ``max_samples``."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    declared = int.from_bytes(b[4:8], "little")
    if declared + 8 > len(b) + 1:  # +1: spec allows a pad byte
        raise ValueError("RIFF size exceeds buffer")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        ln = int.from_bytes(b[i + 4 : i + 8], "little")
        if ln > len(b) - i - 8:
            raise ValueError("chunk length exceeds remaining buffer")
        chunk = b[i + 8 : i + 8 + ln]
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("fmt chunk too short")
            tag = int.from_bytes(chunk[0:2], "little")
            if tag != 1:
                raise ValueError(f"only integer PCM supported (tag {tag})")
            fmt = {
                "channels": int.from_bytes(chunk[2:4], "little"),
                "rate": int.from_bytes(chunk[4:8], "little"),
                "bits": int.from_bytes(chunk[14:16], "little"),
            }
        elif cid == b"data":
            data = chunk
            break  # fmt must precede data; nothing else needed after
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if fmt["channels"] < 1 or fmt["bits"] not in _DEPTH_DTYPE:
        raise ValueError(f"unsupported layout {fmt}")
    dtype = _DEPTH_DTYPE[fmt["bits"]]
    width = fmt["bits"] // 8 * fmt["channels"]
    n = len(data) // width
    if max_samples is not None and n * fmt["channels"] > max_samples:
        raise ValueError(f"too many samples: {n}x{fmt['channels']}")
    arr = np.frombuffer(data[: n * width], dtype=dtype).reshape(
        n, fmt["channels"]
    )
    return arr, fmt["rate"]


def audio_features(payload: bytes) -> dict:
    """Per-clip features over channel 0: sample count, rate, duration,
    peak |amplitude|, mean square (integer-exact), and zero crossings
    (sign-change count, zeros attach to the previous sign) — each
    mirrorable in closed-form SQL for deterministic synthetic
    waveforms."""
    arr, rate = decode_wav_pcm(payload)
    s = arr[:, 0].astype(np.int64)
    n = len(s)
    # zeros inherit the previous nonzero sign so a touch of the axis
    # is not two crossings; the implicit initial sign is positive
    nz = np.sign(s)[np.sign(s) != 0]
    ext = np.concatenate([np.ones(1, dtype=nz.dtype), nz])
    crossings = int(np.count_nonzero(ext[1:] != ext[:-1]))
    # no rounding on the float features: both engines compute an
    # exact integer sum divided by n — bit-identical IEEE doubles —
    # and rounding only risks round-half ties between engines
    return {
        "n_samples": n,
        "sample_rate": rate,
        "duration_s": n / rate if rate else 0.0,
        "peak": int(np.max(np.abs(s))) if n else 0,
        "mean_sq": float(np.mean((s * s).astype(np.float64))) if n else 0.0,
        "zero_crossings": crossings,
    }
