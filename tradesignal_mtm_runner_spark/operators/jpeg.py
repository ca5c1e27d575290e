"""Baseline-sequential JPEG codec, pure stdlib + numpy.

Second rung of the multimodal pixel ladder (after the PNG codec in
``multimodal.py``): real byte-level encode/decode for ITU T.81
baseline DCT JPEGs — marker segment walk, canonical Huffman coding,
differential-DC / run-length-AC entropy coding, dequantization, 8x8
inverse DCT, chroma upsampling and YCbCr->RGB — with no codec library.
The container tooling cannot assume PIL ships on executors, and the
synthetic-payload tests need an encoder whose output is analytically
predictable.

Scope (and honest limits): baseline sequential (SOF0) only, 8-bit
precision, grayscale or 3-component YCbCr with arbitrary sampling
factors (4:4:4 and 4:2:0 are the tested shapes), DRI/RSTn restart
markers. Progressive (SOF2), arithmetic coding, and 12-bit input
raise ValueError — loudly, not wrongly.

Exactness contract the tests lean on: with all-ones quantization
tables, a block whose pixels are CONSTANT has a single nonzero DCT
coefficient (the DC term, an exact multiple of 1/8-scale), so
block-constant grayscale images round-trip BIT-EXACTLY — that is what
lets a SQL oracle compute expected channel means with no codec. For
arbitrary content the float DCT/IDCT round trip is exact to +-2 per
sample (property-tested).

The per-image decode runs inside Arrow-batched ``mapInPandas``
workers; like the PNG path it hard-caps declared dimensions
(multimodal.MAX_DECODE_PIXELS) before allocating anything, because
payloads at 100 TB are untrusted crawl bytes.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables (ITU T.81 Annex K: the standard luminance Huffman
# tables, public spec constants used by virtually every encoder).

#: zig-zag scan order: index = zigzag position, value = row*8+col
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.3.1 — luminance DC: (bits per code length 1..16, symbols)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

#: Annex K.3.2 — luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: forward F = T @ x @ T.T,
    inverse x = T.T @ F @ T."""
    n = np.arange(8)
    k = n[:, None]
    t = np.cos((2 * n[None, :] + 1) * k * np.pi / 16) / 2.0
    t[0, :] /= np.sqrt(2.0)
    return t


_T = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical JPEG Huffman table."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for decoding."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# Bit IO


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Pad to a byte boundary and emit RSTn (raw, not stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + n % 8])


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at any marker
    and exposes it (RSTn handling is the caller's job)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("truncated entropy data")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated entropy data")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker terminates the entropy segment
                self.marker = nxt
                raise _AtMarker()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip pad bits up to the next marker; return the marker byte."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.buf):
            if self.buf[self.pos] == 0xFF and self.buf[self.pos + 1] != 0x00:
                m = self.buf[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        raise ValueError("no marker found")


class _AtMarker(Exception):
    pass


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) encoding of a signed coefficient."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------------------
# Encoder


def _encode_block(
    w: _BitWriter,
    coefs: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - prev_dc)
    w.write(*dc_codes[size])
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            w.write(*ac_codes[0x00])  # EOB
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        size, bits = _magnitude(v)
        w.write(*ac_codes[(run << 4) | size])
        w.write(bits, size)
        run = 0
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _pad_edge(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(n_by, n_bx, 8, 8) float DCT coefficients, all-ones quant."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    coefs = np.zeros((h // 8, w // 8, 8, 8))
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coefs[by, bx] = np.round(_T @ blk @ _T.T)
    return coefs


def _headers(
    h: int, w: int, comps: list[tuple[int, int, int]], restart_interval: int = 0
) -> bytes:
    """SOI..SOS header bytes. comps: (comp_id, h_samp, v_samp)."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # table 0, all ones
    if restart_interval:
        dqt += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sof_body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes([len(comps)])
    for cid, hs, vs in comps:
        sof_body += bytes([cid, (hs << 4) | vs, 0])
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    dht += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos_body = bytes([len(comps)])
    for cid, _hs, _vs in comps:
        sos_body += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos_body += bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + dqt
        + _seg(0xC0, sof_body)
        + dht
        + _seg(0xDA, sos_body)
    )


def encode_jpeg_gray(pixels: np.ndarray, restart_interval: int = 0) -> bytes:
    """(h, w) uint8 -> complete baseline grayscale JPEG. All-ones
    quantization, so block-constant inputs round-trip bit-exactly.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path)."""
    h, w = pixels.shape
    plane = _pad_edge(pixels, -(-h // 8) * 8, -(-w // 8) * 8)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev = 0
    n_mcu = 0
    n_rst = 0
    coefs = _plane_blocks(plane)
    for by in range(coefs.shape[0]):
        for bx in range(coefs.shape[1]):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.restart(n_rst)
                n_rst += 1
                prev = 0
            prev = _encode_block(bw, coefs[by, bx], prev, dc_codes, ac_codes)
            n_mcu += 1
    return (
        _headers(h, w, [(1, 1, 1)], restart_interval)
        + bw.flush()
        + b"\xff\xd9"
    )


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def encode_jpeg_rgb(pixels: np.ndarray, subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 -> baseline YCbCr JPEG, 4:4:4 (default) or
    4:2:0 (``subsample=True``; chroma = 2x2 box mean). Lossy by +-2
    per sample from the color transform + DCT rounding (4:4:4) —
    property-tested, not oracle-exact; the oracle-exact path is
    grayscale."""
    h, w, _ = pixels.shape
    ycc = _rgb_to_ycbcr(pixels)
    hs, vs = (2, 2) if subsample else (1, 1)
    mcu_h, mcu_w = 8 * vs, 8 * hs
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    y = _pad_edge(ycc[..., 0], ph, pw)
    cb = _pad_edge(ycc[..., 1], ph, pw)
    cr = _pad_edge(ycc[..., 2], ph, pw)
    if subsample:
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)).round()
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)).round()
    planes = [
        (_plane_blocks(y), hs, vs),
        (_plane_blocks(cb), 1, 1),
        (_plane_blocks(cr), 1, 1),
    ]
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev = [0, 0, 0]
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            for ci, (coefs, chs, cvs) in enumerate(planes):
                for v in range(cvs):
                    for u in range(chs):
                        prev[ci] = _encode_block(
                            bw,
                            coefs[my * cvs + v, mx * chs + u],
                            prev[ci],
                            dc_codes,
                            ac_codes,
                        )
    comps = [(1, hs, vs), (2, 1, 1), (3, 1, 1)]
    return _headers(h, w, comps) + bw.flush() + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg(payload: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 (grayscale replicated to 3
    channels). Marker walk, Huffman entropy decode, dequantize, IDCT,
    chroma upsample, YCbCr->RGB. Raises ValueError on anything that
    is not well-formed baseline sequential — including declared
    dimensions above ``max_pixels`` (untrusted-input guard)."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps=[(cid, hs, vs, tq)])
    restart_interval = 0
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("expected marker")
        # spec-legal fill: any run of 0xFF may pad before the marker
        # byte (T.81 B.1.1.2) — skip to the last 0xFF of the run
        while i + 1 < len(b) and b[i + 1] == 0xFF:
            i += 1
        if i + 2 > len(b):
            raise ValueError("truncated marker")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn: standalone markers with no length field
            i += 2
            continue
        if i + 4 > len(b):
            raise ValueError("truncated segment header")
        ln = int.from_bytes(b[i + 2 : i + 4], "big")
        if ln < 2 or i + 2 + ln > len(b):
            raise ValueError("segment length exceeds buffer")
        seg = b[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            if fh < 1 or fw < 1:
                raise ValueError("bad dimensions")
            if max_pixels is not None and fh * fw > max_pixels:
                raise ValueError(f"image too large: {fw}x{fh}")
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, sf, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sf >> 4, sf & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            return _decode_scan(
                b, i + 2 + ln, seg, frame, qt, huff, restart_interval
            )
        # APPn / COM / others: skip
        i += 2 + ln
    raise ValueError("no scan data")


def _decode_scan(
    b: bytes,
    pos: int,
    sos: bytes,
    frame: tuple,
    qt: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict[tuple[int, int], int]],
    restart_interval: int,
) -> np.ndarray:
    fh, fw, comps = frame
    ns = sos[0]
    if ns != len(comps):
        raise ValueError("partial scans not supported")
    tables = {}
    for c in range(ns):
        cid, tsel = sos[1 + 2 * c], sos[2 + 2 * c]
        tables[cid] = (tsel >> 4, tsel & 0x0F)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-fw // mcu_w), -(-fh // mcu_h)
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8))
    r = _BitReader(b, pos)
    prev_dc = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                m = r.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected restart marker")
                prev_dc = {cid: 0 for cid, *_ in comps}
            try:
                for cid, hs, vs, tq in comps:
                    dct, act = tables[cid]
                    dc_tab = huff.get((0, dct))
                    ac_tab = huff.get((1, act))
                    if dc_tab is None or ac_tab is None:
                        raise ValueError("missing Huffman table")
                    q = qt.get(tq)
                    if q is None:
                        raise ValueError("missing quant table")
                    for v in range(vs):
                        for u in range(hs):
                            blk = _decode_block(r, dc_tab, ac_tab)
                            prev_dc[cid] += int(blk.reshape(64)[0])
                            zz = blk.copy().reshape(64)
                            zz[0] = prev_dc[cid]
                            deq = np.zeros(64)
                            deq[ZIGZAG] = zz * q.reshape(64)[ZIGZAG]
                            px = _T.T @ deq.reshape(8, 8) @ _T + 128.0
                            planes[cid][
                                (my * vs + v) * 8 : (my * vs + v) * 8 + 8,
                                (mx * hs + u) * 8 : (mx * hs + u) * 8 + 8,
                            ] = px
            except _AtMarker as exc:
                raise ValueError("entropy data ended early") from exc
            n_mcu += 1
    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            if vmax % vs or hmax % hs:
                # np.repeat with integer division would silently emit
                # wrongly-sized planes for non-integer ratios
                raise ValueError(
                    f"non-integer sampling ratio {hmax}/{hs} x {vmax}/{vs}"
                )
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r_, g_, b_], axis=-1)), 0, 255
    ).astype(np.uint8)


def _decode_block(
    r: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
) -> np.ndarray:
    """One block in zig-zag order; [0] holds the DC DIFF (caller
    accumulates the predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    size = _read_symbol(r, dc_tab)
    zz[0] = _extend(r.bits(size), size) if size else 0
    k = 1
    while k < 64:
        sym = _read_symbol(r, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k >= 64:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(r.bits(size), size)
        k += 1
    return zz.reshape(8, 8)
