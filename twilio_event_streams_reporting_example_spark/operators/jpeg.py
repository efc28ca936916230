"""Dependency-free baseline JPEG codec (pure Python + numpy).

Real ITU-T.81 baseline sequential DCT JPEG written from the public
spec: SOI/DQT/SOF0/DHT/DRI/SOS/EOI markers, canonical Huffman coding
(the decoder builds its tables from the DHT segments it reads, so ANY
baseline stream with its tables inline decodes — the encoder emits
simple valid canonical tables rather than the Annex-K defaults), DC
prediction, run-length AC coding with EOB/ZRL, 0xFF byte stuffing,
restart-marker resynchronization (DRI/RSTn — byte-align, reset DC
predictors), orthonormal 8x8 DCT via a precomputed matrix, and JFIF
integer-math color transforms.

The DECODER handles generic per-component sampling factors (h, v in
1..4 with integer plane upsampling — 4:4:4, 4:2:0, 4:2:2, 4:4:0) and
grayscale, so real-world camera JPEGs (overwhelmingly baseline 4:2:0)
decode; chroma upsampling is box replication (each chroma sample
covers its hmax/h x vmax/v pixel footprint), the exactness-friendly
choice. The ENCODER emits 4:4:4 (default) or 4:2:0 (2x2 round-half-up
box-averaged chroma). Progressive (SOF2) and arithmetic-coded streams
stay behind NotImplementedError rather than decode wrongly.

Why integer color math: the RGB<->YCbCr transforms round at exactly
representable decimal coefficients (x.5 cases are real — e.g. the
0.5*B term), so both directions use scaled-integer round-half-up
(`_irnd`), making the transform bit-exactly replicable by an
independent oracle (operators/multimodal.py::_jpeg_flat_formula).

Exactness contract used by the `jpeg_roundtrip` certification: the
encoder's DC quantization step is 8 for all components. A flat 8x8
block has only a DC coefficient, F00 = 8*(level-shifted value), so
quantize(F00/8) reproduces the integer exactly and the IDCT returns
the flat value bit-exactly — for flat-block images the whole lossy
pipeline collapses to the (exact, integer) color transform, giving a
closed-form SQL oracle over REAL compressed JPEG containers. The same
contract extends to 4:2:0: a 2x2 box average of a flat chroma region
is the value itself regardless of rounding, so images flat per 16x16
MCU are bit-exact through the subsampled pipeline too (the
`jpeg420_roundtrip` certification section). General images roundtrip
within the usual DCT quantization error, covered by bounded-error
unit tests (tests/test_multimodal.py).

Scale note: this codec runs inside Arrow-batched ``mapInPandas``
kernels (operators/multimodal.py) — per-item Python cost, no shuffle,
embarrassingly parallel; a production cluster image swaps in
libjpeg-turbo behind the same ``decode_real_media`` dispatch.
"""

from __future__ import annotations

import struct

import numpy as np

# Orthonormal 8x8 DCT-II matrix: F = M @ B @ M.T
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Quant tables: DC step 8 (the flat-block exactness contract above);
# AC steps a mild flat 16 — compression is not the point, correctness
# certification is.
_QTAB = np.full(64, 16, dtype=np.int32)
_QTAB[0] = 8

# Huffman table shapes (canonical, emitted in DHT and rebuilt by the
# decoder): DC = 12 category symbols at code length 4 (max code 1011 —
# no all-ones code, as T.81 requires); AC = the 162 run/size symbols
# at code length 8 (max code 10100001).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


def _irnd(n: int, d: int) -> int:
    """floor(n/d + 1/2) in exact integer math (d > 0, n any sign)."""
    return (2 * n + d) // (2 * d)


def rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF forward color transform, scaled-integer round-half-up —
    bit-exactly replicable in SQL/oracle integer math."""
    y = _irnd(299 * r + 587 * g + 114 * b, 1000)
    cb = _irnd(-168736 * r - 331264 * g + 500000 * b, 1000000) + 128
    cr = _irnd(500000 * r - 418688 * g - 81312 * b, 1000000) + 128
    clip = lambda v: max(0, min(255, v))  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF inverse color transform, same integer-math contract."""
    r = y + _irnd(1402 * (cr - 128), 1000)
    g = y + _irnd(-344136 * (cb - 128) - 714136 * (cr - 128), 1000000)
    b = y + _irnd(1772 * (cb - 128), 1000)
    clip = lambda v: max(0, min(255, v))  # noqa: E731
    return clip(r), clip(g), clip(b)


def _ycc_planes(rgb: np.ndarray) -> np.ndarray:
    """Vectorized forward transform over an (H, W, 3) uint8 image →
    (3, H, W) int32 YCbCr, identical to rgb_to_ycbcr per pixel."""
    p = rgb.astype(np.int64)
    r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]

    def irnd(n, d):
        return (2 * n + d) // (2 * d)

    y = irnd(299 * r + 587 * g + 114 * b, 1000)
    cb = irnd(-168736 * r - 331264 * g + 500000 * b, 1000000) + 128
    cr = irnd(500000 * r - 418688 * g - 81312 * b, 1000000) + 128
    return np.clip(np.stack([y, cb, cr]), 0, 255).astype(np.int32)


def _rgb_from_planes(ycc: np.ndarray) -> np.ndarray:
    """Vectorized inverse transform, (3, H, W) int → (H, W, 3) uint8,
    identical to ycbcr_to_rgb per pixel."""
    y, cb, cr = (ycc[i].astype(np.int64) for i in range(3))

    def irnd(n, d):
        return (2 * n + d) // (2 * d)

    r = y + irnd(1402 * (cr - 128), 1000)
    g = y + irnd(-344136 * (cb - 128) - 714136 * (cr - 128), 1000000)
    b = y + irnd(1772 * (cb - 128), 1000)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from a DHT-style (BITS, HUFFVAL) spec
    (T.81 Annex C code assignment)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def emit_marker(self, m: int) -> None:
        """Byte-align and append a marker (markers are NOT stuffed)."""
        self.pad_to_byte()
        self.buf += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # skip stuffed 0x00
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def restart(self) -> None:
        """Consume an RSTn marker at a restart boundary: discard pad
        bits to the byte boundary, then expect 0xFF 0xD0-0xD7 (T.81
        F.2.1.3.1 — markers are byte-aligned in the entropy stream)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: size-bit magnitude bits → signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _dht_segment(tc_th: int, bits: list[int], symbols: list[int]) -> bytes:
    body = bytes([tc_th] + bits + symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body



def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Forward-DCT, quantize, and entropy-code one 8x8 sample block;
    returns the new DC predictor for the component."""
    coef = _M @ (block - 128.0) @ _M.T
    q = np.round(coef.ravel()[_ZIGZAG] / _QTAB).astype(np.int64)
    diff = int(q[0]) - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.nonzero(q[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return int(q[0])


def _pad_replicate(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad a 2-D plane to (ph, pw) by replicating the last row/column
    (the usual practice for partial MCUs)."""
    h, w = plane.shape
    out = np.zeros((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg(rgb, subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a REAL baseline JPEG
    (SOF0, quant/Huffman tables inline). ``subsampling`` is ``"444"``
    (every component 1x1 — the exactness-contract default), ``"420"``
    (Y at 2x2, chroma 2x2 round-half-up box-averaged — the shape
    virtually every camera emits), ``"422"``, or ``"440"``.
    ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (what
    cameras do for error resilience — and how the decoder's restart
    resynchronization is certified against our own streams). Edges of
    images whose dims are not multiples of the MCU size are replicated
    into the partial MCUs, per the usual practice."""
    # Y sampling factors (chroma is always 1x1): fx/fy are the chroma
    # box-average downsample ratios.
    _SAMP = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in _SAMP:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    fx, fy = _SAMP[subsampling]
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ycc = _ycc_planes(rgb)

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMBOLS)
    writer = _BitWriter()

    samp = [(fx, fy), (1, 1), (1, 1)]
    ph, pw = -(-h // (8 * fy)) * 8 * fy, -(-w // (8 * fx)) * 8 * fx
    y = _pad_replicate(ycc[0].astype(np.int64), ph, pw).astype(np.float64)
    if fx == fy == 1:
        planes = [y, *(
            _pad_replicate(ycc[c].astype(np.float64), ph, pw) for c in (1, 2)
        )]
    else:
        # fx*fy round-half-up box average on the PADDED chroma planes,
        # so a region flat per MCU downsamples to its exact value
        chroma = []
        for c in (1, 2):
            p = _pad_replicate(ycc[c].astype(np.int64), ph, pw)
            s = sum(
                p[dy::fy, dx::fx] for dy in range(fy) for dx in range(fx)
            )
            d = fx * fy
            chroma.append(((2 * s + d) // (2 * d)).astype(np.float64))
        planes = [y, chroma[0], chroma[1]]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)
    pred = [0, 0, 0]
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.emit_marker(0xD0 + ((mcu_i // restart_interval - 1) % 8))
                pred = [0, 0, 0]
            mcu_i += 1
            for comp in range(3):
                hi, vi = samp[comp]
                for byy in range(vi):
                    for bxx in range(hi):
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        block = planes[comp][y0 : y0 + 8, x0 : x0 + 8]
                        pred[comp] = _encode_block(
                            writer, block, pred[comp], dc_codes, ac_codes
                        )
    scan = writer.flush()

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(_QTAB[k]) for k in range(64)
    )
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11 + 6, 8, h, w, 3)
    for comp, cid in enumerate((1, 2, 3)):
        hi, vi = samp[comp]
        sof += bytes([cid, (hi << 4) | vi, 0])  # qtable 0 for all
    dht = (
        _dht_segment(0x00, _DC_BITS, _DC_SYMBOLS)
        + _dht_segment(0x10, _AC_BITS, _AC_SYMBOLS)
    )
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + scan + b"\xff\xd9"


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (tables read from the
    stream's own DQT/DHT segments — not hardwired to this module's
    encoder) into an (H, W, 3) uint8 RGB array.

    Generic per-component sampling factors (h, v in 1..4, integer
    plane ratios): 4:4:4, 4:2:0, 4:2:2, 4:4:0 — the shapes real
    cameras and libjpeg emit — plus single-component grayscale
    (replicated to RGB). Chroma upsampling is box replication.
    Restart markers (DRI/RSTn) resynchronize per T.81 F.2.1.3:
    byte-align, expect RSTn, reset every DC predictor. Progressive,
    arithmetic-coded, 12-bit, and fractional-ratio streams raise
    NotImplementedError rather than decode wrongly."""
    if bytes(payload[:2]) != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, qtab id)
    h = w = None
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtabs[tq] = np.frombuffer(
                    bytes(body[off + 1 : off + 65]), dtype=np.uint8
                ).astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                symbols = list(body[off + 17 : off + 17 + n])
                codes = _canonical_codes(bits, symbols)
                huff[(tc, th)] = {(ln, code): sym for sym, (code, ln) in codes.items()}
                off += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            for c in range(nc):
                cid, sampb, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = sampb >> 4, sampb & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("sampling factor out of range")
                comps.append((cid, hi, vi, tq))
            if nc not in (1, 3):
                raise NotImplementedError("only grayscale or 3-component YCbCr")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential SOF0")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if h is None or not scan_comps:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan_comps) != len(comps):
        raise NotImplementedError("non-interleaved (multi-scan) baseline")
    end = payload.rfind(b"\xff\xd9")
    reader = _BitReader(payload[pos : end if end >= 0 else len(payload)])

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | reader.read(1)
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("invalid Huffman code")

    info = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    for _, hi, vi, _ in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError("fractional chroma upsampling ratios")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * 8 * vi, mcux * 8 * hi))
        for cid, hi, vi, _ in comps
    }
    pred = [0] * len(scan_comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = [0] * len(scan_comps)
            mcu_count += 1
            for ci, (cid, dc_id, ac_id) in enumerate(scan_comps):
                hi, vi, tq = info[cid]
                q = qtabs[tq]
                for byy in range(vi):
                    for bxx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        size = read_symbol(huff[(0, dc_id)])
                        diff = _extend(reader.read(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci] * int(q[0])
                        k = 1
                        while k < 64:
                            sym = read_symbol(huff[(1, ac_id)])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            size = sym & 0xF
                            zz[k] = _extend(reader.read(size), size) * int(q[k])
                            k += 1
                        coef = np.zeros(64)
                        coef[_ZIGZAG] = zz
                        block = _M.T @ coef.reshape(8, 8) @ _M + 128.0
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block

    full = []
    for cid, hi, vi, _ in comps:
        p = np.clip(np.floor(planes[cid] + 0.5), 0, 255).astype(np.int32)
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # box-replication upsample to full res
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:  # grayscale: Y replicated, neutral chroma
        ycc = np.stack(
            [full[0], np.full_like(full[0], 128), np.full_like(full[0], 128)]
        )
    else:
        ycc = np.stack(full)
    return _rgb_from_planes(ycc)
