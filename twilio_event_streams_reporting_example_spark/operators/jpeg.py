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

The DECODER is one multi-scan coefficient-accumulating core covering
baseline sequential AND progressive (SOF2: spectral selection +
successive approximation — DC bit-shift scans, AC sign-magnitude with
EOB-run and correction-bit coding per T.81 G.1.2), with generic
per-component sampling factors (h, v in 1..4 with integer plane
upsampling — 4:4:4, 4:2:0, 4:2:2, 4:4:0) and grayscale, so real-world
camera and web JPEGs (baseline 4:2:0 and progressive alike) decode;
chroma upsampling is box replication (each chroma sample covers its
hmax/h x vmax/v pixel footprint), the exactness-friendly choice. The
ENCODERS emit sequential (4:4:4 default, 420/422/440 with
round-half-up box-averaged chroma) and full progressive streams
(:func:`encode_jpeg_progressive` — identical quantized coefficients,
so progressive decode is certified BIT-EXACT against sequential).
Arithmetic-coded, hierarchical, and 12-bit streams stay behind
NotImplementedError rather than decode wrongly.

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
    if sum(bits) > len(symbols):
        raise ValueError("corrupt DHT: BITS counts exceed HUFFVAL data")
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




def _prepare_planes(rgb: np.ndarray, subsampling: str):
    """Shared encoder front half: RGB → padded YCbCr planes in the
    target sampling shape. Returns (planes, samp, ph, pw) where samp
    is the per-component (h, v) list and chroma (for subsampled modes)
    is round-half-up box-averaged on the PADDED planes, so a region
    flat per MCU downsamples to its exact value."""
    # Y sampling factors (chroma is always 1x1): fx/fy are the chroma
    # box-average downsample ratios.
    _SAMP = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in _SAMP:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    fx, fy = _SAMP[subsampling]
    h, w, _ = rgb.shape
    ycc = _ycc_planes(rgb)
    samp = [(fx, fy), (1, 1), (1, 1)]
    ph, pw = -(-h // (8 * fy)) * 8 * fy, -(-w // (8 * fx)) * 8 * fx
    y = _pad_replicate(ycc[0].astype(np.int64), ph, pw).astype(np.float64)
    if fx == fy == 1:
        planes = [y, *(
            _pad_replicate(ycc[c].astype(np.float64), ph, pw) for c in (1, 2)
        )]
    else:
        chroma = []
        for c in (1, 2):
            p = _pad_replicate(ycc[c].astype(np.int64), ph, pw)
            s = sum(
                p[dy::fy, dx::fx] for dy in range(fy) for dx in range(fx)
            )
            d = fx * fy
            chroma.append(((2 * s + d) // (2 * d)).astype(np.float64))
        planes = [y, chroma[0], chroma[1]]
    return planes, samp, ph, pw



def encode_jpeg(
    rgb, subsampling: str = "444", restart_interval: int = 0,
    color_transform: bool = True,
) -> bytes:
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
    into the partial MCUs, per the usual practice.

    ``color_transform=False`` encodes the three components as-stored
    R,G,B with NO forward YCbCr step (the TIFF TN2 photometric-2
    convention); only ``"444"`` sampling is allowed there — chroma
    subsampling presumes a luma/chroma split that RGB doesn't have."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    if not color_transform:
        if subsampling != "444":
            raise ValueError(
                "color_transform=False (RGB components) requires 444"
            )
        samp = [(1, 1), (1, 1), (1, 1)]
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        planes = [
            _pad_replicate(rgb[:, :, c].astype(np.float64), ph, pw)
            for c in range(3)
        ]
    else:
        planes, samp, ph, pw = _prepare_planes(rgb, subsampling)

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMBOLS)
    writer = _BitWriter()

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


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.read(1)
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code")


def _ac_first(block, ks, se, al, reader, table, eobrun):
    """Decode one block's AC band, first scan (Ah=0) — T.81 G.1.2.2.
    With ks=1, se=63, al=0 and eobrun pinned at 0 this IS the baseline
    sequential AC decode (EOB = EOB-run of 1, ZRL identical), so the
    sequential and progressive paths share one implementation."""
    if eobrun > 0:
        return eobrun - 1
    k = ks
    while k <= se:
        sym = _read_symbol(reader, table)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        block[k] = _extend(reader.read(s), s) << al
        k += 1
    return eobrun


def _ac_refine(block, ks, se, al, reader, table, eobrun):
    """Decode one block's AC band, refinement scan (Ah>0) — T.81
    G.1.2.3: history coefficients (already nonzero) consume one
    correction bit each as the run pointer passes them; zero-history
    runs and EOB runs count only zero-history positions; newly visible
    coefficients arrive as magnitude-1 codes with a sign bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ks
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(reader, table)
            r, s = sym >> 4, sym & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefs below
            else:
                if s != 1:
                    raise ValueError("refinement scan with magnitude > 1")
                newval = p1 if reader.read(1) else m1
            while k <= se:
                v = int(block[k])
                if v != 0:
                    if reader.read(1) and (v & p1) == 0:
                        block[k] = v + (p1 if v >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if newval and k <= se:
                block[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(block[k])
            if v != 0:
                if reader.read(1) and (v & p1) == 0:
                    block[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _scan_units(scan_comps, info, w, h, hmax, vmax, mcux, mcuy):
    """Entropy-coded-unit enumeration for one scan: interleaved scans
    group per MCU (each component contributing its hi x vi raster of
    blocks); single-component scans are one block per unit over the
    component's TRUE block grid (ceil of its sample dims — NOT the
    MCU-padded grid; T.81 A.2.2). Yields lists of
    (cid, by, bx, dc_id, ac_id)."""
    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                group = []
                for cid, dc_id, ac_id in scan_comps:
                    hi, vi, _ = info[cid]
                    for byy in range(vi):
                        for bxx in range(hi):
                            group.append(
                                (cid, my * vi + byy, mx * hi + bxx, dc_id, ac_id)
                            )
                yield group
    else:
        cid, dc_id, ac_id = scan_comps[0]
        hi, vi, _ = info[cid]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        for by in range(bh):
            for bx in range(bw):
                yield [(cid, by, bx, dc_id, ac_id)]


def decode_jpeg(payload: bytes, color_transform: bool = True) -> np.ndarray:
    """Decode a baseline-sequential OR progressive (SOF2) JPEG (tables
    read from the stream's own DQT/DHT segments — not hardwired to
    this module's encoder) into an (H, W, 3) uint8 RGB array.

    One multi-scan coefficient-accumulating core covers both modes:
    each SOS scan (any spectral band Ss..Se, any successive-
    approximation pair Ah/Al, interleaved DC or single-component)
    advances per-block QUANTIZED coefficient arrays; a sequential file
    is simply the one-scan special case (Ss=0, Se=63, Ah=Al=0), and
    multi-scan non-interleaved sequential files work the same way.
    Dequantization + IDCT + upsample + color transform run once at
    EOI over the accumulated coefficients.

    Generic per-component sampling factors (h, v in 1..4, integer
    plane ratios): 4:4:4, 4:2:0, 4:2:2, 4:4:0 — the shapes real
    cameras and libjpeg emit — plus single-component grayscale
    (replicated to RGB). Chroma upsampling is box replication.
    Restart markers (DRI/RSTn) resynchronize per T.81 F.2.1.3:
    byte-align, expect RSTn, reset DC predictors and the EOB run.
    Arithmetic-coded, hierarchical, 12-bit, and fractional-ratio
    streams raise NotImplementedError rather than decode wrongly.

    ``color_transform=False`` skips the inverse YCbCr step: a 3-scan
    stream's components are returned as stored, stacked R,G,B — the
    TIFF TN2 photometric-2 case, where JPEG-in-TIFF strips carry RGB
    components with NO color transform (T.81 itself is colorspace-
    agnostic; the transform is a JFIF/TIFF-container convention)."""
    if bytes(payload[:2]) != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, qtab id)
    h = w = None
    restart_interval = 0
    progressive = False
    coef: dict[int, np.ndarray] | None = None
    geom: tuple[int, int, int, int] | None = None  # hmax, vmax, mcux, mcuy
    info: dict[int, tuple[int, int, int]] = {}
    saw_scan = False
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended sequential and progressive Huffman SOF"
            )
        elif marker == 0xDA:  # SOS: decode this scan's entropy data now
            if h is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("corrupt SOS: truncated header")
            sof_ids = {cid for cid, _, _, _ in comps}
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                if cid not in sof_ids:
                    raise ValueError(
                        f"corrupt SOS: component {cid} not in SOF"
                    )
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if coef is None:
                info = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
                hmax = max(hi for _, hi, _, _ in comps)
                vmax = max(vi for _, _, vi, _ in comps)
                for _, hi, vi, _ in comps:
                    if hmax % hi or vmax % vi:
                        raise NotImplementedError(
                            "fractional chroma upsampling ratios"
                        )
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                geom = (hmax, vmax, mcux, mcuy)
                coef = {
                    cid: np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                    for cid, hi, vi, _ in comps
                }
            hmax, vmax, mcux, mcuy = geom
            if ss > se or se > 63:
                raise ValueError("bad spectral band")
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss != 0 and len(scan_comps) > 1:
                    raise ValueError(
                        "progressive AC scans must be single-component"
                    )
            elif (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("sequential scan must cover the full band")
            data_start = pos + 2 + seglen
            reader = _BitReader(payload[data_start:])
            pred = {cid: 0 for cid, _, _ in scan_comps}
            eobrun = 0
            # corrupt streams may reference never-defined tables: fail
            # as ValueError up front, not KeyError mid-scan
            for cid, dc_id, ac_id in scan_comps:
                if ss == 0 and ah == 0 and (0, dc_id) not in huff:
                    raise ValueError(f"corrupt SOS: no DC table {dc_id}")
                if se >= 1 and (1, ac_id) not in huff:
                    raise ValueError(f"corrupt SOS: no AC table {ac_id}")
            count = 0
            for group in _scan_units(scan_comps, info, w, h, hmax, vmax, mcux, mcuy):
                if restart_interval and count and count % restart_interval == 0:
                    reader.restart()
                    pred = {cid: 0 for cid, _, _ in scan_comps}
                    eobrun = 0
                count += 1
                for cid, by, bx, dc_id, ac_id in group:
                    block = coef[cid][by, bx]
                    if ss == 0:
                        if ah == 0:
                            s = _read_symbol(reader, huff[(0, dc_id)])
                            diff = _extend(reader.read(s), s) if s else 0
                            pred[cid] += diff
                            block[0] = pred[cid] << al
                        elif reader.read(1):
                            block[0] = int(block[0]) | (1 << al)
                    if se >= 1:
                        ks = max(1, ss)
                        if ah == 0:
                            eobrun = _ac_first(
                                block, ks, se, al, reader, huff[(1, ac_id)], eobrun
                            )
                        else:
                            eobrun = _ac_refine(
                                block, ks, se, al, reader, huff[(1, ac_id)], eobrun
                            )
            saw_scan = True
            # find the next marker after this scan's entropy bytes:
            # skip stuffed 0xFF00 and RSTn, stop at any real marker
            p = data_start + reader.pos
            while p + 1 < len(payload):
                if (
                    payload[p] == 0xFF
                    and payload[p + 1] != 0x00
                    and not (0xD0 <= payload[p + 1] <= 0xD7)
                ):
                    break
                p += 1
            pos = p
            continue
        pos += 2 + seglen
    if h is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")

    full = []
    for cid, hi, vi, tq in comps:
        if tq not in qtabs:
            raise ValueError(f"corrupt JPEG: no quantization table {tq}")
        q = qtabs[tq].astype(np.int64)
        blocks = coef[cid]
        bh_t, bw_t, _ = blocks.shape
        plane = np.zeros((bh_t * 8, bw_t * 8))
        for by in range(bh_t):
            for bx in range(bw_t):
                zz = blocks[by, bx] * q
                c2 = np.zeros(64)
                c2[_ZIGZAG] = zz
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _M.T @ c2.reshape(8, 8) @ _M + 128.0
                )
        p = np.clip(np.floor(plane + 0.5), 0, 255).astype(np.int32)
        hmax, vmax, _, _ = geom
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # box-replication upsample to full res
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:  # grayscale: replicate regardless of transform
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if not color_transform:  # components stored as R,G,B (TIFF TN2 pm 2)
        return np.clip(np.stack(full, axis=2), 0, 255).astype(np.uint8)
    return _rgb_from_planes(np.stack(full))


# Progressive AC table: the 15 EOBn run symbols (0x00..0xE0), ZRL, and
# the 160 run/size symbols — 176 codes, all at length 8 (max code
# 10101111: no all-ones code, as T.81 requires).
_AC_SYMBOLS_PROG = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]


def encode_jpeg_progressive(
    rgb, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a REAL progressive JPEG
    (SOF2): spectral selection (DC scan, then AC bands 1-31 and 32-63
    per component) AND successive approximation (every band sent at
    Al=1 first, then a refinement pass at Al=0 — DC as an arithmetic
    bit-shift, AC as sign-magnitude with EOB-run and correction-bit
    coding per T.81 G.1.2). The quantized coefficients are IDENTICAL
    to the sequential encoder's (same DCT, same tables), so
    decode_jpeg(progressive) must reproduce decode_jpeg(sequential)
    BIT-EXACTLY on every image — the roundtrip certification used by
    the tests and the `jpeg420_progressive` oracle section.
    ``restart_interval`` applies to every scan (DRI once; RSTn resets
    DC predictors and the EOB run)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    planes, samp, ph, pw = _prepare_planes(rgb, subsampling)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = pw // (8 * hmax), ph // (8 * vmax)

    # quantized zigzag coefficient arrays per component (the decoder's
    # own storage shape — the entropy scans below are pure views on it)
    qb = []
    for comp in range(3):
        plane = planes[comp]
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coefs = _M @ (block - 128.0) @ _M.T
                arr[by, bx] = np.round(coefs.ravel()[_ZIGZAG] / _QTAB).astype(
                    np.int64
                )
        qb.append(arr)

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_BITS_PROG, _AC_SYMBOLS_PROG)

    def mcu_groups():
        for my in range(mcuy):
            for mx in range(mcux):
                group = []
                for comp in range(3):
                    hi, vi = samp[comp]
                    for byy in range(vi):
                        for bxx in range(hi):
                            group.append((comp, my * vi + byy, mx * hi + bxx))
                yield group

    def comp_blocks(comp):
        # TRUE block grid (T.81 A.2.2), not the MCU-padded grid
        hi, vi = samp[comp]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield comp, by, bx

    def sos(scan_cids, ss, se, ah, al):
        body = bytes([len(scan_cids)])
        for cid in scan_cids:
            body += bytes([cid, 0x00])  # DC table 0, AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    def dc_first_scan(al):
        writer = _BitWriter()
        pred = [0, 0, 0]
        count = rstn = 0
        for group in mcu_groups():
            if restart_interval and count and count % restart_interval == 0:
                writer.emit_marker(0xD0 + (rstn % 8))
                rstn += 1
                pred = [0, 0, 0]
            count += 1
            for comp, by, bx in group:
                v = int(qb[comp][by, bx, 0]) >> al  # DC point transform
                diff = v - pred[comp]
                pred[comp] = v
                s = _category(diff)
                code, ln = dc_codes[s]
                writer.write(code, ln)
                if s:
                    writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        return writer.flush()

    def dc_refine_scan(al):
        writer = _BitWriter()
        count = rstn = 0
        for group in mcu_groups():
            if restart_interval and count and count % restart_interval == 0:
                writer.emit_marker(0xD0 + (rstn % 8))
                rstn += 1
            count += 1
            for comp, by, bx in group:
                writer.write((int(qb[comp][by, bx, 0]) >> al) & 1, 1)
        return writer.flush()

    def ac_first_scan(comp, ss, se, al):
        writer = _BitWriter()
        eobrun = [0]

        def flush_eob():
            n = eobrun[0]
            if n:
                r = n.bit_length() - 1
                code, ln = ac_codes[r << 4]
                writer.write(code, ln)
                if r:
                    writer.write(n - (1 << r), r)
                eobrun[0] = 0

        count = rstn = 0
        for _, by, bx in comp_blocks(comp):
            if restart_interval and count and count % restart_interval == 0:
                flush_eob()
                writer.emit_marker(0xD0 + (rstn % 8))
                rstn += 1
            count += 1
            block = qb[comp][by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(block[k])
                mag = (v if v >= 0 else -v) >> al  # AC: sign-magnitude shift
                if mag == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    writer.write(code, ln)
                    r -= 16
                s = mag.bit_length()
                code, ln = ac_codes[(r << 4) | s]
                writer.write(code, ln)
                sv = mag if v >= 0 else -mag
                writer.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
                r = 0
            if r:
                eobrun[0] += 1
                if eobrun[0] == 0x7FFF:
                    flush_eob()
        flush_eob()
        return writer.flush()

    def ac_refine_scan(comp, ss, se, al):
        writer = _BitWriter()
        eobrun = [0]
        be: list[int] = []  # correction bits owed by blocks in the EOB run

        def flush_eob():
            if eobrun[0]:
                n = eobrun[0]
                r = n.bit_length() - 1
                code, ln = ac_codes[r << 4]
                writer.write(code, ln)
                if r:
                    writer.write(n - (1 << r), r)
                eobrun[0] = 0
                for b in be:
                    writer.write(b, 1)
                be.clear()

        count = rstn = 0
        for _, by, bx in comp_blocks(comp):
            if restart_interval and count and count % restart_interval == 0:
                flush_eob()
                writer.emit_marker(0xD0 + (rstn % 8))
                rstn += 1
            count += 1
            block = qb[comp][by, bx]
            absv = {}
            eob_k = ss - 1  # last NEWLY-VISIBLE (mag 1) position
            for k in range(ss, se + 1):
                m = abs(int(block[k])) >> al
                absv[k] = m
                if m == 1:
                    eob_k = k
            r = 0
            br: list[int] = []  # current block's history correction bits
            for k in range(ss, se + 1):
                m = absv[k]
                if m == 0:
                    r += 1
                    continue
                # ZRLs only when more newly-visible coefs follow; runs
                # past the last one fold into the EOB run instead
                while r > 15 and k <= eob_k:
                    flush_eob()
                    code, ln = ac_codes[0xF0]
                    writer.write(code, ln)
                    r -= 16
                    for b in br:
                        writer.write(b, 1)
                    br = []
                if m > 1:  # history coef: owes one correction bit
                    br.append(m & 1)
                    continue
                flush_eob()
                code, ln = ac_codes[(r << 4) | 1]
                writer.write(code, ln)
                writer.write(1 if int(block[k]) >= 0 else 0, 1)
                for b in br:
                    writer.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun[0] += 1
                be.extend(br)
                if eobrun[0] == 0x7FFF:
                    flush_eob()
        flush_eob()
        return writer.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(_QTAB[k]) for k in range(64)
    )
    sof = b"\xff\xc2" + struct.pack(">HBHHB", 11 + 6, 8, h, w, 3)
    for comp, cid in enumerate((1, 2, 3)):
        hi, vi = samp[comp]
        sof += bytes([cid, (hi << 4) | vi, 0])  # qtable 0 for all
    out += sof
    out += _dht_segment(0x00, _DC_BITS, _DC_SYMBOLS)
    out += _dht_segment(0x10, _AC_BITS_PROG, _AC_SYMBOLS_PROG)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    out += sos([1, 2, 3], 0, 0, 0, 1) + dc_first_scan(1)
    out += sos([1, 2, 3], 0, 0, 1, 0) + dc_refine_scan(0)
    for comp, cid in enumerate((1, 2, 3)):
        out += sos([cid], 1, 31, 0, 1) + ac_first_scan(comp, 1, 31, 1)
        out += sos([cid], 32, 63, 0, 1) + ac_first_scan(comp, 32, 63, 1)
    for comp, cid in enumerate((1, 2, 3)):
        out += sos([cid], 1, 31, 1, 0) + ac_refine_scan(comp, 1, 31, 0)
        out += sos([cid], 32, 63, 1, 0) + ac_refine_scan(comp, 32, 63, 0)
    return bytes(out) + b"\xff\xd9"
