"""Dependency-free FLAC codec (pure Python + numpy).

REAL lossless audio decode for the archival format a media corpus is
most likely to carry next to WAV: FLAC, written from the public
format specification (RFC 9639 / the xiph.org FLAC format document).
The decoder handles the full frame surface: STREAMINFO + skipped
metadata blocks, fixed- and variable-blocksize frame headers with
UTF-8-coded frame/sample numbers, all blocksize/sample-rate/sample-
size codes, CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes,
wasted bits, all four channel assignments (independent, left-side,
right-side, mid-side), 4- and 5-bit Rice-partitioned residuals with
escape partitions, and both CRCs (CRC-8 header, CRC-16 frame) plus
the STREAMINFO MD5 of the decoded stream.

Because FLAC is lossless the certification is *bit-exact round-trip
equality* — stronger than the sum oracles the lossy codecs use: the
``flac_roundtrip`` section of ``multimodal_media_ops`` encodes
closed-form integer signals executor-side (cycling every subframe
type, stereo mode, bit depth, partition order, and an escape
partition), decodes them back through :func:`decode_flac`, asserts
exact equality in-kernel, and certifies the channel sums against the
DuckDB closed form. A wrong Rice bit, CRC table, UTF-8 length byte,
stereo reconstruction, or predictor shift breaks the hash.

Scale notes: decode runs inside Arrow-batched ``mapInPandas`` kernels
(embarrassingly parallel, no shuffle). Fixed-predictor reconstruction
is fully vectorized (k-fold ``np.cumsum`` inverting the k-th
difference); Rice unary decode uses a precomputed set-bit index +
``searchsorted`` so cost per residual is O(log n) instead of
per-bit scanning. The serial parts (LPC IIR recurrence, bounded by
order) are the codec's intrinsic data dependencies.

Reference parity note: the reference app
(twilio-event-streams-reporting-example, events.js) has no media path
— this module is part of the engine's LLM-data-pipeline surface.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# frame-header blocksize code -> samples (None = coded elsewhere)
#   0b0001=192, 0b0010..0b0101 = 576<<(n-2), 0b0110/0b0111 = 8/16-bit
#   "value - 1" follows the header, 0b1000..0b1111 = 256<<(n-8)
# frame-header sample-rate code table (0b0000 = take from STREAMINFO;
# 0b1100..0b1110 = coded after the header; 0b1111 invalid)
_SR_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
# frame-header sample-size code -> bits (0b000 = STREAMINFO)
_BPS_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24,
              0b111: 32}


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tbl.append(r)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)      # x^8 + x^2 + x + 1, init 0
_CRC16_TBL = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1, init 0


def crc8(data: bytes, init: int = 0) -> int:
    r = init
    for b in data:
        r = _CRC8_TBL[r ^ b]
    return r


def crc16(data: bytes, init: int = 0) -> int:
    r = init
    for b in data:
        r = (_CRC16_TBL[(r >> 8) ^ b] ^ ((r & 0xFF) << 8)) & 0xFFFF
    return r


# ------------------------------------------------------------ bit IO ---


class _BitWriter:
    """MSB-first bit accumulator (FLAC is big-endian at the bit level)."""

    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self._out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits terminated by a one bit
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        assert self._n == 0, "unaligned bit writer"
        return bytes(self._out)


class _BitReader:
    """MSB-first reader over a byte buffer.

    ``read`` slices bytes and shifts (O(bytes touched)); ``read_unary``
    finds the terminating 1-bit via a windowed set-bit index
    (np.flatnonzero of unpacked bits over a bounded window) + binary
    search — no per-bit Python loop on the Rice hot path, and no
    whole-payload index either: the set-bit index is ~8 int64 entries
    per byte, a real per-row memory multiplier for large FLAC payloads
    inside ``mapInPandas``, so it is built per 64 KiB window on demand
    and re-windowed as the read position advances.
    """

    _UNARY_WINDOW = 1 << 16  # bytes of set-bit index built at a time

    def __init__(self, buf: bytes, bit_pos: int = 0) -> None:
        self._buf = buf
        self._ones: np.ndarray | None = None  # set bits of current window
        self._win_lo = 0  # window start, in BITS
        self._win_hi = 0  # window end (exclusive), in BITS
        self.pos = bit_pos

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        p, q = self.pos, self.pos + nbits
        last = (q + 7) // 8
        if last > len(self._buf):
            raise ValueError("FLAC bitstream truncated")
        v = int.from_bytes(self._buf[p // 8 : last], "big")
        v >>= last * 8 - q
        self.pos = q
        return v & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def _window(self, from_bit: int) -> None:
        lo_byte = from_bit // 8
        hi_byte = min(lo_byte + self._UNARY_WINDOW, len(self._buf))
        self._win_lo = lo_byte * 8
        self._win_hi = hi_byte * 8
        self._ones = self._win_lo + np.flatnonzero(
            np.unpackbits(
                np.frombuffer(self._buf, dtype=np.uint8, count=hi_byte - lo_byte, offset=lo_byte)
            )
        )

    def read_unary(self) -> int:
        p = self.pos
        while True:
            if self._ones is None or not self._win_lo <= p < self._win_hi:
                if p >= len(self._buf) * 8:
                    raise ValueError("FLAC bitstream: unary ran off the end")
                self._window(p)
            i = np.searchsorted(self._ones, p)
            if i < self._ones.size:
                one = int(self._ones[i])
                q = one - self.pos
                self.pos = one + 1
                return q
            # no set bit in the rest of this window: scan the next one
            p = self._win_hi
            if p >= len(self._buf) * 8:
                raise ValueError("FLAC bitstream: unary ran off the end")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# -------------------------------------------------- UTF-8-coded number ---


def _utf8_encode_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index, up to 36
    bits — the same prefix scheme as UTF-8 extended to 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


def _utf8_decode_number(rd: _BitReader) -> int:
    first = rd.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    probe = first
    while probe & 0x80:
        nbytes += 1
        probe = (probe << 1) & 0xFF
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: bad UTF-8 coded number")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        cont = rd.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation byte")
        n = (n << 6) | (cont & 0x3F)
    return n


# ----------------------------------------------------- fixed predictors ---


def fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    """k-th difference (the FLAC fixed predictor of order k), vectorized."""
    return np.diff(x, order) if order else x.copy()


def fixed_restore(residual: np.ndarray, warmup: np.ndarray,
                  order: int) -> np.ndarray:
    """Invert the k-th difference given k warmup samples — k cumulative
    sums, each seeded with the matching warmup difference (exact
    integer inverse of :func:`fixed_residual`)."""
    y = residual.astype(np.int64)
    w = warmup.astype(np.int64)
    for j in range(order, 0, -1):
        seed = np.diff(w, j - 1)[0] if j > 1 else w[0]
        y = np.cumsum(np.concatenate(([seed], y)))
    return y


# ------------------------------------------------------- Rice residual ---


def _rice_param_for(res: np.ndarray) -> int:
    """Cheap near-optimal Rice parameter: log2 of the mean magnitude."""
    if res.size == 0:
        return 0
    mean = float(np.mean(np.abs(res.astype(np.float64)))) + 1.0
    k = max(0, int(np.ceil(np.log2(mean))))
    return min(k, 14)


def _write_residual(bw: _BitWriter, res: np.ndarray, block_size: int,
                    pred_order: int, partition_order: int,
                    escape_parts: frozenset[int] = frozenset()) -> None:
    """Rice-partitioned residual (coding method 00: 4-bit params).
    Partitions listed in ``escape_parts`` are written with the 0b1111
    escape (raw fixed-width samples) to exercise that decode path."""
    # clamp: partitions must divide the block size and the first
    # partition (which loses pred_order warmup samples) must be non-empty
    while partition_order > 0 and (
        block_size % (1 << partition_order)
        or (block_size >> partition_order) <= pred_order
    ):
        partition_order -= 1
    bw.write(0b00, 2)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    per = block_size >> partition_order
    start = 0
    for p in range(nparts):
        n = per - pred_order if p == 0 else per
        part = res[start : start + n]
        start += n
        if p in escape_parts:
            raw_bits = max(2, int(np.max(np.abs(part.astype(np.int64))) + 1)
                           .bit_length() + 1) if part.size else 2
            bw.write(0b1111, 4)
            bw.write(raw_bits, 5)
            for v in part:
                bw.write_signed(int(v), raw_bits)
            continue
        k = _rice_param_for(part)
        bw.write(k, 4)
        u = part.astype(np.int64)
        zz = (u << 1) ^ (u >> 63)  # zigzag fold
        for v in zz:
            v = int(v)
            bw.write_unary(v >> k)
            if k:
                bw.write(v & ((1 << k) - 1), k)


def _read_residual(rd: _BitReader, block_size: int, pred_order: int
                   ) -> np.ndarray:
    method = rd.read(2)
    if method not in (0b00, 0b01):
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0b00 else 5
    escape = (1 << pbits) - 1
    partition_order = rd.read(4)
    nparts = 1 << partition_order
    if block_size % nparts:
        raise ValueError("FLAC: block size not divisible by partitions")
    per = block_size >> partition_order
    out = np.empty(block_size - pred_order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        n = per - pred_order if p == 0 else per
        k = rd.read(pbits)
        if k == escape:
            raw_bits = rd.read(5)
            for j in range(n):
                out[w + j] = rd.read_signed(raw_bits) if raw_bits else 0
        else:
            for j in range(n):
                q = rd.read_unary()
                v = (q << k) | rd.read(k) if k else q
                out[w + j] = (v >> 1) ^ -(v & 1)  # zigzag unfold
        w += n
    return out


# ----------------------------------------------------------- subframes ---


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int,
                    mode: str, partition_order: int,
                    lpc_spec: tuple | None = None,
                    escape_parts: frozenset[int] = frozenset()) -> None:
    """One subframe. ``mode``: 'auto' | 'constant' | 'verbatim' |
    'fixed<k>' | 'lpc'. ``lpc_spec`` = (order, precision, shift,
    coefficients) — any integer coefficients are VALID FLAC as long as
    the encoder computes the residual with the same integer arithmetic
    the decoder inverts; the section uses deterministic formula-driven
    coefficients so the LPC decode path is certified without a
    Levinson-Durbin dependency."""
    x = x.astype(np.int64)
    # wasted bits: if every sample shares k low zero bits, shift them out
    wasted = 0
    if np.any(x):
        ored = int(np.bitwise_or.reduce(x))
        while not ored & 1:
            wasted += 1
            ored >>= 1
        wasted = min(wasted, bps - 1)
    if wasted:
        x = x >> wasted
    eff_bps = bps - wasted

    def header(type_code: int) -> None:
        bw.write(0, 1)
        bw.write(type_code, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if mode == "auto":
        if np.all(x == x[0]):
            mode = "constant"
        else:
            best, best_cost = 0, None
            for k in range(5):
                if x.size <= k:
                    break
                cost = int(np.sum(np.abs(np.diff(x, k) if k else x)))
                if best_cost is None or cost < best_cost:
                    best, best_cost = k, cost
            mode = f"fixed{best}"

    if mode == "constant":
        header(0b000000)
        bw.write_signed(int(x[0]), eff_bps)
    elif mode == "verbatim":
        header(0b000001)
        for v in x:
            bw.write_signed(int(v), eff_bps)
    elif mode.startswith("fixed"):
        order = int(mode[5:])
        header(0b001000 | order)
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        _write_residual(bw, fixed_residual(x, order), x.size, order,
                        partition_order, escape_parts)
    elif mode == "lpc":
        order, precision, shift, coefs = lpc_spec
        assert 1 <= order <= 32 and len(coefs) == order
        header(0b100000 | (order - 1))
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(int(c), precision)
        c = np.asarray(coefs, dtype=np.int64)
        # residual[n] = x[n] - ((sum_j c[j]*x[n-1-j]) >> shift), n >= order
        hist = np.stack([x[order - 1 - j : x.size - 1 - j] for j in
                         range(order)])
        pred = (c @ hist) >> shift
        _write_residual(bw, x[order:] - pred, x.size, order,
                        partition_order, escape_parts)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


def _read_subframe(rd: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if rd.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    type_code = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1
    eff_bps = bps - wasted

    if type_code == 0b000000:  # CONSTANT
        x = np.full(block_size, rd.read_signed(eff_bps), dtype=np.int64)
    elif type_code == 0b000001:  # VERBATIM
        x = np.array([rd.read_signed(eff_bps) for _ in range(block_size)],
                     dtype=np.int64)
    elif 0b001000 <= type_code <= 0b001100:  # FIXED order 0-4
        order = type_code & 0b000111
        warmup = np.array([rd.read_signed(eff_bps) for _ in range(order)],
                          dtype=np.int64)
        res = _read_residual(rd, block_size, order)
        x = fixed_restore(res, warmup, order) if order else res
    elif type_code & 0b100000:  # LPC order 1-32
        order = (type_code & 0b011111) + 1
        warmup = [rd.read_signed(eff_bps) for _ in range(order)]
        precision = rd.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision code 1111")
        shift = rd.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = np.array([rd.read_signed(precision) for _ in range(order)],
                         dtype=np.int64)
        res = _read_residual(rd, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warmup
        for n in range(order, block_size):
            # serial IIR recurrence — the codec's intrinsic dependency
            pred = int(np.dot(coefs, x[n - order : n][::-1])) >> shift
            x[n] = res[n - order] + pred
    else:
        raise ValueError(f"FLAC: reserved subframe type {type_code:#08b}")
    return x << wasted


# ----------------------------------------------------------- container ---


def _streaminfo(min_bs: int, max_bs: int, min_fs: int, max_fs: int,
                rate: int, channels: int, bits: int, total: int,
                md5: bytes) -> bytes:
    bw = _BitWriter()
    bw.write(min_bs, 16)
    bw.write(max_bs, 16)
    bw.write(min_fs, 24)
    bw.write(max_fs, 24)
    bw.write(rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bits - 1, 5)
    bw.write(total, 36)  # 144 bits so far — byte-aligned by construction
    body = bw.getvalue() + md5
    assert len(body) == 34
    return body


def _md5_raw(samples: np.ndarray, bits: int) -> bytes:
    """MD5 of the unencoded audio: interleaved little-endian signed
    samples at bits/8 bytes each (STREAMINFO md5 definition)."""
    nbytes = bits // 8
    flat = samples.astype(np.int64).reshape(-1)
    u = (flat & ((1 << bits) - 1)).astype(np.uint64)
    arr = np.zeros((flat.size, nbytes), dtype=np.uint8)
    for b in range(nbytes):
        arr[:, b] = ((u >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(
            np.uint8
        )
    return hashlib.md5(arr.tobytes()).digest()


_BS_EXACT = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
             4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
             2048: 0b1011, 4096: 0b1100, 8192: 0b1101, 16384: 0b1110,
             32768: 0b1111}


def encode_flac(samples, sample_rate: int, bits: int = 16,
                block_size: int = 4096, stereo: str = "auto",
                subframe_mode: str = "auto", partition_order: int = 0,
                lpc_spec: tuple | None = None,
                escape_parts: frozenset[int] = frozenset()) -> bytes:
    """Encode ``samples`` (shape (n,) or (n, channels), ints) to a real
    FLAC stream. ``stereo``: auto | independent | left_side |
    right_side | mid_side. ``subframe_mode``/``partition_order``/
    ``lpc_spec``/``escape_parts`` steer which decode paths the stream
    exercises (the certification section cycles all of them)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    lim = 1 << (bits - 1)
    if np.any(x >= lim) or np.any(x < -lim):
        raise ValueError(f"samples exceed {bits}-bit range")
    md5 = _md5_raw(x, bits)

    frames = []
    min_fs = max_fs = None
    # RFC 9639 §8.2: STREAMINFO min/max block size EXCLUDE the last
    # block, which may be shorter. Under the fixed-blocksize strategy
    # every non-final frame is exactly the nominal size, so min = max =
    # nominal (the libFLAC convention) — never the final partial
    # block's length, which earlier versions wrote and which could dip
    # below the 16-sample floor the spec mandates for the field.
    min_bs = max_bs = min(block_size, 65535) if n else 0
    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        frame = _encode_frame(blk, fi, sample_rate, bits, stereo,
                              subframe_mode, partition_order, lpc_spec,
                              escape_parts)
        min_fs = len(frame) if min_fs is None else min(min_fs, len(frame))
        max_fs = len(frame) if max_fs is None else max(max_fs, len(frame))
        frames.append(frame)

    head = bytearray(_MAGIC)
    info = _streaminfo(min_bs or 0, max_bs or 0, min_fs or 0, max_fs or 0,
                       sample_rate, channels, bits, n, md5)
    head += bytes([0x80 | 0x00])  # last-metadata-block flag | STREAMINFO
    head += len(info).to_bytes(3, "big")
    head += info
    return bytes(head) + b"".join(frames)


def _encode_frame(blk: np.ndarray, frame_no: int, rate: int, bits: int,
                  stereo: str, subframe_mode: str, partition_order: int,
                  lpc_spec: tuple | None,
                  escape_parts: frozenset[int]) -> bytes:
    bs, channels = blk.shape
    if stereo == "auto":
        stereo = "independent"
    if channels != 2:
        stereo = "independent"

    if stereo == "independent":
        chan_code = channels - 1
        subs = [(blk[:, c], bits) for c in range(channels)]
    else:
        left = blk[:, 0]
        right = blk[:, 1]
        side = left - right
        if stereo == "left_side":
            chan_code = 0b1000
            subs = [(left, bits), (side, bits + 1)]
        elif stereo == "right_side":
            chan_code = 0b1001
            subs = [(side, bits + 1), (right, bits)]
        elif stereo == "mid_side":
            chan_code = 0b1010
            mid = (left + right) >> 1
            subs = [(mid, bits), (side, bits + 1)]
        else:
            raise ValueError(f"unknown stereo mode {stereo!r}")

    bw = _BitWriter()
    bw.write(0b11111111111110, 14)  # sync
    bw.write(0, 1)                  # reserved
    bw.write(0, 1)                  # fixed-blocksize strategy
    bs_code = _BS_EXACT.get(bs, 0b0111)  # else 16-bit "end of header"
    bw.write(bs_code, 4)
    sr_inv = {v: k for k, v in _SR_TABLE.items()}
    sr_code = sr_inv.get(rate, 0b0000)  # 0000 = from STREAMINFO
    bw.write(sr_code, 4)
    bw.write(chan_code, 4)
    bps_inv = {v: k for k, v in _BPS_TABLE.items()}
    bw.write(bps_inv.get(bits, 0b000), 3)
    bw.write(0, 1)                  # reserved
    for b in _utf8_encode_number(frame_no):
        bw.write(b, 8)
    if bs_code == 0b0111:
        bw.write(bs - 1, 16)
    # header is byte-aligned by construction (32 bits + whole utf8 bytes
    # [+16-bit blocksize field]) — getvalue() asserts it
    hdr_bytes = bw.getvalue()
    hdr_bytes += bytes([crc8(hdr_bytes)])

    body = _BitWriter()
    for sig, eff_bits in subs:
        _write_subframe(body, sig, eff_bits, subframe_mode,
                        partition_order, lpc_spec, escape_parts)
    body.align()
    frame = hdr_bytes + body.getvalue()
    return frame + struct.pack(">H", crc16(frame))


def probe_flac_metadata(payload: bytes) -> dict:
    """O(header) STREAMINFO probe — the no-decode pass a 100 TB corpus
    runs first. Returns rate/channels/bits/total_samples/duration."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        hdr = payload[pos : pos + 4]
        if len(hdr) != 4:
            raise ValueError("FLAC: truncated metadata block header")
        last = bool(hdr[0] & 0x80)
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        if pos + 4 + blen > len(payload):
            raise ValueError("FLAC: truncated metadata block body")
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            info = body
        pos += 4 + blen
        if last:
            break
    if info is None or len(info) != 34:
        raise ValueError("FLAC: missing STREAMINFO")
    rd = _BitReader(info)
    out = {
        "format": "flac",
        "min_block_size": rd.read(16),
        "max_block_size": rd.read(16),
        "min_frame_size": rd.read(24),
        "max_frame_size": rd.read(24),
        "sample_rate": rd.read(20),
        "channels": rd.read(3) + 1,
        "bits": rd.read(5) + 1,
        "total_samples": rd.read(36),
        "md5": info[18:34],
        "frames_offset": pos,
    }
    out["duration_s"] = (
        out["total_samples"] / out["sample_rate"] if out["sample_rate"] else 0.0
    )
    return out


def decode_flac(payload: bytes):
    """Decode a FLAC stream → (samples int32 (n, channels), sample_rate,
    bits). Verifies the header CRC-8, frame CRC-16 and the STREAMINFO
    MD5 of the decoded audio (lossless ⇒ must match exactly)."""
    meta = probe_flac_metadata(payload)
    rate0, channels0, bits0 = (meta["sample_rate"], meta["channels"],
                               meta["bits"])
    total = meta["total_samples"]
    # ONE reader (one unpackbits + set-bit index) shared by every frame
    rd = _BitReader(payload, meta["frames_offset"] * 8)
    chunks: list[np.ndarray] = []
    got = 0
    while rd.pos < len(payload) * 8 and (total == 0 or got < total):
        blk = _decode_frame(rd, payload, rate0, channels0, bits0)
        chunks.append(blk)
        got += blk.shape[0]
    out = (np.concatenate(chunks) if chunks
           else np.empty((0, channels0), dtype=np.int64))
    if total and out.shape[0] != total:
        raise ValueError(
            f"FLAC: decoded {out.shape[0]} samples, STREAMINFO says {total}"
        )
    if meta["md5"] != b"\x00" * 16 and _md5_raw(out, bits0) != meta["md5"]:
        raise ValueError("FLAC: MD5 mismatch — decoded audio is not "
                         "bit-identical to the encoded stream")
    return out.astype(np.int32), rate0, bits0


def _decode_frame(rd: _BitReader, payload: bytes, rate0: int,
                  channels0: int, bits0: int):
    byte_pos = rd.pos // 8
    if rd.read(14) != 0b11111111111110:
        raise ValueError("FLAC: lost frame sync")
    if rd.read(1):
        raise ValueError("FLAC: reserved header bit set")
    variable = rd.read(1)
    bs_code = rd.read(4)
    sr_code = rd.read(4)
    chan_code = rd.read(4)
    bps_code = rd.read(3)
    if rd.read(1):
        raise ValueError("FLAC: reserved header bit set")
    _utf8_decode_number(rd)  # frame (or first-sample) number
    if bs_code == 0b0000:
        raise ValueError("FLAC: reserved blocksize code")
    elif bs_code == 0b0001:
        bs = 192
    elif bs_code <= 0b0101:
        bs = 576 << (bs_code - 2)
    elif bs_code == 0b0110:
        bs = rd.read(8) + 1
    elif bs_code == 0b0111:
        bs = rd.read(16) + 1
    else:
        bs = 256 << (bs_code - 8)
    if sr_code == 0b0000:
        rate = rate0
    elif sr_code in _SR_TABLE:
        rate = _SR_TABLE[sr_code]
    elif sr_code == 0b1100:
        rate = rd.read(8) * 1000
    elif sr_code == 0b1101:
        rate = rd.read(16)
    elif sr_code == 0b1110:
        rate = rd.read(16) * 10
    else:
        raise ValueError("FLAC: invalid sample-rate code")
    bits = bits0 if bps_code == 0b000 else _BPS_TABLE.get(bps_code)
    if bits is None:
        raise ValueError("FLAC: reserved sample-size code")

    hdr_end = rd.pos // 8  # header is byte-aligned before the CRC byte
    expect_crc8 = rd.read(8)
    if crc8(payload[byte_pos:hdr_end]) != expect_crc8:
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    if chan_code <= 0b0111:
        nch = chan_code + 1
        sigs = [_read_subframe(rd, bs, bits) for _ in range(nch)]
        blk = np.stack(sigs, axis=1)
    else:
        if chan_code == 0b1000:  # left-side
            left = _read_subframe(rd, bs, bits)
            side = _read_subframe(rd, bs, bits + 1)
            right = left - side
            blk = np.stack([left, right], axis=1)
        elif chan_code == 0b1001:  # right-side (side stored first)
            side = _read_subframe(rd, bs, bits + 1)
            right = _read_subframe(rd, bs, bits)
            blk = np.stack([side + right, right], axis=1)
        elif chan_code == 0b1010:  # mid-side
            mid = _read_subframe(rd, bs, bits)
            side = _read_subframe(rd, bs, bits + 1)
            m2 = (mid << 1) | (side & 1)
            blk = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=1)
        else:
            raise ValueError("FLAC: reserved channel assignment")

    rd.align()
    frame_end = rd.pos // 8
    expect_crc16 = rd.read(16)
    if crc16(payload[byte_pos:frame_end]) != expect_crc16:
        raise ValueError("FLAC: frame CRC-16 mismatch")
    return blk
