"""Dependency-free CCITT Group 3 / Group 4 fax codec (pure Python).

REAL bilevel fax decode/encode for the three TIFF CCITT compression
schemes, written from the public ITU-T Recommendations:

  TIFF compression 2      "CCITT RLE": T.4 modified-Huffman (MH) run
                          coding, one line at a time, each line's
                          codes starting on a byte boundary (TIFF 6.0
                          §10 variant — no EOL codes).
  TIFF compression 3      Group 3 (ITU-T T.4): MH runs with an EOL
                          code (000000000001) before each line;
                          T4Options bit 0 adds the 2-D mode where each
                          EOL carries a 1-bit tag (1 = next line 1-D,
                          0 = 2-D vertical/horizontal/pass coding
                          against the previous line).
  TIFF compression 4      Group 4 (ITU-T T.6), a.k.a. MMR: pure 2-D
                          coding with an imaginary all-white reference
                          line above the first row, no EOLs, ended by
                          EOFB (two EOLs back-to-back).

The terminating (runs 0..63) and make-up (64..2560) codewords for
white and black runs are hand-transcribed from the normative tables in
T.4 §2.2.4 (Tables 2 and 3) and the shared extended make-up set of
Table 4 — the same spec-literal transcription discipline as the T.81
Annex-K tables in operators/jpeg.py and the TIFF 6.0 §13 LZW vectors
(tests/test_spec_vectors.py pins a sample of codewords and the
prefix-freeness of the full table).

The 2-D coder follows T.4 §2.2.3 / T.6 §2.2: lines are represented by
their changing elements (positions whose color differs from the pixel
to the left, first pixel's left neighbor imaginarily white; even
indices are white→black transitions, odd black→white). For each step
the reference elements b1 (first changing element on the reference
line right of a0 with the parity that flips the current color) and b2
(the next one after it) select pass (b2 < a1), vertical (|a1-b1| ≤ 3)
or horizontal (MH-coded run pair) mode.

Pixel convention: the codec side of a bilevel fax is defined on
white/black runs with every line starting white; this module's
bitmaps are uint8 arrays with 0 = white, 1 = black. The TIFF layer
(operators/tiff.py) maps that through PhotometricInterpretation
(0 = WhiteIsZero → bit 0 renders white; 1 = BlackIsZero → inverted)
and FillOrder (tag 266: 2 = bits of each byte reversed).

Uncompressed mode (T.4 §2.2.5, Table 5; T6Options/T4Options bit 1) is
implemented as of round 12 — entry via the 2-D extension code
0000001 + type 111 or the 12-bit 1-D entry code, literal pixel
patterns, exit codes with the next-run colour tag; the encoder can
force it per line (``uncompressed=True``), which is the escape hatch
real encoders use on noisy lines where run coding expands. Reserved
2-D extension types other than 111 still raise NotImplementedError.
One caveat, same class as PLANS.md #18's provenance rule: T.4 prints
no worked uncompressed-mode example, so the exit-code pixel-position
resume convention is certified by round-trip + prefix-freeness + the
transcribed Table 5 codewords, not by third-party bytes.

Scale note: like the sibling codecs this runs inside Arrow-batched
``mapInPandas`` kernels (operators/multimodal.py) — per-item Python
cost, no shuffle; a 100 TB scan of scanned-document TIFFs decodes
embarrassingly parallel, one document per task.

Reference parity note: the reference app (events.js) has no media
path — engine extension surface.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------
# T.4 §2.2.4 Table 2 — terminating codes, white runs 0..63
# (hand-transcribed; tests/test_spec_vectors.py pins samples + counts)
_WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100",
]

# T.4 §2.2.4 Table 2 — terminating codes, black runs 0..63
_BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111",
]

# T.4 §2.2.4 Table 3 — make-up codes 64..1728 (steps of 64)
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# T.4 §2.2.4 Table 4 — extended make-up codes 1792..2560, shared by
# both colors
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.4 §2.2.3 Table 1 / T.6 — 2-D mode codes
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}
_EXT_2D = "0000001"  # 2-D extensions prefix (T.4 §2.2.4/Table 1)

# T.4 §2.2.5 Table 5 — uncompressed mode code words. Image-pattern
# codes are literal pixels (0 = white, 1 = black): n ≤ 4 white pixels
# followed by one black pixel code as n zeros + '1'; five whites with
# no black are '000001'. Exit code words carry 0-4 pending white
# pixels as extra leading zeros — (6+n) zeros, a '1', then the tag bit
# T giving the colour of the next normally-coded run (0 = white,
# 1 = black). Entry: in 2-D coding the extension code 0000001 followed
# by the 3-bit extension type 111; in 1-D (MH) coding the 12-bit code
# below (prefix-unique against every Table 2/3/4 run code — pinned in
# tests/test_spec_vectors.py — and distinguishable from EOL, which has
# 11 leading zeros).
_UNC_RUN = ["1", "01", "001", "0001", "00001"]  # n whites + one black
_UNC_FIVE = "000001"  # five whites, no terminating black
_UNC_EXT_TYPE = "111"  # extension type bits selecting uncompressed
_UNC_ENTRY_1D = "000000001111"

_EOL = "000000000001"


def _build_decode(term, makeup):
    """(length, codevalue) → (run, is_terminating) decode map."""
    m: dict[tuple[int, int], tuple[int, bool]] = {}
    for run, code in enumerate(term):
        m[(len(code), int(code, 2))] = (run, True)
    for run, code in makeup.items():
        m[(len(code), int(code, 2))] = (run, False)
    for run, code in _EXT_MAKEUP.items():
        m[(len(code), int(code, 2))] = (run, False)
    return m


_WHITE_DECODE = _build_decode(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DECODE = _build_decode(_BLACK_TERM, _BLACK_MAKEUP)

_MODE_DECODE = {
    (len(_MODE_PASS), int(_MODE_PASS, 2)): ("pass", 0),
    (len(_MODE_HORIZ), int(_MODE_HORIZ, 2)): ("horiz", 0),
    (len(_EXT_2D), int(_EXT_2D, 2)): ("ext", 0),
    **{
        (len(code), int(code, 2)): ("vert", d)
        for d, code in _MODE_V.items()
    },
}


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        """Pad with 0 bits to the next byte boundary."""
        if self.nbits:
            self.buf.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over the coded bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def read1(self) -> int:
        if self.pos >= len(self.data) * 8:
            raise ValueError("CCITT: coded data exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def peek_eol(self) -> bool:
        """True if the next bits (after ≥0 zero fill bits) are an EOL;
        does not consume unless matched."""
        save = self.pos
        zeros = 0
        try:
            while True:
                b = self.read1()
                if b == 1:
                    if zeros >= 11:
                        return True  # consumed fill + EOL
                    self.pos = save
                    return False
                zeros += 1
                if zeros > 64 + 11:  # fill is bounded in practice
                    self.pos = save
                    return False
        except ValueError:
            self.pos = save
            return False


def _read_mode(r: _BitReader):
    code, ln = 0, 0
    while ln < 7:
        code = (code << 1) | r.read1()
        ln += 1
        hit = _MODE_DECODE.get((ln, code))
        if hit:
            return hit
    raise ValueError("CCITT: invalid 2-D mode code")


def _decode_uncompressed(
    r: _BitReader, pos: int, white: bool, cur: list[int], w: int
) -> tuple[int, bool]:
    """T.4 §2.2.5 uncompressed mode: literal pixel coding from ``pos``
    with current run colour ``white``, appending changing elements to
    ``cur``, until an exit code. Returns (resume position, colour of
    the next normally-coded run — the exit code's tag bit)."""

    def emit(black: bool) -> None:
        nonlocal pos, white
        if pos >= w:
            raise ValueError("CCITT: uncompressed data overruns the line")
        if black == white:  # literal pixel differs from run colour
            cur.append(pos)
            white = not white
        pos += 1

    while True:
        zeros = 0
        while not r.read1():
            zeros += 1
            if zeros > 10:
                raise ValueError("CCITT: invalid uncompressed code")
        if zeros <= 4:  # n whites then one black
            for _ in range(zeros):
                emit(False)
            emit(True)
        elif zeros == 5:  # five whites, run continues
            for _ in range(5):
                emit(False)
        else:  # exit: zeros-6 pending whites, then the colour tag
            for _ in range(zeros - 6):
                emit(False)
            next_white = r.read1() == 0
            if next_white != white and pos < w:
                # the new colour's run starts here: a changing element
                cur.append(pos)
            return pos, next_white


def _try_read(r: _BitReader, code: str) -> bool:
    """Consume ``code`` if it is exactly the next bits; else restore."""
    save = r.pos
    for ch in code:
        if r.bits_left() == 0 or r.read1() != (ch == "1"):
            r.pos = save
            return False
    return True


def _read_run(r: _BitReader, white: bool) -> int:
    """One complete run length: zero or more make-up codes followed by
    a terminating code (T.4 §2.2.4: runs ≥ 64 use a make-up plus a
    terminating code; ≥ 2624 chain multiple make-ups — T.6 allows it)."""
    table = _WHITE_DECODE if white else _BLACK_DECODE
    total = 0
    while True:
        code, ln = 0, 0
        while ln < 14:
            code = (code << 1) | r.read1()
            ln += 1
            hit = table.get((ln, code))
            if hit:
                run, is_term = hit
                total += run
                if is_term:
                    return total
                break
        else:
            raise ValueError(
                f"CCITT: invalid {'white' if white else 'black'} run code"
            )


def _changes_to_row(changes: list[int], w: int) -> np.ndarray:
    """Changing-element positions → uint8 row (0 white / 1 black)."""
    row = np.zeros(w, dtype=np.uint8)
    it = iter(changes)
    for start in it:
        end = next(it, w)
        row[start:end] = 1
    return row


def _row_to_changes(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(np.concatenate(([0], row.astype(np.int8)))))
    return d.tolist()


def _decode_2d_line(r: _BitReader, ref: list[int], w: int) -> list[int]:
    """One 2-D coded line against reference changing elements ``ref``
    (T.4 §2.2.3 / T.6 §2.2.4)."""
    cur: list[int] = []
    a0 = -1
    white = True
    while a0 < w:
        # b1: first changing element of ref > a0 whose parity flips the
        # current color (even index = white→black). b2: the next one.
        idx = 0
        n = len(ref)
        # linear scan is fine: lines are short and ref is walked in order
        while idx < n and ref[idx] <= a0:
            idx += 1
        if (idx & 1) != (0 if white else 1):
            idx += 1
        b1 = ref[idx] if idx < n else w
        b2 = ref[idx + 1] if idx + 1 < n else w

        mode, d = _read_mode(r)
        if mode == "ext":
            ext = (r.read1() << 2) | (r.read1() << 1) | r.read1()
            if ext != 0b111:
                raise NotImplementedError(
                    f"CCITT: 2-D extension type {ext:03b} is reserved "
                    "(only 111 = uncompressed mode is defined)"
                )
            pos = a0 if a0 > 0 else 0
            a0, white = _decode_uncompressed(r, pos, white, cur, w)
            continue
        if mode == "pass":
            a0 = b2
            continue
        if mode == "vert":
            a1 = b1 + d
            if a1 < 0 or a1 > w or a1 <= a0:
                raise ValueError("CCITT: vertical mode out of order")
            cur.append(a1)
            a0 = a1
            white = not white
            continue
        # horizontal: two MH runs (current color then the opposite)
        start = a0 if a0 > 0 else 0
        run1 = _read_run(r, white)
        run2 = _read_run(r, not white)
        a1 = start + run1
        a2 = a1 + run2
        if a2 > w or a1 > w:
            raise ValueError("CCITT: horizontal runs overflow the line")
        cur.append(a1)
        cur.append(a2)
        a0 = a2
    return [c for c in cur if c < w]


def decode_ccitt(
    data: bytes, w: int, h: int, scheme: int,
    t4_options: int = 0, fillorder: int = 1,
) -> np.ndarray:
    """Decode a CCITT-coded TIFF strip → (h, w) uint8, 0 = white,
    1 = black. ``scheme`` is the TIFF compression value (2, 3 or 4);
    ``t4_options`` is the T4Options tag (292) for scheme 3 (bit 0 =
    2-D lines present); ``fillorder`` 2 reverses the bits of every
    byte first (TIFF tag 266)."""
    if scheme not in (2, 3, 4):
        raise ValueError(f"CCITT: unknown scheme {scheme}")
    if w <= 0 or h <= 0:
        raise ValueError("CCITT: empty image")
    if fillorder == 2:
        data = bytes(_FILL_REVERSE[b] for b in data)
    elif fillorder != 1:
        raise ValueError(f"CCITT: unsupported FillOrder {fillorder}")
    # t4_options bit 1 ("uncompressed mode allowed") needs no gate:
    # the decoder recognises the entry codes wherever they appear
    two_d_allowed = scheme == 3 and (t4_options & 1)
    r = _BitReader(data)
    rows = np.zeros((h, w), dtype=np.uint8)
    ref: list[int] = []  # imaginary all-white line above row 0
    for y in range(h):
        if scheme == 2:
            r.align()  # TIFF 6.0 §10: each line begins byte-aligned
            boundaries = _read_1d_boundaries(r, w)
            changes = [b for b in boundaries if b < w]
        elif scheme == 3:
            if not r.peek_eol():
                raise ValueError("CCITT: G3 line missing EOL")
            if two_d_allowed:
                tag = r.read1()  # 1 = 1-D line, 0 = 2-D line
                if tag:
                    boundaries = _read_1d_boundaries(r, w)
                    changes = [b for b in boundaries if b < w]
                else:
                    changes = _decode_2d_line(r, ref, w)
            else:
                boundaries = _read_1d_boundaries(r, w)
                changes = [b for b in boundaries if b < w]
        else:  # scheme 4: pure 2-D
            changes = _decode_2d_line(r, ref, w)
        if any(
            changes[k] > changes[k + 1] for k in range(len(changes) - 1)
        ):
            raise ValueError("CCITT: non-monotonic changing elements")
        rows[y] = _changes_to_row(changes, w)
        ref = changes
    return rows


def _read_1d_boundaries(r: _BitReader, w: int) -> list[int]:
    """One MH-coded line → cumulative change positions (a final
    boundary at ``w`` appears when the line ends mid-run). Uncompressed
    segments (T.4 §2.2.5, 12-bit 1-D entry code) may appear before any
    run and code literal pixels until their exit code."""
    boundaries: list[int] = []
    pos = 0
    white = True
    while pos < w:
        if _try_read(r, _UNC_ENTRY_1D):
            pos, white = _decode_uncompressed(r, pos, white, boundaries, w)
            continue
        run = _read_run(r, white)
        pos += run
        if pos > w:
            raise ValueError("CCITT: 1-D run overflows the line")
        boundaries.append(pos)
        white = not white
    return boundaries


_FILL_REVERSE = bytes(
    int(f"{b:08b}"[::-1], 2) for b in range(256)
)


# ------------------------------------------------------------ encoder --


def _encode_run(wtr: _BitWriter, run: int, white: bool) -> None:
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = _WHITE_MAKEUP if white else _BLACK_MAKEUP
    while run >= 2624:  # chain extended make-ups (T.6 permits)
        wtr.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        if m > 1728:
            wtr.write(_EXT_MAKEUP[m])
        else:
            wtr.write(makeup[m])
        run -= m
    wtr.write(term[run])


def _encode_1d_line(wtr: _BitWriter, row: np.ndarray, w: int) -> None:
    changes = _row_to_changes(row)
    pos = 0
    white = True
    for c in changes + [w]:
        _encode_run(wtr, c - pos, white)
        pos = c
        white = not white
    # T.4: a line ending on a black run is complete after that run;
    # the loop above always ends each color run explicitly (a final
    # zero-length run is emitted only when the line ends black, which
    # the decoder consumes as the white run of length 0 -- NOT needed:
    # decoding stops at pos == w, so nothing extra is written here.


def _encode_2d_line(
    wtr: _BitWriter, row: np.ndarray, ref: list[int], w: int
) -> None:
    cur = _row_to_changes(row)
    a0 = -1
    white = True
    ci = 0  # index into cur of the next changing element > a0
    while a0 < w:
        while ci < len(cur) and cur[ci] <= a0:
            ci += 1
        a1 = cur[ci] if ci < len(cur) else w
        a2 = cur[ci + 1] if ci + 1 < len(cur) else w
        idx = 0
        while idx < len(ref) and ref[idx] <= a0:
            idx += 1
        if (idx & 1) != (0 if white else 1):
            idx += 1
        b1 = ref[idx] if idx < len(ref) else w
        b2 = ref[idx + 1] if idx + 1 < len(ref) else w
        if b2 < a1:
            wtr.write(_MODE_PASS)
            a0 = b2
            continue
        if abs(a1 - b1) <= 3:
            wtr.write(_MODE_V[a1 - b1])
            a0 = a1
            white = not white
            continue
        start = a0 if a0 > 0 else 0
        wtr.write(_MODE_HORIZ)
        _encode_run(wtr, a1 - start, white)
        _encode_run(wtr, a2 - a1, not white)
        a0 = a2


def _encode_uncompressed_line(
    wtr: _BitWriter, row: np.ndarray, two_d: bool
) -> None:
    """One whole line in T.4 §2.2.5 uncompressed mode: the entry code
    for the current coding context, the literal pixel patterns, and an
    exit code carrying the trailing white pixels (T = 0: the encoder
    exits at end of line, where the next run is the next line's
    leading white by convention)."""
    wtr.write(_EXT_2D + _UNC_EXT_TYPE if two_d else _UNC_ENTRY_1D)
    zeros = 0
    for px in row:
        if px:
            wtr.write(_UNC_RUN[zeros])
            zeros = 0
        else:
            zeros += 1
            if zeros == 5:
                wtr.write(_UNC_FIVE)
                zeros = 0
    wtr.write("0" * (6 + zeros) + "1" + "0")  # exit, T = white


def encode_ccitt(
    bitmap, scheme: int, t4_options: int = 0, uncompressed: bool = False,
) -> bytes:
    """Encode an (h, w) 0/1 bitmap (0 = white) with TIFF compression
    ``scheme`` 2 (MH byte-aligned rows), 3 (G3: EOL per line; with
    ``t4_options`` bit 0 the first line is 1-D and the rest 2-D) or
    4 (G4/MMR, EOFB-terminated). ``uncompressed=True`` codes every
    line's pixels in T.4 §2.2.5 uncompressed mode (entry code, literal
    pixel patterns, exit code) — the escape hatch real encoders use
    when run coding would expand noisy data; pair it with T4Options/
    T6Options bit 1 at the TIFF layer."""
    row_arr = np.asarray(bitmap, dtype=np.uint8)
    if row_arr.ndim != 2:
        raise ValueError("CCITT: bitmap must be 2-D")
    if not np.isin(row_arr, (0, 1)).all():
        raise ValueError("CCITT: bitmap values must be 0 or 1")
    h, w = row_arr.shape
    wtr = _BitWriter()
    if scheme == 2:
        for y in range(h):
            wtr.align()
            if uncompressed:
                _encode_uncompressed_line(wtr, row_arr[y], two_d=False)
            else:
                _encode_1d_line(wtr, row_arr[y], w)
        return wtr.flush()
    if scheme == 3:
        two_d = bool(t4_options & 1)
        ref: list[int] = []
        for y in range(h):
            wtr.write(_EOL)
            if two_d:
                if y == 0:
                    wtr.write("1")  # tag: 1-D line
                    if uncompressed:
                        _encode_uncompressed_line(
                            wtr, row_arr[y], two_d=False
                        )
                    else:
                        _encode_1d_line(wtr, row_arr[y], w)
                else:
                    wtr.write("0")  # tag: 2-D line
                    if uncompressed:
                        _encode_uncompressed_line(
                            wtr, row_arr[y], two_d=True
                        )
                    else:
                        _encode_2d_line(wtr, row_arr[y], ref, w)
                ref = _row_to_changes(row_arr[y])
            elif uncompressed:
                _encode_uncompressed_line(wtr, row_arr[y], two_d=False)
            else:
                _encode_1d_line(wtr, row_arr[y], w)
        return wtr.flush()
    if scheme == 4:
        ref = []
        for y in range(h):
            if uncompressed:
                _encode_uncompressed_line(wtr, row_arr[y], two_d=True)
            else:
                _encode_2d_line(wtr, row_arr[y], ref, w)
            ref = _row_to_changes(row_arr[y])
        wtr.write(_EOL)
        wtr.write(_EOL)  # EOFB
        return wtr.flush()
    raise ValueError(f"CCITT: unknown scheme {scheme}")
