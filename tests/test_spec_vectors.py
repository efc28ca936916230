"""Spec-derived GOLDEN VECTORS for the codec fleet.

Every expected value in this file was transcribed or worked BY HAND
from the public specifications — none is computed by repo code — so a
systematic spec-misread shared by this engine's encoder and decoder
(which round-trip + closed-form harnesses cannot catch) fails here:

  - ITU-T T.81 (JPEG): Annex K.1 luminance quantization table, Annex
    K.3 DC / AC luminance Huffman specs and their Annex-C canonical
    codewords, and two hand-assembled byte streams decoded against
    hand-computed IDCT pixels.
  - PNG (ISO/IEC 15948 / RFC 2083): the universal IEND chunk CRC
    constant, and all five scanline filters re-implemented
    independently from the spec pseudocode (incl. Paeth tie-break
    order) driving a hand-built PNG through the repo decoder.
  - ISO/IEC 11172-3 (MPEG audio): the classic published frame-header
    vector 0xFF 0xFB 0x90 0x64 → 417-byte MPEG-1 Layer III frame, a
    Layer I vector (slot-of-4 sizing), and an MPEG-2 Layer III
    vector (72-factor sizing).
  - IMA "Recommended Practices" rev 3.00: the 89-entry step table and
    index-adaptation table literals, plus a hand-worked 3-nibble
    decode.
  - ITU-T G.711: the published A-law/mu-law endpoint values
    (mu-law ±32124 max / 0xFF↔0, A-law ±32256 max / silence ±8).
  - TIFF 6.0: §13's worked LZW example (input 7,7,7,8,8,7,7,6,6 →
    codes Clear,7,258,8,8,258,6,6,EOI, hand-packed MSB-first at 9
    bits) and §9's quoted Apple PackBits example (24 unpacked ↔ 15
    packed bytes), both asserted in BOTH directions.
"""

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------
# ITU-T T.81 Annex K literals (hand-transcribed)
# --------------------------------------------------------------------

# Table K.1 — luminance quantization values, natural (raster) order
T81_K1_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# T.81 Figure A.6 zig-zag sequence: natural index of each zigzag pos
T81_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Table K.3 — DC luminance Huffman spec (BITS per code length 1..16,
# then HUFFVAL) and the codewords the spec prints for it
T81_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
T81_DC_LUMA_VALS = list(range(12))
T81_DC_LUMA_CODEWORDS = {
    0: "00", 1: "010", 2: "011", 3: "100", 4: "101", 5: "110",
    6: "1110", 7: "11110", 8: "111110", 9: "1111110",
    10: "11111110", 11: "111111110",
}

# Table K.5 — AC luminance Huffman spec
T81_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
T81_AC_LUMA_VALS = [
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
# Codewords Table K.5 prints for the most common run/size symbols
T81_AC_LUMA_CODEWORDS = {
    0x00: "1010",          # EOB
    0x01: "00", 0x02: "01", 0x03: "100", 0x04: "1011",
    0x05: "11010", 0x06: "1111000", 0x11: "1100", 0x12: "11011",
    0x13: "1111001", 0x21: "11100", 0x31: "111010", 0x41: "111011",
    0xF0: "11111111001",   # ZRL
}


def _bits_to_str(code: int, length: int) -> str:
    return format(code, "b").zfill(length)


def test_t81_annex_k_dc_luma_codewords():
    """Annex-C canonical code assignment over the Annex K.3 DC
    luminance spec must reproduce the codewords the spec prints."""
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        _canonical_codes,
    )

    codes = _canonical_codes(T81_DC_LUMA_BITS, T81_DC_LUMA_VALS)
    got = {sym: _bits_to_str(c, ln) for sym, (c, ln) in codes.items()}
    assert got == T81_DC_LUMA_CODEWORDS


def test_t81_annex_k_ac_luma_codewords():
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        _canonical_codes,
    )

    assert sum(T81_AC_LUMA_BITS) == len(T81_AC_LUMA_VALS) == 162
    codes = _canonical_codes(T81_AC_LUMA_BITS, T81_AC_LUMA_VALS)
    for sym, want in T81_AC_LUMA_CODEWORDS.items():
        code, ln = codes[sym]
        assert _bits_to_str(code, ln) == want, hex(sym)


def _t81_tables_jpeg(entropy: bytes) -> bytes:
    """Hand-assemble a single-component 8x8 baseline JPEG carrying the
    Annex K.1 quantization table (zigzag order per B.2.4.1) and the
    Annex K.3/K.5 luminance Huffman tables, plus the given entropy-
    coded bytes. Built with struct only — no repo encoder involved."""
    dqt_zz = bytes(T81_K1_LUMA_QUANT[T81_ZIGZAG[k]] for k in range(64))
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + dqt_zz
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 2 + 6 + 3)
        + bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([1, 1, 0x11, 0])
    )
    dht_dc = (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(T81_DC_LUMA_VALS))
        + bytes([0x00])
        + bytes(T81_DC_LUMA_BITS)
        + bytes(T81_DC_LUMA_VALS)
    )
    dht_ac = (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(T81_AC_LUMA_VALS))
        + bytes([0x10])
        + bytes(T81_AC_LUMA_BITS)
        + bytes(T81_AC_LUMA_VALS)
    )
    sos = (
        b"\xff\xda"
        + struct.pack(">H", 2 + 1 + 2 + 3)
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"


def test_t81_hand_assembled_dc_only_decode():
    """DC-only golden vector: DC category 2, value bits '11' (=+3 per
    T.81 F.12 EXTEND), then EOB. With the K.1 table the DC step is 16,
    so the dequantized DC is 48 and the orthonormal IDCT constant
    block is 48/8 + 128 = 134 everywhere. Entropy bits:
    '011' (DC cat 2) + '11' + '1010' (EOB) + 1-padding = 0x7D 0x7F."""
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
    )

    img = decode_jpeg(_t81_tables_jpeg(bytes([0x7D, 0x7F])))
    assert img.shape == (8, 8, 3)
    assert (img == 134).all()


def test_t81_hand_assembled_ac_decode():
    """AC golden vector: DC category 0 ('00'), one AC coefficient via
    symbol 0x01 run=0/size=1 ('00') with value bit '1' (=+1), then EOB
    ('1010'): bits 000011010 + padding = 0x0D 0x7F. The coefficient
    lands at zigzag position 1 = natural (0,1) — horizontal frequency
    u=1 — and dequantizes by K.1's 11. Hand-computed IDCT row:
    pixel(x) = round(128 + 11/(4*sqrt(2)) * cos((2x+1)*pi/16)),
    identical for every row."""
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
    )

    img = decode_jpeg(_t81_tables_jpeg(bytes([0x0D, 0x7F])))
    assert img.shape == (8, 8, 3)
    want_row = [130, 130, 129, 128, 128, 127, 126, 126]
    for y in range(8):
        assert img[y, :, 0].tolist() == want_row, y
    assert (img[..., 0] == img[..., 1]).all()
    assert (img[..., 0] == img[..., 2]).all()


# --------------------------------------------------------------------
# PNG (ISO/IEC 15948): IEND CRC constant + independent filter vectors
# --------------------------------------------------------------------


def test_png_iend_crc_constant():
    """Every PNG file on earth ends with the same 12 bytes: a
    zero-length IEND chunk whose CRC is AE 42 60 82."""
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _png_chunk,
    )

    assert _png_chunk(b"IEND", b"") == bytes.fromhex("0000000049454e44ae426082")
    assert zlib.crc32(b"IEND") & 0xFFFFFFFF == 0xAE426082


def _spec_paeth(a: int, b: int, c: int) -> int:
    """PaethPredictor exactly as printed in the PNG spec (§ Filtering,
    'breaking ties in the order a, b, c')."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _spec_filter_row(ftype: int, row, prev, bpp: int) -> bytes:
    """Scanline filters 0-4 re-implemented independently from the spec
    definitions (Filt = Orig - predictor, mod 256)."""
    out = bytearray()
    for x, v in enumerate(row):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x] if prev is not None else 0
        c = prev[x - bpp] if prev is not None and x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2  # floor, per spec
        else:
            pred = _spec_paeth(a, b, c)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def test_png_paeth_tiebreak_literals():
    """Tie-break order a, b, c — worked cases from the spec rule."""
    assert _spec_paeth(2, 2, 1) == 2      # p=3: pa=1, pb=1 tie -> a
    assert _spec_paeth(10, 20, 15) == 15  # p=15: pa=5, pb=5, pc=0 -> c
    assert _spec_paeth(0, 9, 9) == 0      # p=0: pa=0 -> a
    assert _spec_paeth(9, 0, 9) == 0      # p=0: pb=0, pa=9 -> b
    assert _spec_paeth(5, 5, 9) == 5      # p=1: pa=4, pb=4, pc=8 -> a


def test_png_hand_built_all_filters_decode():
    """Build a PNG byte-by-byte with stdlib struct/zlib and the
    INDEPENDENT spec filter implementation above — one row per filter
    type, pixel data chosen to hit Paeth ties and Average floor — and
    the repo decoder must return the original pixels exactly."""
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_png,
    )

    w, h, bpp = 4, 5, 3
    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (h, w, bpp)).astype(np.uint8)
    # plant Paeth tie and Average floor cases on the row that uses them
    img[4, 1] = img[3, 1]          # b == orig-above
    img[4, 2] = img[4, 1]          # a tie candidates
    img[3, 0] = [1, 2, 3]
    img[3, 1] = [2, 3, 4]          # odd sums exercise Average floor
    raw = bytearray()
    prev = None
    for y in range(h):
        row = img[y].reshape(-1).tolist()
        raw.append(y % 5)  # filter types 0,1,2,3,4 on rows 0..4
        raw += _spec_filter_row(y % 5, row, prev, bpp)
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (h, w, 3)
    assert (out == img).all()


# --------------------------------------------------------------------
# MPEG audio (ISO/IEC 11172-3): published frame-header vectors
# --------------------------------------------------------------------


def test_mp3_classic_128kbps_vector():
    """The most-published MPEG header example: FF FB 90 64 = MPEG-1
    Layer III, 128 kbps, 44100 Hz, no padding → frame length
    floor(144 * 128000 / 44100) = 417 bytes, 1152 samples/frame."""
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        probe_audio_metadata,
    )

    frame = bytes([0xFF, 0xFB, 0x90, 0x64]) + b"\x00" * 413  # 417 total
    meta = probe_audio_metadata(frame * 2)
    assert meta["mpeg_version"] == "1"
    assert meta["layer"] == 3
    assert meta["sample_rate"] == 44100
    assert meta["n_frames"] == 2
    assert meta["duration_s"] == 2 * 1152 / 44100
    assert not meta["vbr"]
    # a 418-byte padded frame (padding bit set) also walks cleanly
    padded = bytes([0xFF, 0xFB, 0x92, 0x64]) + b"\x00" * 414  # 418 total
    meta = probe_audio_metadata(padded * 2)
    assert meta["n_frames"] == 2 and meta["layer"] == 3


def test_mp3_layer1_slot_of_4_vector():
    """Layer I sizes in 4-byte slots: FF FF 88 00 = MPEG-1 Layer I,
    256 kbps, 32000 Hz → (12*256000/32000)*4 = 384 bytes, 384
    samples/frame."""
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        probe_audio_metadata,
    )

    frame = bytes([0xFF, 0xFF, 0x88, 0x00]) + b"\x00" * 380  # 384 total
    meta = probe_audio_metadata(frame * 3)
    assert meta["mpeg_version"] == "1"
    assert meta["layer"] == 1
    assert meta["sample_rate"] == 32000
    assert meta["n_frames"] == 3
    assert meta["duration_s"] == 3 * 384 / 32000
    assert meta["channel_mode"] == "stereo"


def test_mp3_mpeg2_layer3_72_factor_vector():
    """MPEG-2 Layer III uses the 72 factor (576 samples/frame):
    FF F3 80 00 = MPEG-2 Layer III, 64 kbps, 22050 Hz →
    floor(72 * 64000 / 22050) = 208 bytes."""
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        probe_audio_metadata,
    )

    frame = bytes([0xFF, 0xF3, 0x80, 0x00]) + b"\x00" * 204  # 208 total
    meta = probe_audio_metadata(frame * 2)
    assert meta["mpeg_version"] == "2"
    assert meta["layer"] == 3
    assert meta["sample_rate"] == 22050
    assert meta["n_frames"] == 2
    assert meta["duration_s"] == 2 * 576 / 22050


# --------------------------------------------------------------------
# IMA ADPCM ("Recommended Practices...", rev 3.00) table + hand vector
# --------------------------------------------------------------------

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def test_ima_spec_table_literals():
    from twilio_event_streams_reporting_example_spark.operators.adpcm import (
        INDEX_TABLE,
        STEP_TABLE,
    )

    assert STEP_TABLE.tolist() == IMA_STEP_TABLE
    assert len(IMA_STEP_TABLE) == 89
    assert INDEX_TABLE.tolist() == IMA_INDEX_TABLE


def test_ima_hand_worked_vector():
    """pred0=0, index0=0, nibbles [0x7, 0xF, 0x0], worked by hand from
    the IMA quantizer (diff = step>>3 (+step>>2)(+step>>1)(+step)):
      n=7: step=7:  diff=0+1+3+7=11,  pred=11,  index=0+8=8
      n=F: step=16: diff=2+4+8+16=30, pred=11-30=-19, index=8+8=16
      n=0: step=34: diff=4,           pred=-15, index=16-1=15
    """
    from twilio_event_streams_reporting_example_spark.operators.adpcm import (
        decode_blocks,
        reference_decode_nibbles,
    )

    assert reference_decode_nibbles([0x7, 0xF, 0x0], 0, 0) == [0, 11, -19, -15]
    # and the vectorized block decoder agrees byte-for-byte: one block,
    # header (pred 0, index 0) + nibbles 7,F,0 padded with an 8th-pos
    # batch of zeros (low nibble first packing)
    nibs = np.array([0x7, 0xF, 0x0, 0, 0, 0, 0, 0], dtype=np.uint8)
    packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
    blk = struct.pack("<hBB", 0, 0, 0) + packed.tobytes()
    out = decode_blocks(blk, len(blk), 1)
    assert out[:4, 0].tolist() == [0, 11, -19, -15]


# --------------------------------------------------------------------
# ITU-T G.711: published expansion endpoints
# --------------------------------------------------------------------


def test_g711_published_endpoints():
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _g711_alaw_to_linear,
        _g711_ulaw_to_linear,
    )

    u = _g711_ulaw_to_linear(np.array([0x00, 0x80, 0xFF, 0x7F], np.uint8))
    # mu-law peak magnitude is 32124; 0xFF and 0x7F are ±zero
    assert u.tolist() == [-32124, 32124, 0, 0]
    a = _g711_alaw_to_linear(np.array([0x2A, 0xAA, 0x55, 0xD5], np.uint8))
    # A-law peak magnitude is 32256; silence codes decode to ±8
    assert a.tolist() == [-32256, 32256, -8, 8]
    # monotone magnitude along each chord endpoint sequence
    useq = _g711_ulaw_to_linear(np.arange(0x80, 0x100, dtype=np.uint8))
    assert (np.diff(useq.astype(np.int32)) <= 0).all()


# --------------------------------------------------------------------
# TIFF 6.0 §13 (LZW) and §9 (PackBits): the spec's own worked examples
# --------------------------------------------------------------------

# §13's worked LZW example input — the 9-pixel sequence the spec
# compresses step by step in its "Coding" walkthrough.
TIFF13_INPUT = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])

# The code sequence the spec derives for that input:
#   ClearCode(256), 7, 258, 8, 8, 258, 6, 6, EOI(257)
# packed MSB-first at 9 bits each (81 bits → 11 bytes, zero-padded).
# The byte values below were packed BY HAND from those codes:
#   100000000|000000111|100000010|000001000|000001000|100000010|
#   000000110|000000110|100000001 + 0000000
TIFF13_LZW_BYTES = bytes.fromhex("80 01 e0 40 80 44 08 0c 06 80 80".replace(" ", ""))


def test_tiff_s13_lzw_worked_example_decodes():
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        _tiff_lzw_decode,
    )

    assert _tiff_lzw_decode(TIFF13_LZW_BYTES, 9) == TIFF13_INPUT


def test_tiff_s13_lzw_worked_example_encodes_exactly():
    # the spec's greedy string-table algorithm is deterministic, so a
    # conformant encoder must reproduce the example codes byte-exactly
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        _tiff_lzw_encode,
    )

    assert _tiff_lzw_encode(TIFF13_INPUT) == TIFF13_LZW_BYTES


# §9 quotes Apple's PackBits worked example verbatim: 24 unpacked
# bytes and the 15 packed bytes they compress to.
TIFF9_PACKBITS_UNPACKED = bytes.fromhex(
    "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA"
)
TIFF9_PACKBITS_PACKED = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")


def test_tiff_s9_packbits_worked_example_decodes():
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        _packbits_decode,
    )

    assert (
        _packbits_decode(TIFF9_PACKBITS_PACKED, 24)
        == TIFF9_PACKBITS_UNPACKED
    )


def test_tiff_s9_packbits_worked_example_encodes_exactly():
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        _packbits_encode_row,
    )

    assert (
        _packbits_encode_row(TIFF9_PACKBITS_UNPACKED)
        == TIFF9_PACKBITS_PACKED
    )


# --------------------------------------------------------------------
# ITU-T T.4 (Group 3 fax) code tables — hand-transcribed samples
# --------------------------------------------------------------------

# T.4 §2.2.4 Table 2 — terminating codewords (sample rows copied by
# hand from the Recommendation's printed table; the module's full
# 64-entry tables must agree entry-for-entry on this sample)
T4_WHITE_TERM_SAMPLE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    8: "10011", 16: "101010", 29: "00000010", 32: "00011011",
    45: "00000100", 63: "00110100",
}
T4_BLACK_TERM_SAMPLE = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    8: "000101", 12: "0000111", 19: "00001100111", 26: "000011001010",
    44: "000001010100", 63: "000001100111",
}
# T.4 §2.2.4 Table 3 — make-up codewords (sample)
T4_WHITE_MAKEUP_SAMPLE = {
    64: "11011", 128: "10010", 192: "010111", 1664: "011000",
    1728: "010011011", 960: "011010100",
}
T4_BLACK_MAKEUP_SAMPLE = {
    64: "0000001111", 128: "000011001000", 512: "0000001101100",
    1728: "0000001100101",
}
# T.4 §2.2.4 Table 4 — extended make-up (shared by both colors)
T4_EXT_MAKEUP_SAMPLE = {
    1792: "00000001000", 1856: "00000001100", 2560: "000000011111",
}
# T.4 §2.2.3 Table 1 — 2-D mode codewords, and the EOL sync code
T4_MODE_CODEWORDS = {
    "pass": "0001", "horizontal": "001", "v0": "1",
    "vr1": "011", "vr2": "000011", "vr3": "0000011",
    "vl1": "010", "vl2": "000010", "vl3": "0000010",
}
T4_EOL = "000000000001"


def test_t4_codeword_samples_match_module_tables():
    from twilio_event_streams_reporting_example_spark.operators.ccitt import (
        _BLACK_MAKEUP,
        _BLACK_TERM,
        _EOL,
        _EXT_MAKEUP,
        _MODE_HORIZ,
        _MODE_PASS,
        _MODE_V,
        _WHITE_MAKEUP,
        _WHITE_TERM,
    )

    for run, code in T4_WHITE_TERM_SAMPLE.items():
        assert _WHITE_TERM[run] == code, f"white term {run}"
    for run, code in T4_BLACK_TERM_SAMPLE.items():
        assert _BLACK_TERM[run] == code, f"black term {run}"
    for run, code in T4_WHITE_MAKEUP_SAMPLE.items():
        assert _WHITE_MAKEUP[run] == code, f"white makeup {run}"
    for run, code in T4_BLACK_MAKEUP_SAMPLE.items():
        assert _BLACK_MAKEUP[run] == code, f"black makeup {run}"
    for run, code in T4_EXT_MAKEUP_SAMPLE.items():
        assert _EXT_MAKEUP[run] == code, f"ext makeup {run}"
    assert _MODE_PASS == T4_MODE_CODEWORDS["pass"]
    assert _MODE_HORIZ == T4_MODE_CODEWORDS["horizontal"]
    assert _MODE_V[0] == T4_MODE_CODEWORDS["v0"]
    assert _MODE_V[1] == T4_MODE_CODEWORDS["vr1"]
    assert _MODE_V[2] == T4_MODE_CODEWORDS["vr2"]
    assert _MODE_V[3] == T4_MODE_CODEWORDS["vr3"]
    assert _MODE_V[-1] == T4_MODE_CODEWORDS["vl1"]
    assert _MODE_V[-2] == T4_MODE_CODEWORDS["vl2"]
    assert _MODE_V[-3] == T4_MODE_CODEWORDS["vl3"]
    assert _EOL == T4_EOL


def test_t4_code_length_bounds_per_spec():
    """T.4 structural facts: white codes are 4-9 bits (terminating
    4-8, make-up 5-9), black codes 2-13; every code per color is
    uniquely decodable (prefix-free) together with the extended set."""
    from twilio_event_streams_reporting_example_spark.operators.ccitt import (
        _BLACK_MAKEUP,
        _BLACK_TERM,
        _EXT_MAKEUP,
        _WHITE_MAKEUP,
        _WHITE_TERM,
    )

    assert all(4 <= len(c) <= 8 for c in _WHITE_TERM)
    assert all(5 <= len(c) <= 9 for c in _WHITE_MAKEUP.values())
    assert all(2 <= len(c) <= 13 for c in _BLACK_TERM)
    assert all(10 <= len(c) <= 13 for c in _BLACK_MAKEUP.values())
    assert all(11 <= len(c) <= 12 for c in _EXT_MAKEUP.values())


# T.4 §2.2.5 Table 5 — uncompressed mode codewords (round 12)
T4_UNCOMPRESSED_RUN = {
    "1": "1", "01": "01", "001": "001", "0001": "0001",
    "00001": "00001", "00000": "000001",
}
T4_UNCOMPRESSED_EXIT = {  # pending white pixels before exit → codeword+T
    0: "0000001", 1: "00000001", 2: "000000001", 3: "0000000001",
    4: "00000000001",
}


def test_t4_uncompressed_mode_codewords():
    """The Table 5 transcription: image-pattern codes (literal pixels,
    n ≤ 4 whites + one black as n zeros + '1'; five whites as
    '000001'), exit codes ((6+n) zeros + '1', then the next-run colour
    tag bit), the 2-D entry (extension code 0000001 + type 111) and
    the 12-bit 1-D entry code."""
    from twilio_event_streams_reporting_example_spark.operators.ccitt import (
        _EXT_2D,
        _UNC_ENTRY_1D,
        _UNC_EXT_TYPE,
        _UNC_FIVE,
        _UNC_RUN,
    )

    for n in range(5):
        assert T4_UNCOMPRESSED_RUN["0" * n + "1"] == _UNC_RUN[n]
    assert T4_UNCOMPRESSED_RUN["00000"] == _UNC_FIVE
    for n, code in T4_UNCOMPRESSED_EXIT.items():
        assert code == "0" * (6 + n) + "1"
    assert _EXT_2D + _UNC_EXT_TYPE == "0000001111"
    assert _UNC_ENTRY_1D == "000000001111"


def test_t4_uncompressed_codes_are_uniquely_decodable():
    """Within uncompressed mode the run codes plus every exit code
    (with either tag bit) form a prefix-free set; and the 1-D entry
    code collides with no white/black run code and no EOL prefix —
    the structural facts the decoder's bit-at-a-time reads rely on."""
    from twilio_event_streams_reporting_example_spark.operators.ccitt import (
        _BLACK_MAKEUP,
        _BLACK_TERM,
        _EOL,
        _EXT_MAKEUP,
        _UNC_ENTRY_1D,
        _UNC_FIVE,
        _UNC_RUN,
        _WHITE_MAKEUP,
        _WHITE_TERM,
    )

    unc = list(_UNC_RUN) + [_UNC_FIVE] + [
        "0" * (6 + n) + "1" + t for n in range(5) for t in ("0", "1")
    ]
    for a in unc:
        for b in unc:
            if a != b:
                assert not b.startswith(a), (a, b)
    all_runs = (
        list(_WHITE_TERM) + list(_WHITE_MAKEUP.values())
        + list(_BLACK_TERM) + list(_BLACK_MAKEUP.values())
        + list(_EXT_MAKEUP.values())
    )
    for c in all_runs:
        assert not c.startswith(_UNC_ENTRY_1D), c
        assert not _UNC_ENTRY_1D.startswith(c), c
    assert not _EOL.startswith(_UNC_ENTRY_1D)
    assert not _UNC_ENTRY_1D.startswith(_EOL)
