"""FLAC codec (operators/flac.py): round trips, spec golden vectors,
and corruption detection.

Spec-derived literals (transcribed by hand from RFC 9639 / the xiph
FLAC format document and published CRC catalogues — none computed by
repo code):

  - CRC-8 poly 0x07 (init 0, unreflected) check value over
    b"123456789" = 0xF4 (the published CRC-8/SMBUS check value —
    FLAC's frame-header CRC is exactly this algorithm).
  - CRC-16 poly 0x8005 (init 0, unreflected) check value over
    b"123456789" = 0xFEE8 (the published CRC-16/UMTS a.k.a. BUYPASS
    check value — FLAC's frame CRC).
  - UTF-8 coded numbers: the textbook UTF-8 boundary encodings
    (0x7F → 7F; 0x80 → C2 80; 0x7FF → DF BF; 0x800 → E0 A0 80).
  - A COMPLETE hand-assembled FLAC stream (STREAMINFO + one frame,
    mono 8-bit, FIXED order-1 subframe, Rice k=1), every field
    placed bit-by-bit from the spec text, decoded against
    hand-computed samples [10, 12, 14, 16].
"""

import struct

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _utf8_decode_number,
    _utf8_encode_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    fixed_residual,
    fixed_restore,
    probe_flac_metadata,
)


def _crc_bitwise(data: bytes, poly: int, width: int) -> int:
    """Independent bit-at-a-time CRC straight from the polynomial
    definition (long division, MSB first) — cross-checks the table
    implementation and lets the hand-built stream carry correct CRCs
    without trusting flac.py."""
    reg = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in data:
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            fb = ((reg >> (width - 1)) & 1) ^ bit
            reg = ((reg << 1) & mask) ^ (poly if fb else 0)
    return reg


# ------------------------------------------------------ spec vectors ---


def test_crc8_published_check_value():
    assert crc8(b"123456789") == 0xF4  # CRC-8/SMBUS catalogue value
    assert crc8(b"") == 0
    assert crc8(b"123456789") == _crc_bitwise(b"123456789", 0x07, 8)


def test_crc16_published_check_value():
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS catalogue value
    assert crc16(b"") == 0
    assert crc16(b"123456789") == _crc_bitwise(b"123456789", 0x8005, 16)


def test_utf8_coded_number_boundary_literals():
    # textbook UTF-8 boundary encodings
    assert _utf8_encode_number(0x7F) == bytes([0x7F])
    assert _utf8_encode_number(0x80) == bytes([0xC2, 0x80])
    assert _utf8_encode_number(0x7FF) == bytes([0xDF, 0xBF])
    assert _utf8_encode_number(0x800) == bytes([0xE0, 0xA0, 0x80])
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x3FFFFFF, (1 << 31) - 1, (1 << 36) - 1]:
        rd = _BitReader(_utf8_encode_number(n))
        assert _utf8_decode_number(rd) == n, n


def test_hand_assembled_stream_decodes_to_hand_computed_samples():
    """Mono 8-bit, one FIXED order-1 frame of [10, 12, 14, 16]:
    warmup 10, residuals [2, 2, 2], Rice k=1 (zigzag(2)=4 → unary 2 +
    one remainder bit 0 → '0010' each). Every byte below is placed by
    hand from the spec field layout."""
    streaminfo = bytes(
        [0x00, 0x04,              # min block size 4
         0x00, 0x04,              # max block size 4
         0x00, 0x00, 0x00,        # min frame size unknown
         0x00, 0x00, 0x00,        # max frame size unknown
         # 8000 Hz in 20 bits, channels-1=0 in 3, bits-1=7 in 5,
         # total samples 4 in 36:  00000001 11110100 00000000 0111|0000
         0x01, 0xF4, 0x00, 0x70,
         0x00, 0x00, 0x00, 0x04]  # low 32 bits of total samples
        + [0x00] * 16             # md5 unknown (all zero)
    )
    assert len(streaminfo) == 34
    header = (
        b"fLaC"
        + bytes([0x80, 0x00, 0x00, 0x22])  # last-block | STREAMINFO, len 34
        + streaminfo
    )
    # frame header: sync(14)=11111111111110, reserved 0, fixed strategy 0
    #   → FF F8; blocksize code 0110 (8-bit end-of-header), rate code
    #   0100 (8000) → 64; channels 0000, bps 001 (8-bit), reserved 0
    #   → 02; UTF-8 frame number 0 → 00; blocksize-1 = 3 → 03
    fh = bytes([0xFF, 0xF8, 0x64, 0x02, 0x00, 0x03])
    fh += bytes([_crc_bitwise(fh, 0x07, 8)])
    # subframe: pad 0 | type 001001 (fixed order 1) | wasted 0 → 12;
    # warmup sample 10 → 0A; residual: method 00, partition order 0000,
    # rice k 0001, then 3×'0010', zero-padded to a byte boundary:
    #   00000000 01|001000 10|0010|00 → 00 48 88
    frame = fh + bytes([0x12, 0x0A, 0x00, 0x48, 0x88])
    frame += struct.pack(">H", _crc_bitwise(frame, 0x8005, 16))
    samples, rate, bits = decode_flac(header + frame)
    assert rate == 8000 and bits == 8
    assert samples[:, 0].tolist() == [10, 12, 14, 16]


# -------------------------------------------------------- round trips ---


def _sig(n, ch, amp, seed):
    rng = np.random.RandomState(seed)
    walk = np.cumsum(rng.randint(-amp // 20, amp // 20 + 1, size=(n, ch)),
                     axis=0)
    return np.clip(walk, -amp, amp - 1).astype(np.int64)


@pytest.mark.parametrize("stereo", ["independent", "left_side",
                                    "right_side", "mid_side"])
@pytest.mark.parametrize("mode", ["auto", "verbatim", "fixed3", "lpc"])
def test_stereo_by_subframe_roundtrip(stereo, mode):
    sig = _sig(2000, 2, 20000, 11)
    kw = {"lpc_spec": (4, 12, 5, [35, -20, 9, -2])} if mode == "lpc" else {}
    payload = encode_flac(sig, 44100, bits=16, block_size=512,
                          stereo=stereo, subframe_mode=mode,
                          partition_order=2, **kw)
    out, rate, bits = decode_flac(payload)
    assert rate == 44100 and bits == 16
    assert np.array_equal(out, sig)


def test_constant_and_wasted_bits_roundtrip():
    const = np.full((700, 2), -312, dtype=np.int64)
    out, _, _ = decode_flac(encode_flac(const, 8000, bits=16))
    assert np.array_equal(out, const)
    shifted = _sig(900, 1, 3000, 3) * 8  # three shared low zero bits
    out, _, _ = decode_flac(encode_flac(shifted, 8000, bits=16,
                                        block_size=256))
    assert np.array_equal(out[:, 0], shifted[:, 0])


def test_escape_partition_and_partial_block():
    sig = _sig(777, 1, 100, 5)
    payload = encode_flac(sig, 12345, bits=8, block_size=256,
                          subframe_mode="fixed1", partition_order=1,
                          escape_parts=frozenset([1]))
    out, rate, bits = decode_flac(payload)
    assert rate == 12345 and bits == 8  # STREAMINFO-coded rate path
    assert np.array_equal(out, sig)


def test_24bit_and_probe_fields():
    sig = _sig(3000, 2, 4_000_000, 9)
    payload = encode_flac(sig, 96000, bits=24, block_size=1024,
                          stereo="mid_side")
    meta = probe_flac_metadata(payload)
    assert meta["format"] == "flac"
    assert meta["sample_rate"] == 96000
    assert meta["channels"] == 2
    assert meta["bits"] == 24
    assert meta["total_samples"] == 3000
    assert meta["duration_s"] == pytest.approx(3000 / 96000)
    out, _, bits = decode_flac(payload)
    assert bits == 24 and np.array_equal(out, sig)


def test_fixed_predictor_inverse_property():
    rng = np.random.RandomState(42)
    x = np.cumsum(rng.randint(-50, 51, size=600)).astype(np.int64)
    for order in range(5):
        res = fixed_residual(x, order)
        if order == 0:
            assert np.array_equal(res, x)
            continue
        assert np.array_equal(fixed_restore(res, x[:order], order), x)


def test_corruption_is_detected():
    sig = _sig(1500, 2, 20000, 21)
    payload = bytearray(encode_flac(sig, 44100, bits=16, block_size=512))
    meta = probe_flac_metadata(bytes(payload))
    body = meta["frames_offset"]
    # flip one bit inside the first frame's data
    payload[body + 20] ^= 0x04
    with pytest.raises(ValueError):
        decode_flac(bytes(payload))


def test_md5_is_verified():
    """A stream whose frames decode cleanly but whose STREAMINFO MD5
    disagrees must be rejected (splice two different encodes)."""
    a = encode_flac(_sig(500, 1, 1000, 1), 8000, bits=16)
    b = encode_flac(_sig(500, 1, 1000, 2), 8000, bits=16)
    meta = probe_flac_metadata(a)
    spliced = a[: meta["frames_offset"]] + b[meta["frames_offset"] :]
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(spliced)


def test_bit_writer_reader_inverse():
    bw = _BitWriter()
    vals = [(0b1, 1), (0b1011, 4), (0x5A5, 12), (0, 3), ((1 << 31) - 7, 32)]
    for v, n in vals:
        bw.write(v, n)
    bw.write_unary(11)
    bw.align()
    rd = _BitReader(bw.getvalue())
    for v, n in vals:
        assert rd.read(n) == v
    assert rd.read_unary() == 11


def test_encoded_stream_bytes_are_pinned():
    """Regression-pin the writer's exact output for four fixture items
    spanning the encoder surface (8-bit constant/verbatim with escape
    partitions, 16-bit left-side fixed4, 16-bit mid-side fixed1,
    24-bit right-side LPC): byte-identical streams, recorded while the
    STREAMINFO conformance fixes (r9 ADVICE) are verified in place.
    Any writer change — intended or not — must re-derive these values
    consciously. External-tool decodability is documented as a
    deploy-environment step in PLANS.md (no FLAC tool ships in this
    container)."""
    import hashlib

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _flac_item,
    )

    pinned = {
        0: (384, "c2e49421314738691a52c810f9358017"),
        7: (5049, "e3ff8416013ce3606d08f70451f4a6b8"),
        13: (2397, "61e216b8c1856850fdb907e9a1de744d"),
        26: (2829, "e7f6365c6f1c01b74586ba348163dd8b"),
    }
    for i, (n, md5) in pinned.items():
        payload, _sig = _flac_item(i)
        assert len(payload) == n, i
        assert hashlib.md5(payload).hexdigest() == md5, i
    # the fLaC magic + a STREAMINFO block header lead every stream
    payload, _sig = _flac_item(7)
    assert payload[:4] == b"fLaC"
    assert payload[4] & 0x7F == 0  # block type 0 = STREAMINFO
