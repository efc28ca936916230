"""AIFF + Sun AU containers (operators/aiff.py): spec golden vectors
and round trips.

Spec-derived literals (hand-transcribed — none computed by repo code):
  - The canonical 80-bit IEEE EXTENDED sample-rate encodings from the
    AIFF 1.3 specification's own examples: 44100 Hz = 40 0E AC 44
    00*6 and 8000 Hz = 40 0B FA 00 00*6 (1 sign + 15-bit exponent
    biased 16383 + 64-bit mantissa with EXPLICIT integer bit).
  - A COMPLETE hand-assembled AIFF file (FORM/COMM/SSND laid out
    byte-by-byte from the chunk tables) decoding to hand-picked
    samples.
  - AU encoding-field literals (.snd magic, 24-byte header, encoding
    1=µ-law / 3=int16-BE) with µ-law expansion checked against the
    published table endpoints (µ-law 0x00 → -32124, 0xFF → 0).
"""

import struct

import numpy as np

from twilio_event_streams_reporting_example_spark.operators.aiff import (
    au_header,
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
    f80_decode,
    f80_encode,
)


def test_extended_float_spec_literals():
    # AIFF spec's canonical examples
    assert f80_encode(44100.0) == bytes.fromhex("400EAC44000000000000")
    assert f80_encode(8000.0) == bytes.fromhex("400BFA00000000000000")
    assert f80_decode(bytes.fromhex("400EAC44000000000000")) == 44100.0
    assert f80_decode(bytes.fromhex("400BFA00000000000000")) == 8000.0
    assert f80_encode(0.0) == b"\x00" * 10 and f80_decode(b"\x00" * 10) == 0.0
    for r in (1.0, 11025.0, 22050.0, 48000.0, 96000.0, 12345.0):
        assert f80_decode(f80_encode(r)) == r


def test_hand_assembled_aiff_decodes():
    """Mono 16-bit, 3 frames [1000, -2, 300] at 8000 Hz — every byte
    placed by hand from the AIFF chunk layout."""
    comm = (
        struct.pack(">hLh", 1, 3, 16)          # channels, frames, bits
        + bytes.fromhex("400BFA00000000000000")  # 8000 Hz extended
    )
    ssnd = struct.pack(">LL", 0, 0) + struct.pack(">3h", 1000, -2, 300)
    body = (
        b"COMM" + struct.pack(">L", len(comm)) + comm
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    )
    payload = b"FORM" + struct.pack(">L", 4 + len(body)) + b"AIFF" + body
    out, rate, bits = decode_aiff(payload)
    assert rate == 8000 and bits == 16
    assert out[:, 0].tolist() == [1000, -2, 300]


def test_au_header_field_literals():
    """24-byte .snd header: magic, offset, size, encoding, rate,
    channels — all big-endian u32 per the Sun audio layout."""
    h = au_header(6, 3, 8000, 1)
    assert h == b".snd" + struct.pack(">LLLLL", 24, 6, 3, 8000, 1)
    payload = h + struct.pack(">3h", -5, 7, 32767)
    out, rate, name = decode_au(payload)
    assert rate == 8000 and name == "int16"
    assert out[:, 0].tolist() == [-5, 7, 32767]


def test_au_ulaw_published_endpoints():
    coded = bytes([0x00, 0xFF])
    out, _, name = decode_au(au_header(2, 1, 8000, 1) + coded)
    assert name == "ulaw"
    assert out[:, 0].tolist() == [-32124, 0]  # published µ-law endpoints


def test_au_alaw_silence_literal():
    # A-law code 0xD5 (0x55 after even-bit inversion) is +8 — the
    # canonical A-law near-silence value
    out, _, name = decode_au(au_header(1, 27, 8000, 1) + bytes([0xD5]))
    assert name == "alaw"
    assert out[0, 0] == 8


def test_aiff_au_roundtrips_all_depths():
    rng = np.random.RandomState(5)
    for bits, enc in ((8, 2), (16, 3), (24, 4), (32, 5)):
        amp = 1 << (bits - 2)
        sig = rng.randint(-amp, amp, size=(311, 2)).astype(np.int64)
        out, rate, b = decode_aiff(encode_aiff(sig, 22050, bits=bits))
        assert rate == 22050 and b == bits and np.array_equal(out, sig)
        out, rate, _ = decode_au(encode_au(sig, 11025, encoding=enc))
        assert rate == 11025 and np.array_equal(out, sig)


def test_aiff_odd_sized_chunk_alignment():
    """8-bit mono with an odd frame count forces an odd SSND size —
    the IFF word-alignment pad byte must not corrupt the walk."""
    sig = np.array([1, -2, 3], dtype=np.int64)
    payload = encode_aiff(sig, 8000, bits=8)
    out, rate, bits = decode_aiff(payload)
    assert bits == 8 and out[:, 0].tolist() == [1, -2, 3]
