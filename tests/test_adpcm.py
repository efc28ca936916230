"""IMA ADPCM: vectorized-vs-scalar-reference parity, container
roundtrip, stereo interleave, block independence, and quality bounds.
Pure-Python tests (no Spark) — the Spark-side certification is the
`adpcm_roundtrip` section of `multimodal_media_ops`."""

import struct

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators.adpcm import (
    decode_blocks,
    encode_blocks,
    encode_wav_adpcm,
    reference_decode_nibbles,
    samples_per_block,
)


def test_vectorized_matches_scalar_reference_mono():
    rng = np.random.default_rng(11)
    ba = 64  # 4-byte header + 60 bytes = 121 samples/block
    spb = samples_per_block(ba, 1)
    blocks = []
    expected = []
    for b in range(5):
        pred0 = int(rng.integers(-32768, 32768))
        idx0 = int(rng.integers(0, 89))
        nibs = rng.integers(0, 16, spb - 1, dtype=np.uint8)
        packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
        blocks.append(
            struct.pack("<hBB", pred0, idx0, 0) + packed.tobytes()
        )
        expected.extend(reference_decode_nibbles(nibs.tolist(), pred0, idx0))
    out = decode_blocks(b"".join(blocks), ba, 1)
    assert out.shape == (5 * spb, 1)
    assert out[:, 0].tolist() == expected


def test_vectorized_matches_scalar_reference_stereo():
    rng = np.random.default_rng(12)
    ba = 32 * 2  # stereo: 8-byte headers + 56 bytes → 57 samples/ch
    spb = samples_per_block(ba, 2)
    per_ch = []
    raw = bytearray()
    for c in range(2):
        pred0 = int(rng.integers(-2000, 2000))
        idx0 = int(rng.integers(0, 89))
        nibs = rng.integers(0, 16, spb - 1, dtype=np.uint8)
        per_ch.append(reference_decode_nibbles(nibs.tolist(), pred0, idx0))
        raw += struct.pack("<hBB", pred0, idx0, 0)
        per_ch[-1] = (per_ch[-1], nibs)
    # channel-interleaved 4-byte groups of 8 nibbles
    n_groups = (spb - 1) // 8
    for g in range(n_groups):
        for c in range(2):
            nibs = per_ch[c][1][g * 8 : g * 8 + 8]
            raw += bytes(
                (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8).tobytes()
            )
    out = decode_blocks(bytes(raw), ba, 2)
    assert out.shape == (spb, 2)
    for c in range(2):
        assert out[:, c].tolist() == per_ch[c][0]


def test_encode_decode_determinism_and_header_exactness():
    rng = np.random.default_rng(13)
    sig = (
        2000 * np.sin(np.arange(2000) / 10.0)
        + rng.normal(0, 30, 2000)
    ).astype(np.int16)
    data, n = encode_blocks(sig, 256)
    assert n == 2000
    dec = decode_blocks(data, 256, 1)[:n, 0]
    # determinism
    data2, _ = encode_blocks(sig, 256)
    assert data2 == data
    # structural exactness: every block's first sample is carried
    # VERBATIM in the block header (lossy only between headers)
    spb = samples_per_block(256, 1)
    heads = np.arange(0, n, spb)
    assert (dec[heads] == sig[heads]).all()


def test_quality_bound_smooth_signal():
    t = np.arange(8000)
    sig = (8000 * np.sin(t / 40.0)).astype(np.int16)
    data, n = encode_blocks(sig, 512)
    dec = decode_blocks(data, 512, 1)[:n, 0].astype(np.int64)
    err = np.abs(dec - sig.astype(np.int64))
    # IMA ADPCM on a slow sine tracks within a small fraction of range
    assert float(err.mean()) < 64.0
    assert float(err[16:].max()) < 1024.0


def test_block_independence():
    # decoding any block slice alone gives the same samples: blocks
    # carry their own state (the 100 TB splittability property)
    rng = np.random.default_rng(14)
    sig = rng.integers(-3000, 3000, 1010, dtype=np.int16)
    ba = 128
    spb = samples_per_block(ba, 1)
    data, n = encode_blocks(sig, ba)
    full = decode_blocks(data, ba, 1)
    one = decode_blocks(data[ba : 2 * ba], ba, 1)
    assert (full[spb : 2 * spb] == one).all()


def test_container_roundtrip_and_fact_trim():
    from twilio_event_streams_reporting_example_spark.operators.adpcm import (
        decode_wav_adpcm_payload,
    )

    rng = np.random.default_rng(15)
    sig = rng.integers(-500, 500, (777, 2), dtype=np.int16)
    payload = encode_wav_adpcm(sig, 8000, block_align=256)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    arr, rate = decode_wav_adpcm_payload(payload)
    assert rate == 8000
    # fact chunk trims the padded tail: exactly 777 frames come back
    assert arr.shape == (777, 2)
    raw, _n = encode_blocks(sig, 256)
    assert (decode_blocks(raw, 256, 2)[:777] == arr).all()


def test_gates():
    with pytest.raises(ValueError):
        samples_per_block(10, 1)  # not a multiple of 4
    with pytest.raises(ValueError):
        decode_blocks(b"\x00" * 100, 64, 1)  # not whole blocks
    bad = bytearray(struct.pack("<hBB", 0, 120, 0) + b"\x00" * 60)
    with pytest.raises(ValueError):
        decode_blocks(bytes(bad), 64, 1)  # step index 120 > 88
