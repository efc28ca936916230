"""MS ADPCM (WAV tag 0x02): vectorized-vs-scalar-reference parity over
ALL coefficient pairs in mono and stereo, container roundtrip with the
fmt-declared coefficient table, block independence, quality bounds, and
gates. Pure-Python tests (no Spark) — the Spark-side certification is
the `adpcm_ms` section of `multimodal_media_ops`."""

import struct

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators.adpcm import (
    MS_ADAPT,
    MS_COEF1,
    MS_COEF2,
    decode_ms_blocks,
    decode_wav_ms_payload,
    encode_ms_blocks,
    encode_wav_ms_adpcm,
    ms_samples_per_block,
    reference_decode_ms_nibbles,
)


def _pack_block(preds, deltas, s1s, s2s, nibs):
    """Hand-pack one MS ADPCM block: channel-grouped headers
    (bPredictor*ch, iDelta*ch, iSamp1*ch, iSamp2*ch) then the
    channel-alternating HIGH-nibble-first body."""
    ch = len(preds)
    raw = bytes(preds)
    for c in range(ch):
        raw += struct.pack("<h", deltas[c])
    for c in range(ch):
        raw += struct.pack("<h", s1s[c])
    for c in range(ch):
        raw += struct.pack("<h", s2s[c])
    inter = np.asarray(nibs, dtype=np.uint8).T.reshape(-1)
    return raw + ((inter[0::2] << 4) | inter[1::2]).astype(np.uint8).tobytes()


@pytest.mark.parametrize("ch", [1, 2])
def test_all_coefficient_pairs_match_scalar_reference(ch):
    """Every one of the seven spec predictor pairs, in both channel
    layouts, through the vectorized decoder vs the textbook scalar
    reference — a wrong coefficient, adaptation entry, nibble order,
    clamp, or header-field offset fails here."""
    rng = np.random.default_rng(21)
    ba = 7 * ch + 12 * ch  # 26 samples/channel/block
    spb = ms_samples_per_block(ba, ch)
    for pred in range(7):
        blocks, expected = [], [[] for _ in range(ch)]
        for b in range(3):
            preds = [(pred + c) % 7 for c in range(ch)]
            deltas = [16 + int(rng.integers(0, 2000)) for _ in range(ch)]
            s1s = [int(rng.integers(-30000, 30000)) for _ in range(ch)]
            s2s = [int(rng.integers(-30000, 30000)) for _ in range(ch)]
            nibs = rng.integers(0, 16, (ch, spb - 2), dtype=np.uint8)
            blocks.append(_pack_block(preds, deltas, s1s, s2s, nibs))
            for c in range(ch):
                expected[c].extend(
                    reference_decode_ms_nibbles(
                        nibs[c].tolist(), preds[c], deltas[c], s1s[c], s2s[c]
                    )
                )
        out = decode_ms_blocks(b"".join(blocks), ba, ch)
        assert out.shape == (3 * spb, ch)
        for c in range(ch):
            assert out[:, c].tolist() == expected[c], (pred, c)


def test_spec_table_literals():
    """The spec's built-in tables, transcribed independently here from
    the public ADPCMWAVEFORMAT documentation (mmreg.h / Multimedia
    Data Standards Update): bPredictor coefficient pairs and the
    16-entry delta-adaptation table."""
    assert MS_COEF1.tolist() == [256, 512, 0, 192, 240, 460, 392]
    assert MS_COEF2.tolist() == [0, -256, 0, 64, 0, -208, -232]
    assert MS_ADAPT.tolist() == [
        230, 230, 230, 230, 307, 409, 512, 614,
        768, 614, 512, 409, 307, 230, 230, 230,
    ]


def test_hand_worked_spec_recurrence():
    """A short stream worked by hand from the spec recurrence
    (predictor = (samp1*coef1 + samp2*coef2) >> 8; sample = predictor
    + delta*signed_nibble, clamped; delta = max(16,
    (adapt[nibble]*delta) >> 8)), predictor 0 (coef 256/0 — i.e.
    predictor = samp1): seeds samp2=100, samp1=200, delta=32,
    nibbles [0x3, 0x9, 0x0]:
      n=3 (+3):  pred=200, s=200+32*3=296;   delta=(230*32)>>8=28
      n=9 (-7):  pred=296, s=296+28*(-7)=100; delta=(614*28)>>8=67
      n=0 (+0):  pred=100, s=100;             delta=max(16,(230*67)>>8)=60
    """
    got = reference_decode_ms_nibbles([0x3, 0x9, 0x0], 0, 32, 200, 100)
    assert got == [100, 200, 296, 100, 100]
    blk = _pack_block([0], [32], [200], [100], [[0x3, 0x9, 0x0, 0x0]])
    out = decode_ms_blocks(blk, len(blk), 1)
    assert out[:, 0].tolist() == [100, 200, 296, 100, 100, 100]


def test_clamp_and_delta_floor():
    """Saturating samples clamp to int16 and delta never drops below
    16 (both spec requirements)."""
    # predictor 0, huge delta, max positive nibble (+7) → clamp high;
    # then max negative (-8) repeatedly → clamp low
    got = reference_decode_ms_nibbles(
        [0x7, 0x8, 0x8, 0x8], 0, 20000, 30000, 0
    )
    assert got[2] == 32767  # 30000 + 7*20000 clamps
    assert got[-1] == -32768
    # delta floor: adapt[0]=230 shrinks delta toward the floor of 16
    got = reference_decode_ms_nibbles([0x0] * 40, 0, 17, 5, 5)
    assert got[-1] == 5  # signal is flat; no drift
    blk = _pack_block([0], [17], [5], [5], [[0] * 40])
    out = decode_ms_blocks(blk, len(blk), 1)
    assert out[:, 0].tolist() == got


def test_container_roundtrip_fact_trim_and_declared_coefs():
    rng = np.random.default_rng(22)
    sig = rng.integers(-500, 500, (777, 2), dtype=np.int16)
    payload = encode_wav_ms_adpcm(sig, 8000, block_align=256)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    arr, rate = decode_wav_ms_payload(payload)
    assert rate == 8000
    assert arr.shape == (777, 2)  # fact chunk trims encoder padding
    # the multimodal decode_wav dispatch routes tag 0x02 here too
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_wav,
    )

    arr2, rate2 = decode_wav(payload)
    assert rate2 == 8000 and (arr2 == arr).all()
    # custom fmt-declared coefficient pairs are honoured: perturb the
    # declared table for predictor 2 (built-in 0/0) and the decode of
    # any block using predictor 2 must change accordingly
    blk = _pack_block([2], [32], [100], [50], [[0x1, 0x2, 0x3, 0x4]])
    base = decode_ms_blocks(blk, len(blk), 1)
    custom = decode_ms_blocks(
        blk, len(blk), 1, coef_pairs=[(256, 0)] * 2 + [(256, 0)] + [(0, 0)] * 4
    )
    assert base[:, 0].tolist() != custom[:, 0].tolist()
    ref = reference_decode_ms_nibbles([0x1, 0x2, 0x3, 0x4], 0, 32, 100, 50)
    assert custom[:, 0].tolist() == ref  # (256,0) == predictor-0 behavior


def test_quality_bound_smooth_signal():
    t = np.arange(8000)
    sig = (8000 * np.sin(t / 40.0)).astype(np.int16)
    data, n = encode_ms_blocks(sig, 512)
    dec = decode_ms_blocks(data, 512, 1)[:n, 0].astype(np.int64)
    err = np.abs(dec - sig.astype(np.int64))
    # the 2-tap predictor tracks a slow sine closely
    assert float(err.mean()) < 32.0
    assert float(err[4:].max()) < 512.0
    # both seed samples per block are carried VERBATIM in the header
    spb = ms_samples_per_block(512, 1)
    heads = np.arange(0, n, spb)
    assert (dec[heads] == sig.astype(np.int64)[heads]).all()
    assert (dec[heads + 1] == sig.astype(np.int64)[heads + 1]).all()


def test_block_independence():
    rng = np.random.default_rng(23)
    sig = rng.integers(-3000, 3000, 1010, dtype=np.int16)
    ba = 128
    spb = ms_samples_per_block(ba, 1)
    data, _n = encode_ms_blocks(sig, ba)
    full = decode_ms_blocks(data, ba, 1)
    one = decode_ms_blocks(data[ba : 2 * ba], ba, 1)
    assert (full[spb : 2 * spb] == one).all()


def test_gates():
    with pytest.raises(ValueError):
        ms_samples_per_block(7, 2)  # body not splittable across channels
    with pytest.raises(ValueError):
        decode_ms_blocks(b"\x00" * 100, 64, 1)  # not whole blocks
    bad = _pack_block([7], [16], [0], [0], [[0, 0]])  # predictor 7 > 6
    with pytest.raises(ValueError):
        decode_ms_blocks(bad, len(bad), 1)
    with pytest.raises(ValueError):
        decode_wav_ms_payload(b"OggS not a wav")
