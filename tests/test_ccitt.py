"""CCITT G3/G4 fax codec (operators/ccitt.py): hand-assembled T.4
bitstreams, all three TIFF schemes through the container, FillOrder,
T4Options 2-D tagging, make-up chaining, and error contracts."""

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators.ccitt import (
    decode_ccitt,
    encode_ccitt,
)
from twilio_event_streams_reporting_example_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    encode_tiff_multipage,
)


# ------------------------------------------- hand-assembled streams ----


def test_hand_assembled_mh_line():
    """w=8 row [4 white, 2 black, 2 white]: T.4 Table 2 gives
    white-4 = 1011, black-2 = 11, white-2 = 0111 → the 10 coded bits
    1011 11 0111 pad to bytes 0xBD 0xC0. Both directions by hand."""
    bm = np.array([[0, 0, 0, 0, 1, 1, 0, 0]], np.uint8)
    assert encode_ccitt(bm, 2) == bytes([0xBD, 0xC0])
    assert np.array_equal(decode_ccitt(bytes([0xBD, 0xC0]), 8, 1, 2), bm)


def test_hand_assembled_g4_all_white_line():
    """G4 on one all-white w=8 line: against the imaginary all-white
    reference b1 = 8, and the line's first change is also at 8, so one
    V0 bit ('1') codes the whole line; EOFB (two 12-bit EOLs) follows:
    1 000000000001 000000000001 → 0x80 0x08 0x00 0x80."""
    bm = np.zeros((1, 8), np.uint8)
    want = bytes([0x80, 0x08, 0x00, 0x80])
    assert encode_ccitt(bm, 4) == want
    assert np.array_equal(decode_ccitt(want, 8, 1, 4), bm)


def test_hand_assembled_g3_1d_line_with_eol():
    """G3 1-D: EOL (000000000001) then white-8 (10011), 17 bits:
    00000000 00011001 1·······  → 0x00 0x19 0x80."""
    bm = np.zeros((1, 8), np.uint8)
    want = bytes([0x00, 0x19, 0x80])
    assert encode_ccitt(bm, 3) == want
    assert np.array_equal(decode_ccitt(want, 8, 1, 3), bm)


def test_line_starting_black_gets_zero_length_white_run():
    """T.4: lines start with a white run, length 0 when the first
    pixel is black — white-0 = 00110101 then black-3 = 10 then
    white-5 = 1100: 00110101 10 1100 → 0x35 0xB0."""
    bm = np.array([[1, 1, 1, 0, 0, 0, 0, 0]], np.uint8)
    assert encode_ccitt(bm, 2) == bytes([0x35, 0xB0])
    assert np.array_equal(decode_ccitt(bytes([0x35, 0xB0]), 8, 1, 2), bm)


# ------------------------------------------------------- roundtrips ----


@pytest.mark.parametrize("scheme,t4", [(2, 0), (3, 0), (3, 1), (4, 0)])
def test_roundtrip_patterns(scheme, t4):
    rng = np.random.RandomState(scheme * 10 + t4)
    for shape_kind in range(5):
        h, w = int(rng.randint(1, 24)), int(rng.randint(1, 90))
        if shape_kind == 0:
            bm = np.zeros((h, w), np.uint8)
        elif shape_kind == 1:
            bm = np.ones((h, w), np.uint8)
        elif shape_kind == 2:
            bm = (rng.rand(h, w) < 0.5).astype(np.uint8)
        elif shape_kind == 3:  # vertical stripes: exercises V-codes
            bm = (np.arange(w)[None, :] // 3 % 2).astype(
                np.uint8
            ) * np.ones((h, 1), np.uint8)
        else:  # checker: pass/horizontal mix
            bm = (
                (np.arange(h)[:, None] // 2 + np.arange(w)[None, :] // 5)
                % 2
            ).astype(np.uint8)
        enc = encode_ccitt(bm, scheme, t4_options=t4)
        assert np.array_equal(
            decode_ccitt(enc, w, h, scheme, t4_options=t4), bm
        )


@pytest.mark.parametrize("w", [64, 1728, 1729, 2560, 2624, 5200])
def test_makeup_code_chaining(w):
    """Long runs force make-up codes: 64..1728 (per-color tables),
    1792..2560 (shared extended), > 2624 (chained 2560s, T.6)."""
    bm = np.zeros((3, w), np.uint8)
    bm[1, :] = 1
    bm[2, 1:] = 1
    for scheme in (2, 3, 4):
        enc = encode_ccitt(bm, scheme)
        assert np.array_equal(decode_ccitt(enc, w, 3, scheme), bm)


def test_g3_2d_uses_fewer_bits_on_correlated_rows():
    """The point of 2-D coding: repeated rows cost ~1 V0 code per
    changing element instead of a full MH line."""
    row = np.zeros(200, np.uint8)
    row[30:90] = 1
    row[120:130] = 1
    bm = np.tile(row, (40, 1))
    one_d = encode_ccitt(bm, 3, t4_options=0)
    two_d = encode_ccitt(bm, 3, t4_options=1)
    assert len(two_d) < len(one_d) / 2


# ------------------------------------------------ container wiring -----


@pytest.mark.parametrize("comp,t4", [(2, 0), (3, 0), (3, 1), (4, 0)])
@pytest.mark.parametrize("photometric", [0, 1])
def test_ccitt_tiff_roundtrip(comp, t4, photometric):
    rng = np.random.RandomState(comp + photometric)
    bm = (rng.rand(21, 45) < 0.35).astype(np.uint8)
    payload = encode_tiff(
        bm, photometric, rows_per_strip=6, compression=comp,
        t4_options=t4,
    )
    out = decode_tiff(payload)
    g = (1 - bm) * 255 if photometric == 0 else bm * 255
    assert np.array_equal(out, np.stack([g] * 3, axis=-1).astype(np.uint8))


@pytest.mark.parametrize("big_endian", [False, True])
def test_ccitt_tiff_fillorder2(big_endian):
    """FillOrder 2 (LSB-first bytes — common in real fax TIFFs):
    encoder writes the tag + bit-reversed bytes, decoder honors it."""
    rng = np.random.RandomState(11)
    bm = (rng.rand(9, 33) < 0.5).astype(np.uint8)
    p1 = encode_tiff(bm, 0, compression=4, fillorder=1,
                     big_endian=big_endian)
    p2 = encode_tiff(bm, 0, compression=4, fillorder=2,
                     big_endian=big_endian)
    assert p1 != p2
    assert np.array_equal(decode_tiff(p1), decode_tiff(p2))


def test_multipage_fax_chain():
    """The classic scanned-document shape: multi-page G4 fax TIFF."""
    rng = np.random.RandomState(5)
    pages = [(rng.rand(12, 40) < 0.3).astype(np.uint8) for _ in range(3)]
    mp = encode_tiff_multipage(pages, photometric=0, compression=4)
    for k, bm in enumerate(pages):
        out = decode_tiff(mp, page=k)
        assert np.array_equal(out[:, :, 0], ((1 - bm) * 255).astype(np.uint8))


def test_ccitt_probe_reports_bilevel():
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        probe_image_metadata,
    )

    bm = np.zeros((7, 19), np.uint8)
    meta = probe_image_metadata(encode_tiff(bm, 0, compression=4))
    assert meta["format"] == "tiff"
    assert (meta["width"], meta["height"]) == (19, 7)
    assert meta["bit_depth"] == 1


# --------------------------------------------------- error contracts ---


def test_reserved_2d_extension_types_stay_gated():
    """Only extension type 111 (uncompressed mode) is defined; the
    reserved types after the 0000001 extension code must still raise.
    Stream: 0000001 + 010 (reserved) = 0000001 010 ......"""
    with pytest.raises(NotImplementedError, match="reserved"):
        decode_ccitt(bytes([0b00000010, 0b10000000]), 8, 1, 4)


def test_run_overflow_raises():
    # MH white-64 make-up + white-64 again overruns an 8-wide line
    bm = np.zeros((1, 128), np.uint8)
    enc = encode_ccitt(bm, 2)
    with pytest.raises(ValueError, match="overflow"):
        decode_ccitt(enc, 8, 1, 2)


def test_truncated_stream_raises():
    bm = (np.arange(64).reshape(8, 8) % 2).astype(np.uint8)
    enc = encode_ccitt(bm, 4)
    with pytest.raises(ValueError):
        decode_ccitt(enc[: len(enc) // 3], 8, 8, 4)


def test_g3_missing_eol_raises():
    with pytest.raises(ValueError, match="EOL"):
        decode_ccitt(bytes([0xFF, 0xFF]), 8, 1, 3)


def test_bad_bitmap_values_rejected():
    with pytest.raises(ValueError, match="0 or 1"):
        encode_ccitt(np.full((2, 2), 7, np.uint8), 4)


def test_ccitt_short_strip_chain_raises():
    import struct

    bm = np.zeros((24, 16), np.uint8)
    payload = bytearray(
        encode_tiff(bm, 0, rows_per_strip=8, compression=4)
    )
    for tag in (273, 279):
        i = payload.find(struct.pack("<HHI", tag, 4, 3))
        assert i >= 0
        struct.pack_into("<I", payload, i + 4, 2)
    with pytest.raises(ValueError, match="strip count"):
        decode_tiff(bytes(payload))


# --------------------------------------------------- table integrity ---


def test_code_tables_are_prefix_free_and_complete():
    from twilio_event_streams_reporting_example_spark.operators.ccitt import (
        _BLACK_MAKEUP,
        _BLACK_TERM,
        _EXT_MAKEUP,
        _WHITE_MAKEUP,
        _WHITE_TERM,
    )

    assert len(_WHITE_TERM) == 64 and len(_BLACK_TERM) == 64
    assert sorted(_WHITE_MAKEUP) == list(range(64, 1729, 64))
    assert sorted(_BLACK_MAKEUP) == list(range(64, 1729, 64))
    assert sorted(_EXT_MAKEUP) == list(range(1792, 2561, 64))
    for name, codes in (
        ("white", _WHITE_TERM + list(_WHITE_MAKEUP.values())
         + list(_EXT_MAKEUP.values())),
        ("black", _BLACK_TERM + list(_BLACK_MAKEUP.values())
         + list(_EXT_MAKEUP.values())),
    ):
        assert len(set(codes)) == len(codes), name
        s = sorted(codes)
        for a, b in zip(s, s[1:]):
            assert not b.startswith(a), (name, a, b)


# -------------------------------------------- uncompressed mode (r12) ---


def test_hand_assembled_uncompressed_g4_line():
    """w=8 row [2 white, 1 black, 5 white], coded fully in
    uncompressed mode, every bit placed by hand from T.4 Table 5:
      entry     0000001 111   (2-D extension code + type 111)
      pixels    001           (2 whites + a black)
      pixels    000001        (5 whites, no black)
      exit      0000001 0     (no pending whites, T = 0 → white)
    = 0000001 111 001 000001 0000001 0 → pads to 4 bytes."""
    bits = "0000001" + "111" + "001" + "000001" + "0000001" + "0"
    bits += "0" * (-len(bits) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    want = np.array([[0, 0, 1, 0, 0, 0, 0, 0]], np.uint8)
    assert np.array_equal(decode_ccitt(data, 8, 1, 4), want)


def test_hand_assembled_uncompressed_exit_pending_and_tag():
    """Exit codes carry 0-4 pending whites and the next-run colour:
    w=6 row [1 black, 2 white] + exit(2 whites pending, T=1 black) +
    a vertical-0 code for the black run the tag announced (ref line is
    imaginary white, so b1 = 6 = w... use horizontal instead).

    Exact construction: w=4, row = [black, white, white, black]:
    entry, '1' (one black pixel), then exit with 2 pending whites and
    T=1 — the tag records the changing element at position 3, so the
    black run [3, 4) is open and one V0 code ('1', a1 = b1 = 4 against
    the imaginary white reference) closes the line."""
    bits = (
        "0000001111"  # entry (2-D extension code 0000001 + type 111)
        + "1"  # one black pixel at 0
        + "0" * (6 + 2) + "1" + "1"  # exit, 2 pending whites, T=black
        + "1"  # V0: a1 = 4 = end of line
    )
    bits += "0" * (-len(bits) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    want = np.array([[1, 0, 0, 1]], np.uint8)
    assert np.array_equal(decode_ccitt(data, 4, 1, 4), want)


@pytest.mark.parametrize("scheme,t4", [(2, 0), (3, 0), (3, 1), (4, 0)])
def test_uncompressed_roundtrip_patterns(scheme, t4):
    """encoder uncompressed=True → decoder, across the same pattern
    classes as the run-coded round-trip, plus the noisy class
    uncompressed mode exists for."""
    rng = np.random.RandomState(77 + scheme * 10 + t4)
    for shape_kind in range(4):
        h, w = int(rng.randint(1, 20)), int(rng.randint(1, 70))
        if shape_kind == 0:
            bm = np.zeros((h, w), np.uint8)
        elif shape_kind == 1:
            bm = np.ones((h, w), np.uint8)
        elif shape_kind == 2:
            bm = (rng.rand(h, w) < 0.5).astype(np.uint8)  # noise
        else:
            bm = (np.arange(w)[None, :] % 7 == 3).astype(
                np.uint8
            ) * np.ones((h, 1), np.uint8)
        enc = encode_ccitt(bm, scheme, t4_options=t4, uncompressed=True)
        assert np.array_equal(
            decode_ccitt(enc, w, h, scheme, t4_options=t4), bm
        )


def test_uncompressed_beats_run_coding_on_noise():
    """The reason the mode exists: alternating single pixels make MH
    run codes expand; uncompressed coding stays ~1 bit/pixel."""
    bm = (np.indices((8, 64)).sum(0) % 2).astype(np.uint8)
    run_coded = encode_ccitt(bm, 4)
    unc = encode_ccitt(bm, 4, uncompressed=True)
    assert len(unc) < len(run_coded)


@pytest.mark.parametrize("comp,fo", [(3, 1), (3, 2), (4, 1), (4, 2)])
def test_tiff_uncompressed_mode_roundtrip(comp, fo):
    """Through the TIFF container: T4Options/T6Options bit 1 written,
    FillOrder honored, decode bit-exact."""
    rng = np.random.RandomState(comp + fo)
    bm = (rng.rand(21, 43) < 0.5).astype(np.uint8)
    payload = encode_tiff(
        bm, 0, compression=comp, uncompressed=True, fillorder=fo,
        t4_options=(1 if comp == 3 else 0),
    )
    import struct as _s

    tag = 292 if comp == 3 else 293
    assert _s.pack("<HHI", tag, 4, 1) in payload
    out = decode_tiff(payload)
    assert np.array_equal(out[:, :, 0], (1 - bm) * 255)


def test_tiff_uncompressed_mode_needs_ccitt_g3_g4():
    bm = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="T4Options/T6Options"):
        encode_tiff(bm, 0, compression=2, uncompressed=True)
