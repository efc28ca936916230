"""Baseline TIFF codec (operators/tiff.py): hand-assembled IFD spec
vector, both byte orders, strip assembly, photometric classes, and
the left-justified inline-value rule."""

import struct

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
)


def _entry(e, tag, typ, cnt, field4):
    return struct.pack(e + "HHI", tag, typ, cnt) + field4


def test_hand_assembled_little_endian_tiff():
    """2×2 BlackIsZero gray [10 20 / 30 40], every byte placed by hand
    from the TIFF 6.0 field tables: header, strip at offset 8, IFD at
    12 with 9 ascending-tag entries."""
    e = "<"
    strip = bytes([10, 20, 30, 40])
    entries = [
        _entry(e, 256, 3, 1, struct.pack("<HH", 2, 0)),   # width
        _entry(e, 257, 3, 1, struct.pack("<HH", 2, 0)),   # height
        _entry(e, 258, 3, 1, struct.pack("<HH", 8, 0)),   # bits
        _entry(e, 259, 3, 1, struct.pack("<HH", 1, 0)),   # compression
        _entry(e, 262, 3, 1, struct.pack("<HH", 1, 0)),   # BlackIsZero
        _entry(e, 273, 4, 1, struct.pack("<I", 8)),       # strip offset
        _entry(e, 277, 3, 1, struct.pack("<HH", 1, 0)),   # samples
        _entry(e, 278, 3, 1, struct.pack("<HH", 2, 0)),   # rows/strip
        _entry(e, 279, 4, 1, struct.pack("<I", 4)),       # strip bytes
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00" * 4
    payload = b"II*\x00" + struct.pack("<I", 12) + strip + ifd
    out = decode_tiff(payload)
    assert out.shape == (2, 2, 3)
    assert out[:, :, 0].reshape(-1).tolist() == [10, 20, 30, 40]
    assert (out[:, :, 0] == out[:, :, 1]).all()


def test_big_endian_inline_short_is_left_justified():
    """Under MM, an inline SHORT lives in the FIRST two bytes of the
    4-byte value field — the classic trap. Hand-build one MM IFD."""
    e = ">"
    strip = bytes([7])
    entries = [
        _entry(e, 256, 3, 1, b"\x00\x01\x00\x00"),  # width 1, left-just
        _entry(e, 257, 3, 1, b"\x00\x01\x00\x00"),  # height 1
        _entry(e, 258, 3, 1, b"\x00\x08\x00\x00"),  # 8 bits
        _entry(e, 259, 3, 1, b"\x00\x01\x00\x00"),  # uncompressed
        _entry(e, 262, 3, 1, b"\x00\x01\x00\x00"),  # BlackIsZero
        _entry(e, 273, 4, 1, struct.pack(">I", 8)),
        _entry(e, 277, 3, 1, b"\x00\x01\x00\x00"),
        _entry(e, 278, 3, 1, b"\x00\x01\x00\x00"),
        _entry(e, 279, 4, 1, struct.pack(">I", 1)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + b"\x00" * 4
    payload = b"MM\x00*" + struct.pack(">I", 9) + strip + ifd
    out = decode_tiff(payload)
    assert out.shape == (1, 1, 3) and out[0, 0, 0] == 7


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rps", [None, 1, 5, 100])
def test_rgb_multistrip_roundtrip(big_endian, rps):
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(21, 13, 3)).astype(np.uint8)
    out = decode_tiff(
        encode_tiff(img, 2, big_endian=big_endian, rows_per_strip=rps)
    )
    assert np.array_equal(out, img)


def test_whiteiszero_inverts():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_tiff(encode_tiff(g, 0))
    assert np.array_equal(out[:, :, 0], 255 - g)


def test_palette_uses_high_byte_of_colormap():
    cm = np.zeros((3, 256), dtype=np.uint16)
    cm[0, 5] = 0xABCD  # red channel of index 5 → high byte 0xAB
    idx = np.full((2, 2), 5, dtype=np.uint8)
    out = decode_tiff(encode_tiff(idx, 3, colormap=cm))
    assert (out[:, :, 0] == 0xAB).all() and (out[:, :, 1] == 0).all()


def test_transform_coded_tiff_is_rejected_clearly():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(img, 2))
    # flip the Compression entry's value from 1 to 7 (JPEG-in-TIFF)
    i = payload.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    payload[i + 8 : i + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="compression 7"):
        decode_tiff(bytes(payload))


# ------------------------------------------------- LZW + PackBits ------


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize(
    "compression,predictor",
    [(5, 1), (5, 2), (32773, 1), (8, 1), (8, 2)],
)
def test_compressed_roundtrip_rgb_multistrip(
    big_endian, compression, predictor
):
    rng = np.random.default_rng(11 + compression + predictor)
    img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    payload = encode_tiff(
        img, 2, big_endian=big_endian, rows_per_strip=4,
        compression=compression, predictor=predictor,
    )
    assert np.array_equal(decode_tiff(payload), img)


def test_lzw_width_growth_and_table_reset_roundtrip():
    # incompressible input drives the code table through the 9→10→11→12
    # bit early-change switches and at least one CLEAR-triggered reset
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 150, 3), dtype=np.uint8)  # 28.8 KB
    payload = encode_tiff(img, 2, compression=5)
    assert np.array_equal(decode_tiff(payload), img)


def test_lzw_flat_image_compresses():
    img = np.full((32, 32, 3), 130, dtype=np.uint8)
    payload = encode_tiff(img, 2, compression=5)
    uncompressed = encode_tiff(img, 2)
    assert len(payload) < len(uncompressed) // 4
    assert np.array_equal(decode_tiff(payload), img)


def test_packbits_flat_image_compresses():
    img = np.full((32, 32, 3), 7, dtype=np.uint8)
    payload = encode_tiff(img, 2, compression=32773)
    assert len(payload) < len(encode_tiff(img, 2)) // 4
    assert np.array_equal(decode_tiff(payload), img)


def test_predictor2_changes_stream_but_not_pixels():
    # a horizontal gradient turns into constant deltas under predictor
    # 2, so the LZW stream must shrink while pixels stay identical
    img = np.tile(
        np.arange(256, dtype=np.uint8)[None, :, None], (16, 1, 3)
    )
    plain = encode_tiff(img, 2, compression=5)
    pred = encode_tiff(img, 2, compression=5, predictor=2)
    assert len(pred) < len(plain)
    assert np.array_equal(decode_tiff(pred), img)
    assert np.array_equal(decode_tiff(plain), img)


def test_predictor_without_lzw_is_rejected():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor 2"):
        encode_tiff(img, 2, compression=32773, predictor=2)


def test_truncated_lzw_strip_raises():
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    raw = bytes(np.arange(48, dtype=np.uint8))
    enc = _tiff_lzw_encode(raw)
    assert _tiff_lzw_decode(enc, 48) == raw
    with pytest.raises(ValueError, match="LZW"):
        _tiff_lzw_decode(enc[:-3], 48)


def test_missing_strip_offsets_raises_valueerror():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(img, 2))
    # rename the StripOffsets tag (273) to an unknown private tag so
    # the walk drops it — decode must raise the module's ValueError
    # contract, not KeyError
    i = payload.find(struct.pack("<HH", 273, 4))
    assert i > 0
    payload[i : i + 2] = struct.pack("<H", 60000)
    with pytest.raises(ValueError, match="273"):
        decode_tiff(bytes(payload))


# ---------------------------------------------------- multi-page -------


def test_multipage_chain_roundtrip_and_page_count():
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        encode_tiff_multipage,
        tiff_page_count,
    )

    rng = np.random.default_rng(4)
    pages = [
        rng.integers(0, 256, (11 + k, 9 + 2 * k, 3), dtype=np.uint8)
        for k in range(4)
    ]
    for big_endian in (False, True):
        for comp in (1, 5, 8, 32773):
            p = encode_tiff_multipage(
                pages, 2, big_endian=big_endian, compression=comp
            )
            assert tiff_page_count(p) == 4
            for k in range(4):
                assert np.array_equal(decode_tiff(p, page=k), pages[k])
            with pytest.raises(ValueError, match="out of range"):
                decode_tiff(p, page=4)


def test_single_page_reports_one_and_probe_counts_pages():
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        probe_image_metadata,
    )
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        encode_tiff_multipage,
        tiff_page_count,
    )

    img = np.zeros((6, 5, 3), dtype=np.uint8)
    single = encode_tiff(img, 2)
    assert tiff_page_count(single) == 1
    m = probe_image_metadata(single)
    assert m["format"] == "tiff" and m["n_pages"] == 1
    multi = encode_tiff_multipage([img, img, img], 2, big_endian=True)
    m = probe_image_metadata(multi)
    assert (m["width"], m["height"], m["n_pages"]) == (5, 6, 3)


def test_circular_ifd_chain_detected():
    from twilio_event_streams_reporting_example_spark.operators.tiff import (
        tiff_page_count,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(img, 2))
    # point the next-IFD pointer (last 4 bytes of the IFD, just before
    # any extra values) back at the first IFD
    first_ifd = struct.unpack_from("<I", payload, 4)[0]
    n = struct.unpack_from("<H", payload, first_ifd)[0]
    ptr_pos = first_ifd + 2 + 12 * n
    struct.pack_into("<I", payload, ptr_pos, first_ifd)
    with pytest.raises(ValueError, match="circular"):
        tiff_page_count(bytes(payload))
