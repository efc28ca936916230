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
    # flip the Compression entry's value from 1 to 34661 (JBIG)
    i = payload.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    payload[i + 8 : i + 10] = struct.pack("<H", 34661)
    with pytest.raises(ValueError, match="compression 34661"):
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


# --------------------------------------------- JPEG-in-TIFF (comp 7) ---


def _flat_rgb(h, w, seed):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                (seed + bx * 17 + by * 29) % 256,
                (seed * 3 + bx * 11) % 256,
                (seed * 13 + by * 31) % 256,
            )
    return img


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rps", [None, 8])
def test_jpeg_in_tiff_matches_plain_jpeg(big_endian, rps):
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _flat_rgb(24, 16, 9)
    payload = encode_tiff(
        img, 6, big_endian=big_endian, rows_per_strip=rps, compression=7
    )
    out = decode_tiff(payload)
    step = rps or 24
    want = np.concatenate(
        [
            decode_jpeg(encode_jpeg(img[s : s + step]))
            for s in range(0, 24, step)
        ],
        axis=0,
    )
    assert np.array_equal(out, want)


def test_jpeg_tables_stream_is_merged_into_each_strip():
    """Split a self-contained strip into an abbreviated JPEGTables
    stream (SOI + DQT/DHT + EOI, tag 347) plus a tables-free strip,
    the layout libtiff writes — decode must concatenate them."""
    img = _flat_rgb(8, 8, 4)
    payload = bytearray(encode_tiff(img, 6, compression=7))
    want = decode_tiff(bytes(payload))

    # pull the strip out of the container (single strip at offset 8)
    i = payload.find(struct.pack("<HH", 273, 4))
    (strip_off,) = struct.unpack_from("<I", payload, i + 8)
    i = payload.find(struct.pack("<HH", 279, 4))
    (strip_len,) = struct.unpack_from("<I", payload, i + 8)
    strip = bytes(payload[strip_off : strip_off + strip_len])

    # walk JPEG segments: tables (DQT FFDB / DHT FFC4) vs the rest
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(strip):
        assert strip[pos] == 0xFF
        marker = strip[pos + 1]
        if marker == 0xD9:  # EOI
            rest += strip[pos : pos + 2]
            break
        (seglen,) = struct.unpack_from(">H", strip, pos + 2)
        seg = strip[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
            if marker == 0xDA:  # SOS: entropy data runs to EOI
                rest += strip[pos + 2 + seglen : -2]
                rest += strip[-2:]
                break
        pos += 2 + seglen
    tables += b"\xff\xd9"

    # rebuild: tables-free strip in place (padded to old length) +
    # a JPEGTables tag appended as a NEW IFD... simpler: rewrite via a
    # fresh container with the same geometry
    new = bytearray()
    new += b"II*\x00"
    strip2 = bytes(rest) + b"\x00" * (strip_len - len(rest))
    ifd_off = 8 + len(strip2)
    new += struct.pack("<I", ifd_off)
    new += strip2
    tbl_bytes = bytes(tables)

    entries = []

    def ent(tag, typ, cnt, field4):
        entries.append(struct.pack("<HHI", tag, typ, cnt) + field4)

    extra_off = ifd_off + 2 + 12 * 11 + 4
    ent(256, 3, 1, struct.pack("<HH", 8, 0))
    ent(257, 3, 1, struct.pack("<HH", 8, 0))
    ent(258, 3, 3, struct.pack("<I", extra_off))  # bits [8,8,8]
    ent(259, 3, 1, struct.pack("<HH", 7, 0))  # JPEG
    ent(262, 3, 1, struct.pack("<HH", 6, 0))  # YCbCr
    ent(273, 4, 1, struct.pack("<I", 8))
    ent(277, 3, 1, struct.pack("<HH", 3, 0))
    ent(278, 3, 1, struct.pack("<HH", 8, 0))
    ent(279, 4, 1, struct.pack("<I", len(rest)))
    ent(284, 3, 1, struct.pack("<HH", 1, 0))
    ent(347, 7, len(tbl_bytes), struct.pack("<I", extra_off + 6))
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00" * 4
    new += ifd
    new += struct.pack("<3H", 8, 8, 8)  # bits extra values
    new += tbl_bytes

    out = decode_tiff(bytes(new))
    assert np.array_equal(out, want)


@pytest.mark.parametrize("big_endian", [False, True])
def test_jpeg_tiff_photometric2_is_rgb_with_no_transform(big_endian):
    """TIFF TN2: photometric 2 means the JPEG components ARE R,G,B —
    no inverse YCbCr step. Flat 8x8 blocks make the DCT path exact,
    so a saturated color must roundtrip bit-exactly; applying the
    (wrong) YCbCr inverse to pure red would produce a wildly
    different pixel, which is exactly the bug this pins down."""
    img = np.zeros((16, 8, 3), dtype=np.uint8)
    img[:8] = (255, 0, 0)   # pure red
    img[8:] = (0, 200, 30)
    payload = encode_tiff(
        img, 2, big_endian=big_endian, rows_per_strip=8, compression=7
    )
    out = decode_tiff(payload)
    assert np.array_equal(out, img)

    # sanity: the YCbCr interpretation of a stored-RGB red block is
    # NOT red (Y=255,Cb=0,Cr=0 -> r=clip(255-179)=76...), so a decoder
    # that always applies the inverse transform cannot pass the above
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        ycbcr_to_rgb,
    )

    assert ycbcr_to_rgb(255, 0, 0) != (255, 0, 0)


def test_jpeg_tiff_photometric2_and_6_streams_differ():
    """Same pixels, both conventions: the strips must differ (one
    carries YCbCr, the other RGB) yet both decode to the pixels."""
    img = _flat_rgb(8, 8, 7)
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    p2 = encode_tiff(img, 2, compression=7)
    p6 = encode_tiff(img, 6, compression=7)
    assert p2 != p6
    # RGB-stored flat blocks are exact (no transform at all); the
    # YCbCr path matches the plain-JPEG pipeline (transform roundtrip
    # of arbitrary colors is within-1, not identity)
    assert np.array_equal(decode_tiff(p2), img)
    assert np.array_equal(decode_tiff(p6), decode_jpeg(encode_jpeg(img)))


def test_jpeg_tiff_short_strip_chain_raises():
    """A comp-7 file whose strip list does not cover the image height
    must raise, not return a silently short image: patch the IFD's
    StripOffsets/StripByteCounts counts from 3 strips down to 2."""
    img = _flat_rgb(24, 8, 5)
    payload = bytearray(
        encode_tiff(img, 6, rows_per_strip=8, compression=7)
    )
    for tag, typ in ((273, 4), (279, 4)):
        i = payload.find(struct.pack("<HHI", tag, typ, 3))
        assert i >= 0
        struct.pack_into("<I", payload, i + 4, 2)  # cnt 3 -> 2
    with pytest.raises(ValueError, match="strip count"):
        decode_tiff(bytes(payload))


def test_out_of_line_tag_value_past_eof_raises_valueerror():
    """A tag whose out-of-line value pointer runs past the payload
    must raise the module's contractual ValueError (not a raw
    struct.error): truncate a container right after its IFD so the
    out-of-line StripByteCounts values vanish."""
    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    payload = bytearray(encode_tiff(img, 2, rows_per_strip=4))
    # out-of-line StripOffsets (cnt 2 longs = 8 bytes > 4): point it
    # past the end of the buffer
    i = payload.find(struct.pack("<HHI", 273, 4, 2))
    assert i >= 0
    struct.pack_into("<I", payload, i + 8, len(payload) + 100)
    with pytest.raises(ValueError, match="tag value out of range"):
        decode_tiff(bytes(payload))


# ------------------------------------- old-style JPEG-in-TIFF (comp 6) --


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("photometric", [2, 6])
def test_old_style_jpeg_interchange_roundtrip(big_endian, photometric):
    """TIFF 6.0 §22 interchange layout: one complete JPEG stream at
    JPEGInterchangeFormat (513) with JPEGProc=1. Photometric 2 stores
    RGB (no transform ⇒ flat blocks exact); 6 matches the plain-JPEG
    pipeline."""
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _flat_rgb(16, 8, 3)
    payload = encode_tiff(
        img, photometric, big_endian=big_endian, compression=6
    )
    out = decode_tiff(payload)
    if photometric == 2:
        assert np.array_equal(out, img)
    else:
        assert np.array_equal(out, decode_jpeg(encode_jpeg(img)))


def test_old_style_jpeg_without_length_tag_reads_to_eof():
    """JPEGInterchangeFormatLength (514) is optional in the wild
    (EXIF readers tolerate its absence): drop it and decode must
    still work — the stream runs to its own EOI."""
    img = _flat_rgb(8, 8, 6)
    payload = bytearray(encode_tiff(img, 6, compression=6))
    want = decode_tiff(bytes(payload))
    i = payload.find(struct.pack("<HHI", 514, 4, 1))
    assert i > 0
    # overwrite the 514 entry with a harmless duplicate of 512
    j = payload.find(struct.pack("<HHI", 512, 3, 1))
    payload[i : i + 12] = payload[j : j + 12]
    # IFD entries must stay ascending: re-sort the entry block
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    entries = [
        bytes(payload[ifd_off + 2 + 12 * k : ifd_off + 14 + 12 * k])
        for k in range(n)
    ]
    entries.sort(key=lambda ent: struct.unpack("<H", ent[:2])[0])
    payload[ifd_off + 2 : ifd_off + 2 + 12 * n] = b"".join(entries)
    out = decode_tiff(bytes(payload))
    assert np.array_equal(out, want)


def test_old_style_jpeg_strip_tables_variant_is_gated():
    """The §22 strip-based variant (separate JPEGQTables/DC/AC table
    tags, no 513) is the design TTN2 deprecated — it must raise
    NotImplementedError, not decode wrongly."""
    img = _flat_rgb(8, 8, 2)
    payload = bytearray(encode_tiff(img, 6, compression=6))
    i = payload.find(struct.pack("<HHI", 513, 4, 1))
    assert i > 0
    struct.pack_into("<H", payload, i, 600)  # hide tag 513
    with pytest.raises(NotImplementedError, match="JPEGInterchangeFormat"):
        decode_tiff(bytes(payload))


def test_old_style_jpeg_lossless_proc_is_gated():
    img = _flat_rgb(8, 8, 2)
    payload = bytearray(encode_tiff(img, 6, compression=6))
    i = payload.find(struct.pack("<HHI", 512, 3, 1))
    assert i > 0
    struct.pack_into("<H", payload, i + 8, 14)  # JPEGProc 14 = lossless
    with pytest.raises(NotImplementedError, match="JPEGProc"):
        decode_tiff(bytes(payload))


def test_old_style_jpeg_rejects_strips_on_encode():
    img = _flat_rgb(16, 8, 2)
    with pytest.raises(ValueError, match="interchange"):
        encode_tiff(img, 6, compression=6, rows_per_strip=8)


# ---------------------------------------------------------------- tiled §15


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiled_byte_codec_roundtrip(comp, big_endian):
    """§15 tiled layout, byte codecs: a 37×29 RGB image on a 16×16
    grid (edge tiles padded by replication, cropped on decode) must
    round-trip bit-exact and match the strip-layout decode."""
    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, size=(37, 29, 3)).astype(np.uint8)
    tiled = encode_tiff(
        img, 2, big_endian=big_endian, compression=comp, tile=(16, 16)
    )
    assert np.array_equal(decode_tiff(tiled), img)
    striped = encode_tiff(img, 2, big_endian=big_endian, compression=comp)
    assert np.array_equal(decode_tiff(tiled), decode_tiff(striped))


def test_tiled_ifd_carries_tile_tags_not_strip_tags():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    payload = encode_tiff(img, 2, tile=(16, 16))
    # tags 322/323 (SHORT) and 324/325 (LONG) present; 273/278/279 absent
    for tag, typ in ((322, 3), (323, 3), (324, 4), (325, 4)):
        assert struct.pack("<HHI", tag, typ, 1) in payload
    for tag in (273, 278, 279):
        assert struct.pack("<HH", tag, 3) not in payload
        assert struct.pack("<HH", tag, 4) not in payload


def test_tiled_lzw_predictor2_roundtrip():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(40, 50, 3)).astype(np.uint8)
    payload = encode_tiff(img, 2, compression=5, predictor=2, tile=(32, 16))
    assert np.array_equal(decode_tiff(payload), img)


def test_tiled_gray_roundtrip():
    g = np.arange(18 * 20, dtype=np.uint8).reshape(18, 20) % 251
    payload = encode_tiff(g, 1, compression=8, tile=(16, 16))
    out = decode_tiff(payload)
    assert np.array_equal(out[:, :, 0], g)


@pytest.mark.parametrize("comp,t4", [(2, 0), (3, 1), (4, 0)])
def test_tiled_ccitt_roundtrip(comp, t4):
    """Each tile is an independent CCITT coded segment; pm 0
    (WhiteIsZero) maps codec white → 255 exactly as the strip path."""
    rng = np.random.RandomState(43)
    bm = (rng.rand(20, 45) < 0.3).astype(np.uint8)
    tiled = encode_tiff(bm, 0, compression=comp, t4_options=t4, tile=(16, 16))
    striped = encode_tiff(bm, 0, compression=comp, t4_options=t4)
    assert np.array_equal(decode_tiff(tiled), decode_tiff(striped))
    want = ((1 - bm) * 255).astype(np.uint8)
    assert np.array_equal(decode_tiff(tiled)[:, :, 0], want)


@pytest.mark.parametrize("photometric", [2, 6])
def test_tiled_jpeg_close_to_strip_decode(photometric):
    """Comp-7 tiles: each tile is its own JPEG stream. Lossy, so
    assert near-equality to the source and to the strip-layout
    decode (replicated edge padding keeps tile borders clean)."""
    rng = np.random.RandomState(44)
    base = rng.randint(60, 196, size=(3, 4, 3)).astype(np.uint8)
    img = np.kron(base, np.ones((12, 12, 1))).astype(np.uint8)  # 36x48
    tiled = decode_tiff(
        encode_tiff(img, photometric, compression=7, tile=(16, 16))
    )
    assert tiled.shape == img.shape
    assert np.max(np.abs(tiled.astype(int) - img.astype(int))) <= 20
    striped = decode_tiff(encode_tiff(img, photometric, compression=7))
    assert np.mean(np.abs(tiled.astype(int) - striped.astype(int))) <= 4.0


def test_tiled_encode_rejects_bad_args():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, 2, tile=(8, 16))
    with pytest.raises(ValueError, match="rows_per_strip"):
        encode_tiff(img, 2, tile=(16, 16), rows_per_strip=8)
    with pytest.raises(ValueError, match="cannot tile"):
        encode_tiff(img, 6, compression=6, tile=(16, 16))


def test_tiled_decode_rejects_wrong_tile_count():
    img = np.zeros((20, 20, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(img, 2, tile=(16, 16)))
    # shrink the claimed height to 16 → grid becomes 1x2, not 2x2
    i = payload.find(struct.pack("<HHI", 257, 3, 1))
    assert i > 0
    struct.pack_into("<H", payload, i + 8, 16)
    with pytest.raises(ValueError, match="tile count"):
        decode_tiff(bytes(payload))
