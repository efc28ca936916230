"""Multimodal plumbing tests beyond the registered oracles."""

import pytest
from pyspark.sql import functions as F


def test_frame_sample_shape(spark, sf_dir):
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        FRAME_STRIDE,
        frame_sample,
        with_payload,
    )
    from twilio_event_streams_reporting_example_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir).limit(20)
    mm = with_payload(docs)
    frames = frame_sample(mm)
    joined = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("max_idx"))
        .join(mm.select("doc_id", F.length("payload").alias("n_bytes")), "doc_id")
        .collect()
    )
    assert len(joined) == 20
    for r in joined:
        expected = (r["n_bytes"] + FRAME_STRIDE - 1) // FRAME_STRIDE
        assert r["n"] == expected
        assert r["max_idx"] == expected - 1


def test_real_decoder_is_gated():
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_real_media,
    )

    # BMP/PNG/JPEG/WAV decode for real now; a malformed JPEG payload
    # reaches the real decoder and fails validation, while genuinely
    # compressed formats (MP3/video) remain behind the documented gate.
    with pytest.raises(ValueError):
        decode_real_media(b"\xff\xd8\xff\xe0jpeg-ish", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_real_media(b"ID3\x04mp3-ish", "audio/mpeg")
    with pytest.raises(NotImplementedError):
        decode_real_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_resize_shuffle_free(spark, sf_dir):
    """The resize kernel is a pure scan→mapInPandas plan — no exchange."""
    from twilio_event_streams_reporting_example_spark.registry import all_queries

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        multimodal_resize,
    )

    df = multimodal_resize(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bmp_codec_roundtrip_and_layout():
    """The dependency-free BMP codec: byte-exact container layout
    (magic, offsets, padded bottom-up BGR rows) and lossless
    roundtrip; a non-BMP payload raises, other containers stay gated."""
    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_bmp,
        decode_real_media,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    # width 3 -> row stride 9 -> padded to 12: exercises padding
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    blob = encode_bmp(img)
    assert blob[:2] == b"BM"
    assert len(blob) == 14 + 40 + 12 * 5
    # bottom-up BGR: first data row is the LAST image row, reversed chans
    first_row = blob[54 : 54 + 9]
    assert first_row == img[-1, :, ::-1].tobytes()
    assert (decode_bmp(blob) == img).all()
    assert (decode_real_media(blob, "image/bmp") == img).all()
    with pytest.raises(ValueError):
        decode_bmp(b"NOPE" + blob)
    # a malformed JPEG now reaches the real decoder (ValueError),
    # while compressed audio stays behind the documented gate
    with pytest.raises(ValueError):
        decode_real_media(b"\xff\xd8\xff\xe0jpeg-ish", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_real_media(b"ID3\x04mp3-ish", "audio/mpeg")


def test_png_codec_roundtrip_filters_and_integrity():
    """The dependency-free PNG codec: lossless roundtrip on images tall
    enough that the encoder's filter cycle exercises ALL five scanline
    filter types (None/Sub/Up/Average/Paeth), signature dispatch through
    decode_real_media, CRC verification, and the unimplemented-feature
    gates (non-RGB stays NotImplementedError, corrupt chunks raise)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _png_chunk,
        decode_png,
        decode_real_media,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 3), (12, 7), (40, 33)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_png(img)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        assert (decode_png(blob) == img).all(), (h, w)
        assert (decode_real_media(blob, "image/png") == img).all()
    # every filter type is actually present in a tall image's stream
    img = rng.integers(0, 256, size=(10, 4, 3), dtype=np.uint8)
    blob = encode_png(img)
    idat = blob[8:]
    # walk chunks to the IDAT body
    pos, body = 0, None
    while pos + 8 <= len(idat):
        (ln,) = struct.unpack_from(">I", idat, pos)
        if idat[pos + 4 : pos + 8] == b"IDAT":
            body = zlib.decompress(idat[pos + 8 : pos + 8 + ln])
            break
        pos += 12 + ln
    filters = {body[y * (4 * 3 + 1)] for y in range(10)}
    assert filters == {0, 1, 2, 3, 4}
    # corrupt a data byte -> CRC catches it
    bad = bytearray(blob)
    bad[45] ^= 0x5A
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # spec-ILLEGAL combos are an explicit gate, not a silent wrong
    # decode (every legal depth/color/interlace combo decodes for real
    # — test_png_color_types / test_png_interlaced_and_16bit /
    # test_png_subbyte_depths)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)  # 4-bit RGB
    blob4 = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(blob4)
    with pytest.raises(ValueError):
        decode_png(b"BM not a png")

def test_wav_codec_roundtrip_layout_and_gates():
    """The dependency-free WAV codec: lossless int16 roundtrip (mono and
    stereo), canonical RIFF layout fields, signature dispatch through
    decode_real_media, word-aligned chunk skipping (an odd-length
    non-data chunk between fmt and data must not derail the walk), and
    the explicit gates (non-PCM / non-16-bit raise NotImplementedError,
    inconsistent sizes raise ValueError)."""
    import struct

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_real_media,
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(23)
    for n, ch in [(1, 1), (7, 2), (480, 1), (1024, 2)]:
        sig = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
        blob = encode_wav(sig, 16000)
        arr, rate = decode_wav(blob)
        assert rate == 16000 and arr.shape == (n, ch)
        assert (arr == sig).all(), (n, ch)
        arr2, _ = decode_real_media(blob, "audio/wav")
        assert (arr2 == sig).all()
    # 1-D input is treated as mono
    mono = rng.integers(-1000, 1000, size=64, dtype=np.int16)
    arr, _ = decode_wav(encode_wav(mono, 8000))
    assert arr.shape == (64, 1) and (arr[:, 0] == mono).all()
    # container layout: canonical header fields where they belong
    sig = rng.integers(-100, 100, size=(10, 2), dtype=np.int16)
    blob = encode_wav(sig, 44100)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert struct.unpack_from("<I", blob, 4)[0] == len(blob) - 8
    assert blob[12:16] == b"fmt " and struct.unpack_from("<I", blob, 16)[0] == 16
    fmt_tag, n_ch, rate, byte_rate, block, bits = struct.unpack_from("<HHIIHH", blob, 20)
    assert (fmt_tag, n_ch, rate, byte_rate, block, bits) == (
        1, 2, 44100, 44100 * 4, 4, 16,
    )
    # an extra odd-length chunk before data is skipped word-aligned
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    spliced = blob[:36] + extra + blob[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    arr, rate = decode_wav(spliced)
    assert rate == 44100 and (arr == sig).all()
    # gate: still-compressed-in-RIFF codecs (MP3-in-RIFF, tag 0x55)
    # are not silently wrong (float/8/24/32-bit PCM, G.711, and both
    # IMA/MS ADPCM block codecs now decode for real —
    # test_wav_variant_roundtrips / test_wav_g711_decode /
    # test_adpcm.py / test_adpcm_ms.py cover them)
    mp3_fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 1000, 1, 8)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + mp3_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_wav(bad)
    # truncated/misaligned data chunk is a hard error
    trunc = blob[:-3]
    trunc = trunc[:4] + struct.pack("<I", len(trunc) - 8) + trunc[8:]
    with pytest.raises(ValueError):
        # data length no longer a multiple of block_align
        decode_wav(trunc[: len(blob) - 3])
    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")


def test_wav_formula_matches_kernel_signal():
    """The oracle-side closed form (_wav_signal_formula) and the
    kernel-side numpy signal generation must agree exactly — the same
    guarantee the BMP formula test gives the image sections."""
    import numpy as np

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _wav_signal_formula,
        decode_wav,
        encode_wav,
    )

    for i in [0, 1, 7, 33, 63]:
        n, rate, s_l, s_r = _wav_signal_formula(i)
        t = np.arange(n, dtype=np.int64)
        sig = np.stack(
            [(i * 7 + t * t) % 4001 - 2000, (i * 11 + 3 * t) % 4001 - 2000],
            axis=1,
        ).astype(np.int16)
        arr, got_rate = decode_wav(encode_wav(sig, rate))
        sums = arr.astype(np.int64).sum(axis=0)
        assert (int(sums[0]), int(sums[1]), got_rate) == (s_l, s_r, rate)

def test_jpeg_codec_flat_exact_bounded_ac_and_gates():
    """The dependency-free baseline JPEG codec: flat-8x8-block images
    roundtrip BIT-EXACTLY (DC quant step 8 — the jpeg_roundtrip oracle
    contract), general images roundtrip within quantization error,
    non-multiple-of-8 dims work via edge replication, signature
    dispatch through decode_real_media, and the explicit gates
    (progressive SOF2 and non-4:4:4 raise NotImplementedError, broken
    streams raise ValueError)."""
    import struct

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_real_media,
    )

    rng = np.random.default_rng(31)
    # flat blocks: exact (= closed-form color transform only)
    h, w = 24, 32
    img = np.zeros((h, w, 3), np.uint8)
    expected = np.zeros_like(img)
    for by in range(h // 8):
        for bx in range(w // 8):
            c = rng.integers(0, 256, 3)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = c
            expected[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = ycbcr_to_rgb(
                *rgb_to_ycbcr(*map(int, c))
            )
    blob = encode_jpeg(img)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert (decode_jpeg(blob) == expected).all()
    assert (decode_real_media(blob, "image/jpeg") == expected).all()
    # general image: bounded error through the AC path (flat AC step 16
    # on uint8 noise: DCT error stays well under 64 per channel)
    img2 = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    dec2 = decode_jpeg(encode_jpeg(img2))
    assert np.abs(dec2.astype(int) - img2.astype(int)).max() <= 64
    # smooth gradients compress nearly losslessly
    x = np.linspace(0, 255, 48)
    img3 = np.stack(
        [np.tile(x, (48, 1)), np.tile(x[:, None], (1, 48)), np.full((48, 48), 128)],
        axis=2,
    ).astype(np.uint8)
    dec3 = decode_jpeg(encode_jpeg(img3))
    assert np.abs(dec3.astype(int) - img3.astype(int)).max() <= 8
    # edge replication: odd dims decode at the original shape
    img4 = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    dec4 = decode_jpeg(encode_jpeg(img4))
    assert dec4.shape == (13, 21, 3)
    assert np.abs(dec4.astype(int) - img4.astype(int)).max() <= 64
    # gates: arithmetic-coded (SOF9) is refused, not wrongly decoded
    # (progressive SOF2 now decodes for real — test_jpeg_progressive)
    blob5 = bytearray(encode_jpeg(img2))
    sof = blob5.find(b"\xff\xc0")
    blob5[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob5))
    # a sequential stream whose marker is flipped to SOF2 is MALFORMED
    # progressive (full-band scan): hard error, not a wrong decode
    blob5b = bytearray(encode_jpeg(img2))
    blob5b[blob5b.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob5b))
    # 12-bit precision is refused (2x2 sampling now decodes for real —
    # test_jpeg_subsampling_and_restart covers it)
    blob6 = bytearray(encode_jpeg(img2))
    sof = blob6.find(b"\xff\xc0")
    blob6[sof + 4] = 12  # precision byte
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob6))
    with pytest.raises(ValueError):
        decode_jpeg(b"RIFF not a jpeg")
    # truncated entropy stream is a hard error
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img2)[:-40] + b"\xff\xd9")


def test_png_color_types():
    """Beyond RGB: hand-built 8-bit grayscale, palette, gray+alpha, and
    RGBA PNGs decode to their natural channel shapes (palette expands
    through PLTE to RGB); 16-bit depth stays gated; a bad palette index
    is a hard error."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(29)

    def build(w, h, ctype, pixel_bytes, plte=None, depth=8):
        ihdr = _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        )
        scan = b"".join(
            b"\x00" + pixel_bytes[y * w * _ch(ctype) : (y + 1) * w * _ch(ctype)]
            for y in range(h)
        )
        chunks = ihdr
        if plte is not None:
            chunks += _png_chunk(b"PLTE", plte)
        chunks += _png_chunk(b"IDAT", zlib.compress(scan))
        chunks += _png_chunk(b"IEND", b"")
        return _PNG_SIG + chunks

    def _ch(ctype):
        return {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]

    # grayscale
    g = rng.integers(0, 256, (5, 7, 1), dtype=np.uint8)
    assert (decode_png(build(7, 5, 0, g.tobytes())) == g).all()
    # gray+alpha
    ga = rng.integers(0, 256, (4, 6, 2), dtype=np.uint8)
    assert (decode_png(build(6, 4, 4, ga.tobytes())) == ga).all()
    # RGBA
    rgba = rng.integers(0, 256, (3, 5, 4), dtype=np.uint8)
    assert (decode_png(build(5, 3, 6, rgba.tobytes())) == rgba).all()
    # palette: indices expand through PLTE
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 6, 1), dtype=np.uint8)
    out = decode_png(build(6, 6, 3, idx.tobytes(), plte=pal.tobytes()))
    assert (out == pal[idx[:, :, 0]]).all()
    # palette index out of range is a hard error
    bad_idx = np.full((2, 2, 1), 200, dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_png(build(2, 2, 3, bad_idx.tobytes(), plte=pal.tobytes()))
    # 16-bit palette (invalid per spec) stays gated
    with pytest.raises(NotImplementedError):
        decode_png(build(2, 2, 3, idx[:2, :2].tobytes(), plte=pal.tobytes(),
                         depth=16))


def test_png_interlaced_and_16bit():
    """Adam7-interlaced PNGs (hand-built: each of the 7 sub-images
    filtered independently) reassemble to the exact original for sizes
    exercising empty and partial passes; 16-bit samples decode to
    uint16 big-endian; 16-bit + interlace compose; sub-byte depth
    stays gated."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _ADAM7,
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(83)

    def build(img, depth, ctype, interlace):
        h, w, ch = img.shape
        ihdr = _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        )
        if depth == 8:
            px = img.astype(np.uint8)
        else:
            px = img.astype(">u2").view(np.uint8).reshape(h, w, ch * 2)
        if interlace == 0:
            scan = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        else:
            parts = []
            for x0, y0, dx, dy in _ADAM7:
                sub = px[y0::dy, x0::dx]
                if sub.size == 0:
                    continue
                for row in sub:
                    parts.append(b"\x00" + row.tobytes())
            scan = b"".join(parts)
        return (
            _PNG_SIG + ihdr + _png_chunk(b"IDAT", zlib.compress(scan))
            + _png_chunk(b"IEND", b"")
        )

    # Adam7 RGB at sizes that exercise empty passes (1x1, 3x5) and
    # partial passes (13x9)
    for h, w in [(1, 1), (3, 5), (13, 9), (16, 16)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_png(build(img, 8, 2, 1))
        assert (out == img).all(), (h, w)
    # 16-bit gray and RGB, non-interlaced and interlaced
    g16 = rng.integers(0, 65536, (7, 11, 1), dtype=np.uint16)
    out = decode_png(build(g16, 16, 0, 0))
    assert out.dtype == np.uint16 and (out == g16).all()
    rgb16 = rng.integers(0, 65536, (9, 6, 3), dtype=np.uint16)
    out = decode_png(build(rgb16, 16, 2, 1))
    assert out.dtype == np.uint16 and (out == rgb16).all()
    # sub-byte RGB (spec-illegal) stays gated
    with pytest.raises(NotImplementedError):
        decode_png(build(rng.integers(0, 256, (4, 4, 3), np.uint8), 4, 2, 0))


def test_png_subbyte_depths():
    """1/2/4-bit gray and palette PNGs (MSB-first packed samples,
    byte-distance filtering), non-interlaced and Adam7: hand-packed
    scanlines must decode to the exact sample values; palette expands
    through PLTE."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _ADAM7,
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(101)

    def pack_rows(sam, depth):
        # (rows, width) samples -> filter-0 scanlines, MSB-first
        rows = []
        for row in sam:
            bits = np.zeros(len(row) * depth, dtype=np.uint8)
            for i, v in enumerate(row):
                for b in range(depth):
                    bits[i * depth + b] = (int(v) >> (depth - 1 - b)) & 1
            rows.append(b"\x00" + np.packbits(bits).tobytes())
        return rows

    def build(sam, depth, ctype, interlace, plte=None):
        h, w = sam.shape
        chunks = _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        )
        if plte is not None:
            chunks += _png_chunk(b"PLTE", plte)
        if interlace == 0:
            scan = b"".join(pack_rows(sam, depth))
        else:
            parts = []
            for x0, y0, dx, dy in _ADAM7:
                sub = sam[y0::dy, x0::dx]
                if sub.size == 0:
                    continue
                parts.extend(pack_rows(sub, depth))
            scan = b"".join(parts)
        return (
            _PNG_SIG + chunks + _png_chunk(b"IDAT", zlib.compress(scan))
            + _png_chunk(b"IEND", b"")
        )

    for depth in (1, 2, 4):
        # gray, widths that leave partial trailing bytes
        for h, w in [(3, 5), (7, 11), (1, 1)]:
            sam = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
            out = decode_png(build(sam, depth, 0, 0))
            assert out.shape == (h, w, 1) and (out[:, :, 0] == sam).all()
            out = decode_png(build(sam, depth, 0, 1))
            assert (out[:, :, 0] == sam).all(), (depth, h, w, "adam7")
        # palette
        pal = rng.integers(0, 256, (1 << depth, 3), dtype=np.uint8)
        idx = rng.integers(0, 1 << depth, (6, 7), dtype=np.uint8)
        out = decode_png(build(idx, depth, 3, 0, plte=pal.tobytes()))
        assert (out == pal[idx]).all(), depth


def test_wav_variant_roundtrips():
    """Beyond PCM-16: every uncompressed RIFF variant roundtrips
    losslessly through the dtype-driven encoder/decoder (PCM-8/24/32,
    IEEE float32/64), and compressed-in-RIFF codecs stay gated."""
    import struct

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    cases = [
        (rng.integers(0, 256, (100, 2), dtype=np.uint8), 8000, None, np.uint8),
        (rng.integers(-30000, 30000, (101, 1), dtype=np.int16), 44100, None,
         np.int16),
        (rng.integers(-(1 << 23), 1 << 23, (77, 2)).astype(np.int32), 48000, 24,
         np.int32),
        (rng.integers(-(1 << 30), 1 << 30, (50, 3)).astype(np.int32), 16000,
         None, np.int32),
        (rng.normal(size=(64, 2)).astype(np.float32), 22050, None, np.float32),
        (rng.normal(size=(33, 1)), 96000, None, np.float64),
    ]
    for sig, rate, bits, want_dtype in cases:
        blob = encode_wav(sig, rate, bits=bits) if bits else encode_wav(sig, rate)
        arr, got_rate = decode_wav(blob)
        assert arr.dtype == want_dtype and got_rate == rate
        assert (arr == sig).all(), (want_dtype, bits)
    # MS ADPCM (tag 2) now routes to the real block decoder — a data
    # chunk that is not a whole number of blocks is a hard error, not
    # a silent decode (full coverage in test_adpcm_ms.py)
    fmt_chunk = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 256, 4)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # 24-bit emit demands int32 input; dtype/bits mismatch is an error
    with pytest.raises(ValueError):
        encode_wav(np.zeros((4, 1), np.int16), 8000, bits=24)


def test_image_metadata_probe():
    """Header-only dimension extraction across containers: our own
    real encoders (BMP/PNG/JPEG sequential+progressive) plus
    hand-built GIF and all three WebP chunk flavors — no decode cost;
    unknown payloads raise."""
    import struct

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        probe_image_metadata,
    )

    img = np.random.default_rng(3).integers(0, 256, (21, 34, 3), np.uint8)
    m = probe_image_metadata(encode_bmp(img))
    assert (m["format"], m["width"], m["height"]) == ("bmp", 34, 21)
    m = probe_image_metadata(encode_png(img))
    assert (m["format"], m["width"], m["height"]) == ("png", 34, 21)
    m = probe_image_metadata(encode_jpeg(img))
    assert (m["format"], m["width"], m["height"], m["progressive"]) == (
        "jpeg", 34, 21, False,
    )
    m = probe_image_metadata(encode_jpeg_progressive(img))
    assert (m["format"], m["width"], m["height"], m["progressive"]) == (
        "jpeg", 34, 21, True,
    )
    # EXIF orientation rides along (APP1 TIFF IFD0 tag 0x0112),
    # little- and big-endian TIFF headers both
    base = encode_jpeg(img)
    for bo, fmt in (("II", "<"), ("MM", ">")):
        tiff = (
            bo.encode() + struct.pack(fmt + "H", 42) + struct.pack(fmt + "I", 8)
            + struct.pack(fmt + "H", 1)
            + struct.pack(fmt + "HHI", 0x0112, 3, 1)
            + struct.pack(fmt + "H", 6) + b"\x00\x00"
            + struct.pack(fmt + "I", 0)
        )
        app1_body = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
        with_exif = base[:2] + app1 + base[2:]
        m = probe_image_metadata(with_exif)
        assert m["orientation"] == 6 and m["width"] == 34, bo
    # GIF logical screen descriptor
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    m = probe_image_metadata(gif)
    assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)
    # WebP: VP8X (24-bit canvas minus one), VP8L (14-bit packed),
    # VP8 (frame tag + start code)
    vp8x = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 10) + bytes(4)
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    )
    m = probe_image_metadata(vp8x)
    assert (m["format"], m["width"], m["height"]) == ("webp", 640, 480)
    bits = (99 - 1) | ((77 - 1) << 14)
    vp8l = (
        b"RIFF" + struct.pack("<I", 17) + b"WEBP"
        + b"VP8L" + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits)
    )
    m = probe_image_metadata(vp8l)
    assert (m["format"], m["width"], m["height"]) == ("webp", 99, 77)
    vp8 = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10) + bytes(3) + b"\x9d\x01\x2a"
        + struct.pack("<HH", 512, 288)
    )
    m = probe_image_metadata(vp8)
    assert (m["format"], m["width"], m["height"]) == ("webp", 512, 288)
    with pytest.raises(ValueError):
        probe_image_metadata(b"not a container at all")


def test_wav_g711_decode():
    """G.711 telephony expansion (the call-recording codec of this
    engine's own domain): the vectorized mu-law/A-law decoders match
    an INDEPENDENT scalar re-derivation of the recommendation on all
    256 code points, hit the canonical anchor values, and wire through
    RIFF format tags 7/6 in decode_wav."""
    import struct

    import numpy as np

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _g711_alaw_to_linear,
        _g711_ulaw_to_linear,
        decode_wav,
    )

    def ulaw_ref(b):  # scalar, straight from the spec shape
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw_ref(b):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    codes = np.arange(256, dtype=np.uint8)
    assert (_g711_ulaw_to_linear(codes) == [ulaw_ref(b) for b in range(256)]).all()
    assert (_g711_alaw_to_linear(codes) == [alaw_ref(b) for b in range(256)]).all()
    # canonical anchors (16-bit linear domain, as in the classic Sun
    # g711.c): mu-law 0xFF/0x7F are +-0, extremes +-32124; A-law
    # smallest step +-8 at codes 0xD5/0x55, extreme 32256
    assert _g711_ulaw_to_linear(np.array([0xFF], np.uint8))[0] == 0
    assert _g711_ulaw_to_linear(np.array([0x7F], np.uint8))[0] == 0
    assert _g711_ulaw_to_linear(np.array([0x80], np.uint8))[0] == 32124
    assert _g711_ulaw_to_linear(np.array([0x00], np.uint8))[0] == -32124
    assert _g711_alaw_to_linear(np.array([0xD5], np.uint8))[0] == 8
    assert _g711_alaw_to_linear(np.array([0x55], np.uint8))[0] == -8
    assert _g711_alaw_to_linear(np.array([0xAA], np.uint8))[0] == 32256
    # both laws decode to symmetric value sets
    assert set((-_g711_ulaw_to_linear(codes)).tolist()) == set(
        _g711_ulaw_to_linear(codes).tolist()
    )
    # RIFF wiring: format tags 7 (mu) and 6 (A), mono and stereo
    for tag, fn in ((7, _g711_ulaw_to_linear), (6, _g711_alaw_to_linear)):
        for ch in (1, 2):
            raw = np.arange(64, dtype=np.uint8)
            fmt_chunk = struct.pack("<HHIIHH", tag, ch, 8000, 8000 * ch, ch, 8)
            body = (
                b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
                + b"data" + struct.pack("<I", raw.size) + raw.tobytes()
            )
            arr, rate = decode_wav(
                b"RIFF" + struct.pack("<I", len(body)) + body
            )
            assert rate == 8000 and arr.dtype == np.int16
            assert (arr.reshape(-1) == fn(raw)).all()


def test_mp4_metadata_probe():
    """The ISO-BMFF probe extracts brand/duration/track dims/handler/
    codec from a hand-built minimal MP4 without any codec runtime;
    non-BMFF payloads raise."""
    import struct

    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        probe_video_metadata,
    )

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    # mvhd v0: ver+flags, creation, modification, timescale=1000,
    # duration=5000, then rate/volume/matrix/next-track filler
    mvhd = box(
        b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", 1000, 5000) + bytes(80)
    )
    # tkhd v0: 76 bytes of header/matrix then width/height 16.16 fixed
    tkhd = box(
        b"tkhd", bytes(76) + struct.pack(">II", 640 << 16, 360 << 16)
    )
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    stsd = box(
        b"stsd", bytes(4) + struct.pack(">I", 1) + struct.pack(">I", 86)
        + b"avc1" + bytes(78)
    )
    mdia = box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd)))
    payload = ftyp + box(b"moov", mvhd + box(b"trak", tkhd + mdia))

    meta = probe_video_metadata(payload)
    assert meta["container"] == "mp4" and meta["brand"] == "isom"
    assert meta["timescale"] == 1000 and meta["duration_s"] == 5.0
    assert meta["tracks"] == [
        {"width": 640, "height": 360, "handler": "vide", "codec": "avc1"}
    ]
    with pytest.raises(ValueError):
        probe_video_metadata(b"RIFF this is not bmff")


def test_jpeg_subsampling_and_restart():
    """Chroma-subsampled decode (the real-camera shapes): images flat
    per 16x16 MCU roundtrip BIT-EXACTLY through 4:2:0 / 4:2:2 / 4:4:0
    (flat-region box-average = identity, box-replication upsample
    restores it — the jpeg420_roundtrip oracle contract), with and
    without restart markers; general chroma-smooth images roundtrip
    within quantization error; odd dims work via edge replication;
    grayscale (1-component) decodes to replicated RGB."""
    import struct

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators import jpeg as J
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(47)
    # flat per 16x16 MCU: exact through every subsampling shape
    img = np.zeros((32, 48, 3), np.uint8)
    expected = np.zeros_like(img)
    for my in range(2):
        for mx in range(3):
            c = rng.integers(0, 256, 3)
            img[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = c
            expected[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                ycbcr_to_rgb(*rgb_to_ycbcr(*map(int, c)))
            )
    for ss in ("420", "422", "440"):
        assert (decode_jpeg(encode_jpeg(img, subsampling=ss)) == expected).all(), ss
        # restart markers: DRI emitted, RSTn resynchronization must not
        # change a single pixel
        blob = encode_jpeg(img, subsampling=ss, restart_interval=2)
        assert b"\xff\xdd" in blob
        assert (decode_jpeg(blob) == expected).all(), f"{ss}+restart"
    # general image with chroma constant per 2x2 (so 4:2:0's chroma
    # loss is zero and the only error is DCT quantization)
    base = rng.integers(0, 256, (12, 16, 3))
    smooth = np.repeat(np.repeat(base, 2, 0), 2, 1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(smooth, subsampling="420"))
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 64
    # odd dims through the 16x16 MCU grid
    odd = rng.integers(0, 256, (19, 21, 3), np.uint8)
    assert decode_jpeg(encode_jpeg(odd, subsampling="420")).shape == (19, 21, 3)
    # grayscale: hand-built single-component baseline stream (our
    # encoder is color-only) — flat Y=200 block must decode to
    # (200, 200, 200) everywhere
    writer = J._BitWriter()
    dc = J._canonical_codes(J._DC_BITS, J._DC_SYMBOLS)
    ac = J._canonical_codes(J._AC_BITS, J._AC_SYMBOLS)
    J._encode_block(writer, np.full((8, 8), 200.0), 0, dc, ac)
    scan = writer.flush()
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(J._QTAB[k]) for k in range(64)
    )
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht = J._dht_segment(0x00, J._DC_BITS, J._DC_SYMBOLS) + J._dht_segment(
        0x10, J._AC_BITS, J._AC_SYMBOLS
    )
    sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    gray = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
    out = decode_jpeg(gray)
    assert out.shape == (8, 8, 3) and (out == 200).all()
    # unsupported subsampling name is an explicit error
    with pytest.raises(ValueError):
        encode_jpeg(img, subsampling="411")


def test_jpeg_progressive():
    """The progressive (SOF2) codec: spectral selection + successive
    approximation must reproduce the sequential decode BIT-EXACTLY on
    every image (both paths quantize identically, so any divergence is
    an entropy-coding bug — this catches EOB-run, correction-bit,
    ZRL-fold, restart, and point-transform mistakes in either
    direction), across subsampling shapes, odd dims, and restart
    intervals; coefficient statistics are varied (noise = dense AC,
    smooth = long zero runs, flat = pure EOB runs)."""
    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(61)
    cases = [
        ((16, 16, 3), "444", 0),
        ((24, 40, 3), "444", 1),
        ((32, 48, 3), "420", 2),
        ((19, 21, 3), "420", 0),
        ((48, 32, 3), "422", 3),
        ((40, 24, 3), "440", 0),
    ]
    for shape, ss, ri in cases:
        img = rng.integers(0, 256, shape, np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsampling=ss, restart_interval=ri))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, subsampling=ss, restart_interval=ri)
        )
        assert (base == prog).all(), (shape, ss, ri)
        if ri:
            assert b"\xff\xdd" in encode_jpeg_progressive(
                img, subsampling=ss, restart_interval=ri
            )
    # smooth gradient (long zero runs -> EOB-run coding) and flat
    # (EVERY block an EOB run) statistics
    x = np.linspace(0, 255, 48)
    smooth = np.stack(
        [np.tile(x, (48, 1)), np.tile(x[:, None], (1, 48)), np.full((48, 48), 128)],
        axis=2,
    ).astype(np.uint8)
    flat = np.full((32, 32, 3), 77, np.uint8)
    for img in (smooth, flat):
        assert (
            decode_jpeg(encode_jpeg(img))
            == decode_jpeg(encode_jpeg_progressive(img))
        ).all()
    # stream really is SOF2 with multiple scans: 2 DC (first+refine)
    # + 3 comps x 2 bands x (first+refine) = 14 SOS markers
    blob = encode_jpeg_progressive(flat)
    assert b"\xff\xc2" in blob and blob.count(b"\xff\xda") == 14
    # malformed progressive shapes are hard errors: a multi-component
    # AC scan and a DC scan with a nonzero band end
    import struct as _s

    def sos(cids, ss, se, ahal):
        body = bytes([len(cids)])
        for cid in cids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, ahal])
        return b"\xff\xda" + _s.pack(">H", len(body) + 2) + body

    head = blob[: blob.find(b"\xff\xda")]
    with pytest.raises(ValueError):
        decode_jpeg(head + sos([1, 2, 3], 1, 63, 0x01) + b"\x00" + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(head + sos([1, 2, 3], 0, 5, 0x01) + b"\x00" + b"\xff\xd9")


def test_jpeg420_flat_formula_matches_codec():
    """The oracle-side closed form (_jpeg420_flat_formula) and the real
    4:2:0 codec path (with per-item restart intervals, exactly as the
    certified section encodes) must agree exactly on every item."""
    import numpy as np

    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _jpeg420_flat_formula,
        _jpeg_block_color,
    )

    for i in [0, 1, 4, 8, 17, 35, 63]:
        w, h, rs, gs, bs = _jpeg420_flat_formula(i)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        for my in range(h // 16):
            for mx in range(w // 16):
                img[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                    _jpeg_block_color(i, mx, my)
                )
        blob = encode_jpeg(img, subsampling="420", restart_interval=1 + i % 3)
        sums = decode_jpeg(blob).astype(np.int64).sum(axis=(0, 1))
        assert (int(sums[0]), int(sums[1]), int(sums[2])) == (rs, gs, bs), i


def test_jpeg_flat_formula_matches_codec():
    """The oracle-side closed form (_jpeg_flat_formula) and the real
    codec must agree exactly on every certified item — same guarantee
    the BMP/WAV formula tests give their sections."""
    import numpy as np

    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        _jpeg_block_color,
        _jpeg_flat_formula,
    )

    for i in [0, 1, 5, 15, 37, 63]:
        w, h, rs, gs, bs = _jpeg_flat_formula(i)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        for by in range(h // 8):
            for bx in range(w // 8):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _jpeg_block_color(
                    i, bx, by
                )
        sums = decode_jpeg(encode_jpeg(img)).astype(np.int64).sum(axis=(0, 1))
        assert (int(sums[0]), int(sums[1]), int(sums[2])) == (rs, gs, bs), i


def test_bmp_variant_decodes():
    """decode_bmp covers every common BITMAPINFOHEADER shape: 1/4/8-bit
    palette (uncompressed + RLE8/RLE4 runs, absolute mode, EOL, delta,
    EOB), 16-bit 555 default and 565 BI_BITFIELDS, 32-bit BGRX and
    RGBX bitfields, top-down rows — all against hand-packed streams."""
    import struct

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_bmp,
    )

    def hdr(w, h, bpp, comp, n_pal=0, masks=b""):
        body_off = 14 + 40 + len(masks) + 4 * n_pal
        return (
            b"BM" + struct.pack("<IHHI", 0, 0, 0, body_off)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, 0, 0, 0, n_pal, 0
            )
            + masks
        )

    rng = np.random.default_rng(21)

    # 8-bit palette, bottom-up and top-down
    pal = rng.integers(0, 256, (256, 4), dtype=np.uint8)
    idx = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    stride = (7 + 3) & ~3
    rows = np.zeros((5, stride), dtype=np.uint8)
    rows[:, :7] = idx[::-1]
    expect = pal[idx][:, :, [2, 1, 0]]
    blob = hdr(7, 5, 8, 0, 256) + pal.tobytes() + rows.tobytes()
    assert (decode_bmp(blob) == expect).all()
    rows_td = np.zeros((5, stride), dtype=np.uint8)
    rows_td[:, :7] = idx
    blob = hdr(7, -5, 8, 0, 256) + pal.tobytes() + rows_td.tobytes()
    assert (decode_bmp(blob) == expect).all()

    # 4-bit and 1-bit palette: MSB-first packed indices
    for bpp in (4, 1):
        n = 1 << bpp
        pal = rng.integers(0, 256, (n, 4), dtype=np.uint8)
        idx = rng.integers(0, n, (3, 9), dtype=np.uint8)
        stride = (9 * bpp + 31) // 32 * 4
        rows = np.zeros((3, stride), dtype=np.uint8)
        for y in range(3):
            bits = np.zeros(stride * 8, dtype=np.uint8)
            for x in range(9):
                for b in range(bpp):
                    bits[x * bpp + b] = (int(idx[y, x]) >> (bpp - 1 - b)) & 1
            rows[y] = np.packbits(bits)
        blob = hdr(9, 3, bpp, 0, n) + pal.tobytes() + rows[::-1].tobytes()
        assert (decode_bmp(blob) == pal[idx][:, :, [2, 1, 0]]).all()

    # RLE8: runs + absolute + EOL + delta + EOB
    pal = rng.integers(0, 256, (256, 4), dtype=np.uint8)
    rle = bytes(
        [3, 5, 0, 3, 7, 8, 9, 0, 0, 0]      # row 0 (bottom): 5,5,5,7,8,9
        + [2, 1, 0, 2, 2, 0, 2, 9, 0, 0]    # row 1: 1,1,skip2(0,0),9,9
        + [6, 4, 0, 0]                      # row 2: 4 x6
        + [0, 1]                            # EOB -> row 3 stays 0
    )
    blob = hdr(6, 4, 8, 1, 256) + pal.tobytes() + rle
    exp_idx = np.zeros((4, 6), dtype=np.uint8)
    exp_idx[3] = [5, 5, 5, 7, 8, 9]
    exp_idx[2] = [1, 1, 0, 0, 9, 9]
    exp_idx[1] = [4, 4, 4, 4, 4, 4]
    assert (decode_bmp(blob) == pal[exp_idx][:, :, [2, 1, 0]]).all()

    # RLE4: run alternates nibbles; absolute packs nibbles, word-aligned
    pal4 = rng.integers(0, 256, (16, 4), dtype=np.uint8)
    rle4 = bytes(
        [5, 0x12, 0, 0]             # row 0 (bottom): 1,2,1,2,1
        + [0, 3, 0xAB, 0xC0, 0, 0]  # row 1 absolute: A,B,C (padded)
        + [0, 1]
    )
    blob = hdr(5, 3, 4, 2, 16) + pal4.tobytes() + rle4
    exp_idx = np.zeros((3, 5), dtype=np.uint8)
    exp_idx[2] = [1, 2, 1, 2, 1]
    exp_idx[1, :3] = [0xA, 0xB, 0xC]
    assert (decode_bmp(blob) == pal4[exp_idx][:, :, [2, 1, 0]]).all()

    # 16-bit: 555 default masks and 565 BI_BITFIELDS
    r5 = rng.integers(0, 32, (2, 3), dtype=np.uint32)
    g5 = rng.integers(0, 32, (2, 3), dtype=np.uint32)
    b5 = rng.integers(0, 32, (2, 3), dtype=np.uint32)
    v = (r5 << 10) | (g5 << 5) | b5
    rows = np.zeros((2, 8), dtype=np.uint8)
    le = np.stack([v & 0xFF, v >> 8], axis=2).astype(np.uint8).reshape(2, 6)
    rows[:, :6] = le[::-1]
    out = decode_bmp(hdr(3, 2, 16, 0) + rows.tobytes())
    assert (out[:, :, 0] == (r5 * 255 // 31).astype(np.uint8)).all()
    assert (out[:, :, 2] == (b5 * 255 // 31).astype(np.uint8)).all()
    g6 = rng.integers(0, 64, (2, 3), dtype=np.uint32)
    v = (r5 << 11) | (g6 << 5) | b5
    le = np.stack([v & 0xFF, v >> 8], axis=2).astype(np.uint8).reshape(2, 6)
    rows = np.zeros((2, 8), dtype=np.uint8)
    rows[:, :6] = le[::-1]
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    out = decode_bmp(hdr(3, 2, 16, 3, 0, masks) + rows.tobytes())
    assert (out[:, :, 1] == (g6 * 255 // 63).astype(np.uint8)).all()

    # 32-bit BGRX and RGBX bitfields
    rgb = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    raw = np.zeros((3, 4, 4), dtype=np.uint8)
    raw[:, :, :3] = rgb[::-1][:, :, ::-1]
    assert (decode_bmp(hdr(4, 3, 32, 0) + raw.tobytes()) == rgb).all()
    masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
    raw2 = np.zeros((3, 4, 4), dtype=np.uint8)
    raw2[:, :, :3] = rgb[::-1]
    assert (
        decode_bmp(hdr(4, 3, 32, 3, 0, masks) + raw2.tobytes()) == rgb
    ).all()

    # unsupported bpp still gated
    with pytest.raises(NotImplementedError):
        decode_bmp(hdr(2, 2, 2, 0) + b"\x00" * 16)


def test_mp3_metadata_probe():
    """probe_audio_metadata walks MPEG audio frame headers — versions
    1/2/2.5, Layers I/II/III, CBR/VBR, padding bits, ID3v2 skip,
    trailing-junk tolerance — against containers built from the
    public frame-size formulas."""
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        build_mp3,
        probe_audio_metadata,
    )

    # CBR MPEG-1 Layer III with ID3v2
    m = probe_audio_metadata(build_mp3([128] * 10, 44100, id3_size=321))
    assert m["n_frames"] == 10 and m["mpeg_version"] == "1"
    assert m["layer"] == 3 and m["sample_rate"] == 44100
    assert m["id3v2_bytes"] == 331 and not m["vbr"]
    assert abs(m["duration_s"] - 10 * 1152 / 44100) < 1e-9
    assert m["channel_mode"] == "joint_stereo"

    # VBR across frames
    m = probe_audio_metadata(build_mp3([64, 128, 192, 320], 48000))
    assert m["vbr"] and m["n_frames"] == 4 and m["sample_rate"] == 48000

    # MPEG-2 Layer III: 576 samples/frame, 72-factor frame size
    m = probe_audio_metadata(build_mp3([64] * 6, 22050, version_bits=2))
    assert m["mpeg_version"] == "2" and m["n_frames"] == 6
    assert abs(m["duration_s"] - 6 * 576 / 22050) < 1e-9

    # MPEG-2.5 low rate
    m = probe_audio_metadata(build_mp3([16] * 3, 8000, version_bits=0))
    assert m["mpeg_version"] == "2.5" and m["n_frames"] == 3

    # Layer II and Layer I geometry
    m = probe_audio_metadata(build_mp3([192] * 5, 44100, layer=2))
    assert m["layer"] == 2 and m["n_frames"] == 5
    assert abs(m["duration_s"] - 5 * 1152 / 44100) < 1e-9
    m = probe_audio_metadata(build_mp3([224] * 4, 32000, layer=1, mode_idx=3))
    assert m["layer"] == 1 and m["channel_mode"] == "mono"
    assert abs(m["duration_s"] - 4 * 384 / 32000) < 1e-9

    # trailing ID3v1 junk after frames is tolerated
    blob = build_mp3([128] * 2) + b"TAG" + bytes(125)
    assert probe_audio_metadata(blob)["n_frames"] == 2

    # CBR stream reports ~ the nominal average bitrate
    m = probe_audio_metadata(build_mp3([128] * 50))
    assert abs(m["avg_bitrate_kbps"] - 128) < 3

    # garbage raises; decode (vs probe) stays behind the gate
    with pytest.raises(ValueError):
        probe_audio_metadata(b"\x00" * 64)


def test_bmp_core_header_decodes():
    """OS/2 BITMAPCOREHEADER BMPs (12-byte header, u16 dims, 3-byte
    palette triples) decode: 24-bit and 8/4/1-bit palette shapes."""
    import struct

    import numpy as np
    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_bmp,
    )

    def hdr(w, h, bpp, n_pal=0):
        body_off = 14 + 12 + 3 * n_pal
        return (
            b"BM" + struct.pack("<IHHI", 0, 0, 0, body_off)
            + struct.pack("<IHHHH", 12, w, h, 1, bpp)
        )

    rng = np.random.default_rng(33)

    # 24-bit: bottom-up padded BGR rows
    rgb = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    rows = np.zeros((5, 12), dtype=np.uint8)
    rows[:, :9] = rgb[::-1][:, :, ::-1].reshape(5, 9)
    assert (decode_bmp(hdr(3, 5, 24) + rows.tobytes()) == rgb).all()

    # 8-bit palette with RGB TRIPLES (not quads)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    stride = (6 + 3) & ~3
    rows = np.zeros((4, stride), dtype=np.uint8)
    rows[:, :6] = idx[::-1]
    blob = hdr(6, 4, 8, 256) + pal.tobytes() + rows.tobytes()
    assert (decode_bmp(blob) == pal[idx][:, :, ::-1]).all()

    # 1-bit palette
    pal1 = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    idx = rng.integers(0, 2, (3, 9), dtype=np.uint8)
    stride = (9 + 31) // 32 * 4
    rows = np.zeros((3, stride), dtype=np.uint8)
    for y in range(3):
        bits = np.zeros(stride * 8, dtype=np.uint8)
        bits[:9] = idx[y]
        rows[y] = np.packbits(bits)
    blob = hdr(9, 3, 1, 2) + pal1.tobytes() + rows[::-1].tobytes()
    assert (decode_bmp(blob) == pal1[idx][:, :, ::-1]).all()

    # unsupported core bpp still gated
    with pytest.raises(NotImplementedError):
        decode_bmp(hdr(2, 2, 16) + bytes(16))


def test_tiff_metadata_probe():
    """probe_image_metadata reads TIFF IFD0 dims in both byte orders,
    SHORT and LONG tag types."""
    import struct

    import pytest

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        probe_image_metadata,
    )

    def tiff(bo, w, h, typ):
        fmt = {"II": "<", "MM": ">"}[bo]
        entries = []
        for tag, v in ((256, w), (257, h), (258, 16)):
            if typ == 3:  # SHORT: value left-justified in the 4-byte slot
                val = struct.pack(fmt + "H", v) + b"\x00\x00"
            else:
                val = struct.pack(fmt + "I", v)
            entries.append(struct.pack(fmt + "HHI", tag, typ, 1) + val)
        ifd = struct.pack(fmt + "H", len(entries)) + b"".join(entries) + bytes(4)
        return (bo.encode() + struct.pack(fmt + "HI", 42, 8) + ifd)

    m = probe_image_metadata(tiff("II", 640, 480, 3))
    assert m == {"format": "tiff", "width": 640, "height": 480,
                 "bit_depth": 16, "n_pages": 1}
    m = probe_image_metadata(tiff("MM", 123, 77, 4))
    assert m["width"] == 123 and m["height"] == 77

    with pytest.raises(ValueError):
        probe_image_metadata(b"II\x00\x00" + bytes(16))  # bad magic
