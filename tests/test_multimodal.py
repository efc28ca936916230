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

    # JPEG (and audio/video) remain gated; BMP+PNG now decode for real
    with pytest.raises(NotImplementedError):
        decode_real_media(b"\xff\xd8\xff\xe0jpeg-ish", "image/jpeg")


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
    with pytest.raises(NotImplementedError):
        decode_real_media(b"\xff\xd8\xff\xe0jpeg-ish", "image/jpeg")


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
    # 16-bit / grayscale / interlaced PNGs are explicit gates, not
    # silent wrong decodes
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    blob16 = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(blob16)
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
    # gates: float PCM (format 3) and 8-bit are not silently wrong
    float_fmt = struct.pack("<HHIIHH", 3, 2, 44100, 44100 * 8, 8, 32)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + float_fmt
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
    # gates: progressive (SOF2) is refused, not wrongly decoded
    blob5 = bytearray(encode_jpeg(img2))
    sof = blob5.find(b"\xff\xc0")
    blob5[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob5))
    # 2x2-subsampled SOF is refused
    blob6 = bytearray(encode_jpeg(img2))
    sof = blob6.find(b"\xff\xc0")
    blob6[sof + 11] = 0x22  # component 1 sampling factors
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob6))
    with pytest.raises(ValueError):
        decode_jpeg(b"RIFF not a jpeg")
    # truncated entropy stream is a hard error
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img2)[:-40] + b"\xff\xd9")


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
