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
