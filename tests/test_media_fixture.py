"""The committed data-at-rest media fixture stays in lockstep with the
closed-form generators: stored payload bytes must equal the builder's
output byte-for-byte, and each stored payload must decode to the
closed-form oracle values. (The Spark-side certification is the
`stored_payload_decode` section of `multimodal_media_ops`.)"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from twilio_event_streams_reporting_example_spark.operators.multimodal import (
    MEDIA_FIXTURE_PATH,
    STORED_N_ITEMS,
    _STORED_XIMG_FROM,
    _XIMG_BUILD_VERSIONS,
    _stored_payload_formula,
    _ximage_runtime_versions,
    decode_real_media,
    media_fixture_rows,
)


@pytest.fixture(scope="module")
def stored():
    assert os.path.exists(MEDIA_FIXTURE_PATH), (
        "fixture missing — run tools/build_media_fixture.py"
    )
    t = pq.read_table(MEDIA_FIXTURE_PATH)
    return {
        int(i): (str(k), bytes(p))
        for i, k, p in zip(
            t["item_id"].to_pylist(), t["kind"].to_pylist(),
            t["payload"].to_pylist(),
        )
    }


def _ximg_versions_match_build() -> bool:
    """True when the runtime libpng/libtiff/zlib are the exact
    versions that wrote the committed x* image bytes. When they
    differ, compressed output may legitimately differ byte-for-byte
    (deflate filter heuristics, LZW coder details), so byte-equality
    degrades to decode-level equality."""
    try:
        return _ximage_runtime_versions() == _XIMG_BUILD_VERSIONS
    except OSError:
        # Library absent: media_fixture_rows() served the committed
        # parquet bytes, so byte-equality holds trivially anyway.
        return True


def test_stored_bytes_match_builder(stored):
    rows = media_fixture_rows()
    assert len(rows) == len(stored) == STORED_N_ITEMS
    ximg_exact = _ximg_versions_match_build()
    for j, kind, payload in rows:
        skind, spayload = stored[j]
        assert skind == kind, j
        if spayload == payload:
            continue
        # Third-party image items rebuilt by a DIFFERENT library
        # version than the fixture-build host: the compressed stream
        # may differ while the pixels are identical — require
        # decode-level equality instead of failing.
        assert j >= _STORED_XIMG_FROM and not ximg_exact, (j, kind)
        mime = "image/png" if kind == "xpng" else "image/tiff"
        if kind == "xtifmp":
            from twilio_event_streams_reporting_example_spark.operators.tiff import (
                decode_tiff,
                tiff_page_count,
            )

            assert tiff_page_count(payload) == tiff_page_count(spayload)
            for p in range(tiff_page_count(spayload)):
                assert np.array_equal(
                    decode_tiff(payload, page=p),
                    decode_tiff(spayload, page=p),
                ), (j, kind, p)
        else:
            assert np.array_equal(
                decode_real_media(payload, mime),
                decode_real_media(spayload, mime),
            ), (j, kind)


def test_stored_payloads_decode_to_closed_form(stored):
    for j, (kind, payload) in stored.items():
        want = _stored_payload_formula(j)
        if kind in ("bmp", "png", "tiff", "tiffjo"):
            mime = "image/tiff" if kind == "tiffjo" else f"image/{kind}"
            decoded = decode_real_media(payload, mime)
            sums = decoded.astype(np.int64).sum(axis=(0, 1))
            got = (int(sums[0]), int(sums[1]), int(sums[2]))
        elif kind in ("xpng", "xtif"):
            mime = "image/png" if kind == "xpng" else "image/tiff"
            decoded = decode_real_media(payload, mime)
            hh, ww, cc = decoded.shape
            sums = decoded.astype(np.int64).sum(axis=(0, 1))
            got = (
                int(sums[0]),
                int(sums[cc - 1]),
                hh * 1_000_000 + ww * 1000 + cc * 10
                + int(decoded.dtype == np.uint16),
            )
        elif kind == "xtifmp":
            from twilio_event_streams_reporting_example_spark.operators.tiff import (
                decode_tiff,
                tiff_page_count,
            )

            n_pages = tiff_page_count(payload)
            pages = [
                decode_tiff(payload, page=p).astype(np.int64)
                for p in range(n_pages)
            ]
            got = (
                int(pages[0][:, :, 0].sum()),
                int(sum(p[:, :, 1].sum() for p in pages)),
                n_pages * 10 + int(payload[:2] == b"MM"),
            )
        elif kind == "tifffax":
            decoded = decode_real_media(payload, "image/tiff")
            gray = decoded[:, :, 0].astype(np.int64)
            got = (
                int(gray.sum()),
                int((gray == 0).sum()),
                int(gray[: gray.shape[0] // 2].sum()),
            )
        elif kind == "tiffmp":
            from twilio_event_streams_reporting_example_spark.operators.tiff import (
                decode_tiff,
                tiff_page_count,
            )

            n_pages = tiff_page_count(payload)
            pages = [
                decode_tiff(payload, page=p).astype(np.int64)
                for p in range(n_pages)
            ]
            got = (
                int(pages[0][:, :, 0].sum()),
                int(sum(p[:, :, 1].sum() for p in pages)),
                n_pages * 10 + int(payload[:2] == b"MM"),
            )
        elif kind == "avi":
            frames, _fps = decode_real_media(payload, "video/avi")
            sums = frames.astype(np.int64).sum(axis=(0, 1, 2))
            got = (int(sums[0]), int(sums[1]), int(sums[2]))
        elif kind == "flac":
            decoded, rate, bits = decode_real_media(payload, "audio/flac")
            n, ch = decoded.shape
            sums = decoded.astype(np.int64).sum(axis=0)
            got = (
                int(sums[0]),
                int(sums[1]) if ch == 2 else 0,
                n * 10_000_000 + rate * 100 + bits,
            )
        elif kind in ("aifc", "au"):
            from twilio_event_streams_reporting_example_spark.operators.aiff import (
                decode_aiff,
                decode_au,
            )

            if kind == "aifc":
                decoded, rate, _bits = decode_aiff(payload)
            else:
                decoded, rate, _name = decode_au(payload)
            n, ch = decoded.shape
            sums = decoded.astype(np.int64).sum(axis=0)
            got = (
                int(sums[0]),
                int(sums[1]) if ch == 2 else 0,
                n * 10_000_000 + rate * 100 + ch,
            )
        else:
            decoded, rate = decode_real_media(payload, "audio/wav")
            n, ch = decoded.shape
            sums = decoded.astype(np.int64).sum(axis=0)
            m3 = (
                n * 100000 + rate
                if kind == "wav"
                else n * 100000 + rate * 10 + ch
            )
            got = (int(sums[0]), int(sums[1]) if ch == 2 else 0, m3)
        assert got == tuple(want), (j, kind)


def test_version_drift_falls_back_to_decode_equality(stored, monkeypatch):
    """Proves the version-mismatch branch of
    test_stored_bytes_match_builder is live: a host whose libpng/zlib
    differ from the fixture-build versions produces pixel-identical
    but byte-different compressed streams. Simulated here by
    recompressing item 96's IDAT at a different zlib level (exactly
    what a different deflate implementation does) under a forced
    version mismatch — decode-level equality must accept it, and the
    same bytes must FAIL when versions match (a real regression)."""
    import struct
    import zlib

    j = 96
    kind, spayload = stored[j]
    assert kind == "xpng"
    # Split the PNG into chunks, recompress the concatenated IDAT.
    pos, chunks, idat = 8, [], b""
    while pos < len(spayload):
        (ln,) = struct.unpack(">I", spayload[pos:pos + 4])
        ctype = spayload[pos + 4:pos + 8]
        data = spayload[pos + 8:pos + 8 + ln]
        if ctype == b"IDAT":
            idat += data
        else:
            chunks.append((ctype, data))
        pos += 12 + ln
    recompressed = zlib.compress(zlib.decompress(idat), 1)
    assert recompressed != idat  # byte-different stream
    out = bytearray(spayload[:8])
    for ctype, data in chunks:
        if ctype == b"IEND":
            d = recompressed
            out += struct.pack(">I", len(d)) + b"IDAT" + d
            out += struct.pack(
                ">I", zlib.crc32(b"IDAT" + d) & 0xFFFFFFFF
            )
        out += struct.pack(">I", len(data)) + ctype + data
        out += struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    mutated = bytes(out)
    assert np.array_equal(
        decode_real_media(mutated, "image/png"),
        decode_real_media(spayload, "image/png"),
    )

    import tests.test_media_fixture as tmf

    fake_rows = [
        (i, k, mutated if i == j else p)
        for i, k, p in media_fixture_rows()
    ]
    monkeypatch.setattr(tmf, "media_fixture_rows", lambda: fake_rows)

    # Versions match the build host -> byte drift is a REAL failure.
    monkeypatch.setattr(
        tmf, "_ximg_versions_match_build", lambda: True
    )
    with pytest.raises(AssertionError):
        test_stored_bytes_match_builder(stored)
    # Versions differ -> decode-level equality accepts the drift.
    monkeypatch.setattr(
        tmf, "_ximg_versions_match_build", lambda: False
    )
    test_stored_bytes_match_builder(stored)


def test_fixture_covers_all_kinds(stored):
    kinds = {k for k, _ in stored.values()}
    assert kinds == {
        "bmp", "png", "wav", "ima", "ms", "flac", "tiff", "avi",
        "tiffmp", "tifffax", "tiffjo", "aifc", "au", "xpng", "xtif",
        "xtifmp",
    }


def test_preexisting_items_byte_stable(stored):
    """Items 0-49 predate the FLAC append; their bytes are pinned by
    round-8's committed fixture and must never shift when new kinds
    are appended (md5 of the concatenation, recorded at append time)."""
    import hashlib

    h = hashlib.md5()
    for j in range(50):
        h.update(stored[j][1])
    assert h.hexdigest() == PRE_FLAC_MD5


def test_pre_round14_items_byte_stable(stored):
    """Items 0-95 predate the round-14 third-party IMAGE append
    (libpng/libtiff items 96-101); md5 of their concatenation was
    recorded from the round-13 committed fixture at append time."""
    import hashlib

    h = hashlib.md5()
    for j in range(96):
        h.update(stored[j][1])
    assert h.hexdigest() == PRE_XIMG_MD5


def test_pre_multipage_append_items_byte_stable(stored):
    """Items 0-101 predate the libtiff multi-page append (items
    102-103); md5 recorded at append time."""
    import hashlib

    h = hashlib.md5()
    for j in range(102):
        h.update(stored[j][1])
    assert h.hexdigest() == PRE_XTIFMP_MD5


# recorded from the round-8 committed fixture before the FLAC append
PRE_FLAC_MD5 = "cb04db721f7214e8ab025d8eb3b035df"
# recorded from the round-13 committed fixture before the image append
PRE_XIMG_MD5 = "1b4c721fc31ecf70c07f1891c10312b9"
# recorded mid-round-14 before the libtiff multi-page append
PRE_XTIFMP_MD5 = "5b46d93ca4fec75f90e51469224e1b24"
