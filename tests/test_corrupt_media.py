"""Corrupt-media robustness: a 100 TB corpus contains truncated and
bit-rotted files, and a decode kernel that hangs, loops, or escapes
with an arbitrary exception type takes the whole Arrow batch (and its
task) down with it. Contract certified here for EVERY stored-fixture
payload kind:

    decode(mutated_bytes) either returns a well-formed result or
    raises a CONTROLLED exception (ValueError / NotImplementedError /
    struct.error / zlib.error / EOFError) — quickly.

Round-14 escape sites found by the mutation probe and fixed:
corrupt JPEG DHT with BITS > HUFFVAL (IndexError), SOS referencing a
component absent from SOF or a never-defined Huffman/quantization
table (KeyError), and a truncated TIFF header (struct.error from the
IFD walk). Mutations are deterministic (fixed seed) so a regression
is reproducible, not flaky."""

import random
import struct
import time
import zlib

import pytest

from twilio_event_streams_reporting_example_spark.operators.aiff import (
    decode_aiff,
    decode_au,
)
from twilio_event_streams_reporting_example_spark.operators.multimodal import (
    decode_real_media,
    media_fixture_rows,
)

ALLOWED = (ValueError, NotImplementedError, struct.error, zlib.error, EOFError)

_MIME = {
    "bmp": "image/bmp", "png": "image/png", "xpng": "image/png",
    "wav": "audio/wav", "ima": "audio/wav", "ms": "audio/wav",
    "flac": "audio/flac", "avi": "video/avi",
    "tiff": "image/tiff", "tiffjo": "image/tiff", "tifffax": "image/tiff",
    "tiffmp": "image/tiff", "xtif": "image/tiff", "xtifmp": "image/tiff",
}

# one representative payload per kind (first occurrence in the fixture)
_BY_KIND: dict = {}
for _j, _kind, _payload in media_fixture_rows():
    _BY_KIND.setdefault(_kind, _payload)


def _decoder(kind):
    if kind == "aifc":
        return decode_aiff
    if kind == "au":
        return decode_au
    mime = _MIME[kind]
    return lambda b: decode_real_media(b, mime)


@pytest.mark.parametrize("kind", sorted(_BY_KIND))
def test_truncation_and_bitflips_fail_controlled(kind):
    """60 deterministic mutations per kind — 30 truncations at random
    points, 30 single-bit flips — must each return or raise an ALLOWED
    exception within a per-decode time bound (no hangs: a corrupt LZW/
    Rice/Huffman stream must terminate, not spin)."""
    payload = _BY_KIND[kind]
    dec = _decoder(kind)
    # crc32, NOT hash(): str hash is salted per process (PYTHONHASHSEED)
    # and would make the mutation set — and any failure — unreproducible.
    rng = random.Random(0xC0FFEE ^ zlib.crc32(kind.encode()))
    for trial in range(60):
        b = bytearray(payload)
        if trial % 2 == 0:
            b = b[: rng.randrange(1, len(b))]
        else:
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
        t0 = time.perf_counter()
        try:
            dec(bytes(b))
        except ALLOWED:
            pass
        # any OTHER exception type propagates and fails the test
        took = time.perf_counter() - t0
        assert took < 5.0, (
            f"{kind} trial {trial}: decode took {took:.1f}s on corrupt "
            "input — runaway loop"
        )


def _gif_payload():
    import numpy as np

    from twilio_event_streams_reporting_example_spark.operators.gif import (
        encode_gif,
    )

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    f0 = rng.integers(0, 16, (13, 17), np.uint8)
    f1 = rng.integers(0, 16, (6, 7), np.uint8)
    return encode_gif(
        [f0, f1], pal, delays_ms=[50, 50], transparent=2,
        disposals=[0, 2], offsets=[(0, 0), (3, 4)],
    )


def _jpeg_payloads():
    import numpy as np

    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 33, 3), np.uint8)
    return encode_jpeg(img), encode_jpeg_progressive(img)


@pytest.mark.parametrize("which", ["gif", "jpeg_baseline", "jpeg_progressive"])
def test_entropy_coded_decoders_fail_controlled(which):
    """The decoders NOT represented in the stored fixture, with the
    densest entropy coding (GIF variable-width LZW; JPEG baseline and
    progressive Huffman/DCT scans): 120 deterministic mutations each.
    Corrupt code streams must terminate with a controlled exception —
    the round-14 probe caught a truncated-SOS IndexError in the
    progressive path this test now pins."""
    from twilio_event_streams_reporting_example_spark.operators.gif import (
        decode_gif,
    )
    from twilio_event_streams_reporting_example_spark.operators.jpeg import (
        decode_jpeg,
    )

    if which == "gif":
        payload, dec = _gif_payload(), decode_gif
    else:
        base, prog = _jpeg_payloads()
        payload = base if which == "jpeg_baseline" else prog
        dec = decode_jpeg
    rng = random.Random(11)
    for trial in range(120):
        b = bytearray(payload)
        if trial % 2 == 0:
            b = b[: rng.randrange(1, len(b))]
        else:
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
        t0 = time.perf_counter()
        try:
            dec(bytes(b))
        except ALLOWED:
            pass
        assert time.perf_counter() - t0 < 5.0, (which, trial)


@pytest.mark.parametrize("kind", sorted(_BY_KIND))
def test_empty_and_garbage_prefix_fail_controlled(kind):
    """Degenerate inputs: empty bytes, a lone signature byte, and 64
    bytes of deterministic garbage — never an uncontrolled exception."""
    dec = _decoder(kind)
    garbage = bytes((i * 37 + 11) % 256 for i in range(64))
    for b in (b"", _BY_KIND[kind][:1], garbage):
        try:
            dec(b)
        except ALLOWED:
            pass
