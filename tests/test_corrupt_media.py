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
    rng = random.Random(0xC0FFEE ^ hash(kind) & 0xFFFF)
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
