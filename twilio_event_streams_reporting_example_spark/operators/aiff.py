"""Dependency-free AIFF and Sun AU (.snd) audio containers.

The two big-endian PCM container families legacy audio archives carry
next to RIFF/WAVE — written from the public specs (Apple "Audio
Interchange File Format: AIFF" 1.3, 1989; Sun/NeXT .snd header layout
as standardized in RFC 1945's audio/basic and the Sun audio file
format documentation):

  AIFF  "FORM"/"AIFF" IFF container: COMM chunk (channels, frame
        count, sample size, sample rate as an 80-bit IEEE 754
        EXTENDED float — the format's famous corner, parsed here for
        real) + SSND chunk (offset/blockSize then interleaved
        big-endian signed PCM at 8/16/24/32 bits).
  AU    ".snd" header: data offset, data size, encoding, rate,
        channels, then big-endian payload. Linear encodings 2-5
        (int8/16/24/32) decode here; encoding 1 (G.711 µ-law) and 27
        (A-law) expand through the same published-table companding
        path the WAV G.711 branch uses (multimodal._g711_*).

Certified by the `aiff_au_roundtrip` section of
``multimodal_media_ops`` (closed-form signals → real containers →
decode → bit-exact equality + channel-sum oracle) and the spec-vector
tests in tests/test_aiff_au.py (hand-built 80-bit extended floats,
a byte-level hand-assembled AIFF, µ-law/A-law AU vs the independent
G.711 references).

Scale note: like every codec here, decode runs inside Arrow-batched
``mapInPandas`` kernels — scan → kernel, shuffle-free; all sample math
is numpy over the one payload buffer.

Reference parity note: the reference app (events.js) has no media
path — this module is engine extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

AU_ENCODINGS = {
    1: ("ulaw", 1), 2: ("int8", 1), 3: ("int16", 2), 4: ("int24", 3),
    5: ("int32", 4), 27: ("alaw", 1),
}


# ------------------------------------------- 80-bit extended float ---


def f80_encode(x: float) -> bytes:
    """IEEE 754 extended (1 sign, 15-bit biased exponent, 64-bit
    mantissa WITH explicit integer bit) — the AIFF sampleRate type."""
    if x == 0:
        return b"\x00" * 10
    sign = 0
    if x < 0:
        sign = 0x8000
        x = -x
    m, e = _frexp(x)
    # frexp: x = m * 2^e with m in [0.5, 1) → mantissa = m * 2^64,
    # biased exponent = e + 16382
    mant = int(m * (1 << 64))
    return struct.pack(">HQ", sign | (e + 16382), mant)


def _frexp(x: float):
    import math

    return math.frexp(x)


def f80_decode(b: bytes) -> float:
    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    se, mant = struct.unpack(">HQ", b)
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    exp = (se & 0x7FFF) - 16383
    val = mant * 2.0 ** (exp - 63)
    return -val if se & 0x8000 else val


# --------------------------------------------------------------- AIFF ---


def _be_pcm_pack(samples: np.ndarray, bits: int) -> bytes:
    """Interleaved big-endian signed PCM at 8/16/24/32 bits."""
    flat = samples.astype(np.int64).reshape(-1)
    nbytes = bits // 8
    u = (flat & ((1 << bits) - 1)).astype(np.uint64)
    arr = np.zeros((flat.size, nbytes), dtype=np.uint8)
    for k in range(nbytes):
        arr[:, nbytes - 1 - k] = (
            (u >> np.uint64(8 * k)) & np.uint64(0xFF)
        ).astype(np.uint8)
    return arr.tobytes()


def _be_pcm_unpack(data: bytes, bits: int, channels: int) -> np.ndarray:
    nbytes = bits // 8
    raw = np.frombuffer(data, dtype=np.uint8)
    n = raw.size // (nbytes * channels) * channels
    raw = raw[: n * nbytes].reshape(n, nbytes)
    v = np.zeros(n, dtype=np.int64)
    for k in range(nbytes):
        v = (v << 8) | raw[:, k].astype(np.int64)
    v = np.where(v >= 1 << (bits - 1), v - (1 << bits), v)
    return v.reshape(-1, channels)


def encode_aiff(samples, sample_rate: int, bits: int = 16) -> bytes:
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if bits not in (8, 16, 24, 32):
        raise ValueError("AIFF PCM bits must be 8/16/24/32")
    comm = struct.pack(">hLh", channels, n, bits) + f80_encode(
        float(sample_rate)
    )
    sound = struct.pack(">LL", 0, 0) + _be_pcm_pack(x, bits)
    chunks = b"COMM" + struct.pack(">L", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">L", len(sound)) + sound
    if len(sound) % 2:  # IFF chunks are word-aligned
        chunks += b"\x00"
    return b"FORM" + struct.pack(">L", 4 + len(chunks)) + b"AIFF" + chunks


def decode_aiff(payload: bytes):
    """→ (samples int32 (n, channels), sample_rate, bits).

    Accepts plain AIFF and AIFF-C (form type ``AIFC`` — the variant
    every modern writer emits, including CPython's stdlib ``aifc``,
    which is this path's external-conformance encoder): the AIFC COMM
    chunk appends a 4-byte compression type + pascal-string name
    after the 18-byte AIFF layout. Supported compressions: ``NONE``
    (big-endian PCM, as AIFF), ``sowt`` (byte-swapped little-endian
    PCM — the Apple-era variant common in the wild) and G.711
    ``ulaw``/``ULAW``/``alaw``/``ALAW`` (one coded byte per sample,
    expanded through the same published tables as the WAV and AU
    branches). Anything else raises the documented ValueError gate."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFF-C stream")
    pos = 12
    end = 8 + struct.unpack(">L", payload[4:8])[0]
    comm = ssnd = None
    while pos + 8 <= min(end, len(payload)):
        tag = payload[pos : pos + 4]
        size = struct.unpack(">L", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"COMM":
            comm = body
        elif tag == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # word alignment
    if comm is None or ssnd is None:
        raise ValueError("AIFF: missing COMM or SSND chunk")
    channels, n_frames, bits = struct.unpack(">hLh", comm[:8])
    rate = f80_decode(comm[8:18])
    comp = comm[18:22] if payload[8:12] == b"AIFC" and len(comm) >= 22 \
        else b"NONE"
    offset, _block = struct.unpack(">LL", ssnd[:8])
    data = ssnd[8 + offset :]
    if comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
        from .multimodal import _g711_alaw_to_linear, _g711_ulaw_to_linear

        coded = np.frombuffer(data, dtype=np.uint8)
        lin = (
            _g711_alaw_to_linear(coded)
            if comp in (b"alaw", b"ALAW")
            else _g711_ulaw_to_linear(coded)
        )
        n = min(lin.size // channels, n_frames) * channels
        if n < n_frames * channels:
            raise ValueError("AIFF-C: SSND shorter than COMM frame count")
        return (
            lin[:n].reshape(-1, channels).astype(np.int32),
            int(round(rate)),
            16,
        )
    if comp not in (b"NONE", b"sowt"):
        raise ValueError(
            f"AIFF-C: unsupported compression {comp!r} (supported: "
            "NONE, sowt, ulaw/ULAW, alaw/ALAW)"
        )
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"AIFF: unsupported sample size {bits}")
    if comp == b"sowt":  # little-endian PCM: reverse each sample's bytes
        nb = bits // 8
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[: raw.size // nb * nb].reshape(-1, nb)[:, ::-1]
        data = raw.tobytes()
    out = _be_pcm_unpack(data, bits, channels)[:n_frames]
    if out.shape[0] != n_frames:
        raise ValueError("AIFF: SSND shorter than COMM frame count")
    return out.astype(np.int32), int(round(rate)), bits


# ----------------------------------------------------------------- AU ---


def encode_au(samples, sample_rate: int, encoding: int = 3) -> bytes:
    """Linear encodings only (2=int8, 3=int16, 4=int24, 5=int32);
    µ-law/A-law AU payloads are built from coded bytes directly (the
    companding ENCODE direction belongs to a telephony gateway, not a
    corpus reader — decode is what a 100 TB pipeline needs)."""
    if encoding not in (2, 3, 4, 5):
        raise ValueError("encode_au supports linear encodings 2-5")
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    _n, channels = x.shape
    bits = AU_ENCODINGS[encoding][1] * 8
    data = _be_pcm_pack(x, bits)
    return au_header(len(data), encoding, sample_rate, channels) + data


def au_header(data_size: int, encoding: int, sample_rate: int,
              channels: int, annotation: bytes = b"") -> bytes:
    offset = 24 + len(annotation)
    return (
        b".snd"
        + struct.pack(">LLLLL", offset, data_size, encoding, sample_rate,
                      channels)
        + annotation
    )


def decode_au(payload: bytes):
    """→ (samples int32 (n, channels), sample_rate, encoding_name).
    µ-law/A-law expand to the same 16-bit linear values as the WAV
    G.711 branch (published tables)."""
    if payload[:4] != b".snd":
        raise ValueError("not an AU stream")
    offset, size, encoding, rate, channels = struct.unpack(
        ">LLLLL", payload[4:24]
    )
    if encoding not in AU_ENCODINGS:
        raise ValueError(f"AU: unsupported encoding {encoding}")
    name, width = AU_ENCODINGS[encoding]
    data = payload[offset:]
    if size != 0xFFFFFFFF:
        data = data[:size]
    if name in ("ulaw", "alaw"):
        from .multimodal import _g711_alaw_to_linear, _g711_ulaw_to_linear

        coded = np.frombuffer(data, dtype=np.uint8)
        lin = (
            _g711_alaw_to_linear(coded)
            if name == "alaw"
            else _g711_ulaw_to_linear(coded)
        )
        n = lin.size // channels * channels
        out = lin[:n].reshape(-1, channels).astype(np.int32)
    else:
        out = _be_pcm_unpack(data, width * 8, channels).astype(np.int32)
    return out, int(rate), name
