"""Dependency-free baseline TIFF codec (pure Python + numpy).

REAL decode for uncompressed baseline TIFF 6.0 (Adobe, 1992) — the
scanned-document / scientific-imaging format a media corpus meets
after BMP/PNG/JPEG/GIF. Both byte orders ("II" little- and "MM"
big-endian), chunky planar layout, multi-strip images, and the
baseline photometric classes:

  0  WhiteIsZero   8-bit grayscale, inverted
  1  BlackIsZero   8-bit grayscale
  2  RGB           8 bits per sample, 3 samples per pixel
  3  Palette       8-bit indices into a 3×2^8 16-bit ColorMap

The IFD walk honors the value-fits-inline rule (left-justified in the
4-byte field under MM — the classic endianness trap, exercised by the
certification). Compression values other than 1 (none) raise — LZW /
PackBits / JPEG-in-TIFF belong to a codec runtime.

Certified by the `tiff_roundtrip` section of ``multimodal_media_ops``
(closed-form pixels → real containers in BOTH byte orders with
varying strip heights → decode → channel-sum oracle) and unit tests
with a hand-assembled IFD.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` kernels
(scan → kernel, shuffle-free); all pixel work is numpy over the
concatenated strips.

Reference parity note: the reference app (events.js) has no media
path — engine extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tags
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTES = 279
_T_COLORMAP = 320
_T_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_ifd(buf: bytes, e: str):
    off = struct.unpack(e + "I", buf[4:8])[0]
    n = struct.unpack(e + "H", buf[off : off + 2])[0]
    tags: dict[int, list[int]] = {}
    for k in range(n):
        ent = buf[off + 2 + 12 * k : off + 14 + 12 * k]
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * cnt
        if total <= 4:
            raw = ent[8 : 8 + total]  # inline, LEFT-justified
        else:
            ptr = struct.unpack(e + "I", ent[8:12])[0]
            raw = buf[ptr : ptr + total]
        if typ == 3:
            vals = list(struct.unpack(e + f"{cnt}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(e + f"{cnt}I", raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = list(raw)  # ASCII/RATIONAL: bytes, unused here
        tags[tag] = vals
    return tags


def decode_tiff(payload: bytes):
    """→ (h, w, 3) uint8 RGB for photometric 0/1/2/3 baseline TIFFs."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    tags = _read_ifd(payload, e)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return v[0]

    comp = one(_T_COMPRESSION, 1)
    if comp != 1:
        raise ValueError(
            f"TIFF: compression {comp} needs a codec runtime; only "
            "uncompressed baseline (1) decodes dependency-free"
        )
    if one(_T_PLANAR, 1) != 1:
        raise ValueError("TIFF: only chunky planar configuration supported")
    w = one(_T_WIDTH)
    h = one(_T_HEIGHT)
    photometric = one(_T_PHOTOMETRIC)
    samples = one(_T_SAMPLES, 1)
    bits = tags.get(_T_BITS, [8])
    if any(b != 8 for b in bits[:samples]):
        raise ValueError("TIFF: only 8 bits per sample supported")
    offsets = tags[_T_STRIP_OFFSETS]
    counts = tags.get(
        _T_STRIP_BYTES, [w * h * samples]  # single strip fallback
    )
    data = b"".join(
        payload[o : o + c] for o, c in zip(offsets, counts)
    )
    need = w * h * samples
    if len(data) < need:
        raise ValueError("TIFF: strip data shorter than image")
    arr = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, samples)

    if photometric == 2:
        if samples < 3:
            raise ValueError("TIFF: RGB photometric needs >= 3 samples")
        return arr[:, :, :3].copy()
    if photometric == 3:
        cmap = tags.get(_T_COLORMAP)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("TIFF: palette image missing ColorMap")
        cm = np.array(cmap[: 3 * 256], dtype=np.uint16).reshape(3, 256)
        rgb8 = (cm >> 8).astype(np.uint8)  # 16-bit map → 8-bit channels
        idx = arr[:, :, 0]
        return np.stack(
            [rgb8[0][idx], rgb8[1][idx], rgb8[2][idx]], axis=-1
        )
    if photometric in (0, 1):
        g = arr[:, :, 0]
        if photometric == 0:
            g = 255 - g  # WhiteIsZero inverts
        return np.stack([g, g, g], axis=-1)
    raise ValueError(f"TIFF: unsupported photometric {photometric}")


def encode_tiff(
    img, photometric: int = 2, big_endian: bool = False,
    rows_per_strip: int | None = None, colormap=None,
) -> bytes:
    """Baseline uncompressed TIFF writer. ``img``: (h, w, 3) uint8 for
    photometric 2; (h, w) uint8 gray for 0/1; (h, w) uint8 indices for
    3 (with ``colormap`` (3, 256) uint16). Multi-strip when
    ``rows_per_strip`` is set; both byte orders."""
    e = ">" if big_endian else "<"
    img = np.asarray(img, dtype=np.uint8)
    if photometric == 2:
        h, w, _ = img.shape
        samples = 3
        raw = img.tobytes()
    else:
        h, w = img.shape
        samples = 1
        raw = img.tobytes()
    rps = rows_per_strip or h
    n_strips = (h + rps - 1) // rps
    strip_bytes = [
        min(rps, h - s * rps) * w * samples for s in range(n_strips)
    ]

    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, cnt, raw
    extra = bytearray()  # out-of-line values, appended after the IFD

    header_len = 8
    # layout: header | strips | IFD | extra. Compute strip offsets now.
    strip_offsets = []
    pos = header_len
    for sb in strip_bytes:
        strip_offsets.append(pos)
        pos += sb
    ifd_off = pos

    def add(tag, typ, vals):
        entries.append((tag, typ, len(vals), vals))

    add(_T_WIDTH, 3, [w])
    add(_T_HEIGHT, 3, [h])
    add(_T_BITS, 3, [8] * samples)
    add(_T_COMPRESSION, 3, [1])
    add(_T_PHOTOMETRIC, 3, [photometric])
    add(_T_STRIP_OFFSETS, 4, strip_offsets)
    add(_T_SAMPLES, 3, [samples])
    add(_T_ROWS_PER_STRIP, 3, [rps])
    add(_T_STRIP_BYTES, 4, strip_bytes)
    add(_T_PLANAR, 3, [1])
    if photometric == 3:
        cm = np.asarray(colormap, dtype=np.uint16)
        if cm.shape != (3, 256):
            raise ValueError("colormap must be (3, 256) uint16")
        add(_T_COLORMAP, 3, [int(v) for v in cm.reshape(-1)])
    entries.sort(key=lambda t: t[0])  # spec: ascending tag order

    ifd_len = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_len
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, cnt, vals in entries:
        size = _TYPE_SIZES[typ]
        if typ == 3:
            raw_v = struct.pack(e + f"{cnt}H", *vals)
        else:
            raw_v = struct.pack(e + f"{cnt}I", *vals)
        if size * cnt <= 4:
            field = raw_v + b"\x00" * (4 - size * cnt)  # left-justified
        else:
            field = struct.pack(e + "I", extra_off + len(extra))
            extra += raw_v
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + field
    ifd += struct.pack(e + "I", 0)  # no next IFD

    head = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        e + "I", ifd_off
    )
    return head + raw + ifd + bytes(extra)
