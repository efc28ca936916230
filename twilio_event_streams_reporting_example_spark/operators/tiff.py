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
certification). Compression 1 (none), 5 (LZW, TIFF 6.0 §13 — MSB-first
bit packing with the "early change" width switch at table sizes
511/1023/2047, ClearCode 256 / EOI 257, optional horizontal-differencing
Predictor 2 per §14), 7 (new-style JPEG per TIFF Technical Note 2 —
each strip a JPEG stream decoded by the sibling operators/jpeg.py
codec, with the optional abbreviated JPEGTables (tag 347) stream
concatenated onto every strip), 8 (Adobe Deflate per TTN2 — stdlib
zlib per strip, Predictor 2 allowed) and 32773 (PackBits RLE, §9,
packed per row) all decode, as do the bilevel CCITT fax schemes —
2 (MH RLE), 3 (Group 3 / T.4, 1-D and 2-D) and 4 (Group 4 / T.6 MMR)
via the sibling operators/ccitt.py codec, honoring FillOrder (266)
and T4Options (292); other values (old-style JPEG 6, JBIG) raise —
they belong to a codec runtime. Note TIFF LZW differs
from GIF LZW (operators/gif.py)
in bit order (MSB- vs LSB-first), fixed 8-bit literal alphabet, and
the early-change rule — shared concept, different bitstreams.

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
_T_FILLORDER = 266
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTES = 279
_T_T4OPTIONS = 292
_T_T6OPTIONS = 293
_T_COLORMAP = 320
_T_PLANAR = 284
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTES = 325
_T_PREDICTOR = 317
_T_JPEG_TABLES = 347

# BYTE ASCII SHORT LONG RATIONAL SBYTE UNDEFINED
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1}

# ------------------------------------------- TIFF LZW (6.0 §13) --------
#
# MSB-first variable-width codes; ClearCode=256, EOI=257, first table
# entry 258; width starts at 9 and — the spec's "early change" rule —
# increments when the NEXT code to be added equals (1 << width) - 1
# (i.e. at table sizes 511, 1023, 2047), capping at 12 bits.

_TIFF_CLEAR = 256
_TIFF_EOI = 257


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW → exactly ``expected`` bytes."""
    table: list[bytes] = []

    def reset() -> int:
        nonlocal table, width
        table = [bytes([c]) for c in range(256)] + [b"", b""]
        width = 9
        return _TIFF_CLEAR

    width = 9
    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    out = bytearray()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream ended without EOI code")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == _TIFF_CLEAR:
            reset()
            prev = None
            continue
        if code == _TIFF_EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW first code after CLEAR not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("TIFF LZW code beyond table")
        if prev is not None:
            table.append(prev + entry[:1])
            # early change: switch width when the next entry to be
            # added would be (1 << width) - 1
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        out += entry
        prev = entry
        if len(out) > expected:
            raise ValueError("TIFF LZW produced more bytes than the strip")
    if len(out) != expected:
        raise ValueError("TIFF LZW strip byte count mismatch")
    return bytes(out)


def _tiff_lzw_encode(raw: bytes) -> bytes:
    """TIFF-flavor LZW compress (explicit CLEAR when the 12-bit table
    fills; early-change width switching mirroring the decoder)."""
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc = (acc << w) | (code & ((1 << w) - 1))
        nbits += w
        while nbits >= 8:
            nbits -= 8
            bits.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([c]): c for c in range(256)}
    next_code = 258
    width = 9
    emit(_TIFF_CLEAR, width)
    w = b""
    for ch in raw:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        # Early-change lockstep: the decoder (one table entry behind the
        # encoder, inherently) widens after APPENDING entry 510 — its
        # next read, code #255, is 10-bit. Code #255 coincides with this
        # encoder INSERTING entry 511, so widen when the just-inserted
        # code == (1 << width) - 1 (one emission earlier than GIF's
        # vanilla rule — TIFF 6.0 §13's "early change").
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        next_code += 1
        if next_code == (1 << 12) - 2:  # table nearly full: reset
            emit(_TIFF_CLEAR, width)
            table = {bytes([c]): c for c in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(_TIFF_EOI, width)
    if nbits:
        bits.append((acc << (8 - nbits)) & 0xFF)  # MSB-justified pad
    return bytes(bits)


# ----------------------------------------- PackBits (6.0 §9) -----------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError("PackBits stream shorter than the strip")
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            if pos + n + 1 > len(data):
                raise ValueError("PackBits literal run truncated")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("PackBits strip byte count mismatch")
    return bytes(out)


def _packbits_encode_row(row: bytes) -> bytes:
    """PackBits one row (spec: rows are packed separately)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:  # repeat run
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
            continue
        # literal run: scan until a 3+ repeat starts or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def _ifd_offsets(buf: bytes, e: str) -> list[int]:
    """Walk the IFD chain (multi-page TIFF): offsets of every IFD."""
    offs: list[int] = []
    if len(buf) < 8:
        raise ValueError("TIFF: truncated header")
    off = struct.unpack(e + "I", buf[4:8])[0]
    while off:
        if off + 2 > len(buf):
            raise ValueError("TIFF: IFD offset out of range")
        if off in offs or len(offs) > 10_000:
            raise ValueError("TIFF: circular IFD chain")
        offs.append(off)
        n = struct.unpack(e + "H", buf[off : off + 2])[0]
        nxt = off + 2 + 12 * n
        if nxt + 4 > len(buf):
            raise ValueError("TIFF: IFD extends past payload")
        off = struct.unpack(e + "I", buf[nxt : nxt + 4])[0]
    if not offs:
        raise ValueError("TIFF: no IFD")
    return offs


def _read_ifd(buf: bytes, e: str, off: int | None = None):
    if off is None:
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
            if ptr + total > len(buf):
                raise ValueError("TIFF: tag value out of range")
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


def tiff_page_count(payload: bytes) -> int:
    """Number of pages (IFDs) in the chain — multi-page scanned-doc
    TIFFs are the common real-world case; O(header) walk."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    return len(_ifd_offsets(payload, e))


def decode_tiff(payload: bytes, page: int = 0):
    """→ (h, w, 3) uint8 RGB for photometric 0/1/2/3 baseline TIFFs.
    ``page`` selects the IFD in a multi-page chain (default: first)."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    offs = _ifd_offsets(payload, e)
    if not 0 <= page < len(offs):
        raise ValueError(
            f"TIFF: page {page} out of range ({len(offs)} pages)"
        )
    tags = _read_ifd(payload, e, offs[page])

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return v[0]

    comp = one(_T_COMPRESSION, 1)
    if comp not in (1, 2, 3, 4, 5, 6, 7, 8, 32773):
        raise ValueError(
            f"TIFF: compression {comp} needs a codec runtime; only "
            "uncompressed (1), CCITT MH/G3/G4 (2/3/4), LZW (5), "
            "JPEG old- and new-style (6/7), Deflate (8) and PackBits "
            "(32773) decode dependency-free"
        )
    if comp == 6:
        # Old-style JPEG-in-TIFF (TIFF 6.0 §22), restricted to the
        # JPEGInterchangeFormat layout (tags 513/514 point at one
        # complete JPEG stream — the shape EXIF thumbnails and most
        # surviving §22 writers emit; JPEGProc (512) must be 1 =
        # baseline). The strip-based variant with separate
        # JPEGQTables/DCTables/ACTables (519-521) is the §22 design
        # TTN2 deprecated as unimplementable-portably and stays gated.
        from .jpeg import decode_jpeg

        if one(512, 1) != 1:
            raise NotImplementedError(
                "TIFF: old-style JPEG with JPEGProc != 1 (lossless) "
                "is not implemented"
            )
        jif = tags.get(513)
        if not jif:
            raise NotImplementedError(
                "TIFF: old-style JPEG without JPEGInterchangeFormat "
                "(strip-based tables, tags 519-521) is not implemented"
                " — TTN2 replaced it with compression 7"
            )
        jif_len = tags.get(514)
        start = jif[0]
        end = start + (jif_len[0] if jif_len else len(payload) - start)
        if end > len(payload):
            raise ValueError(
                "TIFF: JPEGInterchangeFormat range out of bounds"
            )
        w = one(_T_WIDTH)
        h = one(_T_HEIGHT)
        photometric = one(_T_PHOTOMETRIC)
        img = decode_jpeg(
            payload[start:end], color_transform=(photometric != 2)
        )
        if img.shape != (h, w, 3):
            raise ValueError(
                "TIFF: old-style JPEG dimensions disagree with the IFD"
            )
        return img
    predictor = one(_T_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: unsupported predictor {predictor}")
    if predictor == 2 and comp not in (5, 8):
        # §14 defines the Predictor tag for LZW; TIFF Technical Note 2
        # extends it to Deflate (compression 8) — not to PackBits
        raise ValueError("TIFF: predictor 2 needs LZW or Deflate")
    if one(_T_PLANAR, 1) != 1:
        raise ValueError("TIFF: only chunky planar configuration supported")
    w = one(_T_WIDTH)
    h = one(_T_HEIGHT)
    photometric = one(_T_PHOTOMETRIC)
    samples = one(_T_SAMPLES, 1)
    # bilevel CCITT defaults BitsPerSample to 1; everything else is 8
    bits = tags.get(_T_BITS, [1] if comp in (2, 3, 4) else [8])
    if comp in (2, 3, 4):
        if samples != 1 or any(b != 1 for b in bits[:samples]):
            raise ValueError("TIFF: CCITT images are 1-bit single-sample")
        if photometric not in (0, 1):
            raise ValueError(
                "TIFF: CCITT images are bilevel (photometric 0/1)"
            )
    elif any(b != 8 for b in bits[:samples]):
        raise ValueError("TIFF: only 8 bits per sample supported")
    if _T_TILE_WIDTH in tags:
        return _decode_tiled(
            payload, tags, comp, w, h, photometric, samples, one
        )
    offsets = tags.get(_T_STRIP_OFFSETS)
    if not offsets:
        raise ValueError(f"TIFF: missing required tag {_T_STRIP_OFFSETS}")
    counts = tags.get(
        _T_STRIP_BYTES, [w * h * samples]  # single strip fallback
    )
    if len(offsets) != len(counts):
        raise ValueError(
            "TIFF: StripOffsets/StripByteCounts length mismatch "
            f"({len(offsets)} vs {len(counts)})"
        )
    if comp in (2, 3, 4):
        # CCITT bilevel fax (operators/ccitt.py): each strip is an
        # independently coded segment (G4's reference line resets to
        # the imaginary all-white line per strip). FillOrder (266),
        # T4Options (292, G3 1-D vs 2-D) honored; codec bit 1 = black.
        from .ccitt import decode_ccitt

        if predictor != 1:
            raise ValueError("TIFF: predictor is not defined for CCITT")
        fillorder = one(_T_FILLORDER, 1)
        t4opts = one(_T_T4OPTIONS, 0)
        # T4Options/T6Options bit 1 (uncompressed mode allowed) needs
        # no special handling: the codec recognises the entry codes
        # wherever they appear (round 12 — gate removed)
        rps = one(_T_ROWS_PER_STRIP, h)
        if len(offsets) != (h + rps - 1) // rps:
            raise ValueError(
                "TIFF: CCITT strip count does not cover the image "
                f"({len(offsets)} strips for {h} rows at {rps}/strip)"
            )
        rows = []
        for si, (o, c) in enumerate(zip(offsets, counts)):
            n = min(rps, h - si * rps)
            rows.append(
                decode_ccitt(
                    payload[o : o + c], w, n, comp,
                    t4_options=t4opts, fillorder=fillorder,
                )
            )
        bitmap = np.concatenate(rows, axis=0)  # (h, w) 0=white 1=black
        # photometric 0 (WhiteIsZero, the fax default): codec white →
        # stored 0 → renders 255; photometric 1 inverts (libtiff-
        # compatible: a pm-1 fax renders inverted)
        g = (
            (1 - bitmap) * np.uint8(255)
            if photometric == 0
            else bitmap * np.uint8(255)
        ).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if comp == 7:
        # New-style JPEG-in-TIFF (TIFF Technical Note 2): each strip
        # is a JPEG stream; an optional JPEGTables tag (347) carries
        # an abbreviated tables-only stream whose segments prepend
        # onto every strip (drop the tables stream's EOI and the
        # strip's SOI — the standard concatenation).
        from .jpeg import decode_jpeg

        if predictor != 1:
            raise ValueError("TIFF: predictor is not defined for JPEG")
        if photometric not in (2, 6) or samples != 3:
            raise ValueError(
                "TIFF: JPEG compression supported for 3-sample "
                "photometric 2 (RGB) / 6 (YCbCr) only"
            )
        tables_v = tags.get(_T_JPEG_TABLES)
        tables = bytes(tables_v) if tables_v else b""
        if tables and (
            tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9"
        ):
            raise ValueError("TIFF: malformed JPEGTables stream")
        rps = one(_T_ROWS_PER_STRIP, h)
        if len(offsets) != (h + rps - 1) // rps:
            raise ValueError(
                "TIFF: JPEG strip count does not cover the image "
                f"({len(offsets)} strips for {h} rows at {rps}/strip)"
            )
        strips = []
        for si, (o, c) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - si * rps)
            if rows <= 0:
                raise ValueError("TIFF: more strips than image rows")
            stream = payload[o : o + c]
            if stream[:2] != b"\xff\xd8":
                raise ValueError("TIFF: JPEG strip missing SOI")
            if tables:
                stream = tables[:-2] + stream[2:]
            # TIFF TN2: photometric 6 strips are YCbCr (JFIF inverse
            # transform applies); photometric 2 strips carry RGB
            # components with NO color transform — decode as stored.
            img = decode_jpeg(stream, color_transform=(photometric == 6))
            if img.shape != (rows, w, 3):
                raise ValueError(
                    "TIFF: JPEG strip dimensions disagree with the IFD"
                )
            strips.append(img)
        return np.concatenate(strips, axis=0)
    if comp == 1:
        data = b"".join(
            payload[o : o + c] for o, c in zip(offsets, counts)
        )
    else:
        rps = one(_T_ROWS_PER_STRIP, h)
        chunks = []
        for si, (o, c) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - si * rps)
            if rows <= 0:
                raise ValueError("TIFF: more strips than image rows")
            exp = rows * w * samples
            raw_strip = payload[o : o + c]
            if comp == 5:
                d = _tiff_lzw_decode(raw_strip, exp)
            elif comp == 8:
                import zlib

                d = zlib.decompress(raw_strip)
                if len(d) != exp:
                    raise ValueError(
                        "TIFF: Deflate strip byte count mismatch"
                    )
            else:
                d = _packbits_decode(raw_strip, exp)
            if predictor == 2:
                # undo horizontal differencing: cumulative sum across
                # the row, per sample channel, modulo 256
                a = np.frombuffer(d, dtype=np.uint8).reshape(
                    rows, w, samples
                )
                d = (
                    np.cumsum(a.astype(np.int64), axis=1) % 256
                ).astype(np.uint8).tobytes()
            chunks.append(d)
        data = b"".join(chunks)
    need = w * h * samples
    if len(data) < need:
        raise ValueError("TIFF: strip data shorter than image")
    arr = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, samples)
    return _apply_photometric(arr, photometric, samples, tags)


def _apply_photometric(arr, photometric: int, samples: int, tags):
    """(h, w, samples) uint8 sample array → (h, w, 3) RGB per the
    PhotometricInterpretation tag (shared by the strip and tile
    paths)."""
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


def _decode_tiled(
    payload: bytes, tags, comp: int, w: int, h: int,
    photometric: int, samples: int, one,
):
    """TIFF 6.0 §15 tiled layout: the image is a grid of fixed-size
    (tw × th) tiles, ordered left-to-right then top-to-bottom, EVERY
    tile padded to full size (edge padding cropped on assembly), each
    tile compressed independently with the page's compression —
    byte codecs (1/5/8/32773 w/ Predictor 2 per tile row), CCITT fax
    (each tile an independent coded segment) and new-style JPEG
    (each tile its own stream, JPEGTables merged) all supported."""
    tw = one(_T_TILE_WIDTH)
    th = one(_T_TILE_LENGTH)
    if tw % 16 or th % 16:
        raise ValueError("TIFF: tile dimensions must be multiples of 16")
    offsets = tags.get(_T_TILE_OFFSETS)
    counts = tags.get(_T_TILE_BYTES)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: missing/mismatched tile offset tags")
    across = (w + tw - 1) // tw
    down = (h + th - 1) // th
    if len(offsets) != across * down:
        raise ValueError(
            f"TIFF: tile count {len(offsets)} does not cover the "
            f"{across}x{down} grid"
        )
    predictor = one(_T_PREDICTOR, 1)
    out = np.zeros((down * th, across * tw, samples), dtype=np.uint8)
    for ti, (o, c) in enumerate(zip(offsets, counts)):
        raw_tile = payload[o : o + c]
        ty, tx = divmod(ti, across)
        if comp in (2, 3, 4):
            from .ccitt import decode_ccitt

            bitmap = decode_ccitt(
                raw_tile, tw, th, comp,
                t4_options=one(_T_T4OPTIONS, 0),
                fillorder=one(_T_FILLORDER, 1),
            )
            # same mapping as the strip path: pm 0 (WhiteIsZero) —
            # codec black (1) renders 0; pm 1 renders inverted
            tile = (
                ((1 - bitmap) if photometric == 0 else bitmap)
                * np.uint8(255)
            ).astype(np.uint8)[:, :, None]
        elif comp == 7:
            from .jpeg import decode_jpeg

            tables_v = tags.get(_T_JPEG_TABLES)
            tables = bytes(tables_v) if tables_v else b""
            stream = raw_tile
            if stream[:2] != b"\xff\xd8":
                raise ValueError("TIFF: JPEG tile missing SOI")
            if tables:
                stream = tables[:-2] + stream[2:]
            img = decode_jpeg(stream, color_transform=(photometric == 6))
            if img.shape != (th, tw, 3):
                raise ValueError(
                    "TIFF: JPEG tile dimensions disagree with the IFD"
                )
            tile = img
        else:
            exp = th * tw * samples
            if comp == 1:
                d = bytes(raw_tile)
            elif comp == 5:
                d = _tiff_lzw_decode(raw_tile, exp)
            elif comp == 8:
                import zlib

                d = zlib.decompress(raw_tile)
            else:
                d = _packbits_decode(raw_tile, exp)
            if len(d) != exp:
                raise ValueError("TIFF: tile byte count mismatch")
            a = np.frombuffer(d, dtype=np.uint8).reshape(th, tw, samples)
            if predictor == 2:
                a = (
                    np.cumsum(a.astype(np.int64), axis=1) % 256
                ).astype(np.uint8)
            tile = a
        out[ty * th : ty * th + th, tx * tw : tx * tw + tw] = (
            tile if tile.ndim == 3 else tile[:, :, None]
        )
    arr = out[:h, :w]
    if comp in (2, 3, 4):
        # already mapped to gray bytes incl. photometric above
        g = arr[:, :, 0]
        return np.stack([g, g, g], axis=-1)
    if comp == 7:
        return arr[:, :, :3].copy()
    return _apply_photometric(arr, photometric, samples, tags)


def encode_tiff(
    img, photometric: int = 2, big_endian: bool = False,
    rows_per_strip: int | None = None, colormap=None,
    compression: int = 1, predictor: int = 1,
    t4_options: int = 0, fillorder: int = 1,
    tile: tuple[int, int] | None = None, uncompressed: bool = False,
) -> bytes:
    """Baseline TIFF writer. ``img``: (h, w, 3) uint8 for photometric
    2; (h, w) uint8 gray for 0/1; (h, w) uint8 indices for 3 (with
    ``colormap`` (3, 256) uint16). Multi-strip when ``rows_per_strip``
    is set; both byte orders; ``compression`` 1 (none), 5 (LZW) or 8
    (Deflate) — both with optional horizontal-differencing
    ``predictor`` 2 — or 32773 (PackBits, packed per row per §9).
    Bilevel fax pages: ``compression`` 2 (CCITT MH), 3 (G3 — with
    ``t4_options`` bit 0 for 2-D lines) or 4 (G4/MMR) take an (h, w)
    0/1 bitmap with photometric 0/1; ``fillorder`` 2 writes
    bit-reversed bytes plus the FillOrder tag. ``uncompressed=True``
    (compression 3/4 only) codes every line in T.4 §2.2.5 uncompressed
    mode and sets T4Options/T6Options bit 1. ``tile=(tw, th)``
    (multiples of 16) writes the §15 tiled layout — tags 322-325,
    no strip tags — with edge tiles padded by replication; mutually
    exclusive with ``rows_per_strip`` and compression 6."""
    e = ">" if big_endian else "<"
    blob, ifd_off, next_ptr = _build_page(
        img, photometric, e, rows_per_strip, colormap, compression,
        predictor, base=8, t4_options=t4_options, fillorder=fillorder,
        tile=tile, uncompressed=uncompressed,
    )
    head = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        e + "I", ifd_off
    )
    return head + blob


def encode_tiff_multipage(
    pages, photometric: int = 2, big_endian: bool = False,
    rows_per_strip: int | None = None, colormap=None,
    compression: int = 1, predictor: int = 1,
    t4_options: int = 0, fillorder: int = 1,
) -> bytes:
    """Multi-page TIFF writer: each page in ``pages`` becomes one IFD
    in the chain (the scanned-document layout). Per-page parameters
    may be scalars (applied to every page) or lists."""
    if not pages:
        raise ValueError("encode_tiff_multipage needs at least one page")

    def per_page(v, k):
        return v[k] if isinstance(v, (list, tuple)) else v

    e = ">" if big_endian else "<"
    out = bytearray(
        (b"MM\x00*" if big_endian else b"II*\x00") + b"\x00\x00\x00\x00"
    )
    prev_ptr = 4  # header's first-IFD pointer
    for k, img in enumerate(pages):
        blob, ifd_off, next_ptr = _build_page(
            img, per_page(photometric, k), e, per_page(rows_per_strip, k),
            per_page(colormap, k), per_page(compression, k),
            per_page(predictor, k), base=len(out),
            t4_options=per_page(t4_options, k),
            fillorder=per_page(fillorder, k),
        )
        struct.pack_into(e + "I", out, prev_ptr, ifd_off)
        out += blob
        prev_ptr = next_ptr
    return bytes(out)


def _build_page(
    img, photometric: int, e: str, rows_per_strip: int | None,
    colormap, compression: int, predictor: int, base: int,
    t4_options: int = 0, fillorder: int = 1,
    tile: tuple[int, int] | None = None, uncompressed: bool = False,
):
    """One page's ``strips | IFD | extra`` blob with all offsets
    absolute to a file where the blob starts at ``base``. Returns
    ``(blob, ifd_offset, next_ifd_pointer_position)`` — the pointer
    position is patched by the multi-page writer (it is written 0)."""
    img = np.asarray(img, dtype=np.uint8)
    if photometric in (2, 6):
        h, w, _ = img.shape
        samples = 3
    else:
        h, w = img.shape
        samples = 1
        img = img[:, :, None]
    if compression not in (1, 2, 3, 4, 5, 6, 7, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    if predictor == 2 and compression not in (5, 8):
        raise ValueError("predictor 2 needs LZW or Deflate")
    ccitt = compression in (2, 3, 4)
    if ccitt and photometric not in (0, 1):
        raise ValueError("CCITT compression writes bilevel photometric 0/1")
    if uncompressed and compression not in (3, 4):
        raise ValueError(
            "uncompressed mode is signalled via T4Options/T6Options "
            "bit 1 — compression 3 or 4 only"
        )
    if uncompressed and compression == 3:
        t4_options |= 0b10  # signal: uncompressed mode may appear
    if fillorder not in (1, 2):
        raise ValueError(f"unsupported FillOrder {fillorder}")
    if fillorder == 2 and not ccitt:
        raise ValueError("FillOrder 2 is written for CCITT pages only")
    if compression in (6, 7) and photometric not in (2, 6):
        raise ValueError(
            "JPEG compression writes photometric 6 (YCbCr) or 2 (RGB)"
        )
    if photometric == 6 and compression not in (6, 7):
        raise ValueError("photometric 6 is written with JPEG compression")
    if compression == 6 and rows_per_strip not in (None, h):
        raise ValueError(
            "old-style JPEG (compression 6) writes one interchange "
            "stream, not strips"
        )
    img3 = img.reshape(h, w, samples)

    def encode_block(blk) -> bytes:
        """One strip's (or padded tile's) compressed bytes."""
        if compression in (6, 7):
            # 6: §22 interchange layout — ONE complete JPEG stream,
            # referenced by tags 513/514 (no strips). 7: self-contained
            # per-strip/per-tile JPEG streams (no JPEGTables tag);
            # photometric 2 stores RGB with no transform (TN2)
            from .jpeg import encode_jpeg

            return encode_jpeg(
                blk, subsampling="444",
                color_transform=(photometric == 6),
            )
        if ccitt:
            from .ccitt import _FILL_REVERSE, encode_ccitt

            coded = encode_ccitt(
                blk[:, :, 0], compression, t4_options=t4_options,
                uncompressed=uncompressed,
            )
            if fillorder == 2:
                coded = bytes(_FILL_REVERSE[b] for b in coded)
            return coded
        if predictor == 2:
            d = blk.astype(np.int64)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            blk = (d % 256).astype(np.uint8)
        raw_blk = blk.tobytes()
        if compression == 1:
            return raw_blk
        if compression == 5:
            return _tiff_lzw_encode(raw_blk)
        if compression == 8:
            import zlib

            return zlib.compress(raw_blk, 6)
        # PackBits: spec packs each row separately
        row_len = blk.shape[1] * samples
        return b"".join(
            _packbits_encode_row(raw_blk[r : r + row_len])
            for r in range(0, len(raw_blk), row_len)
        )

    if tile is not None:
        # §15 tiled layout: dims multiples of 16; edge tiles padded by
        # edge replication (cropped on decode, and replication keeps
        # the lossy JPEG path clean at the borders)
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        if rows_per_strip is not None:
            raise ValueError("tiled pages do not take rows_per_strip")
        if compression == 6:
            raise ValueError("old-style JPEG (compression 6) cannot tile")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        pad = np.pad(
            img3,
            ((0, down * th - h), (0, across * tw - w), (0, 0)),
            mode="edge",
        )
        strips = [
            encode_block(
                pad[ty * th : ty * th + th, tx * tw : tx * tw + tw]
            )
            for ty in range(down)
            for tx in range(across)
        ]
        rps = None
    else:
        rps = rows_per_strip or h
        n_strips = (h + rps - 1) // rps
        strips = [
            encode_block(img3[s * rps : s * rps + rps])
            for s in range(n_strips)
        ]
    raw = b"".join(strips)
    strip_bytes = [len(s) for s in strips]

    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, cnt, raw
    extra = bytearray()  # out-of-line values, appended after the IFD

    # layout: [base:] strips | IFD | extra. Compute strip offsets now.
    strip_offsets = []
    pos = base
    for sb in strip_bytes:
        strip_offsets.append(pos)
        pos += sb
    ifd_off = pos

    def add(tag, typ, vals):
        entries.append((tag, typ, len(vals), vals))

    add(_T_WIDTH, 3, [w])
    add(_T_HEIGHT, 3, [h])
    add(_T_BITS, 3, [1] if ccitt else [8] * samples)
    add(_T_COMPRESSION, 3, [compression])
    add(_T_PHOTOMETRIC, 3, [photometric])
    if fillorder == 2:
        add(_T_FILLORDER, 3, [2])
    if compression == 3 and t4_options:
        add(_T_T4OPTIONS, 4, [t4_options])
    if compression == 4 and uncompressed:
        add(_T_T6OPTIONS, 4, [0b10])  # uncompressed mode allowed
    if predictor == 2:
        add(_T_PREDICTOR, 3, [2])
    if compression == 6:
        add(512, 3, [1])  # JPEGProc = 1 (baseline)
        add(513, 4, [strip_offsets[0]])  # JPEGInterchangeFormat
        add(514, 4, [strip_bytes[0]])  # JPEGInterchangeFormatLength
    elif tile is not None:
        # §15: tiled pages carry tags 322-325 and NO strip tags.
        add(_T_TILE_WIDTH, 3, [tile[0]])
        add(_T_TILE_LENGTH, 3, [tile[1]])
        add(_T_TILE_OFFSETS, 4, strip_offsets)
        add(_T_TILE_BYTES, 4, strip_bytes)
    else:
        add(_T_STRIP_OFFSETS, 4, strip_offsets)
        add(_T_ROWS_PER_STRIP, 3, [rps])
        add(_T_STRIP_BYTES, 4, strip_bytes)
    add(_T_SAMPLES, 3, [samples])
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
    next_ptr_pos = ifd_off + len(ifd)
    ifd += struct.pack(e + "I", 0)  # next IFD (0 unless patched)

    return raw + ifd + bytes(extra), ifd_off, next_ptr_pos
