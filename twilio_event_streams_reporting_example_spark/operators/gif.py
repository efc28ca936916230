"""Dependency-free GIF87a/GIF89a codec (pure Python + numpy).

REAL media decode for the one remaining raster format the engine
probed but could not open: LZW-compressed, palette-indexed, optionally
interlaced, optionally animated GIF. Written from the GIF89a
specification (CompuServe, 1990-07-31): logical screen descriptor,
global/local color tables, graphic-control extensions (delay,
transparency index, disposal method), Adam-less 4-pass row
interlacing, and variable-width LSB-first LZW with CLEAR/END codes
and the 12-bit table cap.

Like the sibling PNG/JPEG/WAV codecs in ``multimodal.py`` this exists
so the engine's multimodal plumbing decodes *real bytes* instead of a
deterministic fake: the ``gif_roundtrip`` section of the
``multimodal_media_ops`` query encodes closed-form frames executor-side,
decodes them back through :func:`decode_gif`, and certifies the channel
sums against a DuckDB oracle computed from the same closed form — a
single wrong byte in the container layout, LZW bitstream, interlace
reorder, or frame compositing breaks the hash match.

Scale note: the codec runs inside Arrow-batched ``mapInPandas``
kernels (one Python call per item, numpy for all pixel math); the
per-code LZW loop is bounded by the 12-bit table, and GIF payloads in
a 100 TB corpus are decoded embarrassingly parallel with no shuffle.

Reference parity note: the reference app
(twilio-event-streams-reporting-example, events.js) has no media path
at all — this module is part of the engine's LLM-data-pipeline
surface, not a port.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAX_CODE = 1 << 12  # spec: LZW code size never exceeds 12 bits

# 4-pass row interlace: (first row, row step) per pass
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row permutation: ``order[k]`` = image row of the k-th stored row."""
    return np.concatenate(
        [np.arange(y0, h, dy) for y0, dy in _GIF_INTERLACE if y0 < h]
    ).astype(np.int64)


# --------------------------------------------------------------- LZW ---


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Variable-width LSB-first GIF LZW → ``expected`` index bytes.

    Classic table-of-bytes construction: width starts at
    ``min_code_size + 1``, grows when the table fills the current width,
    caps at 12 bits (further codes reuse the full table until a CLEAR).
    """
    if not 2 <= min_code_size <= 8:
        raise ValueError("GIF LZW minimum code size out of range")
    clear = 1 << min_code_size
    end_code = clear + 1
    base = [bytes([c]) for c in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    out = bytearray()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without END code")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end_code:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW code beyond table")
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
        if len(out) > expected:
            raise ValueError("GIF LZW produced more pixels than the frame")
    if len(out) != expected:
        raise ValueError("GIF LZW pixel count mismatch")
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW compress with an explicit CLEAR on table overflow
    (never relies on deferred-clear decoder behavior)."""
    clear = 1 << min_code_size
    end_code = clear + 1
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < _GIF_MAX_CODE:
            table[wc] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset exactly like the decoder will
            emit(clear, width)
            table = {bytes([c]): c for c in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(end_code, width)
    if nbits:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _sub_blocks(data: bytes) -> bytes:
    """Split ``data`` into GIF data sub-blocks (≤255-byte chunks, each
    preceded by its length, followed by a zero terminator)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ------------------------------------------------------------ encode ---


def encode_gif(
    frames,
    palette,
    delays_ms=None,
    transparent: int | None = None,
    disposals=None,
    offsets=None,
    interlace: bool = False,
    loop: int | None = 0,
) -> bytes:
    """Encode palette-indexed frames into a real GIF payload.

    ``frames``: one ``(h, w)`` uint8 index array or a list of them
    (per-frame arrays may be smaller than the logical screen when
    paired with ``offsets``). ``palette``: ``(n, 3)`` uint8, n ≤ 256.
    ``transparent``: an index applied to every frame, or a per-frame
    list mixing indices and ``None``.
    ``delays_ms``/``disposals``/``offsets``: per-frame frame delay,
    disposal method (0–3), and ``(top, left)`` placement. Animated
    output (more than one frame, or any delay/disposal) is GIF89a with
    a NETSCAPE2.0 loop block; a single plain frame is spec-minimal
    GIF89a when ``transparent`` is set, else GIF87a.
    """
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    offsets = offsets or [(0, 0)] * len(frames)
    delays_ms = delays_ms or [0] * len(frames)
    disposals = disposals or [0] * len(frames)
    if isinstance(transparent, (list, tuple)):
        transparents = list(transparent)
    else:
        transparents = [transparent] * len(frames)
    if not (
        len(offsets) == len(delays_ms) == len(disposals)
        == len(transparents) == len(frames)
    ):
        raise ValueError("per-frame metadata length mismatch")
    any_transparent = any(t is not None for t in transparents)
    sw = max(o[1] + f.shape[1] for f, o in zip(frames, offsets))
    sh = max(o[0] + f.shape[0] for f, o in zip(frames, offsets))
    # color table size: next power of two ≥ len(palette), minimum 2
    ct_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    ct_n = 1 << ct_bits
    for f in frames:
        if f.size and int(f.max()) >= len(palette):
            raise ValueError("frame index beyond palette")
    for t in transparents:
        if t is not None and not 0 <= t < ct_n:
            raise ValueError("transparent index beyond color table")

    animated = len(frames) > 1 or any(delays_ms) or any(disposals)
    out = bytearray()
    out += b"GIF89a" if (animated or any_transparent) else b"GIF87a"
    # logical screen descriptor: GCT present, color resolution 8 bits
    out += struct.pack(
        "<HHBBB", sw, sh, 0x80 | ((8 - 1) << 4) | (ct_bits - 1), 0, 0
    )
    pal = np.zeros((ct_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    if animated and loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0" + bytes([3, 1]) + struct.pack(
            "<H", loop
        ) + b"\x00"
    for f, (top, left), delay, disposal, transp in zip(
        frames, offsets, delays_ms, disposals, transparents
    ):
        fh, fw = f.shape
        if left + fw > sw or top + fh > sh:
            raise ValueError("frame rectangle outside logical screen")
        if animated or transp is not None:
            flags = (disposal & 7) << 2
            tidx = 0
            if transp is not None:
                flags |= 1
                tidx = transp
            out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack(
                "<H", max(0, delay) // 10
            ) + bytes([tidx, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", left, top, fw, fh, 0x40 if interlace else 0
        )
        rows = f[_interlace_order(fh)] if interlace else f
        mcs = max(2, ct_bits)
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(rows.tobytes(), mcs))
    out.append(0x3B)  # trailer
    return bytes(out)


# ------------------------------------------------------------ decode ---


def decode_gif(payload: bytes):
    """Decode a GIF payload into composited RGBA frames.

    Returns ``(frames, delays_ms)`` where ``frames`` is a
    ``(n_frames, h, w, 4)`` uint8 array over the logical screen —
    each frame fully composited per the animation model (disposal 0/1
    leave the canvas, 2 clears the frame rectangle to transparent, 3
    restores the pre-frame canvas; transparent pixels leave the
    underlying canvas visible) — and ``delays_ms`` the per-frame
    delays. Still images come back as a 1-frame stack.
    """
    buf = memoryview(bytes(payload))
    if bytes(buf[:6]) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(buf) < 13:
        raise ValueError("GIF truncated before logical screen descriptor")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(buf):
            raise ValueError("GIF truncated inside global color table")
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the NEXT image
    g_transparent: int | None = None
    g_delay = 0
    g_disposal = 0

    def read_sub_blocks(p: int) -> tuple[bytes, int]:
        chunks = bytearray()
        while True:
            if p >= len(buf):
                raise ValueError("GIF truncated inside sub-blocks")
            n = buf[p]
            p += 1
            if n == 0:
                return bytes(chunks), p
            if p + n > len(buf):
                raise ValueError("GIF truncated inside sub-blocks")
            chunks += buf[p : p + n]
            p += n

    while True:
        if pos >= len(buf):
            raise ValueError("GIF missing trailer")
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("GIF truncated in extension")
            label = buf[pos]
            pos += 1
            body, pos = read_sub_blocks(pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise ValueError("GIF graphic control too short")
                f, delay_cs, tidx = struct.unpack_from("<BHB", body, 0)
                g_disposal = (f >> 2) & 7
                g_transparent = tidx if f & 1 else None
                g_delay = delay_cs * 10
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(buf):
                raise ValueError("GIF truncated inside local color table")
            ct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(
                n, 3
            )
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        if left + fw > sw or top + fh > sh or fw == 0 or fh == 0:
            raise ValueError("GIF frame rectangle outside logical screen")
        if pos >= len(buf):
            raise ValueError("GIF truncated before LZW code size")
        mcs = buf[pos]
        pos += 1
        data, pos = read_sub_blocks(pos)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: stored rows are permuted
            deinter = np.empty_like(idx)
            deinter[_interlace_order(fh)] = idx
            idx = deinter
        if int(idx.max()) >= len(ct):
            raise ValueError("GIF pixel index beyond color table")
        saved = canvas.copy() if g_disposal == 3 else None
        rgba = np.concatenate(
            [ct[idx], np.full((fh, fw, 1), 255, dtype=np.uint8)], axis=2
        )
        region = canvas[top : top + fh, left : left + fw]
        if g_transparent is not None:
            opaque = (idx != g_transparent)[:, :, None]
            region[:] = np.where(opaque, rgba, region)
        else:
            region[:] = rgba
        frames.append(canvas.copy())
        delays.append(g_delay)
        if g_disposal == 2:
            canvas[top : top + fh, left : left + fw] = 0
        elif g_disposal == 3:
            canvas = saved
        g_transparent, g_delay, g_disposal = None, 0, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays
