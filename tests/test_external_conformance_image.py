"""External conformance, IMAGE side: cross this repo's PNG/TIFF/GIF
codecs with the reference C implementations the box ships as shared
libraries — libpng 1.6 (simplified read/write API), libtiff 6
(TIFFOpen/TIFFReadScanline/TIFFWriteScanline/TIFFReadDirectory) and
giflib 5 (DGifOpen/DGifSlurp) — in BOTH directions where a producer
exists:

  libpng/libtiff-encoded bytes -> our decoder   (container + filter +
                                                 LZW/predictor layout)
  our-encoded bytes -> libpng/libtiff decoder   (external decodability:
                                                 all five PNG scanline
                                                 filters, TIFF LZW /
                                                 Deflate / PackBits /
                                                 predictor-2, and the
                                                 CCITT G3/G4 fax coder
                                                 read back by libtiff's
                                                 own fax decoder)

This is the image analogue of tests/test_external_conformance.py
(round-13 stdlib audio crossing); the round-14 stored fixture items
96-101 certify the same encoders on data at rest. Skips cleanly when
the shared libraries are absent (PLANS.md #24 records the environment
probe: no Python imaging package, no CLI encoder — the .so files are
the only independent producers on the box).
"""

import ctypes
import os
import struct
import tempfile
import zlib

import numpy as np
import pytest

try:
    _libpng = ctypes.CDLL("libpng16.so.16")
except OSError:  # pragma: no cover - env-dependent
    _libpng = None
try:
    _libtiff = ctypes.CDLL("libtiff.so.6")
except OSError:  # pragma: no cover - env-dependent
    _libtiff = None
try:
    _libgif = ctypes.CDLL("libgif.so.7")
except OSError:  # pragma: no cover - env-dependent
    _libgif = None

from twilio_event_streams_reporting_example_spark.operators.multimodal import (
    _ADAM7,
    _libpng_encode,
    _libtiff_encode,
    _PNG_SIG,
    _png_chunk,
    _PngImageStruct,
    decode_png,
    encode_png,
)
from twilio_event_streams_reporting_example_spark.operators.gif import (
    encode_gif,
)
from twilio_event_streams_reporting_example_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    encode_tiff_multipage,
)

requires_libpng = pytest.mark.skipif(_libpng is None, reason="no libpng16")
requires_libtiff = pytest.mark.skipif(_libtiff is None, reason="no libtiff")
requires_libgif = pytest.mark.skipif(_libgif is None, reason="no libgif")


def _grad(h, w, ch, mod=256, dtype=np.uint8, k=0):
    a = np.empty((h, w, ch), dtype=dtype)
    for c in range(ch):
        yy = np.arange(h, dtype=np.int64)[:, None]
        xx = np.arange(w, dtype=np.int64)[None, :]
        a[:, :, c] = ((yy * 7 + xx * (3 + c) + c * 29 + k * 11) % mod).astype(dtype)
    return a


# ---------------- libpng -> our PNG decoder ----------------

@requires_libpng
@pytest.mark.parametrize(
    "fmt,ch,mod,dtype",
    [
        (0, 1, 256, np.uint8),    # PNG_FORMAT_GRAY
        (2, 3, 256, np.uint8),    # PNG_FORMAT_RGB
        (3, 4, 256, np.uint8),    # PNG_FORMAT_RGBA
        (6, 3, 65536, np.uint16), # PNG_FORMAT_LINEAR_RGB (16-bit)
    ],
)
def test_libpng_written_png_decodes_bit_exact(fmt, ch, mod, dtype):
    src = _grad(21, 33, ch, mod, dtype, k=fmt)
    payload = _libpng_encode(src, fmt)
    got = decode_png(payload)
    assert got.shape == (21, 33, ch)
    assert got.dtype == dtype
    assert np.array_equal(got, src)


# ---------------- our PNG bytes -> libpng reader ----------------

def _libpng_read(payload: bytes, fmt: int, is16: bool = False):
    """Decode a PNG with libpng's simplified read API in the requested
    PNG_FORMAT_* (0 GRAY, 1 GA, 2 RGB, 3 RGBA; +4 = 16-bit linear)."""
    PngImage = _PngImageStruct.get()
    begin = _libpng.png_image_begin_read_from_memory
    begin.restype = ctypes.c_int
    begin.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_void_p, ctypes.c_size_t,
    ]
    finish = _libpng.png_image_finish_read
    finish.restype = ctypes.c_int
    finish.argtypes = [
        ctypes.POINTER(PngImage), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p,
    ]
    img = PngImage()
    img.version = 1
    if not begin(ctypes.byref(img), payload, len(payload)):
        raise RuntimeError(f"libpng begin_read: {bytes(img.message)!r}")
    img.format = fmt
    h, w = img.height, img.width
    ch = {0: 1, 1: 2, 2: 3, 3: 4, 4: 1, 6: 3, 7: 4}[fmt]
    buf = np.empty((h, w, ch), dtype=np.uint16 if is16 else np.uint8)
    if not finish(
        ctypes.byref(img), None,
        buf.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        raise RuntimeError(f"libpng finish_read: {bytes(img.message)!r}")
    return buf


@requires_libpng
def test_our_png_reads_back_through_libpng():
    """encode_png cycles ALL FIVE scanline filters (row y uses filter
    y % 5) — libpng reading it bit-exactly certifies every filter
    writer against the reference unfilter implementation."""
    src = _grad(25, 19, 3)  # 25 rows: each filter exercised 5 times
    got = _libpng_read(encode_png(src), 2)
    assert np.array_equal(got, src)


def _build_png(img, depth, ctype, interlace, plte=None):
    """Hand-built PNG (filter 0 rows) in the exact style of the
    spec-grid synthesizers certified in tests/test_multimodal.py —
    8/16-bit any color type, 1/2/4-bit gray/palette (MSB-first
    packing), non-interlaced or Adam7 (each sub-image its own
    scanline set)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ihdr = _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if depth == 8:
        px = img.astype(np.uint8)
    elif depth == 16:
        px = img.astype(">u2").view(np.uint8).reshape(h, w, ch * 2)
    else:
        px = img

    def scanlines(sub):
        if depth in (8, 16):
            return b"".join(
                b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])
            )
        out = []
        for y in range(sub.shape[0]):
            row = sub[y, :, 0]
            bits = np.zeros(((row.size * depth + 7) // 8) * 8, np.uint8)
            for i, v in enumerate(row):
                for b in range(depth):
                    bits[i * depth + b] = (int(v) >> (depth - 1 - b)) & 1
            out.append(b"\x00" + np.packbits(bits).tobytes())
        return b"".join(out)

    if interlace == 0:
        scan = scanlines(px)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size:
                parts.append(scanlines(sub))
        scan = b"".join(parts)
    chunks = ihdr
    if plte is not None:
        chunks += _png_chunk(b"PLTE", plte)
    chunks += _png_chunk(b"IDAT", zlib.compress(scan)) + _png_chunk(b"IEND", b"")
    return _PNG_SIG + chunks


@requires_libpng
@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize(
    "ctype,ch,fmt",
    [(0, 1, 0), (4, 2, 1), (2, 3, 2), (6, 4, 3)],  # gray/GA/RGB/RGBA
)
def test_our_8bit_png_grid_reads_back_through_libpng(ctype, ch, fmt, interlace):
    """The 8-bit arm of the spec-legal synthesis grid — every color
    type, non-interlaced AND Adam7 — read bit-exactly by libpng. The
    grid is certified against OUR decoder in tests/test_multimodal;
    this crosses the same bytes with the reference implementation, so
    a shared build/decode misconception (e.g. a wrong Adam7 pass
    order that round-trips internally) cannot survive."""
    src = _grad(13, 9, ch, k=ctype)  # 13x9: partial Adam7 passes
    got = _libpng_read(_build_png(src, 8, ctype, interlace), fmt)
    assert np.array_equal(got, src)


@requires_libpng
@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("ctype,ch,fmt", [(0, 1, 4), (2, 3, 6)])
def test_our_16bit_png_grid_reads_back_through_libpng(ctype, ch, fmt, interlace):
    """16-bit gray and RGB (big-endian samples), both interlace modes,
    through libpng's 16-bit linear formats — pass-through bit-exact
    (no gAMA chunk, so the simplified API applies no transform)."""
    src = _grad(11, 7, ch, mod=65536, dtype=np.uint16, k=ctype)
    got = _libpng_read(_build_png(src, 16, ctype, interlace), fmt, is16=True)
    assert np.array_equal(got, src)


@requires_libpng
@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_our_subbyte_png_reads_back_through_libpng(depth, interlace):
    """1/2/4-bit gray (MSB-first packed, per-pass repacking under
    Adam7): libpng expands sub-byte samples with the spec scaling
    v * 255 / (2^d - 1); our packed scanlines must produce exactly
    those values."""
    src = _grad(9, 17, 1, mod=1 << depth, k=depth)
    got = _libpng_read(_build_png(src, depth, 0, interlace), 0)
    exp = (src.astype(np.uint32) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    assert np.array_equal(got, exp)


@requires_libpng
def test_our_palette_png_reads_back_through_libpng():
    """Palette (color type 3) indices expand through PLTE identically
    in libpng and in our decoder."""
    pal = _grad(1, 16, 3)[0]  # 16 RGB entries
    idx = _grad(6, 7, 1, mod=16, k=3)
    got = _libpng_read(_build_png(idx, 8, 3, 0, plte=pal.tobytes()), 2)
    assert np.array_equal(got, pal[idx[:, :, 0]])
    ours = decode_png(_build_png(idx, 8, 3, 0, plte=pal.tobytes()))
    assert np.array_equal(ours, pal[idx[:, :, 0]])


# ---------------- libtiff -> our TIFF decoder ----------------

@requires_libtiff
def test_libtiff_lzw_rgb_decodes_bit_exact():
    src = _grad(18, 37, 3)
    payload = _libtiff_encode(src, 0)
    got = decode_tiff(payload)
    assert np.array_equal(got, src)


@requires_libtiff
def test_libtiff_lzw_predictor2_gray_decodes_bit_exact():
    src = _grad(16, 29, 1)
    payload = _libtiff_encode(src, 2)
    got = decode_tiff(payload)  # gray expands to 3 equal channels
    assert got.shape == (16, 29, 3)
    for c in range(3):
        assert np.array_equal(got[:, :, c], src[:, :, 0])


# ---------------- our TIFF encoder -> libtiff reader ----------------

def _tiff_getfield_u32(tif, tag: int) -> int:
    gf = _libtiff.TIFFGetField
    gf.restype = ctypes.c_int
    out = ctypes.c_uint32(0)
    assert gf(tif, ctypes.c_uint32(tag), ctypes.byref(out)) == 1
    return out.value


def _libtiff_read_scanlines(payload: bytes):
    """Read a (strip-based) TIFF with libtiff: returns (h, w, spp,
    bits, rows) where rows[y] is the DECODED scanline bytes (libtiff
    has applied decompression, predictor, and fax decoding)."""
    _libtiff.TIFFSetErrorHandler(None)
    _libtiff.TIFFSetWarningHandler(None)
    _libtiff.TIFFOpen.restype = ctypes.c_void_p
    _libtiff.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.write(fd, payload)
    os.close(fd)
    try:
        tif = ctypes.c_void_p(_libtiff.TIFFOpen(path.encode(), b"r"))
        assert tif, "libtiff refused to open our TIFF"
        w = _tiff_getfield_u32(tif, 256)
        h = _tiff_getfield_u32(tif, 257)
        ssize = _libtiff.TIFFScanlineSize(tif)
        rs = _libtiff.TIFFReadScanline
        rs.restype = ctypes.c_int
        rs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_uint16,
        ]
        rows = []
        for y in range(h):
            buf = ctypes.create_string_buffer(ssize)
            assert rs(tif, buf, y, 0) == 1, f"libtiff scanline {y}"
            rows.append(buf.raw)
        _libtiff.TIFFClose.argtypes = [ctypes.c_void_p]
        _libtiff.TIFFClose(tif)
        return h, w, rows
    finally:
        os.unlink(path)


@requires_libtiff
@pytest.mark.parametrize(
    "compression,predictor,big_endian",
    [
        (5, 1, False),   # LZW
        (5, 2, False),   # LZW + horizontal differencing
        (5, 2, True),    # LZW + predictor, big-endian container
        (8, 1, False),   # Adobe Deflate
        (8, 2, False),   # Deflate + predictor
        (32773, 1, False),  # PackBits
    ],
)
def test_our_compressed_tiff_reads_back_through_libtiff(
    compression, predictor, big_endian
):
    """Our §13 LZW (early-change), Deflate and §9 PackBits WRITERS,
    with and without predictor 2, decoded by the canonical libtiff
    implementation — a shared encode/decode misconception in our LZW
    pair cannot survive this."""
    src = _grad(17, 23, 3, k=compression % 7)
    payload = encode_tiff(
        src, photometric=2, big_endian=big_endian,
        rows_per_strip=5, compression=compression, predictor=predictor,
    )
    h, w, rows = _libtiff_read_scanlines(payload)
    assert (h, w) == (17, 23)
    got = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(17, 23, 3)
    assert np.array_equal(got, src)


def _fax_bitmap(h, w, k=0):
    """Deterministic bilevel page with fax-typical run structure."""
    yy = np.arange(h)[:, None]
    xx = np.arange(w)[None, :]
    return (((xx // (3 + (yy + k) % 5)) + yy // 2) % 2).astype(np.uint8)


@requires_libtiff
@pytest.mark.parametrize(
    "compression,t4_options",
    [
        (2, 0),  # CCITT MH (modified Huffman)
        (3, 0),  # G3 1-D
        (3, 1),  # G3 2-D
        (4, 0),  # G4 / MMR
    ],
)
def test_our_ccitt_fax_reads_back_through_libtiff(
    compression, t4_options
):
    """Our ITU-T T.4/T.6 fax ENCODER decoded by libtiff's own fax
    codec (the reference implementation every fax TIFF in the wild is
    read with). Photometric 0 (WhiteIsZero): bitmap 1 = black.

    The T.4 §2.2.5 UNCOMPRESSED-mode variants are deliberately absent:
    libtiff's fax decoder does not implement that optional extension
    (Fax3Decode1D reports "Bad code word" at the 0000001111 entry
    codeword — verified on this box, libtiff 6.0) — those encodings
    are certified against the spec grid (ccitt items 48-71) and our
    own decoder instead."""
    bm = _fax_bitmap(20, 41, k=compression)
    payload = encode_tiff(
        bm, photometric=0, compression=compression,
        t4_options=t4_options,
    )
    h, w, rows = _libtiff_read_scanlines(payload)
    assert (h, w) == (20, 41)
    packed = np.frombuffer(b"".join(rows), dtype=np.uint8)
    stride = (41 + 7) // 8
    bits = np.unpackbits(packed.reshape(20, stride), axis=1)[:, :41]
    assert np.array_equal(bits, bm)


@requires_libtiff
@pytest.mark.parametrize("compression,predictor", [(5, 2), (8, 1)])
def test_our_tiled_tiff_reads_back_through_libtiff(compression, predictor):
    """encode_tiff's §15 TILED layout (tags 322-325, edge tiles padded
    by replication) read tile-by-tile with TIFFReadEncodedTile — the
    reference reader must reassemble our 37x53 image from 16x16 tiles
    bit-exactly under LZW+predictor and Deflate."""
    src = _grad(37, 53, 3, k=compression)
    payload = encode_tiff(
        src, tile=(16, 16), compression=compression, predictor=predictor
    )
    _libtiff.TIFFSetErrorHandler(None)
    _libtiff.TIFFSetWarningHandler(None)
    _libtiff.TIFFOpen.restype = ctypes.c_void_p
    _libtiff.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.write(fd, payload)
    os.close(fd)
    try:
        tif = ctypes.c_void_p(_libtiff.TIFFOpen(path.encode(), b"r"))
        assert tif, "libtiff refused our tiled TIFF"
        w, h = _tiff_getfield_u32(tif, 256), _tiff_getfield_u32(tif, 257)
        tw, th = _tiff_getfield_u32(tif, 322), _tiff_getfield_u32(tif, 323)
        assert (h, w, tw, th) == (37, 53, 16, 16)
        _libtiff.TIFFTileSize.restype = ctypes.c_long
        tsize = _libtiff.TIFFTileSize(tif)
        _libtiff.TIFFComputeTile.restype = ctypes.c_uint32
        ret = _libtiff.TIFFReadEncodedTile
        ret.restype = ctypes.c_long
        ret.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
            ctypes.c_long,
        ]
        out = np.zeros((37, 53, 3), np.uint8)
        for ty in range(0, 37, 16):
            for tx in range(0, 53, 16):
                idx = _libtiff.TIFFComputeTile(
                    tif, ctypes.c_uint32(tx), ctypes.c_uint32(ty), 0, 0
                )
                buf = ctypes.create_string_buffer(tsize)
                n = ret(tif, idx, buf, tsize)
                assert n > 0, (tx, ty)
                t = np.frombuffer(buf.raw[:n], np.uint8).reshape(16, 16, 3)
                hh, ww = min(16, 37 - ty), min(16, 53 - tx)
                out[ty:ty + hh, tx:tx + ww] = t[:hh, :ww]
        _libtiff.TIFFClose.argtypes = [ctypes.c_void_p]
        _libtiff.TIFFClose(tif)
    finally:
        os.unlink(path)
    assert np.array_equal(out, src)


@requires_libtiff
def test_our_multipage_tiff_walks_through_libtiff():
    """encode_tiff_multipage's IFD chain walked by libtiff's
    TIFFReadDirectory: every page's scanlines decode bit-exactly and
    the chain ends exactly at page count."""
    pages = [_grad(7 + p, 11 + 2 * p, 3, k=p) for p in range(3)]
    payload = encode_tiff_multipage(pages, compression=5, predictor=2)
    _libtiff.TIFFSetErrorHandler(None)
    _libtiff.TIFFSetWarningHandler(None)
    _libtiff.TIFFOpen.restype = ctypes.c_void_p
    _libtiff.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.write(fd, payload)
    os.close(fd)
    try:
        tif = ctypes.c_void_p(_libtiff.TIFFOpen(path.encode(), b"r"))
        assert tif, "libtiff refused our multi-page TIFF"
        rs = _libtiff.TIFFReadScanline
        rs.restype = ctypes.c_int
        rs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_uint16,
        ]
        for p, src in enumerate(pages):
            w = _tiff_getfield_u32(tif, 256)
            h = _tiff_getfield_u32(tif, 257)
            assert (h, w) == src.shape[:2], f"page {p} dims"
            ssize = _libtiff.TIFFScanlineSize(tif)
            rows = []
            for y in range(h):
                buf = ctypes.create_string_buffer(ssize)
                assert rs(tif, buf, y, 0) == 1, f"page {p} row {y}"
                rows.append(buf.raw)
            got = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(
                h, w, 3
            )
            assert np.array_equal(got, src), f"page {p} pixels"
            has_next = _libtiff.TIFFReadDirectory(tif)
            assert has_next == (1 if p < len(pages) - 1 else 0), p
        _libtiff.TIFFClose.argtypes = [ctypes.c_void_p]
        _libtiff.TIFFClose(tif)
    finally:
        os.unlink(path)


# ---------------- our GIF encoder -> giflib reader ----------------
#
# giflib struct layout per gif_lib.h (GIFLIB 5 ABI, libgif.so.7):
# GifWord is int; DGifSlurp stores RasterBits already DE-interlaced
# (verified empirically — an interlaced frame's raster equals the
# display-order image, not the file pass order).

_GifWord = ctypes.c_int


class _GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(_GifColorType))]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", _GifWord), ("Top", _GifWord),
                ("Width", _GifWord), ("Height", _GifWord),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(_ColorMapObject))]


class _ExtensionBlock(ctypes.Structure):
    _fields_ = [("ByteCount", ctypes.c_int),
                ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                ("Function", ctypes.c_int)]


class _SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock))]


class _GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", _GifWord), ("SHeight", _GifWord),
                ("SColorResolution", _GifWord),
                ("SBackGroundColor", _GifWord),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(_ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", _GifImageDesc),
                ("SavedImages", ctypes.POINTER(_SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock)),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


_GIF_INPUT_FUNC = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(_GifFileType),
    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
)


def _giflib_slurp(payload: bytes):
    """Decode a whole GIF with giflib (DGifOpen + DGifSlurp over an
    in-memory read callback): returns (screen_w, screen_h,
    global_palette, frames) with frames = [(left, top, index_array,
    local_palette|None)] in display row order."""
    pos = [0]

    def read(_gif, buf, n):
        take = payload[pos[0]: pos[0] + n]
        ctypes.memmove(buf, take, len(take))
        pos[0] += len(take)
        return len(take)

    cb = _GIF_INPUT_FUNC(read)
    err = ctypes.c_int(0)
    _libgif.DGifOpen.restype = ctypes.POINTER(_GifFileType)
    _libgif.DGifOpen.argtypes = [
        ctypes.c_void_p, _GIF_INPUT_FUNC, ctypes.POINTER(ctypes.c_int),
    ]
    g = _libgif.DGifOpen(None, cb, ctypes.byref(err))
    assert g, f"DGifOpen failed: error {err.value}"
    _libgif.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
    assert _libgif.DGifSlurp(g) == 1, (
        f"DGifSlurp failed: error {g.contents.Error}"
    )
    gf = g.contents

    def pal_of(cmp_):
        if not cmp_:
            return None
        cm = cmp_.contents
        return np.array(
            [[cm.Colors[i].Red, cm.Colors[i].Green, cm.Colors[i].Blue]
             for i in range(cm.ColorCount)],
            np.uint8,
        )

    gpal = pal_of(gf.SColorMap)
    frames = []
    for fi in range(gf.ImageCount):
        si = gf.SavedImages[fi]
        d = si.ImageDesc
        raster = np.ctypeslib.as_array(
            si.RasterBits, shape=(d.Height * d.Width,)
        ).reshape(d.Height, d.Width).copy()
        frames.append((d.Left, d.Top, raster, pal_of(d.ColorMap)))
    out = (gf.SWidth, gf.SHeight, gpal, frames)
    _libgif.DGifCloseFile.argtypes = [
        ctypes.POINTER(_GifFileType), ctypes.POINTER(ctypes.c_int),
    ]
    _libgif.DGifCloseFile(g, ctypes.byref(err))
    return out


@requires_libgif
@pytest.mark.parametrize("n_colors", [2, 5, 16, 256])
def test_our_gif_reads_back_through_giflib(n_colors):
    """Our variable-width LSB-first GIF-LZW writer decoded by giflib
    (the reference GIF implementation) across palette sizes that
    exercise LZW minimum code sizes 2..8 — indices and palette
    bit-exact."""
    pal = _grad(1, n_colors, 3, k=n_colors)[0]
    idx = _grad(14, 23, 1, mod=n_colors, k=1)[:, :, 0]
    w, h, gpal, frames = _giflib_slurp(encode_gif(idx, pal))
    assert (w, h) == (23, 14)
    assert np.array_equal(gpal[:n_colors], pal)
    left, top, raster, lpal = frames[0]
    assert (left, top, lpal) == (0, 0, None)
    assert np.array_equal(raster, idx)


@requires_libgif
def test_our_interlaced_gif_reads_back_through_giflib():
    """4-pass interlaced frame: giflib's slurped raster is display
    order, so bit-equality certifies our pass writer end to end."""
    pal = _grad(1, 8, 3)[0]
    idx = _grad(11, 17, 1, mod=8, k=2)[:, :, 0]
    _w, _h, _gpal, frames = _giflib_slurp(
        encode_gif(idx, pal, interlace=True)
    )
    assert np.array_equal(frames[0][2], idx)


@requires_libgif
def test_our_animated_gif_reads_back_through_giflib():
    """GIF89a animation: per-frame geometry (offsets, sub-screen
    frames), transparency and disposal extensions present — every
    frame's indices decode bit-exactly and placement survives."""
    pal = _grad(1, 8, 3)[0]
    f0 = _grad(9, 13, 1, mod=8, k=3)[:, :, 0]
    f1 = _grad(4, 5, 1, mod=8, k=4)[:, :, 0]
    payload = encode_gif(
        [f0, f1], pal, delays_ms=[100, 50], transparent=3,
        disposals=[0, 2], offsets=[(0, 0), (2, 3)],
    )
    w, h, _gpal, frames = _giflib_slurp(payload)
    assert (w, h) == (13, 9)
    assert np.array_equal(frames[0][2], f0)
    left, top, raster, _ = frames[1]
    assert (top, left) == (2, 3)
    assert np.array_equal(raster, f1)


@requires_libtiff
def test_our_gray_tiff_reads_back_through_libtiff():
    src = _grad(13, 31, 1)
    payload = encode_tiff(
        src[:, :, 0], photometric=1, compression=5, predictor=2
    )
    h, w, rows = _libtiff_read_scanlines(payload)
    assert (h, w) == (13, 31)
    got = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(13, 31)
    assert np.array_equal(got, src[:, :, 0])
