"""GIF codec: LZW roundtrip, interlace, transparency, animation
compositing with all disposal methods, and malformed-payload gates.
Pure-Python tests (no Spark) — the Spark-side certification is the
`gif_roundtrip` section of `multimodal_media_ops`."""

import struct

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _pal(n: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (n, 3), dtype=np.uint8)


def test_lzw_roundtrip_widths_and_reset():
    rng = np.random.default_rng(1)
    for mcs in (2, 4, 8):
        nsym = 1 << mcs
        # long enough to force width growth; repetitive enough to
        # exercise dictionary hits; long tail to hit the 4096 reset
        data = bytes(rng.integers(0, nsym, 9000, dtype=np.uint8))
        data += data[:4000]
        out = _lzw_decode(_lzw_encode(data, mcs), mcs, len(data))
        assert out == data


def test_lzw_kwkwk_case():
    # 'ababab...' style input is the classic KwKwK trigger
    data = bytes([0, 1] * 300 + [0] * 5)
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data


def test_still_roundtrip_exact():
    rng = np.random.default_rng(3)
    for n_colors, w, h in ((2, 5, 3), (16, 31, 17), (256, 64, 40)):
        pal = _pal(n_colors)
        idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
        payload = encode_gif(idx, pal)
        frames, delays = decode_gif(payload)
        assert frames.shape == (1, h, w, 4)
        assert (frames[0, :, :, :3] == pal[idx]).all()
        assert (frames[0, :, :, 3] == 255).all()
        assert delays == [0]
    # 87a for a plain still, 89a once transparency is in play
    assert encode_gif(idx, pal)[:6] == b"GIF87a"
    assert encode_gif(idx, pal, transparent=0)[:6] == b"GIF89a"


def test_interlaced_roundtrip():
    rng = np.random.default_rng(4)
    for h in (1, 2, 7, 8, 33):
        idx = rng.integers(0, 64, (h, 13), dtype=np.uint8)
        pal = _pal(64)
        frames, _ = decode_gif(encode_gif(idx, pal, interlace=True))
        assert (frames[0, :, :, :3] == pal[idx]).all()


def test_transparency_composites_over_canvas():
    pal = _pal(4)
    base = np.zeros((6, 6), dtype=np.uint8)
    over = np.full((6, 6), 3, dtype=np.uint8)
    over[2:4, 2:4] = 1  # index 1 will be declared transparent
    frames, _ = decode_gif(
        encode_gif([base, over], pal, transparent=1, delays_ms=[20, 30])
    )
    assert frames.shape[0] == 2
    # frame 2: transparent pixels show frame-1 canvas underneath
    assert (frames[1, 2:4, 2:4, :3] == pal[0]).all()
    assert (frames[1, 0, 0, :3] == pal[3]).all()


def test_animation_disposals_and_offsets():
    pal = _pal(8)
    f0 = np.zeros((8, 8), dtype=np.uint8)
    patch = np.full((3, 3), 5, dtype=np.uint8)
    # disposal 2 on the patch: its rect reverts to transparent after
    payload = encode_gif(
        [f0, patch, patch],
        pal,
        delays_ms=[10, 10, 10],
        disposals=[1, 2, 3],
        offsets=[(0, 0), (1, 1), (4, 4)],
    )
    frames, delays = decode_gif(payload)
    assert frames.shape == (3, 8, 8, 4)
    assert delays == [10, 10, 10]
    # frame 1: patch drawn over f0 at (1,1)
    assert (frames[1, 1:4, 1:4, :3] == pal[5]).all()
    assert (frames[1, 0, 0, :3] == pal[0]).all()
    # frame 2: disposal-2 cleared (1,1) rect to TRANSPARENT alpha 0,
    # new patch at (4,4)
    assert (frames[2, 1:4, 1:4, 3] == 0).all()
    assert (frames[2, 4:7, 4:7, :3] == pal[5]).all()


def test_sub_block_spanning_payload():
    # >255 compressed bytes forces multiple data sub-blocks
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    pal = _pal(256)
    frames, _ = decode_gif(encode_gif(idx, pal))
    assert (frames[0, :, :, :3] == pal[idx]).all()


def test_malformed_gates():
    pal = _pal(4)
    idx = np.zeros((4, 4), dtype=np.uint8)
    good = bytearray(encode_gif(idx, pal))
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + bytes(good[6:]))
    with pytest.raises(ValueError):
        decode_gif(bytes(good[:-1]))  # trailer gone
    # truncate inside the LZW stream
    with pytest.raises(ValueError):
        decode_gif(bytes(good[: len(good) - 4]))
    # frame rectangle escaping the logical screen
    bad = bytearray(good)
    # image descriptor starts right after header+LSD+GCT(4->4 entries)
    desc = bad.index(0x2C, 13)
    struct.pack_into("<H", bad, desc + 1, 1000)  # left = 1000
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))
    with pytest.raises(ValueError):
        encode_gif(np.full((2, 2), 9, dtype=np.uint8), pal)  # idx > pal


def test_large_palette_deep_lzw():
    # 256-color noise image: codes reach 12-bit width and the table cap
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 256, (100, 100), dtype=np.uint8)
    pal = _pal(256)
    frames, _ = decode_gif(encode_gif(idx, pal))
    assert (frames[0, :, :, :3] == pal[idx]).all()
