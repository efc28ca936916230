"""MJPEG-in-AVI container: walk, index validation, probe, and the
cross-checks against header claims. (The Spark-side certification is
the `avi_mjpeg` section of `multimodal_media_ops`.)"""

import struct

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    encode_avi_mjpeg_from_arrays,
    probe_avi_metadata,
)
from twilio_event_streams_reporting_example_spark.operators.jpeg import (
    encode_jpeg,
)


def _flat_frames(n, h, w, seed=0):
    fr = np.zeros((n, h, w, 3), dtype=np.uint8)
    for f in range(n):
        for by in range(h // 8):
            for bx in range(w // 8):
                fr[f, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    (seed + f * 19 + bx * 17 + by * 29) % 256,
                    (seed + f * 7 + bx * 11) % 256,
                    (seed + f * 11 + by * 31) % 256,
                )
    return fr


def test_probe_reads_headers_without_decoding():
    fr = _flat_frames(4, 16, 24, seed=3)
    payload = encode_avi_mjpeg_from_arrays(fr, fps=30)
    meta = probe_avi_metadata(payload)
    assert meta["format"] == "avi"
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["n_frames"] == 4 and meta["n_streams"] == 1
    assert meta["stream_type"] == "vids"
    assert meta["handler"] == "MJPG" and meta["compression"] == "MJPG"
    assert meta["stream_fps"] == 30.0


def test_decode_returns_all_frames_in_order():
    fr = _flat_frames(5, 8, 16, seed=9)
    decoded, fps = decode_avi_mjpeg(
        encode_avi_mjpeg_from_arrays(fr, fps=25)
    )
    assert decoded.shape == (5, 8, 16, 3)
    assert fps == 25.0
    # frames differ pairwise, so a frame-order slip would show
    for a in range(5):
        for b in range(a + 1, 5):
            assert not np.array_equal(decoded[a], decoded[b])


def test_odd_sized_jpeg_chunks_get_pad_bytes():
    # JPEG payload lengths are frequently odd; RIFF requires chunks
    # padded to even — decode must still find every subsequent chunk
    payloads = []
    for seed in range(64):
        p = encode_jpeg(_flat_frames(1, 16, 16, seed=3 * seed + 1)[0])
        if len(p) % 2:
            payloads.append(p)
        if len(payloads) == 3:
            break
    assert len(payloads) == 3, "no odd-length JPEG found in 64 seeds"
    decoded, _ = decode_avi_mjpeg(encode_avi_mjpeg(payloads, 16, 16, 24))
    assert decoded.shape == (3, 16, 16, 3)
    # frames must be distinct (different seeds), proving the walk
    # didn't resync onto garbage after an unpadded boundary
    assert not np.array_equal(decoded[0], decoded[1])


def test_avih_frame_count_mismatch_detected():
    fr = _flat_frames(2, 8, 8)
    payload = bytearray(encode_avi_mjpeg_from_arrays(fr, fps=30))
    i = payload.find(b"avih")
    # dwTotalFrames is the 5th dword of the avih body (offset 8+16)
    payload[i + 8 + 16 : i + 8 + 20] = struct.pack("<I", 7)
    with pytest.raises(ValueError, match="claims 7 frames"):
        decode_avi_mjpeg(bytes(payload))


def test_idx1_offset_mismatch_detected():
    fr = _flat_frames(2, 8, 8)
    payload = bytearray(encode_avi_mjpeg_from_arrays(fr, fps=30))
    i = payload.find(b"idx1")
    # corrupt the first entry's dwChunkOffset (entry: ckid, flags, off, len)
    payload[i + 16 : i + 20] = struct.pack("<I", 9999)
    with pytest.raises(ValueError, match="idx1 offset"):
        decode_avi_mjpeg(bytes(payload))


def test_non_mjpg_stream_rejected_clearly():
    fr = _flat_frames(2, 8, 8)
    payload = bytearray(encode_avi_mjpeg_from_arrays(fr, fps=30))
    for _ in range(2):  # strh handler + strf biCompression
        i = payload.find(b"MJPG")
        payload[i : i + 4] = b"H264"
    with pytest.raises(ValueError, match="codec runtime"):
        decode_avi_mjpeg(bytes(payload))


def test_frame_dims_must_match_header():
    fr = _flat_frames(2, 8, 8)
    payloads = [encode_jpeg(fr[k]) for k in range(2)]
    bad = encode_avi_mjpeg(payloads, 16, 8, 30)  # header says w=16
    with pytest.raises(ValueError, match="dimensions disagree"):
        decode_avi_mjpeg(bad)


def test_truncated_container_raises():
    fr = _flat_frames(2, 8, 8)
    payload = encode_avi_mjpeg_from_arrays(fr, fps=30)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(payload[: len(payload) // 2])


def test_hand_assembled_minimal_container_decodes():
    """Container built field-by-field here (not via encode_avi_mjpeg)
    so the decoder's walk is exercised against independent bytes."""
    jf = encode_jpeg(np.full((8, 8, 3), 200, dtype=np.uint8))

    def chunk(cc, body):
        return cc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    avih = struct.pack("<14I", 40000, 0, 0, 0, 1, 0, 1, 0, 8, 8, 0, 0, 0, 0)
    strh = b"vidsMJPG" + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, 25, 0, 1, 0, 0, 0, 0, 0, 8, 8
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 8, 8, 1, 24, b"MJPG", 192, 0, 0, 0, 0)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jf))
    body = b"AVI " + hdrl + movi  # no idx1: index is optional
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    frames, fps = decode_avi_mjpeg(payload)
    assert frames.shape == (1, 8, 8, 3)
    assert fps == 25.0
    assert probe_avi_metadata(payload)["fps"] == 25.0


def test_strided_decode_picks_exactly_sampled_frames():
    from twilio_event_streams_reporting_example_spark.operators.avi import (
        decode_avi_mjpeg_strided,
    )

    fr = _flat_frames(5, 8, 16, seed=21)
    payload = encode_avi_mjpeg_from_arrays(fr, fps=30)
    full, _ = decode_avi_mjpeg(payload)
    sampled, picked, fps = decode_avi_mjpeg_strided(payload, 2)
    assert picked == [0, 2, 4]
    assert fps == 30.0
    assert np.array_equal(sampled, full[::2])
    # stride 1 degenerates to the full decode
    all_frames, picked1, _ = decode_avi_mjpeg_strided(payload, 1)
    assert picked1 == [0, 1, 2, 3, 4]
    assert np.array_equal(all_frames, full)


def test_strided_decode_movi_fallback_without_idx1():
    from twilio_event_streams_reporting_example_spark.operators.avi import (
        decode_avi_mjpeg_strided,
    )

    fr = _flat_frames(4, 8, 8, seed=2)
    payload = bytearray(encode_avi_mjpeg_from_arrays(fr, fps=25))
    i = payload.find(b"idx1")
    # rename idx1 to a junk chunk so the walk must fall back to movi
    payload[i : i + 4] = b"JUNK"
    full, _ = decode_avi_mjpeg(bytes(payload))
    sampled, picked, _ = decode_avi_mjpeg_strided(bytes(payload), 3)
    assert picked == [0, 3]
    assert np.array_equal(sampled, full[::3])


def test_pcm_audio_stream_roundtrips_interleaved():
    from twilio_event_streams_reporting_example_spark.operators.avi import (
        decode_avi_streams,
    )

    fr = _flat_frames(4, 8, 8, seed=6)
    t = np.arange(777, dtype=np.int64)
    pcm = np.stack(
        [(t * t % 4001 - 2000), (3 * t % 4001 - 2000)], axis=1
    ).astype(np.int16)
    payload = encode_avi_mjpeg_from_arrays(
        fr, fps=30, audio=pcm, audio_rate=22050
    )
    assert probe_avi_metadata(payload)["n_streams"] == 2
    frames, fps, audio, rate = decode_avi_streams(payload)
    assert frames.shape == (4, 8, 8, 3) and fps == 30.0
    assert rate == 22050
    assert np.array_equal(audio, pcm)
    # the video-only paths must skip the 01wb chunks untroubled
    v, _ = decode_avi_mjpeg(payload)
    assert v.shape == (4, 8, 8, 3)


def test_compressed_audio_stream_rejected():
    from twilio_event_streams_reporting_example_spark.operators.avi import (
        decode_avi_streams,
    )

    fr = _flat_frames(2, 8, 8)
    pcm = np.zeros(100, dtype=np.int16)
    payload = bytearray(
        encode_avi_mjpeg_from_arrays(fr, fps=30, audio=pcm)
    )
    # flip wFormatTag (first WORD of the auds strf) from 1 to 0x55 (MP3)
    i = payload.find(b"auds")
    j = payload.find(b"strf", i)
    payload[j + 8 : j + 10] = struct.pack("<H", 0x55)
    with pytest.raises(ValueError, match="not PCM"):
        decode_avi_streams(bytes(payload))


def test_no_audio_file_returns_none_track():
    from twilio_event_streams_reporting_example_spark.operators.avi import (
        decode_avi_streams,
    )

    fr = _flat_frames(2, 8, 8)
    frames, fps, audio, rate = decode_avi_streams(
        encode_avi_mjpeg_from_arrays(fr, fps=30)
    )
    assert audio is None and rate == 0
