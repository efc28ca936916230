"""Derived media-feature passes over the stored fixture
(`audio_features` / `image_preprocess` sections of
multimodal_media_ops): the production decode+feature path must agree
with the INDEPENDENT oracle streams (closed forms for PCM/FLAC pixels
and samples, textbook scalar reference decoders for ADPCM) on every
committed payload — no Spark session needed, the kernels' math is
checked directly."""

import numpy as np
import pytest

from twilio_event_streams_reporting_example_spark.operators import (
    multimodal as M,
)


@pytest.fixture(scope="module")
def fixture_rows():
    return {r[0]: r for r in M.media_fixture_rows()}


def test_audio_features_match_independent_streams(fixture_rows):
    ids = M._audio_item_ids()
    assert len(ids) == 40  # 10 each: wav, ima, ms, flac
    for j in ids:
        kind = (
            "flac" if j >= M._STORED_FLAC_FROM else M._STORED_KINDS[j % 5]
        )
        payload = fixture_rows[j][2]
        if kind == "flac":
            decoded, _, _ = M.decode_real_media(payload, "audio/flac")
        else:
            decoded, _ = M.decode_real_media(payload, "audio/wav")
        x = decoded[:, 0].astype(np.int64)
        got = (
            int(np.abs(x).sum()),
            int(((x[:-1] * x[1:]) < 0).sum()),
            int(np.abs(x).max()),
        )
        assert got == tuple(M._audio_feat_formula(j)), (j, kind)


def test_image_preprocess_matches_closed_form(fixture_rows):
    ids = M._image_item_ids()
    assert len(ids) == 20  # 10 bmp + 10 png
    p = M._PREPROC_PATCH
    for j in ids:
        kind = M._STORED_KINDS[j % 5]
        img = M.decode_real_media(fixture_rows[j][2], f"image/{kind}")
        h, w = img.shape[:2]
        s = min(w, h)
        x0, y0 = (w - s) // 2, (h - s) // 2
        crop = img[y0 : y0 + s, x0 : x0 + s]
        idx = np.arange(p) * s // p
        patch = crop[idx][:, idx].astype(np.int64)
        gray = (
            77 * patch[..., 0] + 150 * patch[..., 1] + 29 * patch[..., 2]
        ) >> 8
        got = (
            int(gray.sum()),
            int(gray[p // 2, p // 2]),
            s * 1_000_000 + w * 1000 + h,
        )
        assert got == tuple(M._image_preproc_formula(j)), (j, kind)


def test_audio_stream_zero_crossings_sane():
    """The zero-crossing feature must actually fire: the closed-form
    signals oscillate around zero, so every audio item has > 0
    crossings (a dead feature would silently certify nothing) — except
    the FLAC constant-subframe clips, whose flat signal correctly has
    none (and which thereby pin the zc=0 edge)."""
    flat = 0
    for j in M._audio_item_ids():
        zc = M._audio_feat_formula(j)[1]
        if j >= M._STORED_FLAC_FROM and M._flac_stream_spec(
            j - M._STORED_FLAC_FROM
        )[6] == "constant":
            flat += 1
            continue
        assert zc > 0, j
    assert flat >= 1  # the zc=0 edge is represented


def test_probe_audio_metadata_routes_flac():
    payload, _sig = M._flac_item(3)
    meta = M.probe_audio_metadata(payload)
    assert meta["format"] == "flac"
    spec = M._flac_stream_spec(3)
    assert meta["channels"] == spec[0]
    assert meta["bits"] == spec[1]
    assert meta["total_samples"] == spec[3]
    assert meta["sample_rate"] == spec[4]


def test_probe_audio_metadata_still_walks_mpeg():
    meta = M.probe_audio_metadata(M.build_mp3([128, 128]))
    assert meta["format"] == "mp3" and meta["n_frames"] == 2
