"""Dependency-free ADPCM codecs: IMA (WAV tag 0x11) and MS (tag 0x02).

The last WAV gate the engine could close without a media runtime:
block-structured 4-bit IMA ADPCM, the compressed format classic
telephony/call-recording WAV archives actually use. Written from the
IMA "Recommended Practices for Enhancing Digital Audio Compatibility"
(rev 3.00, 1992) quantizer: 89-entry step table, 8-entry index
adaptation, sign+magnitude nibbles, per-block (predictor, step-index)
headers that make every block independently decodable.

Scale design: the recurrence is sequential *within* a block but blocks
are independent, so both directions vectorize across blocks — decode
loops ``samples_per_block`` times doing numpy ops over ALL blocks (and
channels) at once, never per-sample Python. A 100 TB audio corpus
decodes embarrassingly parallel inside Arrow-batched ``mapInPandas``
kernels with no shuffle; within one payload the cost is
O(samples_per_block) numpy steps regardless of block count.

Certified by the ``adpcm_roundtrip`` section of
``multimodal_media_ops``: nibble streams are generated closed-form
executor-side, wrapped in real RIFF containers, decoded back through
this vectorized path, and the channel sums must match a DuckDB oracle
computed at import time by an independent SCALAR reference decode
(`reference_decode_nibbles`) — a wrong step-table entry, clamp,
nibble order, or stereo interleave breaks the hash.

Reference parity note: the reference app (events.js) has no media
path; this module is engine LLM-data-pipeline surface, not a port.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA step-size table (89 entries) and index-adaptation table
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def samples_per_block(block_align: int, channels: int) -> int:
    """Samples per channel in one block: a 4-byte header sample plus
    two nibbles per remaining byte, per channel."""
    if block_align < 4 * channels or block_align % (4 * channels):
        raise ValueError("ADPCM block_align must be a multiple of 4*channels")
    return (block_align - 4 * channels) * 2 // channels + 1


def _step_nibbles(nib, pred, index):
    """One vectorized IMA step: arrays of nibbles / predictors /
    step-indices (any matching shape) → updated (pred, index).
    Integer-exact per the IMA practice (diff built from step>>3 plus
    conditional step>>2 / step>>1 / step terms)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    diff += np.where(nib & 1, step >> 2, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + INDEX_TABLE[nib & 7], 0, 88)
    return pred, index


def decode_blocks(data: bytes, block_align: int, channels: int) -> np.ndarray:
    """Vectorized IMA ADPCM block decode → (n_samples, channels) int16.

    Layout per block: one ``<hBB`` header per channel (initial
    predictor, step index, reserved), then 4-byte channel-interleaved
    nibble groups (8 samples per group per channel), low nibble first.
    """
    if len(data) == 0 or len(data) % block_align:
        raise ValueError("ADPCM data not a whole number of blocks")
    spb = samples_per_block(block_align, channels)
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, block_align)
    nb = blocks.shape[0]
    hdr = blocks[:, : 4 * channels].reshape(nb, channels, 4)
    pred = (
        hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8)
    ).astype(np.int16).astype(np.int32)  # little-endian int16 predictor
    index = hdr[:, :, 2].astype(np.int32)
    if (index > 88).any():
        raise ValueError("ADPCM step index beyond table")
    body = blocks[:, 4 * channels :].reshape(nb, -1, channels, 4)
    # (nb, groups, ch, 4 bytes) → 8 nibbles per group, low nibble first
    nibs = np.empty(body.shape[:3] + (8,), dtype=np.uint8)
    nibs[..., 0::2] = body & 0x0F
    nibs[..., 1::2] = body >> 4
    nibs = nibs.reshape(nb, -1, channels, 8).transpose(0, 2, 1, 3)
    nibs = nibs.reshape(nb, channels, spb - 1)
    out = np.empty((nb, channels, spb), dtype=np.int16)
    out[:, :, 0] = pred.astype(np.int16)
    for t in range(spb - 1):
        pred, index = _step_nibbles(nibs[:, :, t].astype(np.int32), pred, index)
        out[:, :, t + 1] = pred.astype(np.int16)
    # (nb, ch, spb) → (nb*spb, ch)
    return out.transpose(0, 2, 1).reshape(-1, channels)


def encode_blocks(
    samples: np.ndarray, block_align: int
) -> tuple[bytes, int]:
    """Vectorized IMA ADPCM encode → (block bytes, n_samples_encoded).

    ``samples``: (N, channels) int16. N is padded (by repeating the
    last sample) up to a whole number of blocks; the true count is
    returned for the ``fact`` chunk. Encoder state follows the decoder
    exactly (predict-with-reconstructed), so decode(encode(x)) is the
    canonical quantization of x.
    """
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if n == 0:
        raise ValueError("ADPCM encode needs at least one sample")
    spb = samples_per_block(block_align, channels)
    nb = -(-n // spb)
    pad = nb * spb - n
    if pad:
        samples = np.concatenate([samples, np.repeat(samples[-1:], pad, 0)])
    s = samples.reshape(nb, spb, channels).transpose(0, 2, 1).astype(np.int32)
    pred = s[:, :, 0].copy()
    index = np.zeros((nb, channels), dtype=np.int32)
    # warm-start the step index from the first real delta so the
    # quantizer is in range immediately (any index is decodable; this
    # just improves quality)
    if spb > 1:
        d0 = np.abs(s[:, :, 1] - s[:, :, 0])
        index = np.searchsorted(STEP_TABLE, np.minimum(d0, 32767)).clip(0, 88)
    hdr_index = index.copy()
    nibs = np.empty((nb, channels, spb - 1), dtype=np.uint8)
    for t in range(spb - 1):
        step = STEP_TABLE[index]
        diff = s[:, :, t + 1] - pred
        sign = (diff < 0).astype(np.int32)
        mag = np.abs(diff)
        # 3-bit magnitude quantization mirroring the decoder's terms
        code = np.zeros_like(mag)
        code |= np.where(mag >= step, 4, 0)
        mag -= np.where(mag >= step, step, 0)
        code |= np.where(mag >= step >> 1, 2, 0)
        mag -= np.where(mag >= step >> 1, step >> 1, 0)
        code |= np.where(mag >= step >> 2, 1, 0)
        nib = (code | (sign << 3)).astype(np.int32)
        pred, index = _step_nibbles(nib, pred, index)
        nibs[:, :, t] = nib.astype(np.uint8)
    # pack: per block, per channel header then channel-interleaved
    # 4-byte groups of 8 nibbles (low nibble first)
    hdr = np.zeros((nb, channels, 4), dtype=np.uint8)
    p0 = s[:, :, 0].astype(np.int16)
    hdr[:, :, 0] = (p0 & 0xFF).astype(np.uint8)
    hdr[:, :, 1] = ((p0.astype(np.int32) >> 8) & 0xFF).astype(np.uint8)
    hdr[:, :, 2] = hdr_index.astype(np.uint8)
    g = nibs.reshape(nb, channels, -1, 8)
    body = (g[..., 0::2] | (g[..., 1::2] << 4)).astype(np.uint8)
    body = body.transpose(0, 2, 1, 3).reshape(nb, -1)
    blocks = np.concatenate([hdr.reshape(nb, -1), body], axis=1)
    return blocks.tobytes(), n


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 1024
) -> bytes:
    """Wrap IMA-ADPCM-encoded samples in a real RIFF/WAVE container:
    fmt tag 0x11 with the 2-byte samples-per-block extension and the
    spec-required ``fact`` chunk carrying the true sample count."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data, n = encode_blocks(samples, block_align)
    spb = samples_per_block(block_align, channels)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, byte_rate,
        block_align, 4, 2, spb,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm_payload(payload: bytes):
    """RIFF/WAVE container parse for format tag 0x11 → ((N, ch) int16,
    sample_rate). Word-aligned chunk walk (mirrors
    ``multimodal.decode_wav``, which delegates here on tag 0x11); the
    ``fact`` chunk's sample count trims encoder padding."""
    if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_n = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = bytes(payload[pos : pos + 4])
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif tag == b"data":
            data = bytes(payload[pos + 8 : pos + 8 + ln])
        elif tag == b"fact" and ln >= 4:
            (fact_n,) = struct.unpack_from("<I", payload, pos + 8)
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _byte_rate, block_align, bits = fmt
    if audio_fmt != 0x11 or bits != 4:
        raise ValueError("not a 4-bit IMA ADPCM (tag 0x11) payload")
    arr = decode_blocks(data, block_align, ch)
    if fact_n is not None:
        if fact_n > arr.shape[0]:
            raise ValueError("WAV fact count beyond decoded samples")
        arr = arr[:fact_n]
    return arr, rate


# --------------------------- MS ADPCM (tag 0x02) -------------------------
#
# Written from the public Microsoft WAVE specification ("Multimedia
# Programming Interface and Data Specifications 1.0" / mmreg.h
# ADPCMWAVEFORMAT): 7 built-in 2-tap linear predictors, a 16-entry
# delta-adaptation table, per-(block, channel) headers carrying the
# predictor index, the initial delta, and the two seed samples, and
# 4-bit two's-complement nibbles stored HIGH nibble first (the opposite
# order from IMA), channel-interleaved nibble-by-nibble for stereo.
# Custom coefficient pairs may be declared in the fmt extension; the
# decoder honours them (bPredictor indexes the declared table).

MS_COEF1 = np.array([256, 512, 0, 192, 240, 460, 392], dtype=np.int64)
MS_COEF2 = np.array([0, -256, 0, 64, 0, -208, -232], dtype=np.int64)
MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307,
     230, 230, 230],
    dtype=np.int64,
)


def ms_samples_per_block(block_align: int, channels: int) -> int:
    """Samples per channel per MS ADPCM block: two header seed samples
    plus two nibbles per body byte split across channels."""
    body = block_align - 7 * channels
    if body < 0 or (body * 2) % channels:
        raise ValueError("MS ADPCM block_align inconsistent with channels")
    return body * 2 // channels + 2


def _ms_step(nib, s1, s2, delta, c1, c2):
    """One vectorized MS ADPCM step over arrays of any matching shape:
    (unsigned nibble, samp1, samp2, delta, per-stream coef1/coef2) →
    (sample, new_samp1, new_samp2, new_delta). int64 throughout — the
    predictor product can exceed 32 bits before the >>8."""
    pred = (s1 * c1 + s2 * c2) >> 8
    signed = np.where(nib >= 8, nib - 16, nib)
    samp = np.clip(pred + delta * signed, -32768, 32767)
    new_delta = np.maximum((MS_ADAPT[nib] * delta) >> 8, 16)
    return samp, samp, s1, new_delta


def decode_ms_blocks(
    data: bytes, block_align: int, channels: int, coef_pairs=None
) -> np.ndarray:
    """Vectorized MS ADPCM block decode → (n_samples, channels) int16.

    Block layout (channel-grouped headers, per the spec): one
    bPredictor byte per channel, then one ``<h`` iDelta per channel,
    then iSamp1 per channel, then iSamp2 per channel (7*ch header
    bytes), then the nibble body — HIGH nibble first, alternating
    channels nibble-by-nibble. The first two output samples per channel
    are iSamp2 then iSamp1 (samp2 is the earlier sample). The sample
    recurrence is sequential within a block but vectorizes across ALL
    (block, channel) streams at once, exactly like the IMA path."""
    c1_tab = MS_COEF1 if coef_pairs is None else np.array(
        [p[0] for p in coef_pairs], dtype=np.int64
    )
    c2_tab = MS_COEF2 if coef_pairs is None else np.array(
        [p[1] for p in coef_pairs], dtype=np.int64
    )
    if len(data) == 0 or len(data) % block_align:
        raise ValueError("MS ADPCM data not a whole number of blocks")
    spb = ms_samples_per_block(block_align, channels)
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, block_align)
    nb = blocks.shape[0]
    ch = channels
    pred_idx = blocks[:, :ch].astype(np.int64)  # (nb, ch)
    if (pred_idx >= len(c1_tab)).any():
        raise ValueError("MS ADPCM predictor index beyond coefficient table")

    def le16(col0):  # int16 little-endian fields grouped per channel
        lo = blocks[:, col0 : col0 + 2 * ch : 2].astype(np.int64)
        hi = blocks[:, col0 + 1 : col0 + 2 * ch : 2].astype(np.int64)
        return (lo | (hi << 8)).astype(np.int16).astype(np.int64)

    delta = le16(ch)
    s1 = le16(3 * ch)
    s2 = le16(5 * ch)
    c1 = c1_tab[pred_idx]
    c2 = c2_tab[pred_idx]
    body = blocks[:, 7 * ch :]  # (nb, body_bytes)
    nibs = np.empty((nb, body.shape[1] * 2), dtype=np.int64)
    nibs[:, 0::2] = body >> 4  # HIGH nibble first (MS order)
    nibs[:, 1::2] = body & 0x0F
    # nibble stream alternates channels → (nb, ch, spb-2)
    nibs = nibs.reshape(nb, -1, ch).transpose(0, 2, 1)
    out = np.empty((nb, ch, spb), dtype=np.int16)
    out[:, :, 0] = s2.astype(np.int16)
    out[:, :, 1] = s1.astype(np.int16)
    for t in range(spb - 2):
        samp, s1, s2, delta = _ms_step(nibs[:, :, t], s1, s2, delta, c1, c2)
        out[:, :, t + 2] = samp.astype(np.int16)
    return out.transpose(0, 2, 1).reshape(-1, ch)


def encode_ms_blocks(
    samples: np.ndarray, block_align: int, predictor: int | None = None
) -> tuple[bytes, int]:
    """Vectorized MS ADPCM encode → (block bytes, n_samples_encoded).

    ``samples``: (N, channels) int16, padded up to whole blocks by
    repeating the last frame. When ``predictor`` is None every block/
    channel tries all 7 built-in predictors (each trial fully
    vectorized across blocks) and keeps the one with least total
    squared reconstruction error — the strategy real encoders use.
    The encoder mirrors the decoder exactly (predict-with-
    reconstructed), so decode(encode(x)) is the canonical
    quantization of x."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if n == 0:
        raise ValueError("MS ADPCM encode needs at least one sample")
    spb = ms_samples_per_block(block_align, ch)
    nb = -(-n // spb)
    pad = nb * spb - n
    if pad:
        samples = np.concatenate([samples, np.repeat(samples[-1:], pad, 0)])
    s = samples.reshape(nb, spb, ch).transpose(0, 2, 1).astype(np.int64)

    def trial(pidx):  # encode ALL blocks/channels with predictor pidx
        c1 = np.full((nb, ch), MS_COEF1[pidx], dtype=np.int64)
        c2 = np.full((nb, ch), MS_COEF2[pidx], dtype=np.int64)
        s2, s1 = s[:, :, 0].copy(), s[:, :, 1].copy()
        # standard initial-delta estimate: mean |prediction error| / 4
        pred = (s1 * c1 + s2 * c2) >> 8
        err0 = np.abs(s[:, :, 2] - pred) if spb > 2 else np.zeros_like(s1)
        delta = np.maximum(err0 >> 2, 16)
        delta0 = delta.copy()
        nibs = np.empty((nb, ch, spb - 2), dtype=np.uint8)
        sqerr = np.zeros((nb, ch), dtype=np.int64)
        for t in range(spb - 2):
            pred = (s1 * c1 + s2 * c2) >> 8
            diff = s[:, :, t + 2] - pred
            code = np.clip(
                np.floor_divide(diff, delta)
                + (np.mod(diff, delta) * 2 >= delta),
                -8,
                7,
            )
            nib = (code & 0x0F).astype(np.int64)
            samp, s1, s2, delta = _ms_step(nib, s1, s2, delta, c1, c2)
            nibs[:, :, t] = nib.astype(np.uint8)
            sqerr += (samp - s[:, :, t + 2]) ** 2
        return nibs, delta0, sqerr

    if predictor is None:
        trials = [trial(p) for p in range(7)]
        errs = np.stack([t[2] for t in trials])  # (7, nb, ch)
        best = errs.argmin(axis=0)  # (nb, ch)
        nibs = np.empty((nb, ch, spb - 2), dtype=np.uint8)
        delta0 = np.empty((nb, ch), dtype=np.int64)
        for p in range(7):
            mask = best == p
            nibs[mask] = trials[p][0][mask]
            delta0[mask] = trials[p][1][mask]
        pred_idx = best
    else:
        nibs, delta0, _ = trial(predictor)
        pred_idx = np.full((nb, ch), predictor, dtype=np.int64)

    hdr = np.empty((nb, 7 * ch), dtype=np.uint8)
    hdr[:, :ch] = pred_idx.astype(np.uint8)

    def put16(col0, vals):
        v = vals.astype(np.int16)
        hdr[:, col0 : col0 + 2 * ch : 2] = (v & 0xFF).astype(np.uint8)
        hdr[:, col0 + 1 : col0 + 2 * ch : 2] = (
            (v.astype(np.int32) >> 8) & 0xFF
        ).astype(np.uint8)

    put16(ch, delta0)
    put16(3 * ch, s[:, :, 1])  # iSamp1 = second seed sample
    put16(5 * ch, s[:, :, 0])  # iSamp2 = first seed sample
    # body: channel-alternating nibbles, high nibble first
    inter = nibs.transpose(0, 2, 1).reshape(nb, -1)  # (nb, (spb-2)*ch)
    body = ((inter[:, 0::2] << 4) | inter[:, 1::2]).astype(np.uint8)
    return np.concatenate([hdr, body], axis=1).tobytes(), n


def encode_wav_ms_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 1024
) -> bytes:
    """Wrap MS-ADPCM-encoded samples in a real RIFF/WAVE container: fmt
    tag 0x02 with the spec extension (wSamplesPerBlock, wNumCoef, the
    seven built-in coefficient pairs) and the ``fact`` chunk."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    data, n = encode_ms_blocks(samples, block_align)
    spb = ms_samples_per_block(block_align, ch)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    ext = struct.pack("<HH", spb, 7) + b"".join(
        struct.pack("<hh", int(MS_COEF1[p]), int(MS_COEF2[p]))
        for p in range(7)
    )
    fmt = struct.pack(
        "<HHIIHHH", 0x02, ch, sample_rate, byte_rate, block_align, 4,
        len(ext),
    ) + ext
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_ms_payload(payload: bytes):
    """RIFF/WAVE container parse for format tag 0x02 → ((N, ch) int16,
    sample_rate). Reads custom coefficient pairs from the fmt
    extension when declared (wNumCoef ≥ 7 per the spec); falls back to
    the built-in seven. The ``fact`` count trims encoder padding."""
    if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fmt_raw, data, fact_n = 12, None, b"", None, None
    while pos + 8 <= len(payload):
        tag = bytes(payload[pos : pos + 4])
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
            fmt_raw = bytes(payload[pos + 8 : pos + 8 + ln])
        elif tag == b"data":
            data = bytes(payload[pos + 8 : pos + 8 + ln])
        elif tag == b"fact" and ln >= 4:
            (fact_n,) = struct.unpack_from("<I", payload, pos + 8)
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _byte_rate, block_align, bits = fmt
    if audio_fmt != 0x02 or bits != 4:
        raise ValueError("not a 4-bit MS ADPCM (tag 0x02) payload")
    coef_pairs = None
    if len(fmt_raw) >= 22:  # cbSize + wSamplesPerBlock + wNumCoef
        (n_coef,) = struct.unpack_from("<H", fmt_raw, 20)
        if n_coef and len(fmt_raw) >= 22 + 4 * n_coef:
            coef_pairs = [
                struct.unpack_from("<hh", fmt_raw, 22 + 4 * k)
                for k in range(n_coef)
            ]
    arr = decode_ms_blocks(data, block_align, ch, coef_pairs)
    if fact_n is not None:
        if fact_n > arr.shape[0]:
            raise ValueError("WAV fact count beyond decoded samples")
        arr = arr[:fact_n]
    return arr, rate


def reference_decode_ms_nibbles(
    nibbles, predictor: int, delta0: int, samp1: int, samp2: int
) -> list[int]:
    """Independent SCALAR MS ADPCM reference decode (oracle side): one
    stream's header fields + unsigned nibble list → all samples
    including the two seeds (samp2 first). Textbook per-sample loop,
    structurally different from the vectorized path it cross-checks."""
    c1, c2 = int(MS_COEF1[predictor]), int(MS_COEF2[predictor])
    s1 = int(np.int16(samp1))
    s2 = int(np.int16(samp2))
    delta = int(np.int16(delta0))
    out = [s2, s1]
    for nib in nibbles:
        pred = (s1 * c1 + s2 * c2) >> 8
        signed = nib - 16 if nib >= 8 else nib
        samp = max(-32768, min(32767, pred + delta * signed))
        s2, s1 = s1, samp
        delta = max(16, (int(MS_ADAPT[nib]) * delta) >> 8)
        out.append(samp)
    return out


def reference_decode_nibbles(
    nibbles, pred0: int, index0: int
) -> list[int]:
    """Independent SCALAR IMA reference decode (oracle side): one
    initial predictor/step-index and a nibble list → all samples
    including the header sample. Deliberately written as the textbook
    per-sample loop so the vectorized path is cross-checked against a
    structurally different implementation."""
    out = [int(np.int16(pred0))]
    pred, index = int(np.int16(pred0)), int(index0)
    for nib in nibbles:
        step = int(STEP_TABLE[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(INDEX_TABLE[nib & 7])))
        out.append(pred)
    return out
