"""Dependency-free IMA ADPCM (DVI4, WAV format tag 0x11) codec.

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
