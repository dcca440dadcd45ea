"""Compressed telephony/ADPCM audio codecs — pure numpy, no audio library.

Implements the three classic compressed-audio encodings that appear as
WAV format tags in real corpora, from their published specifications:

* **G.711 mu-law** (ITU-T G.711, WAV format tag 7): logarithmic 8-bit
  companding, bias 0x84, clip 32635, ones-complement output.
* **G.711 A-law** (ITU-T G.711, WAV format tag 6): logarithmic 8-bit
  companding with the 0x55 toggle mask.
* **IMA ADPCM** (IMA "DVI4" algorithm, WAV format tag 0x11): 4-bit
  adaptive differential PCM over independent blocks — 4-byte block
  header (int16 predictor seed, step index) + low-nibble-first sample
  nibbles, the published WAV block layout.

Reference analog: the reference pipeline treats media payloads as
opaque bytes (SURVEY.md §2.6); these codecs extend the graft's
training-data-pipeline layer so compressed audio decodes natively in
``decode_audio_stats``-style operators instead of being PIL/ffmpeg
gated.

Scale note: G.711 in both directions is a pure 256-entry LUT gather /
vectorized bit-math over the whole sample array — C speed. IMA ADPCM
is serial *within* a block by construction (the predictor state
chains), so the kernels vectorize across BLOCKS: the time loop runs
``samples_per_block`` iterations and each iteration processes every
block of the payload simultaneously in numpy. Blocks are independent
(each carries its own seed), which is also what makes the format
splittable at corpus scale.
"""

from __future__ import annotations

import numpy as np

# -- G.711 mu-law -------------------------------------------------------

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 array → uint8 mu-law codes (ITU-T G.711)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = x < 0
    mag = np.where(sign, -x, x)
    mag = np.minimum(mag, _ULAW_CLIP) + _ULAW_BIAS
    # exponent = position of the highest set bit above bit 7 (0..7)
    exp = (np.frexp(mag.astype(np.float64))[1] - 8).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    code = ~((sign.astype(np.int32) << 7) | (exp << 4) | mant) & 0xFF
    return code.astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes → int16 samples (ITU-T G.711 expansion)."""
    c = (~np.asarray(codes, dtype=np.uint8).astype(np.int32)) & 0xFF
    sign = (c & 0x80) != 0
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


# -- G.711 A-law --------------------------------------------------------


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 array → uint8 A-law codes (ITU-T G.711, 0x55 mask)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = x >= 0  # A-law: bit 7 SET for non-negative input
    mag = np.minimum(np.where(x < 0, -x - 1, x), 32767) >> 3  # 12-bit domain
    exp = (np.frexp(np.maximum(mag, 1).astype(np.float64))[1] - 5).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = np.where(exp == 0, (mag >> 1) & 0x0F, (mag >> exp) & 0x0F)
    code = ((sign.astype(np.int32) << 7) | (exp << 4) | mant) ^ 0x55
    return code.astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law codes → int16 samples (ITU-T G.711 expansion)."""
    c = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    sign = (c & 0x80) != 0
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << (exp - 1),
    )
    return np.where(sign, mag, -mag).astype(np.int16)


# -- IMA ADPCM ----------------------------------------------------------

# published IMA step-size table (89 entries) — generated from the
# spec's recurrence step[i+1] = floor(step[i] * 1.1) with the listed
# seed values; stored closed-form here as the algorithm requires the
# exact integer sequence
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)

_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_quantize(diff: np.ndarray, step: np.ndarray):
    """Vectorized IMA 3-bit magnitude quantize: returns (nibble
    magnitude 0..7, reconstruction delta) for positive ``diff``."""
    delta = np.zeros_like(diff)
    vpdiff = step >> 3
    d = diff.copy()
    s = step.copy()
    hit = d >= s
    delta |= np.where(hit, 4, 0)
    d -= np.where(hit, s, 0)
    vpdiff += np.where(hit, step, 0)
    s >>= 1
    hit = d >= s
    delta |= np.where(hit, 2, 0)
    d -= np.where(hit, s, 0)
    vpdiff += np.where(hit, step >> 1, 0)
    s >>= 1
    hit = d >= s
    delta |= np.where(hit, 1, 0)
    vpdiff += np.where(hit, step >> 2, 0)
    return delta, vpdiff


def adpcm_ima_encode_blocks(samples: np.ndarray, samples_per_block: int):
    """int16 samples (length a multiple of ``samples_per_block``, odd)
    → (headers, nibbles): per-block 4-byte headers and the packed
    nibble payload, laid out per the published WAV IMA-ADPCM block
    format. Vectorized across blocks: the only Python loop is over the
    ``samples_per_block - 1`` time steps, each processing ALL blocks.
    """
    spb = samples_per_block
    if spb % 2 == 0:
        raise ValueError("samples_per_block must be odd (seed + 2 per byte)")
    x = np.asarray(samples, dtype=np.int32)
    if len(x) % spb:
        raise ValueError("sample count must be a multiple of samples_per_block")
    blocks = x.reshape(-1, spb)
    nb = blocks.shape[0]

    predictor = blocks[:, 0].copy()
    index = np.zeros(nb, dtype=np.int32)
    nibbles = np.zeros((nb, spb - 1), dtype=np.uint8)
    for t in range(1, spb):
        step = _IMA_STEPS[index]
        diff = blocks[:, t] - predictor
        sign = diff < 0
        delta, vpdiff = _ima_quantize(np.abs(diff), step)
        predictor = np.clip(
            predictor + np.where(sign, -vpdiff, vpdiff), -32768, 32767
        )
        index = np.clip(index + _IMA_INDEX_ADJ[delta], 0, 88)
        nibbles[:, t - 1] = (delta | np.where(sign, 8, 0)).astype(np.uint8)

    headers = np.zeros((nb, 4), dtype=np.uint8)
    seed = blocks[:, 0].astype("<i2")
    headers[:, 0:2] = seed.view(np.uint8).reshape(nb, 2)
    # header index is the state BEFORE the first coded sample: 0 here
    # (each block restarts adaptation — that's what makes blocks
    # independent and the format splittable)
    packed = (nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)).astype(np.uint8)
    return headers, packed


def adpcm_ima_decode_blocks(data: bytes, block_align: int) -> np.ndarray:
    """WAV IMA-ADPCM block bytes → int16 samples. Vectorized across
    blocks exactly like the encoder."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if len(raw) % block_align:
        raise ValueError("payload is not a whole number of blocks")
    blk = raw.reshape(-1, block_align)
    nb = blk.shape[0]
    spb = (block_align - 4) * 2 + 1

    predictor = blk[:, 0:2].copy().view("<i2")[:, 0].astype(np.int32)
    index = np.clip(blk[:, 2].astype(np.int32), 0, 88)
    packed = blk[:, 4:]
    nibbles = np.zeros((nb, spb - 1), dtype=np.int32)
    nibbles[:, 0::2] = packed & 0x0F
    nibbles[:, 1::2] = packed >> 4

    out = np.zeros((nb, spb), dtype=np.int16)
    out[:, 0] = predictor.astype(np.int16)
    for t in range(1, spb):
        nib = nibbles[:, t - 1]
        step = _IMA_STEPS[index]
        delta = nib & 7
        vpdiff = (step >> 3)
        vpdiff += np.where(delta & 4, step, 0)
        vpdiff += np.where(delta & 2, step >> 1, 0)
        vpdiff += np.where(delta & 1, step >> 2, 0)
        predictor = np.clip(
            predictor + np.where(nib & 8, -vpdiff, vpdiff), -32768, 32767
        )
        index = np.clip(index + _IMA_INDEX_ADJ[delta], 0, 88)
        out[:, t] = predictor.astype(np.int16)
    return out.reshape(-1)


def adpcm_ima_encode_scalar(samples, samples_per_block: int):
    """Per-sample reference implementation of the IMA encoder (the
    spec's scalar recurrence, Python loop) — the parity oracle the
    tests pin the vectorized kernel against."""
    spb = samples_per_block
    x = [int(v) for v in samples]
    headers, packed = [], []
    for b0 in range(0, len(x), spb):
        block = x[b0: b0 + spb]
        predictor, index = block[0], 0
        headers.append((predictor, index))
        nibs = []
        for sample in block[1:]:
            step = int(_IMA_STEPS[index])
            diff = sample - predictor
            sign = 8 if diff < 0 else 0
            diff = abs(diff)
            delta, vpdiff, s = 0, step >> 3, step
            if diff >= s:
                delta |= 4
                diff -= s
                vpdiff += step
            s >>= 1
            if diff >= s:
                delta |= 2
                diff -= s
                vpdiff += step >> 1
            s >>= 1
            if diff >= s:
                delta |= 1
                vpdiff += step >> 2
            predictor += -vpdiff if sign else vpdiff
            predictor = max(-32768, min(32767, predictor))
            index = max(0, min(88, index + int(_IMA_INDEX_ADJ[delta])))
            nibs.append(delta | sign)
        packed.append(bytes(
            nibs[i] | (nibs[i + 1] << 4) for i in range(0, len(nibs), 2)
        ))
    return headers, packed
