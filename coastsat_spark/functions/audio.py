"""Compressed-audio codecs in pure NumPy: G.711 (mu-law / A-law) and
IMA ADPCM (DVI4), the three classic WAV compression tags (7, 6, 0x11).

Like the image codecs in this package these are real, deterministic
implementations from the public specs (ITU-T G.711; IMA "Recommended
Practices for Enhancing Digital Audio Compatibility", the algorithm
Microsoft WAVE tag 0x11 uses), not library bindings — the sandbox has
no audio libraries, and the oracle needs bit-reproducible output.

Vectorization shape: G.711 is memoryless (pure per-sample table math —
fully vectorized). IMA ADPCM carries (predictor, step-index) state
through each block, so the decode/encode loops run over the
samples-per-block axis while staying vectorized across ALL blocks of
the payload — the loop length is the block size (typically 505 or
1017), never the sample count.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- G.711

_BIAS = 0x84  # mu-law bias (132)
_CLIP = 32635

# segment end points for mu-law encode (biased magnitudes)
_MU_SEG = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF])


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> uint8 G.711 mu-law bytes (ITU-T G.711 table 2a/2b)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    seg = np.searchsorted(_MU_SEG, mag)  # 0..7
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(data: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law bytes -> int16 samples (exact table inverse)."""
    b = (~np.asarray(data, dtype=np.uint8).astype(np.int32)) & 0xFF
    seg = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (((mant << 3) + _BIAS) << seg) - _BIAS
    return np.where(b & 0x80, -mag, mag).astype(np.int16)


_A_SEG = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF])


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> uint8 G.711 A-law bytes (ITU-T G.711 table 1a/1b)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.where(x >= 0, x, -x - 1), 0x7FFF)
    seg = np.searchsorted(_A_SEG, mag)  # 0..7
    mant = np.where(seg < 1, (mag >> 4) & 0x0F, (mag >> (seg + 3)) & 0x0F)
    return ((sign | (seg << 4) | mant) ^ 0x55).astype(np.uint8)


def alaw_decode(data: np.ndarray) -> np.ndarray:
    """uint8 G.711 A-law bytes -> int16 samples (exact table inverse)."""
    b = np.asarray(data, dtype=np.uint8).astype(np.int32) ^ 0x55
    seg = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = np.where(
        seg == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (seg - 1)
    )
    return np.where(b & 0x80, mag, -mag).astype(np.int16)


# ----------------------------------------------------------- IMA ADPCM

_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)


def _ima_step(pred, index, nib):
    """One vectorized IMA update across blocks: (pred, index, nibble) ->
    (new_pred, new_index). All int32 arrays of shape (n_blocks,)."""
    step = _STEP_TABLE[index]
    diff = step >> 3
    diff += np.where(nib & 4, step, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 1, step >> 2, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + _INDEX_TABLE[nib], 0, 88)
    return pred, index


def ima_adpcm_decode(data: bytes, block_align: int, n_samples: int | None = None) -> np.ndarray:
    """Mono IMA-ADPCM blocks -> int16 samples. Each `block_align`-byte
    block is a 4-byte header (int16 predictor = first output sample,
    uint8 step index, 1 reserved byte) + 4-bit codes, low nibble first.
    `n_samples` (the WAV 'fact' count) truncates the final block."""
    if block_align < 5:
        raise ValueError(f"IMA ADPCM: block_align {block_align} < 5")
    raw = np.frombuffer(data, np.uint8)
    n_blocks = len(raw) // block_align
    if n_blocks == 0:
        raise ValueError("IMA ADPCM: no complete block")
    blk = raw[: n_blocks * block_align].reshape(n_blocks, block_align)
    pred = blk[:, :2].copy().view("<i2").astype(np.int32).ravel()
    index = blk[:, 2].astype(np.int32)
    if (index > 88).any():
        raise ValueError("IMA ADPCM: step index > 88 in block header")
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header sample
    out = np.empty((n_blocks, spb), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    body = blk[:, 4:].astype(np.int32)
    for t in range(block_align - 4):
        byte = body[:, t]
        for half, nib in enumerate((byte & 0x0F, byte >> 4)):
            pred, index = _ima_step(pred, index, nib)
            out[:, 1 + 2 * t + half] = pred.astype(np.int16)
    flat = out.ravel()
    return flat[:n_samples] if n_samples is not None else flat


def ima_adpcm_encode(samples: np.ndarray, block_align: int = 256) -> tuple[bytes, int]:
    """int16 mono samples -> (IMA-ADPCM block bytes, n_samples). The
    input is zero-padded to whole blocks; the true count is returned for
    the WAV 'fact' chunk. State resets per block (each block header
    carries its own predictor/index), so blocks decode independently."""
    if block_align < 5 or block_align % 4:
        raise ValueError("block_align must be >= 5 and a multiple of 4")
    x = np.asarray(samples, dtype=np.int16)
    n = len(x)
    if n == 0:
        raise ValueError("no samples")
    spb = (block_align - 4) * 2 + 1
    n_blocks = -(-n // spb)
    pad = np.zeros(n_blocks * spb, dtype=np.int16)
    pad[:n] = x
    s = pad.reshape(n_blocks, spb).astype(np.int32)
    pred = s[:, 0].copy()
    # seed each block's step index from its own first delta (instead of
    # 0): blocks stay independent — no cross-block state, so this loop
    # vectorizes across all blocks — while a block starting mid-swing
    # doesn't spend ~20 samples ramping the step table up (measured
    # ~12000-count spikes at every block start of a 440 Hz sine with a
    # zero seed; <600 with this one)
    if spb > 1:
        first = np.abs(s[:, 1] - pred)
        index = np.clip(
            np.searchsorted(_STEP_TABLE, first), 0, 88
        ).astype(np.int32)
    else:
        index = np.zeros(n_blocks, dtype=np.int32)
    out = np.zeros((n_blocks, block_align), dtype=np.uint8)
    out[:, :2] = pred.astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    out[:, 2] = index.astype(np.uint8)
    nibs = np.empty((n_blocks, spb - 1), dtype=np.int32)
    for t in range(spb - 1):
        step = _STEP_TABLE[index]
        delta = s[:, t + 1] - pred
        nib = np.where(delta < 0, 8, 0)
        d = np.abs(delta)
        ge = d >= step
        nib |= np.where(ge, 4, 0)
        d -= np.where(ge, step, 0)
        ge = d >= (step >> 1)
        nib |= np.where(ge, 2, 0)
        d -= np.where(ge, step >> 1, 0)
        nib |= np.where(d >= (step >> 2), 1, 0)
        pred, index = _ima_step(pred, index, nib)
        nibs[:, t] = nib
    out[:, 4:] = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).astype(np.uint8)
    return out.tobytes(), n
