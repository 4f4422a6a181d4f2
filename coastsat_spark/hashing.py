"""Deterministic vectorized hashing (splitmix64) used for data generation
and hash-ordered deterministic sampling.

The reference relies on unseeded ``np.random.choice`` for its class-balanced
subsample (``SDS_shoreline.py:498-500``) which is not reproducible; this
engine replaces every random draw with a pure function of (seed, index) so
any executor produces identical bytes for a given row id regardless of
partitioning (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. Input/output uint64 arrays."""
    z = (np.asarray(x, dtype=np.uint64) + _GOLDEN)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        z = z ^ (z >> np.uint64(31))
    return z


def hash_stream(index: np.ndarray, stream: int, seed: int = 42) -> np.ndarray:
    """Independent uint64 hash per (row index, named stream).

    Streams let one row draw many independent values (lat, lon, length, ...)
    without correlation.
    """
    idx = np.asarray(index, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = idx * np.uint64(0x2545F4914F6CDD1D) + np.uint64(stream) * _GOLDEN + np.uint64(seed)
    return splitmix64(mixed)


def uniform01(index: np.ndarray, stream: int, seed: int = 42) -> np.ndarray:
    """Deterministic uniform [0,1) doubles per (index, stream)."""
    return (hash_stream(index, stream, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def normal(index: np.ndarray, stream: int, seed: int = 42) -> np.ndarray:
    """Deterministic standard-normal draws via Box-Muller on two streams."""
    u1 = uniform01(index, stream * 2 + 1, seed)
    u2 = uniform01(index, stream * 2 + 2, seed)
    u1 = np.clip(u1, 1e-12, 1.0)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
