"""Deterministic 64-bit hashing primitives, vectorized over numpy uint64.

All hashing in the engine flows through here so that retried Ray tasks are
bit-identical (SURVEY.md §4.2: deterministic & idempotent stage fns). No wall
clock, no PYTHONHASHSEED dependence — constants only, plus the pipeline seed.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

_SM_C1 = U64(0x9E3779B97F4A7C15)
_SM_C2 = U64(0xBF58476D1CE4E5B9)
_SM_C3 = U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants). uint64 wraparound."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + _SM_C1).copy()
        z = (z ^ (z >> U64(30))) * _SM_C2
        z = (z ^ (z >> U64(27))) * _SM_C3
        return z ^ (z >> U64(31))


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """K multiply-shift permutation params (a odd, b arbitrary), seeded."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=num_perm, dtype=np.uint64) * U64(2) + U64(1)
    b = rng.integers(0, 1 << 62, size=num_perm, dtype=np.uint64)
    return a, b


def stable_text_hash_u64(texts: list[str] | np.ndarray) -> np.ndarray:
    """Exact per-string 64-bit digest via blake2b — for fingerprints only.

    Exact dedup never relies on this: identical-text grouping uses the string
    itself as the groupby key (no collision risk at 10^12 rows).
    """
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.blake2b(t.encode("utf-8", "surrogatepass"), digest_size=8).digest()
        out[i] = int.from_bytes(d, "little")
    return out
