"""Stable, process-independent hashing.

The reference uses Python's salted ``hash()`` for synthetic change ids
(``src/importers/helicopter_change_importer.py:320``) which is
nondeterministic across processes — a bug SURVEY.md §7.4 flags. Every hash
here is seedless-stable (splitmix64 / blake2) so results are identical across
Ray workers, runs, and machines.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 ndarray."""
    with np.errstate(over="ignore"):
        z = (x.astype(_U64) + _GOLDEN)
        z = (z ^ (z >> _U64(30))) * _M1
        z = (z ^ (z >> _U64(27))) * _M2
        return z ^ (z >> _U64(31))


def mix2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Stable 64-bit mix of two uint64 arrays (used as the per-turn PRNG)."""
    with np.errstate(over="ignore"):
        return splitmix64(a.astype(_U64) * _U64(0x100000001B3) + splitmix64(b.astype(_U64)))


def stable_id(text: str, prefix: str = "", n_hex: int = 12) -> str:
    """Deterministic short id from text (blake2b), replacing Python hash()."""
    return prefix + hashlib.blake2b(text.encode("utf-8"), digest_size=16).hexdigest()[:n_hex]


def stable_u64(strings: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash per string (FNV-1a, vectorized-ish via Python loop
    only at build time for small tables; for hot paths use
    ``pandas.util.hash_pandas_object`` which is also process-stable)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        h = _U64(0xCBF29CE484222325)
        with np.errstate(over="ignore"):
            for ch in str(s).encode("utf-8"):
                h = (h ^ _U64(ch)) * _U64(0x100000001B3)
        out[i] = h
    return out
