"""Deterministic hashing shared by datagen, engine, and the oracle.

The reference leaves several decisions to ``random.choice`` / Python set
iteration order (/root/reference/dnscrawler/dnsresolver_new.py:41,
/root/reference/dnscrawler/pydns.py:29) — a determinism hazard the new
engine removes (SURVEY.md §7.3): every "random" pick is a pure function
of row identity via splitmix64, implemented identically in scalar Python
(oracle) and vectorized numpy (datagen / Arrow UDFs).

Engine-side URL keys use Spark's built-in ``xxhash64`` (JVM-side,
codegen) — the oracle never needs those keys because parity is asserted
on URL *strings* and normalized order, not on hash values.
"""

from __future__ import annotations

import numpy as np

_MASK = (1 << 64) - 1
_GAMMA = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB


def splitmix64(x: int) -> int:
    """Scalar splitmix64 finalizer (pure function of x, 64-bit)."""
    z = (x + _GAMMA) & _MASK
    z = ((z ^ (z >> 30)) * _MIX1) & _MASK
    z = ((z ^ (z >> 27)) * _MIX2) & _MASK
    return z ^ (z >> 31)


def mix2(a: int, b: int) -> int:
    """Hash two ints into one (order-sensitive)."""
    return splitmix64(splitmix64(a) ^ (b & _MASK))


def splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array (matches scalar exactly)."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + np.uint64(_GAMMA))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_MIX1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_MIX2)
        return z ^ (z >> np.uint64(31))


def mix2_np(a: np.ndarray, b) -> np.ndarray:
    with np.errstate(over="ignore"):
        bb = np.uint64(b) if np.isscalar(b) else b.astype(np.uint64)
        return splitmix64_np(splitmix64_np(np.asarray(a, dtype=np.uint64)) ^ bb)


def str_hash64(s: str, seed: int = 0) -> int:
    """Deterministic 64-bit hash of a UTF-8 string (scalar; oracle use).

    Folds 8-byte little-endian chunks through splitmix64. Not xxhash64 —
    this is the *semantic* hash (glue/retry/robots flags in datagen);
    the engine's storage key is Spark's xxhash64, which never needs a
    Python twin.
    """
    data = s.encode("utf-8")
    h = splitmix64(seed ^ len(data))
    for i in range(0, len(data), 8):
        chunk = int.from_bytes(data[i : i + 8], "little")
        h = splitmix64(h ^ chunk)
    return h
