"""Pure-Python twin of Spark's ``xxhash64`` expression (oracle use only).

Spark's ``F.xxhash64(c1, c2, …)`` chains XXH64 over the columns: the
running hash seeds the next column's hash, starting from seed 42
(`org.apache.spark.sql.catalyst.expressions.XxHash64`). Per type:

- string  → XXH64 over the UTF-8 bytes
- int     → XXH64 of the 4-byte value (``XXH64.hashInt``)
- long    → XXH64 of the 8-byte value (``XXH64.hashLong``)

This module re-implements the published XXH64 algorithm (Yann Collet's
xxHash, public spec) in pure Python so correctness probes whose Spark
side uses ``xxhash64`` (F12 url keys, SimHash token hashes, the
hyperplane-sketch LSH weights) get an engine-independent oracle — the
driver's DuckDB gate hashes both sides the same way.

NEVER imported by the engine: the engine's hot path stays on the JVM
builtin. Agreement with Spark is asserted in tests/test_hashing.py.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # XxHash64's default seed in Spark


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of a 4-byte int (Spark ``XXH64.hashInt``)."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of an 8-byte long (Spark ``XXH64.hashLong``)."""
    h = (seed + _P5 + 8) & _MASK
    h ^= (_rotl((value * _P2) & _MASK, 31) * _P1) & _MASK
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def _signed(x: int) -> int:
    x &= _MASK
    return x - (1 << 64) if x >= (1 << 63) else x


class Long(int):
    """Marker for BIGINT columns: hash the 8-byte value even when it
    fits in 32 bits (``spark_xxhash64`` otherwise mirrors ``F.lit``
    inference, which types small Python ints as IntegerType)."""


def spark_xxhash64(*cols) -> int:
    """``F.xxhash64(*cols)`` twin: chain the per-column hashes starting
    at seed 42, return the SIGNED 64-bit value Spark's LongType carries.

    Column typing mirrors how the probes build the expression: Python
    ``str`` → StringType (UTF-8 bytes), ``int`` → IntegerType if it fits
    in 32 bits else LongType (matches ``F.lit`` inference and
    ``F.sequence`` elements).
    """
    h = SPARK_SEED
    for c in cols:
        if c is None:
            continue  # null columns are skipped, hash unchanged
        if isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        elif isinstance(c, bool):
            raise TypeError("boolean columns not needed by any probe")
        elif isinstance(c, Long):
            h = xxh64_long(int(c) & _MASK, h)
        elif isinstance(c, int):
            if -(1 << 31) <= c < (1 << 31):
                h = xxh64_int(c, h)
            else:
                h = xxh64_long(c & _MASK, h)
        elif isinstance(c, bytes):
            h = xxh64_bytes(c, h)
        else:
            raise TypeError(f"unsupported oracle hash type {type(c)!r}")
    return _signed(h)
