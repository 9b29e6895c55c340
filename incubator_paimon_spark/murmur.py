"""Driver-side replica of Spark's `F.hash()` (Murmur3_x86_32, seed 42).

Bucket pruning (ScanBucketFilter, ReadBuilder.withBucketFilter
table/source/ReadBuilder.java:111) needs the planner to compute, in Python,
the same bucket a row was written to by `pmod(hash(bucket_keys), n)`
(write.bucket_expr). Murmur3 x86-32 is public (Austin Appleby, public
domain); the byte-order and seed-chaining conventions here mirror Spark's
Murmur3Hash expression: multi-column hash chains each column's hash as the
next seed, starting at 42; ints hash as 4-byte values, longs as two 32-bit
halves, strings as UTF-8 via hashUnsafeBytes (4-byte little-endian words,
then SIGNED per-byte tail mixes).

Verified against `F.hash` by tests/test_table.py::test_murmur_matches_spark_hash.
"""

from __future__ import annotations

from datetime import date, datetime

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF
SPARK_SEED = 42


def _rotl(x: int, d: int) -> int:
    return ((x << d) | (x >> (32 - d))) & _M32


def _mixk1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _M32


def _mixh1(h1: int, k1: int) -> int:
    h1 = (h1 ^ k1) & _M32
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _signed32(h: int) -> int:
    return h - (1 << 32) if h >= (1 << 31) else h


def hash_int(v: int, seed: int) -> int:
    return _signed32(_fmix(_mixh1(seed & _M32, _mixk1(v & _M32)), 4))


def hash_long(v: int, seed: int) -> int:
    v &= 0xFFFFFFFFFFFFFFFF
    h1 = _mixh1(seed & _M32, _mixk1(v & _M32))
    h1 = _mixh1(h1, _mixk1((v >> 32) & _M32))
    return _signed32(_fmix(h1, 8))


def hash_bytes(b: bytes, seed: int) -> int:
    """Murmur3_x86_32.hashUnsafeBytes: aligned 4-byte LE words, then each
    remaining byte mixed individually as a SIGNED int (Spark's tail differs
    from canonical murmur3)."""
    n = len(b)
    aligned = n - n % 4
    h1 = seed & _M32
    for i in range(0, aligned, 4):
        word = int.from_bytes(b[i:i + 4], "little", signed=True)
        h1 = _mixh1(h1, _mixk1(word & _M32))
    for i in range(aligned, n):
        byte = b[i] - 256 if b[i] > 127 else b[i]
        h1 = _mixh1(h1, _mixk1(byte & _M32))
    return _signed32(_fmix(h1, n))


_EPOCH = date(1970, 1, 1)

# Spark type simpleString → hashable driver-side?
_INT_TYPES = {"tinyint", "smallint", "int", "integer"}


def spark_hash(values: list, type_names: list[str]) -> int | None:
    """F.hash(*cols) for literal values; None = unsupported type (caller
    must skip pruning). Chains each column's hash as the next seed."""
    h = SPARK_SEED
    for v, t in zip(values, type_names):
        if v is None:
            continue  # null columns leave the running hash unchanged
        if t in _INT_TYPES:
            h = hash_int(int(v), h)
        elif t in ("bigint", "long"):
            h = hash_long(int(v), h)
        elif t == "date":
            d = v if isinstance(v, date) else None
            if d is None:
                return None
            h = hash_int((d - _EPOCH).days, h)
        elif t in ("string", "varchar", "char") or t.startswith(("varchar(", "char(")):
            if not isinstance(v, str):
                return None
            h = hash_bytes(v.encode("utf-8"), h)
        else:
            return None  # float/decimal/timestamp: not worth the risk
    return h
