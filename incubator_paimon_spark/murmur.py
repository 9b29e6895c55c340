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


# ----------------------------------------------------------------------
# vectorized (numpy) form — executor-side bucket assignment over whole
# Arrow batches (datasource.PaimonBatchWriter). Same algorithm as above,
# elementwise on uint32 arrays with per-row running seeds so multi-column
# chaining and null-skipping (null leaves the seed unchanged, like
# Spark's Murmur3Hash) vectorize too.

def _mixk1_np(np, k1):
    k1 = k1 * np.uint32(_C1)
    k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
    return k1 * np.uint32(_C2)


def _mixh1_np(np, h1, k1):
    h1 = h1 ^ k1
    h1 = (h1 << np.uint32(13)) | (h1 >> np.uint32(19))
    return h1 * np.uint32(5) + np.uint32(0xE6546B64)


def _fmix_np(np, h1, length):
    h1 = h1 ^ np.uint32(length)
    h1 = h1 ^ (h1 >> np.uint32(16))
    h1 = h1 * np.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> np.uint32(13))
    h1 = h1 * np.uint32(0xC2B2AE35)
    return h1 ^ (h1 >> np.uint32(16))


def _hash_int_np(np, v32, seeds):
    return _fmix_np(np, _mixh1_np(np, seeds, _mixk1_np(np, v32)), 4)


def _hash_long_np(np, v64, seeds):
    lo = (v64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (v64 >> np.uint64(32)).astype(np.uint32)
    h1 = _mixh1_np(np, seeds, _mixk1_np(np, lo))
    h1 = _mixh1_np(np, h1, _mixk1_np(np, hi))
    return _fmix_np(np, h1, 8)


_VEC_INT = {"tinyint", "smallint", "int", "integer", "date", "boolean"}
_VEC_LONG = {"bigint", "long", "timestamp", "timestamp_ntz"}


def spark_hash_columns(columns, type_names: list[str]):
    """F.hash(*cols) over pyarrow arrays → numpy int32 array, or None when
    a column's type has no vectorized path (caller falls back to per-row
    spark_hash / hash_bytes). int/long/date/boolean/timestamp cover the
    typical bucket-key shapes; dates hash as epoch days, timestamps as
    epoch MICROseconds, booleans as 0/1 ints — Spark's Murmur3Hash input
    conventions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(columns[0]) if columns else 0
    seeds = np.full(n, SPARK_SEED, dtype=np.uint32)
    for arr, t in zip(columns, type_names):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        null_mask = arr.is_null().to_numpy(zero_copy_only=False)
        if t in _VEC_INT:
            if t == "date":
                arr = arr.cast(pa.int32())
            elif t == "boolean":
                arr = pc.cast(arr, pa.int32())
            v = arr.fill_null(0).to_numpy(zero_copy_only=False) \
                   .astype(np.int64).astype(np.uint32)
            mixed = _hash_int_np(np, v, seeds)
        elif t in _VEC_LONG:
            if t.startswith("timestamp"):
                arr = arr.cast(pa.int64())  # micros, Spark's hash input
            v = arr.fill_null(0).to_numpy(zero_copy_only=False) \
                   .astype(np.int64).view(np.uint64)
            mixed = _hash_long_np(np, v, seeds)
        elif t == "float":
            f = arr.fill_null(0).to_numpy(zero_copy_only=False) \
                   .astype(np.float32)
            f = np.where(f == 0.0, np.float32(0.0), f)  # -0f → 0f
            # Spark hashes Float.floatToIntBits, which canonicalizes EVERY
            # NaN (incl. negative/payload NaNs) to 0x7fc00000; a raw bit
            # view would not
            f = np.where(np.isnan(f), np.float32(np.nan), f)
            mixed = _hash_int_np(np, f.view(np.uint32), seeds)
        elif t == "double":
            f = arr.fill_null(0).to_numpy(zero_copy_only=False) \
                   .astype(np.float64)
            f = np.where(f == 0.0, np.float64(0.0), f)
            f = np.where(np.isnan(f), np.float64(np.nan), f)
            mixed = _hash_long_np(np, f.view(np.uint64), seeds)
        elif (t in ("string", "varchar", "char")
                or t.startswith(("varchar(", "char("))):
            # no fixed-width vector form; per-row, which is the slow path —
            # fine for the write sizes one task sees
            vals = arr.to_pylist()
            mixed = np.fromiter(
                (hash_bytes(v.encode("utf-8"), int(s)) & _M32 if v is not None
                 else int(s) for v, s in zip(vals, seeds)),
                dtype=np.uint32, count=n)
            null_mask = np.zeros(n, dtype=bool)  # already folded in
        else:
            return None
        seeds = np.where(null_mask, seeds, mixed)
    return seeds.view(np.int32)


def spark_buckets(columns, type_names: list[str], num_buckets: int):
    """pmod(F.hash(*cols), num_buckets) per row → numpy int32 array or
    None (unsupported type). THE bucket function (write.bucket_expr)."""
    h = spark_hash_columns(columns, type_names)
    if h is None:
        return None
    import numpy as np
    return np.mod(h.astype(np.int64), num_buckets).astype(np.int32)
