"""Vectorized murmur3 exactness vs F.hash — every lane of
murmur.spark_hash_columns / spark_buckets.

The numpy replica decides which bucket every DataSource-written row lands
in (datasource._BucketedTaskWriter), while the read-side pruner recomputes
the same hash scalar-side (read.py bucket filter). A divergence is a
silent wrong-answer generator: PK-equality reads would skip the bucket the
row actually landed in. So: cell-exact comparison against Spark's own
Murmur3Hash (`F.hash`, seed 42) over randomized rows for ALL seven
vectorized lanes (int/long/date/boolean/timestamp/float/double) plus the
per-row string lane, including nulls, -0.0, NaN, non-canonical NaN bit
patterns, and non-ASCII strings.
"""

import datetime
import math
import random

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark.murmur import spark_buckets, spark_hash_columns

N = 500
_RNG = random.Random(0xB10C)


def _maybe_null(gen, p=0.12):
    return None if _RNG.random() < p else gen()


def _rand_int():
    return _RNG.choice([0, 1, -1, 2**31 - 1, -(2**31),
                        _RNG.randint(-10**9, 10**9)])


def _rand_long():
    return _RNG.choice([0, 1, -1, 2**63 - 1, -(2**63), 2**40 + 7,
                        _RNG.randint(-10**18, 10**18)])


def _rand_date():
    return datetime.date(1970, 1, 1) + datetime.timedelta(
        days=_RNG.randint(-30000, 30000))


def _rand_ts():
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(
        seconds=_RNG.randint(-2 * 10**9, 2 * 10**9),
        microseconds=_RNG.randint(0, 999999))


def _rand_float():
    return _RNG.choice([0.0, -0.0, float("nan"), float("inf"),
                        float("-inf"), 1.5, -2.25,
                        _RNG.uniform(-1e30, 1e30)])


def _rand_str():
    # cover every tail residue (len % 4), empty, non-ASCII, long
    pool = ["", "a", "ab", "abc", "abcd", "日本語テキスト", "naïve café",
            "x" * 37, "𐍈𐍉𐍊", "line\nbreak\ttab",
            "".join(_RNG.choice("abcdefgh01234") for _ in range(_RNG.randint(0, 24)))]
    return _RNG.choice(pool)


@pytest.fixture(scope="module")
def hashed(spark):
    """One DataFrame with every lane + Spark's own hashes, and its Arrow
    form (df.toArrow() IS what the DSv2 writer receives)."""
    rows = [(
        _maybe_null(_rand_int),
        _maybe_null(_rand_long),
        _maybe_null(_rand_date),
        _maybe_null(lambda: _RNG.random() < 0.5),
        _maybe_null(_rand_ts),
        _maybe_null(_rand_float),
        _maybe_null(_rand_float),
        _maybe_null(_rand_str),
    ) for _ in range(N)]
    ddl = ("i int, l bigint, d date, b boolean, ts timestamp, "
           "f float, dd double, s string")
    df = spark.createDataFrame(rows, ddl)
    cols = ["i", "l", "d", "b", "ts", "f", "dd", "s"]
    exp = df.select(
        *[F.hash(c).alias(f"h_{c}") for c in cols],
        F.hash(*cols).alias("h_all"),
        F.pmod(F.hash(*cols), F.lit(16)).alias("bucket_all"),
        F.pmod(F.hash("s", "ts"), F.lit(7)).alias("bucket_s_ts"),
    ).collect()
    return df.toArrow(), exp


LANES = [("i", "int"), ("l", "bigint"), ("d", "date"), ("b", "boolean"),
         ("ts", "timestamp"), ("f", "float"), ("dd", "double"),
         ("s", "string")]


@pytest.mark.parametrize("col,tname", LANES)
def test_each_lane_matches_f_hash(hashed, col, tname):
    tbl, exp = hashed
    got = spark_hash_columns([tbl.column(col)], [tname])
    assert got is not None, f"lane {tname} lost its vectorized path"
    want = [r[f"h_{col}"] for r in exp]
    assert got.tolist() == want


def test_multi_column_chain_matches_f_hash(hashed):
    """Multi-column chaining (each column's hash seeds the next) with
    null-skip across ALL lanes at once."""
    tbl, exp = hashed
    cols = [tbl.column(c) for c, _ in LANES]
    types = [t for _, t in LANES]
    got = spark_hash_columns(cols, types)
    assert got.tolist() == [r["h_all"] for r in exp]


def test_spark_buckets_matches_pmod(hashed):
    tbl, exp = hashed
    cols = [tbl.column(c) for c, _ in LANES]
    types = [t for _, t in LANES]
    got = spark_buckets(cols, types, 16)
    assert got.tolist() == [r["bucket_all"] for r in exp]
    got2 = spark_buckets([tbl.column("s"), tbl.column("ts")],
                         ["string", "timestamp"], 7)
    assert got2.tolist() == [r["bucket_s_ts"] for r in exp]


def test_scalar_hash_agrees_with_vectorized(hashed):
    """The read-side pruner's scalar spark_hash must agree with the
    write-side vector path on the types it supports (int/long/date/str) —
    they are the two halves of one bucket contract."""
    from incubator_paimon_spark.murmur import spark_hash
    tbl, _ = hashed
    for col, tname in [("i", "int"), ("l", "bigint"), ("d", "date"),
                       ("s", "string")]:
        vec = spark_hash_columns([tbl.column(col)], [tname]).tolist()
        vals = tbl.column(col).to_pylist()
        for v, h in zip(vals, vec):
            if v is None:
                continue  # scalar path only ever sees non-null literals
            assert spark_hash([v], [tname]) == h, (col, v)


def test_nan_bit_patterns_canonicalize(spark):
    """Spark hashes Float.floatToIntBits / Double.doubleToLongBits, which
    canonicalize EVERY NaN (negative, payload) to the canonical quiet NaN
    — the vector path must do the same even for raw non-canonical bits
    that arrive through Arrow."""
    want_f = spark.sql(
        "SELECT hash(cast('NaN' as float)) f, hash(cast('NaN' as double)) d"
    ).collect()[0]
    weird_f = np.array([0x7FC00000, 0xFFC00000, 0x7FC00001, 0xFF800123],
                       dtype=np.uint32).view(np.float32)
    got = spark_hash_columns([pa.array(weird_f, type=pa.float32())],
                             ["float"])
    assert got.tolist() == [want_f["f"]] * 4
    weird_d = np.array([0x7FF8000000000000, 0xFFF8000000000000,
                        0x7FF800000000BEEF], dtype=np.uint64
                       ).view(np.float64)
    assert all(math.isnan(x) for x in weird_d)
    got_d = spark_hash_columns([pa.array(weird_d, type=pa.float64())],
                               ["double"])
    assert got_d.tolist() == [want_f["d"]] * 3
