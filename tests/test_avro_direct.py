"""Pins for the r16 direct Arrow→avro staging write (formats/avro_direct.py).

The direct path replaces the staged-parquet + transcode double
materialization; its correctness surface is (a) identical read-back rows and
(b) manifest-stats parity with the parquet-footer numbers the staged path
produced — min/max/null_count feed file pruning, `_SEQUENCE_NUMBER` ordering
and the `_VALUE_KIND` delete-row proof. `PMN_AVRO_DIRECT=0` forces the old
staged path on the same tree, so every pin here is a true A/B on identical
input."""

import math
import os
from datetime import date, datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_paimon_spark.metadata.util import dumps


@pytest.fixture()
def force_staged(monkeypatch):
    """Context helper: run one write through the pre-r16 staged path."""
    def _ctx():
        monkeypatch.setenv("PMN_AVRO_DIRECT", "0")
    yield _ctx
    monkeypatch.delenv("PMN_AVRO_DIRECT", raising=False)


def _file_sigs(t, with_file_size=False):
    """Order-insensitive per-file signature multiset (names carry uuids)."""
    snap = t.snapshots.latest()
    sigs = []
    for e in t.entries_at(snap):
        sig = {"rc": e.file.row_count, "stats": e.file.stats,
               "min_seq": e.file.min_seq, "max_seq": e.file.max_seq,
               "dr": e.file.delete_row_count,
               "part": sorted(e.partition.items()), "bucket": e.bucket}
        if with_file_size:
            sig["size"] = e.file.file_size
        sigs.append(dumps(sig))
    return sorted(sigs)


EDGE_SCHEMA = T.StructType([
    T.StructField("i", T.IntegerType()),
    T.StructField("l", T.LongType()),
    T.StructField("d_nan", T.DoubleType()),
    T.StructField("d_zero", T.DoubleType()),
    T.StructField("f32", T.FloatType()),
    T.StructField("all_null", T.StringType()),
    T.StructField("s", T.StringType()),
    T.StructField("s_long", T.StringType()),
    T.StructField("s17", T.StringType()),
    T.StructField("b", T.BooleanType()),
    T.StructField("dt", T.DateType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("tsn", T.TimestampNTZType()),
    T.StructField("bin", T.BinaryType()),
    T.StructField("dec", T.DecimalType(10, 2)),
    T.StructField("arr", T.ArrayType(T.IntegerType())),
])


def _edge_rows():
    from decimal import Decimal
    return [
        (1, 10, float("nan"), -0.0, float("-0.0"), None, "mid",
         "x" * 5000, "a_string_longer_than_sixteen_chars", True,
         date(2020, 1, 2), datetime(2021, 3, 4, 5, 6, 7),
         datetime(2021, 3, 4, 5, 6, 7), bytearray(b"ab"),
         Decimal("12.34"), [1, 2]),
        (2, -5, 1.5, 0.0, 0.0, None, "zzz",
         "y" * 5000, "b_string_longer_than_sixteen_chars", False,
         date(2019, 5, 6), datetime(2022, 1, 1), datetime(2022, 1, 1),
         bytearray(b"zz"), Decimal("-5.00"), [3]),
        (3, 7, -2.0, 2.5, float("nan"), None, "aaa",
         "w" * 10, "shorty", None, None, None, None, None, None, None),
    ]


def test_direct_stats_parity_edge_types(spark, catalog):
    """Byte-level stats parity on every footer semantics edge: NaN max
    (Java total order), -0.0 min, INT96 timestamp no-stats, NTZ full
    stats, decimal null-count-only, >4096 string stats drop, truncate(16)
    prefix-min/dropped-max, nested column skipped, all-null column.
    coalesce(1) + trigger=1 keep all rows in ONE file (the avro write
    otherwise spreads small appends to `min(cores, trigger)` tasks): the
    4096-byte stats-drop rule is per-file, so the spot-checks below only
    read cleanly when the edge rows share a footer."""
    df = spark.createDataFrame(_edge_rows(), EDGE_SCHEMA).coalesce(1)
    one_file = {"file.format": "avro",
                "num-sorted-run.compaction-trigger": "1"}
    td = catalog.create_table("db.dx_a", df.schema, options=one_file)
    td.write(spark, df)
    os.environ["PMN_AVRO_DIRECT"] = "0"
    try:
        ts_ = catalog.create_table("db.dx_b", df.schema, options=one_file)
        ts_.write(spark, df)
    finally:
        os.environ.pop("PMN_AVRO_DIRECT", None)
    assert _file_sigs(td) == _file_sigs(ts_)
    # spot-check the semantics themselves on the direct table
    snap = td.snapshots.latest()
    stats = {}
    for e in td.entries_at(snap):
        for c, st in e.file.stats.items():
            cur = stats.setdefault(c, {"null_count": 0})
            cur["null_count"] += st["null_count"]
            if "min" in st and ("min" not in cur or st["min"] < cur["min"]):
                cur["min"] = st["min"]
            if "max" in st:
                mx = st["max"]
                if "max" not in cur:
                    cur["max"] = mx
                elif isinstance(mx, float) and math.isnan(mx):
                    cur["max"] = mx
                elif not (isinstance(cur["max"], float)
                          and math.isnan(cur["max"])) and mx > cur["max"]:
                    cur["max"] = mx
    assert "arr" not in stats                       # nested: no entry
    assert stats["ts"] == {"null_count": 0}         # INT96: no stats at all
    assert "min" in stats["tsn"]                    # NTZ: real stats
    assert stats["dec"] == {"null_count": 1}        # decimal: counts only
    assert stats["s_long"] == {"null_count": 0}     # >4096: dropped whole
    assert stats["all_null"] == {"null_count": 3}
    assert math.isnan(stats["d_nan"]["max"])        # Java order: NaN is max
    assert stats["d_nan"]["min"] == -2.0
    import struct as _st
    assert _st.pack("<d", stats["d_zero"]["min"]) == _st.pack("<d", -0.0)
    assert stats["s17"]["min"] == "a_string_longer_"  # truncate(16) prefix
    assert "max" not in stats["s17"] or len(stats["s17"]["max"]) <= 16


def test_direct_readback_identical_and_pk_system_cols(spark, catalog,
                                                      customer):
    """PK avro table: read-back rows identical between paths, and the
    _SEQUENCE_NUMBER min/max + _VALUE_KIND delete proof in the manifests
    agree (delete_row_count 0 on '+'-only files, None when a -D row is in
    the file)."""
    from incubator_paimon_spark.types import ROW_KIND

    upd = (customer.limit(20)
           .withColumn(ROW_KIND, F.when(F.col("c_custkey") % 2 == 0,
                                        F.lit("-D")).otherwise(F.lit("+I"))))
    tabs = {}
    for tag, env in (("a", None), ("b", "0")):
        if env:
            os.environ["PMN_AVRO_DIRECT"] = env
        try:
            t = catalog.create_table(f"db.dxpk_{tag}", customer.schema,
                                     primary_keys=["c_custkey"],
                                     options={"file.format": "avro",
                                              "bucket": "2"})
            t.write(spark, customer)
            t.write(spark, upd)
        finally:
            os.environ.pop("PMN_AVRO_DIRECT", None)
        tabs[tag] = t
    a, b = tabs["a"].read(spark), tabs["b"].read(spark)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert _file_sigs(tabs["a"]) == _file_sigs(tabs["b"])
    # the second commit carries -D rows: at least one file must prove it
    drs = [e.file.delete_row_count
           for e in tabs["a"].entries_at(tabs["a"].snapshots.latest())]
    assert None in drs and 0 in drs


def test_direct_rolls_at_max_records_per_file(spark, catalog, customer):
    t = catalog.create_table("db.dx_roll", customer.schema,
                             options={"file.format": "avro",
                                      "write.max-records-per-file": "40"})
    t.write(spark, customer.limit(100))
    entries = t.new_scan().plan().entries
    assert all(e.file.row_count <= 40 for e in entries)
    assert sum(e.file.row_count for e in entries) == 100
    assert t.read(spark).count() == 100


def test_direct_partitioned_layout_roundtrip(spark, catalog):
    """Partition dir naming written by the task must decode back to the
    typed values — including booleans (Hive lowercase), dates and NULL."""
    df = spark.createDataFrame(
        [(1, True, date(2020, 1, 1), "x"),
         (2, False, date(2020, 1, 2), "y"),
         (3, None, None, "z"),
         (4, True, date(2020, 1, 1), "w")],
        "id long, flag boolean, d date, v string")
    t = catalog.create_table("db.dx_part", df.schema,
                             partition_keys=["flag", "d"],
                             options={"file.format": "avro"})
    t.write(spark, df)
    got = sorted(map(tuple, t.read(spark).collect()))
    assert got == sorted(map(tuple, df.collect()))
    parts = {tuple(sorted(e.partition.items()))
             for e in t.entries_at(t.snapshots.latest())}
    assert (("d", date(2020, 1, 1)), ("flag", True)) in parts
    assert (("d", None), ("flag", None)) in parts
    # partition pruning by typed value still works
    assert t.read(spark).filter("flag = true").count() == 2


def test_direct_container_schema_matches_transcode(spark, catalog, customer):
    """The avro writer schema embedded in the container header must be the
    same one the transcode path derived from the staged parquet (union
    nullability included), so any avro reader sees identical files."""
    import json

    from incubator_paimon_spark.formats.avro_codec import MAGIC

    def header_schema(t):
        e = t.new_scan().plan().entries[0]
        path = os.path.join(t.path, e.file.file_name)
        with open(path, "rb") as f:
            blob = f.read(1 << 16)
        assert blob[:4] == MAGIC
        i = blob.index(b'{"type": "record"')
        # the schema JSON is length-prefixed; parse greedily via decoder
        dec = json.JSONDecoder()
        obj, _ = dec.raw_decode(blob[i:i + 60000].decode("utf-8",
                                                         "replace"))
        return obj

    td = catalog.create_table("db.dx_sch_a", customer.schema,
                              options={"file.format": "avro"})
    td.write(spark, customer)
    os.environ["PMN_AVRO_DIRECT"] = "0"
    try:
        ts_ = catalog.create_table("db.dx_sch_b", customer.schema,
                                   options={"file.format": "avro"})
        ts_.write(spark, customer)
    finally:
        os.environ.pop("PMN_AVRO_DIRECT", None)
    assert header_schema(td) == header_schema(ts_)


def test_bloom_indexed_avro_keeps_staged_path(spark, catalog, customer):
    """file-index.bloom-filter.columns on an avro table takes the staged
    fallback (the bloom positions job scans staged parquet) and still
    produces the index."""
    t = catalog.create_table("db.dx_bloom", customer.schema,
                             options={"file.format": "avro",
                                      "file-index.bloom-filter.columns":
                                          "c_name"})
    t.write(spark, customer)
    entries = t.new_scan().plan().entries
    assert entries and all("c_name" in e.file.file_index for e in entries)
    assert t.read(spark).count() == customer.count()
