"""Lineage system tables (lineage.py; TableLineageTable.java:59,
Source/SinkTableLineageTable, DataLineageTable): MERGE INTO, matview sync
and clone produce warehouse-persisted lineage events served by
sys.table_lineage / sys.data_lineage; the loose event tail rolls into
parquet segments past a threshold and expire_lineage bounds history."""

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark.maintenance import clone_table
from incubator_paimon_spark.operators import matview as MV


def _tl(spark, catalog):
    df = catalog.system(spark, "table_lineage")
    return {(r.direction, r.database_name, r.table_name, r.job_name)
            for r in df.collect()}


def test_merge_into_lineage(spark, catalog, customer):
    t = catalog.create_table("db.tgt", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    t.write(spark, customer.limit(50))
    s = catalog.create_table("db.src", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    s.write(spark, customer.limit(20).withColumn("c_acctbal", F.lit(9.0)))

    catalog.sql(spark, """
        MERGE INTO db.tgt t USING db.src s ON t.c_custkey = s.c_custkey
        WHEN MATCHED THEN UPDATE SET *""")

    rows = _tl(spark, catalog)
    assert ("sink", "db", "tgt", "merge_into") in rows
    assert ("source", "db", "src", "merge_into") in rows

    dl = {(r.direction, r.table_name, r.snapshot_id, r.job_name)
          for r in catalog.system(spark, "data_lineage").collect()}
    assert ("sink", "tgt", 2, "merge_into") in dl  # write 1 + merge = snap 2
    assert ("source", "src", 1, "merge_into") in dl

    # SQL front-end surface too
    got = catalog.sql(spark, "SELECT * FROM sys.table_lineage "
                             "WHERE job_name = 'merge_into'")
    assert got.count() == 2

    # a subquery USING (no catalog table) records only the sink side
    catalog.sql(spark, """
        MERGE INTO db.tgt t
        USING (SELECT 3 AS c_custkey) s ON t.c_custkey = s.c_custkey
        WHEN MATCHED THEN DELETE""")
    rows = [(r.direction, r.job_name)
            for r in catalog.system(spark, "table_lineage").collect()
            if r.job_name == "merge_into"]
    assert rows.count(("sink", "merge_into")) == 2
    assert rows.count(("source", "merge_into")) == 1


def test_matview_sync_lineage(spark, catalog):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", 10 * i) for i in range(30)],
        "doc_id long, source string, n_chars long")
    src = catalog.create_table("db.lin_src", docs.schema,
                               primary_keys=["doc_id"],
                               options={"bucket": "1",
                                        "changelog-producer": "lookup"})
    mv = MV.create_materialized_agg(
        catalog, "db.lin_mv", src, ["source"],
        {"n_docs": ("count", "doc_id"), "chars_sum": ("sum", "n_chars")})
    src.write(spark, docs)
    assert MV.sync_materialized_agg(spark, src, mv) == 1

    rows = _tl(spark, catalog)
    assert ("source", "db", "lin_src", "matview_sync") in rows
    assert ("sink", "db", "lin_mv", "matview_sync") in rows
    # the recorded source snapshot is the one the sync COVERED (the
    # consumer's next-1), not whatever latest() is at record time
    dl = {(r.direction, r.table_name): r.snapshot_id
          for r in catalog.system(spark, "data_lineage").collect()
          if r.job_name == "matview_sync"}
    assert dl[("source", "lin_src")] == 1
    assert dl[("sink", "lin_mv")] == mv.snapshots.latest().id

    # a no-op sync (nothing new) records nothing further
    before = catalog.system(spark, "table_lineage").count()
    assert MV.sync_materialized_agg(spark, src, mv) == 0
    assert catalog.system(spark, "table_lineage").count() == before


def test_clone_lineage_both_warehouses(spark, catalog, customer):
    from incubator_paimon_spark import Catalog
    t = catalog.create_table("db.c_src", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    t.write(spark, customer.limit(40))
    wh2 = tempfile.mkdtemp(prefix="pmn_lin_wh2_")
    try:
        cat2 = Catalog(wh2)
        clone_table(spark, t, cat2, "db2.c_dst")
        # the event lands in BOTH warehouses' lineage stores
        assert ("source", "db", "c_src", "clone") in _tl(spark, catalog)
        rows2 = _tl(spark, cat2)
        assert ("sink", "db2", "c_dst", "clone") in rows2
        dl2 = {(r.direction, r.table_name, r.snapshot_id)
               for r in cat2.system(spark, "data_lineage").collect()}
        assert ("sink", "c_dst", 1) in dl2
        assert ("source", "c_src", 1) in dl2
    finally:
        shutil.rmtree(wh2, ignore_errors=True)

# ----------------------------------------------------------------------
# segment store: roll / dedupe / expire (VERDICT r11 #2 — the lineage
# event store must be bounded like every other metadata plane)

def _store(catalog):
    d = os.path.join(catalog.warehouse, "_lineage")
    names = os.listdir(d) if os.path.isdir(d) else []
    return (d, sorted(n for n in names if n.startswith("ev-")),
            sorted(n for n in names if n.startswith("seg-")))


def test_lineage_segment_roll_bounds_store(spark, catalog, customer,
                                           monkeypatch):
    from incubator_paimon_spark import lineage as L
    monkeypatch.setattr(L, "LINEAGE_SEGMENT_THRESHOLD", 50)
    t = catalog.create_table("db.seg_t", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    t.write(spark, customer.limit(5))
    for i in range(180):
        L.record(f"job{i}", sinks=[(t, 1 if i % 2 else None)])
    d, loose, segs = _store(catalog)
    # the loose tail stays bounded by the threshold; history is in segments
    assert len(loose) < 50
    assert len(segs) >= 3
    rows = catalog.system(spark, "table_lineage").collect()
    # the table-write itself records nothing (plain writes carry no job),
    # so exactly our 180 events * 1 sink endpoint are served, no dupes
    got = [r.job_name for r in rows if r.job_name.startswith("job")]
    assert sorted(got) == sorted(f"job{i}" for i in range(180))
    # snapshot-level rows only for the events that carried a snapshot id
    dl = catalog.system(spark, "data_lineage")
    assert dl.where("job_name LIKE 'job%'").count() == 90
    # driver-side reader agrees with the Spark-served table
    assert len(L.table_lineage_rows(catalog.warehouse)) == len(rows)


def test_lineage_crash_duplicate_rows_dedupe(spark, catalog, customer):
    from incubator_paimon_spark import lineage as L
    t = catalog.create_table("db.dup_t", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    t.write(spark, customer.limit(5))
    L.record("dup_job", sinks=[(t, 1)])
    d, loose, _ = _store(catalog)
    name = next(n for n in loose)
    body = open(os.path.join(d, name)).read()
    assert L.compact_events(catalog.warehouse) is not None
    # simulate a compactor crash AFTER the segment was durable but BEFORE
    # the loose delete: the same event exists loose AND in the segment
    with open(os.path.join(d, name), "w") as f:
        f.write(body)
    rows = catalog.system(spark, "table_lineage") \
                  .where("job_name = 'dup_job'").collect()
    assert len(rows) == 1  # (event_id, direction, ord) dedupe
    assert len([r for r in L.table_lineage_rows(catalog.warehouse)
                if r[3] == "dup_job"]) == 1


def test_expire_lineage_segment_granularity(spark, catalog, customer):
    from incubator_paimon_spark import lineage as L
    t = catalog.create_table("db.exp_t", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    t.write(spark, customer.limit(5))
    for i in range(4):
        L.record(f"old{i}", sinks=[(t, 1)])
    assert L.compact_events(catalog.warehouse) is not None  # old segment
    time.sleep(0.02)
    cut1 = int(time.time() * 1000)
    time.sleep(0.02)
    for i in range(3):
        L.record(f"mid{i}", sinks=[(t, 1)])
    time.sleep(0.02)
    cut2 = int(time.time() * 1000)
    time.sleep(0.02)
    for i in range(2):
        L.record(f"new{i}", sinks=[(t, 1)])
    assert L.compact_events(catalog.warehouse) is not None  # straddles cut2

    # cut2: the old segment is wholly expired and dropped; the straddling
    # segment stays WHOLE (keep-the-tail rule) so mid* rows survive
    got = L.expire_lineage(catalog.warehouse, cut2)
    assert got["expired_segments"] == 1 and got["expired_events"] == 0
    jobs = {r[3] for r in L.table_lineage_rows(catalog.warehouse)}
    assert jobs == {f"mid{i}" for i in range(3)} | {f"new{i}" for i in range(2)}

    # loose events expire individually
    for i in range(2):
        L.record(f"late{i}", sinks=[(t, 1)])
    cut3 = int(time.time() * 1000) + 1
    got = L.expire_lineage(catalog.warehouse, cut3)
    assert got["expired_events"] == 2 and got["expired_segments"] == 1
    assert L.table_lineage_rows(catalog.warehouse) == []

    # SQL surface (CALL sys.expire_lineage)
    L.record("sql_job", sinks=[(t, 1)])
    res = catalog.sql(spark, "CALL sys.expire_lineage(older_than => "
                             f"{int(time.time() * 1000) + 1})")
    assert L.table_lineage_rows(catalog.warehouse) == []


def test_jdbc_lineage_store(spark, warehouse, customer):
    """The pluggable LineageMeta seam's JDBC implementation: lineage
    rows land in a metastore relation instead of _lineage/ files, the
    system tables serve them, replays are PK-idempotent, and expiry is
    row-exact (reference: the catalog's LineageMeta, JDBC-backed)."""
    import sqlite3

    from incubator_paimon_spark import lineage as L
    from incubator_paimon_spark.jdbc_catalog import JdbcCatalog
    from incubator_paimon_spark.lineage import (JdbcLineageStore,
                                                set_lineage_store)

    db_path = os.path.join(warehouse, "lineage_meta.sqlite")

    def connect():
        con = sqlite3.connect(db_path, timeout=30.0,
                              isolation_level="IMMEDIATE")
        con.execute("PRAGMA busy_timeout=30000")
        return con

    store = JdbcLineageStore(connect, paramstyle="qmark")
    cat = JdbcCatalog(warehouse, lineage_store=store)
    try:
        t = cat.create_table("db.jl_t", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
        t.write(spark, customer.limit(30))
        s = cat.create_table("db.jl_s", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
        s.write(spark, customer.limit(10).withColumn("c_acctbal",
                                                     F.lit(1.0)))
        cat.sql(spark, """
            MERGE INTO db.jl_t t USING db.jl_s s
            ON t.c_custkey = s.c_custkey
            WHEN MATCHED THEN UPDATE SET *""")

        # no file store was touched; rows come from the DB relation
        assert not os.path.isdir(os.path.join(warehouse, "_lineage"))
        rows = _tl(spark, cat)
        assert ("sink", "db", "jl_t", "merge_into") in rows
        assert ("source", "db", "jl_s", "merge_into") in rows
        dl = {(r.direction, r.table_name, r.snapshot_id)
              for r in cat.system(spark, "data_lineage").collect()}
        assert ("sink", "jl_t", 2) in dl and ("source", "jl_s", 1) in dl

        # replayed producer write (same event id) is idempotent
        got = store.all_rows()
        store.append_rows(got)
        assert store.all_rows() == got

        # row-exact expiry through the shared surface
        res = L.expire_lineage(warehouse, int(time.time() * 1000) + 1)
        assert res["expired_events"] == len(got)
        assert cat.system(spark, "table_lineage").count() == 0
    finally:
        set_lineage_store(warehouse, None)


def test_concurrent_compactors_no_loss_no_dupes(spark, catalog, customer):
    """Two threads race compact_events on one warehouse: the lease lock
    serializes rollers (the loser skips or rolls the remainder), and the
    served row set is exactly the written events — nothing lost, nothing
    doubled."""
    import threading

    from incubator_paimon_spark import lineage as L
    t = catalog.create_table("db.cc_t", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    t.write(spark, customer.limit(5))
    # write loose events WITHOUT auto-compaction (threshold stays high)
    for i in range(60):
        L.record(f"cc{i}", sinks=[(t, 1)])
    barrier = threading.Barrier(2)
    errs = []

    def run():
        barrier.wait()
        try:
            L.compact_events(catalog.warehouse)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs
    jobs = sorted(r[3] for r in L.table_lineage_rows(catalog.warehouse))
    assert jobs == sorted(f"cc{i}" for i in range(60))
    _d, loose, segs = _store(catalog)
    assert loose == [] and len(segs) >= 1
