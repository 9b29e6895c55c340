"""Lineage system tables (lineage.py; TableLineageTable.java:59,
Source/SinkTableLineageTable, DataLineageTable): MERGE INTO, matview sync
and clone produce warehouse-persisted lineage events served by
sys.table_lineage / sys.data_lineage."""

import shutil
import tempfile

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
