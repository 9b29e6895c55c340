"""Clone-table tests (docs/content/migration/clone-tables.md; the
reference's Flink clone action): only latest-snapshot files travel — data
files, DV/index manifests + files, statistics, full schema history — and
the target starts independent at snapshot 1."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark import Catalog, P
from incubator_paimon_spark.maintenance import clone_table


@pytest.fixture()
def dst_catalog():
    wh = tempfile.mkdtemp(prefix="pmn_clone_wh_")
    yield Catalog(wh)
    shutil.rmtree(wh, ignore_errors=True)


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_clone_pk_with_schema_history(spark, catalog, dst_catalog, customer):
    t = catalog.create_table("db.src", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    t.write(spark, customer)
    # schema evolution between commits: old files cite schema 0
    catalog.sql(spark, "ALTER TABLE db.src ADD COLUMN vip BOOLEAN")
    t = catalog.get_table("db.src")
    t.write(spark, customer.limit(40).withColumn("vip", F.lit(True)))

    out = clone_table(spark, t, dst_catalog, "db2.dst")
    c = out["table"]
    assert out["files"] > 0 and out["bytes"] > 0
    assert _same(t.read(spark), c.read(spark))
    # clone starts at snapshot 1, with the full schema history
    assert c.snapshots.latest().id == 1
    assert {e.file.schema_id for e in c.entries_at()} == \
        {e.file.schema_id for e in t.entries_at()}

    # independence: writes to the clone never touch the source
    before = t.read(spark).count()
    c.write(spark, customer.limit(5).withColumn("c_custkey",
                                                F.col("c_custkey") + 10_000)
            .withColumn("vip", F.lit(False)))
    assert t.read(spark).count() == before
    assert c.read(spark).count() == before + 5


def test_clone_carries_dv_and_statistics(spark, catalog, dst_catalog,
                                         customer):
    t = catalog.create_table("db.dvsrc", customer.schema,
                             options={"deletion-vectors.enabled": "true"})
    t.write(spark, customer)
    t.delete_where(spark, P.lt("c_custkey", 30))
    from incubator_paimon_spark.analyze import analyze_table
    analyze_table(spark, t)

    c = clone_table(spark, t, dst_catalog, "db2.dvdst")["table"]
    assert _same(t.read(spark), c.read(spark))
    assert c.read(spark).filter("c_custkey < 30").count() == 0
    snap = c.snapshots.latest()
    assert snap.dv_manifest is not None
    assert snap.statistics is not None
    from incubator_paimon_spark.analyze import read_statistics
    assert read_statistics(c) == read_statistics(t)


def test_clone_procedure(spark, catalog, dst_catalog, orders):
    t = catalog.create_table("db.po", orders.schema,
                             partition_keys=["o_orderstatus"])
    t.write(spark, orders)
    catalog.sql(spark, f"CALL sys.clone(table => 'db.po', "
                       f"target_table => 'db2.po', "
                       f"target_warehouse => '{dst_catalog.warehouse}')")
    c = Catalog(dst_catalog.warehouse).get_table("db2.po")
    assert _same(t.read(spark), c.read(spark))
    # same-catalog clone, explicit parallelism
    catalog.sql(spark, "CALL sys.clone(table => 'db.po', "
                       "target_table => 'db.po2', parallelism => 2)")
    assert _same(t.read(spark), catalog.get_table("db.po2").read(spark))


def test_clone_dynamic_bucket_index(spark, catalog, dst_catalog, customer):
    """Dynamic-bucket tables carry a hash index referenced by the
    snapshot's indexManifest — the clone must copy it so upserts into the
    clone keep routing keys to their existing buckets."""
    t = catalog.create_table("db.dynsrc", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "-1"})
    t.write(spark, customer)
    t.write(spark, customer.limit(30).withColumn("c_acctbal", F.lit(9.0)))
    assert t.snapshots.latest().index_manifest is not None

    c = clone_table(spark, t, dst_catalog, "db2.dyndst")["table"]
    assert c.snapshots.latest().index_manifest is not None
    assert _same(t.read(spark), c.read(spark))
    # upsert into the clone: index routing keeps the key unique
    c.write(spark, customer.limit(30).withColumn("c_acctbal", F.lit(7.0)))
    assert c.read(spark).count() == customer.count()
    assert c.read(spark).filter("c_acctbal = 7.0").count() == 30


def test_clone_into_jdbc_managed_warehouse(spark, catalog, orders):
    """CALL sys.clone with a target_warehouse that a JdbcCatalog manages
    (paimon_catalog.sqlite present) must register the clone in that
    metastore — otherwise the clone is invisible to listings/get_table
    until register_existing() runs."""
    import tempfile
    from incubator_paimon_spark.jdbc_catalog import JdbcCatalog
    t = catalog.create_table("db.jsrc", orders.schema,
                             partition_keys=["o_orderstatus"])
    t.write(spark, orders.limit(500))
    wh = tempfile.mkdtemp(prefix="pmn_jclone_wh_")
    try:
        jcat = JdbcCatalog(wh)  # initializes paimon_catalog.sqlite
        catalog.sql(spark, f"CALL sys.clone(table => 'db.jsrc', "
                           f"target_table => 'dbj.jdst', "
                           f"target_warehouse => '{wh}')")
        # visible to the metastore without register_existing
        assert jcat.list_tables("dbj") == ["jdst"]
        c = jcat.get_table("dbj.jdst")
        assert _same(t.read(spark), c.read(spark))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
