"""End-to-end: a warehouse addressed by URI (file://) drives every byte of
metadata + commit IO through the FileIO abstraction — the same code path an
s3://, gs:// or hdfs:// table takes (only the backend object differs).
Spark itself reads/writes the data files through Hadoop's own scheme
support, which is exactly the split the reference uses."""

import tempfile

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark import Catalog, P


@pytest.fixture
def uri_catalog():
    d = tempfile.mkdtemp(prefix="pmn_uriwh_")
    yield Catalog(f"file://{d}")


def test_uri_warehouse_full_lifecycle(spark, uri_catalog, customer):
    cat = uri_catalog
    t = cat.create_table("db.c_pk", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    assert t.path.startswith("file://")
    t.write(spark, customer)
    upd = customer.limit(10).withColumn("c_acctbal", F.lit(42.0))
    t.write(spark, upd)
    # merge-on-read through the URI path
    assert t.read(spark).count() == customer.count()
    got = (t.read(spark).filter("c_acctbal = 42.0").count())
    assert got == 10
    # time travel + tags + pruning on URI metadata
    assert t.read(spark, snapshot_id=1).filter("c_acctbal = 42.0").count() == 0
    t.create_tag("v1", 1)
    assert t.list_tags() == ["v1"]
    assert t.read(spark, tag="v1").count() == customer.count()
    plan = t.new_scan().plan(P.eq("c_custkey", 3))
    assert 0 < len(plan.entries) <= 2
    # compaction rewrites + commits through FileIO
    t.compact(spark, full=True)
    assert t.read(spark).count() == customer.count()
    # catalog ops on the URI warehouse
    assert cat.list_databases() == ["db"]
    assert cat.list_tables("db") == ["c_pk"]


def test_uri_warehouse_branch_and_expire(spark, uri_catalog, customer):
    cat = uri_catalog
    t = cat.create_table("db.br", customer.schema)
    t.write(spark, customer.limit(40))
    t.write(spark, customer.limit(20))
    b = t.create_branch("dev")
    b.write(spark, customer.limit(5))
    assert b.read(spark).count() == 65
    assert t.read(spark).count() == 60  # main unaffected
    from incubator_paimon_spark.maintenance import expire_snapshots
    n = expire_snapshots(t, retain_max=1, retain_min=1)
    assert n == 1
    assert t.read(spark).count() == 60
