"""End-to-end: a warehouse addressed by URI (file://) drives every byte of
metadata + commit IO through the FileIO abstraction — the same code path an
s3://, gs:// or hdfs:// table takes (only the backend object differs).
Spark itself reads/writes the data files through Hadoop's own scheme
support, which is exactly the split the reference uses."""

import shutil
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


def test_lease_lock_two_racing_committers():
    """Two threads race snapshot CAS-creates through the LeaseFileLock on
    an ArrowFS root (the exact code path an s3:// table takes when the
    lease provider is installed): every contended create admits exactly
    one winner, and a full commit sequence loses no commits."""
    import threading

    from incubator_paimon_spark import fileio as fio

    d = tempfile.mkdtemp(prefix="pmn_lease_")
    io = fio.ArrowFSFileIO(f"file://{d}")
    fio.set_lock_provider(fio.lease_lock_provider(settle_s=0.01))
    try:
        # force the lock branch (not the hdfs atomic-rename branch) the
        # way an S3 fs would: the provider is consulted FIRST in try_create
        results = []
        def committer(tid):
            wins = 0
            for n in range(1, 21):
                path = f"file://{d}/snapshot-{n}"
                if io.try_create(path, f"writer{tid}".encode()):
                    wins += 1
            results.append((tid, wins))

        ts = [threading.Thread(target=committer, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # every snapshot exists exactly once, total wins == 20
        assert sum(w for _tid, w in results) == 20
        for n in range(1, 21):
            assert io.exists(f"file://{d}/snapshot-{n}")
        # no lock files left behind
        assert not [x for x in io.list_names(d) if x.endswith(".lock")]

        # expired-lease takeover: a dead holder's lock is broken
        import json, time
        stale = f"file://{d}/snapshot-99"
        io.write_overwrite(stale + ".lock", json.dumps(
            {"owner": "dead", "expire_at_ms": int(time.time() * 1000) - 5}).encode())
        assert io.try_create(stale, b"alive")
        assert io.read_bytes(stale) == b"alive"
    finally:
        fio.set_lock_provider(None)
        shutil.rmtree(d, ignore_errors=True)
