"""JDBC(sqlite)-backed metastore catalog (jdbc_catalog.py, r10).

Reference parity under test (paimon-core/.../jdbc/JdbcCatalog.java,
JdbcCatalogLock.java): listings/DDL arbitrated by the metastore's
composite primary key, catalog locks with lease-expiry reaping, and —
the reason a metastore exists — RACING DDL from two separate processes
resolving to exactly one winner.
"""

import os
import subprocess
import sys
import tempfile

import pytest

from incubator_paimon_spark.jdbc_catalog import (JdbcCatalog,
                                                 JdbcCatalogLock,
                                                 LockNotAcquiredError)


@pytest.fixture()
def jcat(warehouse):
    return JdbcCatalog(warehouse)


def _schema():
    import pyspark.sql.types as T
    return T.StructType([T.StructField("id", T.LongType()),
                         T.StructField("v", T.StringType())])


def test_ddl_matrix(jcat):
    """create / list / get / rename / drop against the metastore — and
    the LISTING comes from the store, not the directory tree."""
    assert jcat.list_databases() == []
    t = jcat.create_table("db.a", _schema(), primary_keys=["id"],
                          options={"bucket": "2"})
    assert jcat.list_databases() == ["db"]
    assert jcat.list_tables("db") == ["a"]
    assert jcat.get_table("db.a").path == t.path

    # duplicate create: the metastore PK is the arbiter
    with pytest.raises(ValueError, match="already exists"):
        jcat.create_table("db.a", _schema())
    assert jcat.create_table("db.a", _schema(),
                             ignore_if_exists=True).path == t.path

    # a failed create must not poison the identifier (claim released)
    with pytest.raises(ValueError):
        jcat.create_table("db.bad", _schema(),
                          options={"merge-engine": "aggregation"})
    assert "bad" not in jcat.list_tables("db")
    jcat.create_table("db.bad", _schema())  # identifier reusable

    jcat.rename_table("db.a", "db.b")
    assert jcat.list_tables("db") == ["b", "bad"]
    with pytest.raises(ValueError, match="not found"):
        jcat.get_table("db.a")
    jcat.get_table("db.b")

    # rename onto an existing target refuses; source intact
    jcat.create_table("db.c", _schema())
    with pytest.raises(ValueError, match="already exists"):
        jcat.rename_table("db.c", "db.b")
    assert sorted(jcat.list_tables("db")) == ["b", "bad", "c"]

    jcat.drop_table("db.c")
    assert sorted(jcat.list_tables("db")) == ["b", "bad"]
    with pytest.raises(ValueError, match="does not exist"):
        jcat.drop_table("db.c", ignore_if_not_exists=False)

    with pytest.raises(ValueError, match="not empty"):
        jcat.drop_database("db")
    jcat.drop_database("db", cascade=True)
    assert jcat.list_databases() == []


def test_catalog_lock_blocks_and_lease_reaps(warehouse):
    jcat = JdbcCatalog(warehouse)
    with jcat.lock("db", "t"):
        with pytest.raises(LockNotAcquiredError):
            with jcat.lock("db", "t", acquire_timeout_ms=300):
                pass
    # released: immediate re-acquire succeeds
    with jcat.lock("db", "t", acquire_timeout_ms=300):
        pass
    # a crashed holder (never released) is reaped once the lease expires
    # (lock ids are database-scoped: "paimon.db")
    crashed = JdbcCatalogLock(jcat.uri, "paimon.db", lease_ms=100)
    assert crashed._try_acquire()
    import time
    time.sleep(0.15)
    with jcat.lock("db", "t", acquire_timeout_ms=500, lease_ms=100):
        pass


def test_data_ops_through_jdbc_catalog(spark, jcat):
    """The metastore changes WHERE identifiers live, not how tables
    work: write/read/merge-on-read run unchanged."""
    from pyspark.sql import functions as F
    d = spark.range(100).select(F.col("id"),
                                F.concat(F.lit("v"), F.col("id"))
                                 .alias("v"))
    t = jcat.create_table("db.data", d.schema, primary_keys=["id"],
                          options={"bucket": "2"})
    t.write(spark, d)
    t.write(spark, d.limit(10).withColumn("v", F.lit("upd")))
    assert t.read(spark).count() == 100
    assert t.read(spark).filter(F.col("v") == "upd").count() == 10


def test_register_existing_adopts_filesystem_tables(warehouse):
    from incubator_paimon_spark import Catalog
    fs = Catalog(warehouse)
    fs.create_table("db.legacy", _schema())
    jcat = JdbcCatalog(warehouse)
    assert jcat.list_tables("db") == []      # metastore is the truth
    assert jcat.register_existing() == 1
    assert jcat.list_tables("db") == ["legacy"]
    jcat.get_table("db.legacy")


_RACE_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from incubator_paimon_spark.jdbc_catalog import JdbcCatalog
import pyspark.sql.types as T
schema = T.StructType([T.StructField("id", T.LongType())])
cat = JdbcCatalog({wh!r})
import time
# barrier-ish: both processes spin until the same wall-clock edge so
# the two INSERTs genuinely race
target = {t0!r}
while time.time() < target:
    pass
try:
    cat.create_table("db.raced", schema)
    print("WINNER")
except ValueError as e:
    assert "already exists" in str(e), e
    print("LOSER")
"""


def test_racing_create_across_processes(warehouse):
    """Two separate PROCESSES race CREATE TABLE on one identifier: the
    metastore primary key must pick exactly one winner (the r5
    commit-race test's shape, applied to catalog DDL)."""
    import time
    JdbcCatalog(warehouse)  # initialize the store
    t0 = time.time() + 1.5
    script = _RACE_SCRIPT.format(repo=os.getcwd(), wh=warehouse, t0=t0)
    procs = [subprocess.Popen([sys.executable, "-c", script],
                              stdout=subprocess.PIPE, text=True)
             for _ in range(2)]
    outs = [p.communicate(timeout=60)[0].strip() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert sorted(outs) == ["LOSER", "WINNER"], outs
    cat = JdbcCatalog(warehouse)
    assert cat.list_tables("db") == ["raced"]
    cat.get_table("db.raced")


def test_racing_rename_across_processes(warehouse):
    """Two processes race RENAME of one table to different targets:
    exactly one rename lands; the loser sees 'does not exist'."""
    import time
    cat = JdbcCatalog(warehouse)
    cat.create_table("db.src", _schema())
    t0 = time.time() + 1.5
    script = r"""
import sys, time
sys.path.insert(0, {repo!r})
from incubator_paimon_spark.jdbc_catalog import JdbcCatalog
cat = JdbcCatalog({wh!r})
target = {t0!r}
while time.time() < target:
    pass
try:
    cat.rename_table("db.src", "db.dst{n}")
    print("WINNER")
except ValueError as e:
    assert "does not exist" in str(e), e
    print("LOSER")
"""
    procs = [subprocess.Popen(
        [sys.executable, "-c",
         script.format(repo=os.getcwd(), wh=warehouse, t0=t0, n=i)],
        stdout=subprocess.PIPE, text=True) for i in range(2)]
    outs = [p.communicate(timeout=60)[0].strip() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert sorted(outs) == ["LOSER", "WINNER"], outs
    cat2 = JdbcCatalog(warehouse)
    tables = cat2.list_tables("db")
    assert len(tables) == 1 and tables[0].startswith("dst"), tables
    cat2.get_table(f"db.{tables[0]}")  # metastore and filesystem agree


def test_lock_release_is_fenced(warehouse):
    """A holder that outlived its lease must NOT release the lock a
    reaping process has since re-acquired (review finding: an
    unfenced DELETE broke mutual exclusion for the third contender)."""
    import time
    jcat = JdbcCatalog(warehouse)
    stale = JdbcCatalogLock(jcat.uri, "paimon.dbf", lease_ms=100)
    assert stale._try_acquire()
    time.sleep(0.15)
    fresh = JdbcCatalogLock(jcat.uri, "paimon.dbf")
    assert fresh._try_acquire()        # reaps the expired row
    stale.__exit__(None, None, None)   # fenced: must not touch fresh's
    third = JdbcCatalogLock(jcat.uri, "paimon.dbf")
    assert not third._try_acquire()    # fresh still holds
    fresh.__exit__(None, None, None)
    assert third._try_acquire()


def test_rename_into_missing_database_rejected(jcat):
    """Cross-db rename must verify the target database row exists (the
    reference's JdbcCatalog rejects renames into an unknown database) —
    otherwise paimon_tables holds rows whose database is absent from
    paimon_databases and listings disagree."""
    jcat.create_table("db.r1", _schema())
    with pytest.raises(ValueError, match="does not exist"):
        jcat.rename_table("db.r1", "nodb.r1")
    # nothing moved: still listed (and only) in the source database
    assert jcat.list_tables("db") == ["r1"]
    assert "nodb" not in jcat.list_databases()
    # after creating the target database the same rename succeeds
    jcat.create_database("db2")
    jcat.rename_table("db.r1", "db2.r1")
    assert jcat.list_tables("db2") == ["r1"]
    assert jcat.list_tables("db") == []


# ----------------------------------------------------------------------
# dialect seam (r11, VERDICT r10 #8): the same races, run against BOTH
# dialects — sqlite (file store) and the in-memory second implementation
# (two instances of one uri = two connections to one shared server state)
def _dbapi_over_sqlite(warehouse, tag, flavor):
    """Certify the networked DB-API dialects' statements in-sandbox: the
    MySQL/Postgres flavor executes its EXACT verb SQL against a sqlite
    DB-API connection (paramstyle translated to qmark; FOR UPDATE elided
    — sqlite's BEGIN IMMEDIATE serializes write transactions, giving the
    row lock's guarantee). A live server swaps only the connect factory."""
    import sqlite3

    from incubator_paimon_spark.jdbc_catalog import (MysqlDialect,
                                                     PostgresDialect)

    path = os.path.join(warehouse, f"dbapi_{flavor}_{tag}.sqlite")

    def connect():
        con = sqlite3.connect(path, timeout=30.0,
                              isolation_level="IMMEDIATE")
        con.execute("PRAGMA journal_mode=WAL")
        con.execute("PRAGMA busy_timeout=30000")
        return con

    base = MysqlDialect if flavor == "mysql" else PostgresDialect

    class Certified(base):
        PARAMSTYLE = "qmark"
        FOR_UPDATE = ""

    return Certified(connect, uri=f"{flavor}+sqlite://{path}")


# ----------------------------------------------------------------------
# HMS certification rig (r13): a fake metastore SERVER implementing the
# exact ThriftHiveMetastore.Client method surface HmsDialect calls
# (create_database/get_database/.../alter_table/lock/unlock), atomically
# per call like a real HMS (each verb is one metastore-DB transaction).
# HmsDialect's thrift CALLS are thereby contract-certified in-sandbox; a
# live HMS swaps only the client factory (same pattern as the MySQL/
# Postgres dialects over a sqlite DB-API connection above).
class _FakeHmsTypes:
    """hive_metastore.ttypes stand-in with the exact struct shapes."""

    class Database:
        def __init__(self, name=None, parameters=None, **kw):
            self.name, self.parameters = name, parameters or {}

    class StorageDescriptor:
        def __init__(self, **kw):
            pass

    class Table:
        def __init__(self, tableName=None, dbName=None, parameters=None,
                     sd=None, **kw):
            self.tableName, self.dbName = tableName, dbName
            self.parameters = parameters or {}
            self.sd = sd

    class LockComponent:
        def __init__(self, type=None, level=None, dbname=None, **kw):
            self.type, self.level, self.dbname = type, level, dbname

    class LockRequest:
        def __init__(self, component=None, user=None, hostname=None,
                     agentInfo=None, **kw):
            self.component = component or []
            self.user, self.hostname = user, hostname
            self.agentInfo = agentInfo

    class UnlockRequest:
        def __init__(self, lockid=None, **kw):
            self.lockid = lockid

    class LockResponse:
        def __init__(self, lockid, state):
            self.lockid, self.state = lockid, state

    class LockState:
        ACQUIRED, WAITING = 1, 2

    class LockType:
        EXCLUSIVE = 1

    class LockLevel:
        DB = 1


class AlreadyExistsException(Exception):
    pass


class NoSuchObjectException(Exception):
    pass


class NoSuchLockException(Exception):
    pass


_HMS_STORES = {}


class _FakeHmsClient:
    def __init__(self, uri):
        import threading as _t
        self._s = _HMS_STORES.setdefault(uri, {
            "guard": _t.RLock(),
            "dbs": {},      # name -> parameters
            "tables": {},   # (db, name) -> parameters
            "locks": {},    # dbname -> (lockid, deadline)
            "next_id": [1],
        })

    # --- databases ---
    def create_database(self, db):
        with self._s["guard"]:
            if db.name in self._s["dbs"]:
                raise AlreadyExistsException(db.name)
            self._s["dbs"][db.name] = dict(db.parameters)

    def get_all_databases(self):
        with self._s["guard"]:
            return list(self._s["dbs"])

    def get_database(self, name):
        with self._s["guard"]:
            if name not in self._s["dbs"]:
                raise NoSuchObjectException(name)
            return _FakeHmsTypes.Database(
                name=name, parameters=self._s["dbs"][name])

    def drop_database(self, name, deleteData, cascade):
        with self._s["guard"]:
            if name not in self._s["dbs"]:
                raise NoSuchObjectException(name)
            del self._s["dbs"][name]
            for k in [k for k in self._s["tables"] if k[0] == name]:
                del self._s["tables"][k]

    # --- tables ---
    def create_table(self, tbl):
        with self._s["guard"]:
            if tbl.dbName not in self._s["dbs"]:
                raise NoSuchObjectException(tbl.dbName)
            key = (tbl.dbName, tbl.tableName)
            if key in self._s["tables"]:
                raise AlreadyExistsException(tbl.tableName)
            self._s["tables"][key] = dict(tbl.parameters)

    def drop_table(self, dbname, name, deleteData):
        with self._s["guard"]:
            if (dbname, name) not in self._s["tables"]:
                raise NoSuchObjectException(name)
            del self._s["tables"][(dbname, name)]

    def get_tables(self, dbname, pattern):
        with self._s["guard"]:
            if dbname not in self._s["dbs"]:
                raise NoSuchObjectException(dbname)
            return [n for d, n in self._s["tables"] if d == dbname]

    def get_table(self, dbname, name):
        with self._s["guard"]:
            if (dbname, name) not in self._s["tables"]:
                raise NoSuchObjectException(name)
            return _FakeHmsTypes.Table(tableName=name, dbName=dbname)

    def alter_table(self, dbname, name, new):
        with self._s["guard"]:
            if (dbname, name) not in self._s["tables"]:
                raise NoSuchObjectException(name)
            dst = (new.dbName, new.tableName)
            if dst in self._s["tables"]:
                raise AlreadyExistsException(new.tableName)
            self._s["tables"][dst] = self._s["tables"].pop((dbname, name))

    # --- locks (server-side expiry, like hive.txn.timeout reaping) ---
    def lock(self, rqst):
        import time as _time
        lease = 3600.0
        if rqst.agentInfo and "paimon-lease-s=" in rqst.agentInfo:
            lease = float(rqst.agentInfo.split("paimon-lease-s=")[1])
        dbname = rqst.component[0].dbname
        with self._s["guard"]:
            now = _time.monotonic()
            held = self._s["locks"].get(dbname)
            if held is not None and held[1] < now:
                held = None  # server reaped the expired holder
                del self._s["locks"][dbname]
            lid = self._s["next_id"][0]
            self._s["next_id"][0] += 1
            if held is not None:
                return _FakeHmsTypes.LockResponse(
                    lid, _FakeHmsTypes.LockState.WAITING)
            self._s["locks"][dbname] = (lid, now + lease)
            return _FakeHmsTypes.LockResponse(
                lid, _FakeHmsTypes.LockState.ACQUIRED)

    def unlock(self, rqst):
        with self._s["guard"]:
            for dbname, (lid, _dl) in list(self._s["locks"].items()):
                if lid == rqst.lockid:
                    del self._s["locks"][dbname]
                    return
        # waiting ids / already-reaped ids: no-op, like the real server
        # raising NoSuchLockException which the dialect tolerates


def _hms_dialect(warehouse, tag):
    from incubator_paimon_spark.jdbc_catalog import HmsDialect
    uri = f"hms://{warehouse}/{tag}"
    return HmsDialect(lambda: _FakeHmsClient(uri), _FakeHmsTypes, uri=uri)


def _dialects(warehouse, tag):
    from incubator_paimon_spark.jdbc_catalog import (InMemoryDialect,
                                                     SqliteDialect)
    return [
        ("sqlite", lambda: SqliteDialect(
            os.path.join(warehouse, f"seam_{tag}.sqlite"))),
        ("memory", lambda: InMemoryDialect(f"memory://{warehouse}/{tag}")),
        ("mysql", lambda: _dbapi_over_sqlite(warehouse, tag, "mysql")),
        ("pg", lambda: _dbapi_over_sqlite(warehouse, tag, "pg")),
        ("hms", lambda: _hms_dialect(warehouse, tag)),
    ]


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4],
                         ids=["sqlite", "memory", "mysql", "pg", "hms"])
def test_dialect_thread_racing_create(warehouse, idx):
    """32 threads x 2 catalog connections race CREATE TABLE on one
    identifier: exactly one winner, everyone else gets the exists
    error — against both dialects."""
    import threading
    name, mk = _dialects(warehouse, "create")[idx]
    cats = [JdbcCatalog(warehouse, dialect=mk()) for _ in range(2)]
    results, barrier = [], threading.Barrier(32)

    def run(i):
        barrier.wait()
        try:
            cats[i % 2].create_table(f"db.raced_{name}", _schema())
            results.append("WINNER")
        except ValueError:
            results.append("LOSER")

    threads = [threading.Thread(target=run, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == ["LOSER"] * 31 + ["WINNER"]
    assert cats[0].list_tables("db") == [f"raced_{name}"]


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4],
                         ids=["sqlite", "memory", "mysql", "pg", "hms"])
def test_dialect_lock_contract(warehouse, idx):
    """Mutual exclusion + lease reap + fenced release hold for both
    dialect implementations of the AbstractDistributedLockDialect
    contract."""
    import time
    _, mk = _dialects(warehouse, "lock")[idx]
    d = mk()
    stale = JdbcCatalogLock(d, "paimon.seam", lease_ms=100)
    assert stale._try_acquire()
    # held: a second contender cannot acquire
    assert not JdbcCatalogLock(d, "paimon.seam")._try_acquire()
    time.sleep(0.15)
    fresh = JdbcCatalogLock(d, "paimon.seam")
    assert fresh._try_acquire()        # reaps the expired row
    stale.__exit__(None, None, None)   # fenced: must not touch fresh's
    third = JdbcCatalogLock(d, "paimon.seam")
    assert not third._try_acquire()    # fresh still holds
    fresh.__exit__(None, None, None)
    assert third._try_acquire()


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4],
                         ids=["sqlite", "memory", "mysql", "pg", "hms"])
def test_dialect_thread_racing_rename(warehouse, idx):
    """Two threads race the same rename: one wins, the loser sees the
    missing-source or existing-target error, and the final state is
    consistent between metastore and filesystem — both dialects."""
    import threading
    name, mk = _dialects(warehouse, "rename")[idx]
    cat = JdbcCatalog(warehouse, dialect=mk())
    cat.create_table(f"db.rn_{name}", _schema())
    outcomes, barrier = [], threading.Barrier(2)

    def run():
        barrier.wait()
        try:
            cat.rename_table(f"db.rn_{name}", f"db.rn_{name}_new")
            outcomes.append("WINNER")
        except ValueError:
            outcomes.append("LOSER")

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(outcomes) == ["LOSER", "WINNER"]
    assert cat.list_tables("db") == [f"rn_{name}_new"]
    cat.get_table(f"db.rn_{name}_new")


def test_inmemory_lock_release_is_noop_safe(warehouse):
    """Double release / release-after-failed-acquire is a no-op on BOTH
    dialects (the sqlite DELETE matches nothing; the in-memory dialect
    must not KeyError)."""
    from incubator_paimon_spark.jdbc_catalog import InMemoryDialect
    d = InMemoryDialect(f"memory://{warehouse}/noop")
    lk = JdbcCatalogLock(d, "paimon.x")
    assert lk._try_acquire()
    lk.__exit__(None, None, None)
    lk.__exit__(None, None, None)          # second release: no-op
    loser = JdbcCatalogLock(d, "paimon.x")
    assert loser._try_acquire()
    failed = JdbcCatalogLock(d, "paimon.x")
    assert not failed._try_acquire()
    failed.__exit__(None, None, None)      # release after failed acquire
    assert not JdbcCatalogLock(d, "paimon.x")._try_acquire()  # still held


def test_hms_dialect_ddl_matrix(warehouse):
    """The full DDL verb surface over HmsDialect's thrift-call mapping:
    databases/tables arbitrate in the (fake) metastore server, purge
    drops table rows in the same server call, rename refuses missing
    targets — the same matrix the sqlite dialect passes."""
    d = _hms_dialect(warehouse, "ddlmx")
    cat = JdbcCatalog(warehouse, dialect=d)
    assert cat.list_databases() == []
    cat.create_table("hdb.a", _schema())
    assert cat.list_databases() == ["hdb"]
    assert cat.list_tables("hdb") == ["a"]
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("hdb.a", _schema())
    cat.rename_table("hdb.a", "hdb.b")
    assert cat.list_tables("hdb") == ["b"]
    with pytest.raises(ValueError, match="does not exist"):
        cat.rename_table("hdb.b", "nodb.b")
    cat.create_table("hdb.c", _schema())
    with pytest.raises(ValueError, match="exists"):
        cat.rename_table("hdb.c", "hdb.b")
    cat.drop_table("hdb.c")
    assert cat.list_tables("hdb") == ["b"]
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_database("hdb")
    cat.drop_database("hdb", cascade=True)
    assert cat.list_databases() == []
