"""JDBC-backed metastore catalog (sqlite), with distributed DDL locks.

The filesystem catalog (`table.Catalog`) derives its listing from the
directory tree and its DDL atomicity from the filesystem — fine for a
single-tenant warehouse, but a shared metastore needs (a) listings that
are transactional with DDL, (b) a create/rename race decided by ONE
arbiter, and (c) a catalog-scope lock for multi-step DDL. The reference
ships exactly this as its JDBC catalog:

- `paimon-core/src/main/java/org/apache/paimon/jdbc/JdbcUtils.java:41-130`
  — a `paimon_tables(catalog_key, database_name, table_name)` relation
  with a composite primary key (the INSERT's uniqueness violation IS
  the create-race arbiter), plus database and properties relations;
- `JdbcCatalogLock.java:52-86` — `runWithLock(db, table, body)`
  acquiring `catalog_key.db.table` in a `paimon_distributed_locks`
  relation, exponential-backoff retry capped by an acquire timeout;
- `AbstractDistributedLockDialect.java` / `SqlLiteDistributedLockDialect`
  — acquire = INSERT of the lock id (conflict = held), release =
  DELETE, plus timed-out-lock cleanup so a crashed holder cannot wedge
  the catalog forever.

This module re-expresses that on Python's stdlib `sqlite3` (the
reference itself ships a SQLite dialect, so a file-backed store is
in-family). Data files stay exactly where the filesystem catalog puts
them (`<warehouse>/<db>.db/<table>`), so `Table` and every engine path
work unchanged — only listing/DDL go through the metastore. Cross-
process safety comes from sqlite's own locking: WAL journal + BEGIN
IMMEDIATE write transactions; every helper opens a short-lived
connection (no pooling needed at catalog-DDL rates).
"""

from __future__ import annotations

import os
import sqlite3
import time

from .table import Catalog, Table

_SCHEMA = (
    # JdbcUtils.CREATE_CATALOG_TABLE (catalog_key scopes multiple
    # logical catalogs onto one store)
    """CREATE TABLE IF NOT EXISTS paimon_tables(
        catalog_key TEXT NOT NULL,
        database_name TEXT NOT NULL,
        table_name TEXT NOT NULL,
        PRIMARY KEY (catalog_key, database_name, table_name))""",
    """CREATE TABLE IF NOT EXISTS paimon_databases(
        catalog_key TEXT NOT NULL,
        database_name TEXT NOT NULL,
        properties TEXT NOT NULL DEFAULT '{}',
        PRIMARY KEY (catalog_key, database_name))""",
    # AbstractDistributedLockDialect.getCreateTableSql — plus the
    # holder's own lease duration, so a reaper judges expiry by the
    # HOLDER's declared lease, not its own
    """CREATE TABLE IF NOT EXISTS paimon_distributed_locks(
        lock_id TEXT NOT NULL PRIMARY KEY,
        acquired_at REAL NOT NULL,
        lease_s REAL NOT NULL DEFAULT 60.0)""",
)


class LockNotAcquiredError(RuntimeError):
    """Catalog lock could not be acquired within the timeout."""


class JdbcCatalogLock:
    """`JdbcCatalogLock.runWithLock` parity: acquire = INSERT of the
    lock id (a PRIMARY KEY conflict means someone holds it), release =
    DELETE, a lock older than `lease_ms` is reaped before retrying (a
    crashed holder can't wedge the catalog), and acquisition retries
    with doubling sleeps capped at `check_max_sleep_ms` until
    `acquire_timeout_ms` elapses."""

    def __init__(self, db_path: str, lock_id: str,
                 acquire_timeout_ms: int = 10_000,
                 check_max_sleep_ms: int = 500,
                 lease_ms: int = 60_000):
        self.db_path = db_path
        self.lock_id = lock_id
        self.acquire_timeout_ms = acquire_timeout_ms
        self.check_max_sleep_ms = check_max_sleep_ms
        self.lease_ms = lease_ms
        self._token: float | None = None

    def _try_acquire(self) -> bool:
        with _connect(self.db_path) as con:
            # tryReleaseTimedOutLock: reap a holder that outlived ITS
            # OWN declared lease (stored in the row — a reaper's lease
            # must not shorten someone else's)
            con.execute(
                "DELETE FROM paimon_distributed_locks "
                "WHERE lock_id = ? AND acquired_at + lease_s < ?",
                (self.lock_id, time.time()))
            try:
                token = time.time()
                con.execute(
                    "INSERT INTO paimon_distributed_locks "
                    "VALUES (?, ?, ?)",
                    (self.lock_id, token, self.lease_ms / 1000.0))
                self._token = token
                return True
            except sqlite3.IntegrityError:
                return False

    def __enter__(self):
        start, sleep = time.time(), 0.05
        while not self._try_acquire():
            if (time.time() - start) * 1000 > self.acquire_timeout_ms:
                raise LockNotAcquiredError(
                    f"could not acquire catalog lock {self.lock_id!r} "
                    f"within {self.acquire_timeout_ms} ms")
            time.sleep(sleep)
            sleep = min(sleep * 2, self.check_max_sleep_ms / 1000.0)
        return self

    def __exit__(self, *exc):
        # FENCED release: only delete the row THIS acquire inserted — a
        # holder that outlived its lease must not release the lock a
        # reaping process has since re-acquired (mutual-exclusion break
        # found in review)
        with _connect(self.db_path) as con:
            con.execute("DELETE FROM paimon_distributed_locks "
                        "WHERE lock_id = ? AND acquired_at = ?",
                        (self.lock_id, self._token))
        self._token = None
        return False


from contextlib import contextmanager


@contextmanager
def _connect(db_path: str):
    """One short-lived connection per operation: the inner `with con`
    scopes the transaction (commit on success, rollback on error) and
    the finally CLOSES the handle — `with sqlite3.connect(...)` alone
    commits but leaks the connection to GC, pinning WAL/-shm files."""
    con = sqlite3.connect(db_path, timeout=30.0,
                          isolation_level="IMMEDIATE")
    try:
        con.execute("PRAGMA journal_mode=WAL")
        con.execute("PRAGMA busy_timeout=30000")
        with con:
            yield con
    finally:
        con.close()


class JdbcCatalog(Catalog):
    """Metastore-backed catalog: listings and DDL arbitration live in a
    sqlite store (default ``<warehouse>/paimon_catalog.sqlite``; pass
    ``uri=`` to share one store across warehouses/processes), table
    data stays on the warehouse filesystem in the same layout the
    filesystem catalog uses. Every inherited surface — `attach`,
    `sql`, system tables, privilege checks — works unchanged, because
    only the listing/DDL primitives are overridden."""

    def __init__(self, warehouse: str, uri: str | None = None,
                 options: dict | None = None, catalog_key: str = "paimon"):
        super().__init__(warehouse, options)
        self.uri = uri or os.path.join(warehouse, "paimon_catalog.sqlite")
        self.catalog_key = catalog_key
        self.options["metastore"] = "jdbc"
        self.options.setdefault("uri", self.uri)
        with _connect(self.uri) as con:
            for ddl in _SCHEMA:
                con.execute(ddl)

    # -- lock surface (JdbcCatalogLock.runWithLock) --------------------
    def lock(self, database: str, table: str = "",
             **kw) -> JdbcCatalogLock:
        """DATABASE-scoped lock id (the `table` arg is accepted for
        call-site readability but does not narrow the scope): every
        DDL on one database serializes against every other — required
        so a create_table cannot interleave with drop_database
        CASCADE's multi-step metastore+filesystem teardown (review
        finding). DDL rates make the coarser scope free."""
        return JdbcCatalogLock(
            self.uri, f"{self.catalog_key}.{database}", **kw)

    # -- databases ------------------------------------------------------
    def create_database(self, db: str, ignore_if_exists: bool = True):
        with _connect(self.uri) as con:
            try:
                con.execute(
                    "INSERT INTO paimon_databases(catalog_key, "
                    "database_name) VALUES (?, ?)", (self.catalog_key, db))
            except sqlite3.IntegrityError:
                if not ignore_if_exists:
                    raise ValueError(f"database {db} exists") from None
        self.io.mkdirs(self._db_path(db))

    def list_databases(self) -> list[str]:
        with _connect(self.uri) as con:
            rows = con.execute(
                "SELECT database_name FROM paimon_databases "
                "WHERE catalog_key = ? ORDER BY database_name",
                (self.catalog_key,)).fetchall()
        return [r[0] for r in rows]

    def drop_database(self, db: str, cascade: bool = False,
                      ignore_if_not_exists: bool = True):
        with self.lock(db):
            if db not in self.list_databases():
                if not ignore_if_not_exists:
                    raise ValueError(f"database {db} does not exist")
                return
            tables = self.list_tables(db)
            if tables and not cascade:
                raise ValueError(f"database {db} is not empty: {tables}")
            with _connect(self.uri) as con:
                con.execute(
                    "DELETE FROM paimon_tables WHERE catalog_key = ? "
                    "AND database_name = ?", (self.catalog_key, db))
                con.execute(
                    "DELETE FROM paimon_databases WHERE catalog_key = ? "
                    "AND database_name = ?", (self.catalog_key, db))
            if self.io.is_dir(self._db_path(db)):
                self.io.delete_dir(self._db_path(db))

    # -- tables ---------------------------------------------------------
    def list_tables(self, db: str) -> list[str]:
        with _connect(self.uri) as con:
            rows = con.execute(
                "SELECT table_name FROM paimon_tables WHERE "
                "catalog_key = ? AND database_name = ? ORDER BY table_name",
                (self.catalog_key, db)).fetchall()
        return [r[0] for r in rows]

    def _claim(self, db: str, name: str) -> bool:
        """One metastore INSERT claims the identifier; the composite
        primary key is the create-race arbiter (JdbcUtils: the insert's
        uniqueness violation, not a filesystem check). The database row
        is verified in the SAME transaction so a claim cannot land in a
        database a concurrent DROP DATABASE is tearing down."""
        with _connect(self.uri) as con:
            if con.execute(
                    "SELECT 1 FROM paimon_databases WHERE catalog_key = ?"
                    " AND database_name = ?",
                    (self.catalog_key, db)).fetchone() is None:
                raise ValueError(f"database {db} does not exist")
            try:
                con.execute(
                    "INSERT INTO paimon_tables VALUES (?, ?, ?)",
                    (self.catalog_key, db, name))
                return True
            except sqlite3.IntegrityError:
                return False

    def create_table(self, identifier: str, schema, partition_keys=None,
                     primary_keys=None, options=None, comment=None,
                     ignore_if_exists: bool = False) -> Table:
        db, name = identifier.split(".", 1)
        self.create_database(db)
        path = os.path.join(self._db_path(db), name)
        # the db-scoped catalog lock serializes the claim+schema-write
        # against drop_database CASCADE's teardown (review finding: an
        # unlocked create could write schema files into a directory the
        # cascade was about to delete)
        with self.lock(db):
            if not self._claim(db, name):
                if ignore_if_exists:
                    return Table(path)
                raise ValueError(f"table {identifier} already exists")
            try:
                from .metadata.schema import SchemaManager, TableSchema
                from .table import _validate
                ts = TableSchema.create(schema, partition_keys,
                                        primary_keys, options, comment)
                _validate(ts)
                SchemaManager(path).commit_new(ts)
            except Exception:
                # a claim without a schema is a phantom: release it so
                # the failed create doesn't poison the identifier
                with _connect(self.uri) as con:
                    con.execute(
                        "DELETE FROM paimon_tables WHERE catalog_key = ? "
                        "AND database_name = ? AND table_name = ?",
                        (self.catalog_key, db, name))
                raise
        t = Table(path)
        for ref, database in getattr(self, "_attached", []):
            s = ref()
            if s is not None and (database is None or database == db):
                self._bind_view(s, t, f"{db}_{name}")
        return t

    def get_table(self, identifier: str) -> Table:
        db, name = identifier.split(".", 1)
        with _connect(self.uri) as con:
            row = con.execute(
                "SELECT 1 FROM paimon_tables WHERE catalog_key = ? AND "
                "database_name = ? AND table_name = ?",
                (self.catalog_key, db, name)).fetchone()
        if row is None:
            raise ValueError(f"table {identifier} not found in metastore")
        return super().get_table(identifier)

    def drop_table(self, identifier: str, ignore_if_not_exists: bool = True):
        db, name = identifier.split(".", 1)
        with self.lock(db, name):
            with _connect(self.uri) as con:
                cur = con.execute(
                    "DELETE FROM paimon_tables WHERE catalog_key = ? AND "
                    "database_name = ? AND table_name = ?",
                    (self.catalog_key, db, name))
                existed = cur.rowcount > 0
            if not existed and not ignore_if_not_exists:
                raise ValueError(f"table {identifier} does not exist")
            path = os.path.join(self._db_path(db), name)
            if existed and self.io.is_dir(path):
                self.io.delete_dir(path)

    def rename_table(self, old: str, new: str):
        db1, n1 = old.split(".", 1)
        db2, n2 = new.split(".", 1)
        # db-scoped source lock (reference locks the fromTable) so two
        # racing renames of one table serialize; a cross-db rename also
        # locks the target database — in sorted order so two opposed
        # renames cannot deadlock. The metastore UPDATE inside one
        # transaction is the arbiter for the target identifier.
        import contextlib
        locks = contextlib.ExitStack()
        for db in sorted({db1, db2}):
            locks.enter_context(self.lock(db))
        with locks:
            with _connect(self.uri) as con:
                # the UPDATE has no FK: verify the target database row
                # exists (same check _claim does) — the reference's
                # JdbcCatalog rejects renames into an unknown database
                if db2 != db1 and con.execute(
                        "SELECT 1 FROM paimon_databases WHERE catalog_key = ?"
                        " AND database_name = ?",
                        (self.catalog_key, db2)).fetchone() is None:
                    raise ValueError(
                        f"target database {db2} does not exist in metastore")
                try:
                    cur = con.execute(
                        "UPDATE paimon_tables SET database_name = ?, "
                        "table_name = ? WHERE catalog_key = ? AND "
                        "database_name = ? AND table_name = ?",
                        (db2, n2, self.catalog_key, db1, n1))
                except sqlite3.IntegrityError:
                    raise ValueError(
                        f"rename target {new} already exists") from None
                if cur.rowcount == 0:
                    raise ValueError(f"table {old} does not exist")
            try:
                self.io.mkdirs(self._db_path(db2))
                self.io.rename(os.path.join(self._db_path(db1), n1),
                               os.path.join(self._db_path(db2), n2))
            except Exception:
                # filesystem move failed: revert the metastore row so
                # the catalog and the data agree again
                with _connect(self.uri) as con:
                    con.execute(
                        "UPDATE paimon_tables SET database_name = ?, "
                        "table_name = ? WHERE catalog_key = ? AND "
                        "database_name = ? AND table_name = ?",
                        (db1, n1, self.catalog_key, db2, n2))
                raise

    # -- migration ------------------------------------------------------
    def register_existing(self) -> int:
        """Adopt tables a FILESYSTEM catalog already created under this
        warehouse into the metastore (the migrate seam): scans the
        directory layout once and inserts missing rows. Returns how
        many identifiers were added."""
        added = 0
        fs = Catalog(self.warehouse)
        for db in fs.list_databases():
            self.create_database(db)
            for name in fs.list_tables(db):
                if self._claim(db, name):
                    added += 1
        return added
