"""File-based privilege system: users, grants, and a privileged catalog.

Mirrors the reference's privilege package
(paimon-core/src/main/java/org/apache/paimon/privilege/
FileBasedPrivilegeManager.java:60-133, PrivilegeCheckerImpl.java:131-141,
PrivilegeType.java:30-41, PrivilegedCatalog.java:111-206): two
primary-key system tables at the WAREHOUSE ROOT hold the state —
``user.sys`` (user → sha256(password)) and ``privilege.sys``
((name, entity_type, identifier, privilege), all primary key) — so the
access-control data is itself versioned, snapshot-isolated table data
readable with the ordinary engine. Privilege checks walk the identifier
hierarchy ``db.t → db → ""`` (the whole-catalog identifier), exactly the
reference's recursive check. ``root`` bypasses all checks; ``anonymous``
is the default identity; ADMIN is required to manage users/grants.

Freshness without a per-check Spark job: the checker caches the two
tables' contents keyed by their latest snapshot ids (one hint-file read
per check — control-plane), reloading only when some process committed.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import types as T

from .metadata.schema import SchemaManager, TableSchema
from .predicate import And, P
from .table import Catalog, Table

USER_ROOT = "root"
USER_ANONYMOUS = "anonymous"
PASSWORD_ANONYMOUS = "anonymous"
IDENTIFIER_WHOLE_CATALOG = ""

# privilege → the narrowest scope it applies to (PrivilegeType.java):
# TABLE privileges may be granted at table, database, or catalog scope;
# DATABASE privileges at database or catalog; CATALOG only at catalog.
PRIVILEGES_ON_TABLE = {"SELECT", "INSERT", "ALTER_TABLE", "DROP_TABLE"}
PRIVILEGES_ON_DATABASE = {"CREATE_TABLE", "DROP_DATABASE"}
PRIVILEGES_ON_CATALOG = {"CREATE_DATABASE", "ADMIN"}
ALL_PRIVILEGES = (PRIVILEGES_ON_TABLE | PRIVILEGES_ON_DATABASE
                  | PRIVILEGES_ON_CATALOG)

_USER_SCHEMA = T.StructType([
    T.StructField("user", T.StringType(), False),
    T.StructField("sha256", T.BinaryType(), True),
])
_PRIV_SCHEMA = T.StructType([
    T.StructField("name", T.StringType(), False),
    T.StructField("entity_type", T.StringType(), False),
    T.StructField("identifier", T.StringType(), False),
    T.StructField("privilege", T.StringType(), False),
])


class NoPrivilegeException(PermissionError):
    def __init__(self, user, entity, identifier, privilege):
        super().__init__(
            f"User {user} doesn't have privilege {privilege} on {entity} "
            f"{identifier!r}")


def _sha256(password: str) -> bytes:
    return hashlib.sha256(password.encode("utf-8")).digest()


def _grantable_at(identifier: str, privilege: str) -> bool:
    if identifier == IDENTIFIER_WHOLE_CATALOG:
        return True
    if "." in identifier:
        return privilege in PRIVILEGES_ON_TABLE
    return privilege in (PRIVILEGES_ON_TABLE | PRIVILEGES_ON_DATABASE)


class PrivilegeChecker:
    """check() walks db.t → db → '' like PrivilegeCheckerImpl."""

    def __init__(self, user: str, grants: dict[str, set]):
        self.user = user
        self._grants = grants

    def check(self, identifier: str, privilege: str) -> bool:
        if privilege in self._grants.get(identifier, ()):
            return True
        if identifier == IDENTIFIER_WHOLE_CATALOG:
            return False
        return self.check(identifier[:max(identifier.rfind("."), 0)],
                          privilege)

    def _assert(self, entity, identifier, privilege):
        if not self.check(identifier, privilege):
            raise NoPrivilegeException(self.user, entity, identifier,
                                       privilege)

    def assert_select(self, ident):
        self._assert("table", ident, "SELECT")

    def assert_insert(self, ident):
        self._assert("table", ident, "INSERT")

    def assert_alter_table(self, ident):
        self._assert("table", ident, "ALTER_TABLE")

    def assert_drop_table(self, ident):
        self._assert("table", ident, "DROP_TABLE")

    def assert_create_table(self, db):
        self._assert("database", db, "CREATE_TABLE")

    def assert_drop_database(self, db):
        self._assert("database", db, "DROP_DATABASE")

    def assert_create_database(self):
        self._assert("catalog", IDENTIFIER_WHOLE_CATALOG, "CREATE_DATABASE")

    def assert_admin(self):
        self._assert("catalog", IDENTIFIER_WHOLE_CATALOG, "ADMIN")


class AllGrantedChecker(PrivilegeChecker):
    """root (and disabled-privilege catalogs): everything allowed
    (AllGrantedPrivilegeChecker.java)."""

    def __init__(self, user: str = USER_ROOT):
        super().__init__(user, {})

    def check(self, identifier, privilege):
        return True


class PrivilegeManager:
    def __init__(self, spark, warehouse: str, user: str = USER_ANONYMOUS,
                 password: str = PASSWORD_ANONYMOUS):
        self.spark = spark
        self.warehouse = warehouse
        self.user = user
        self._sha = _sha256(password)
        self._cache_key = None
        self._cache = None  # (users: dict, grants: dict[user][ident] -> set)

    def _path(self, name):
        return os.path.join(self.warehouse, name)

    def enabled(self) -> bool:
        return (SchemaManager(self._path("user.sys")).latest_id() is not None
                and SchemaManager(
                    self._path("privilege.sys")).latest_id() is not None)

    # -- lifecycle ----------------------------------------------------
    def initialize(self, root_password: str):
        """Enable the privilege system: create both system tables, the
        root user, and the anonymous user (initializePrivilege)."""
        if self.enabled():
            raise ValueError(f"privilege system already enabled in "
                             f"warehouse {self.warehouse}")
        for name, schema, pks in (
                ("user.sys", _USER_SCHEMA, ["user"]),
                ("privilege.sys", _PRIV_SCHEMA,
                 ["name", "entity_type", "identifier", "privilege"])):
            ts = TableSchema.create(schema, None, pks, {"bucket": "1"}, None)
            SchemaManager(self._path(name)).commit_new(ts)
        self._write_users([(USER_ROOT, _sha256(root_password)),
                           (USER_ANONYMOUS, _sha256(PASSWORD_ANONYMOUS))])

    def _user_table(self) -> Table:
        return Table(self._path("user.sys"))

    def _priv_table(self) -> Table:
        return Table(self._path("privilege.sys"))

    def _write_users(self, rows):
        self._user_table().write(
            self.spark, self.spark.createDataFrame(rows, _USER_SCHEMA))

    def _load(self):
        ut, pt = self._user_table(), self._priv_table()
        key = (ut.snapshots.latest_id(), pt.snapshots.latest_id())
        if key != self._cache_key:
            users = {r["user"]: bytes(r["sha256"])
                     for r in ut.read(self.spark).collect()}
            grants: dict = {}
            for r in pt.read(self.spark).collect():
                grants.setdefault(r["name"], {}) \
                      .setdefault(r["identifier"], set()).add(r["privilege"])
            self._cache_key, self._cache = key, (users, grants)
        return self._cache

    def checker(self) -> PrivilegeChecker:
        if not self.enabled():
            return AllGrantedChecker(self.user)
        users, grants = self._load()
        stored = users.get(self.user)
        if stored is None or stored != self._sha:
            raise ValueError(
                f"User {self.user} not found or password incorrect")
        if self.user == USER_ROOT:
            return AllGrantedChecker(self.user)
        return PrivilegeChecker(self.user, grants.get(self.user, {}))

    # -- user / grant management (all require ADMIN) ------------------
    def create_user(self, user: str, password: str):
        self.checker().assert_admin()
        users, _ = self._load()
        if user in users:
            raise ValueError(f"User {user} already exists")
        self._write_users([(user, _sha256(password))])

    def drop_user(self, user: str):
        self.checker().assert_admin()
        if user in (USER_ROOT, USER_ANONYMOUS):
            raise ValueError(f"{user} cannot be dropped")
        self._user_table().delete_where(self.spark, P.eq("user", user))
        self._priv_table().delete_where(self.spark, P.eq("name", user))

    def grant(self, user: str, identifier: str, privilege: str):
        self.checker().assert_admin()
        privilege = privilege.upper()
        if privilege not in ALL_PRIVILEGES:
            raise ValueError(f"unknown privilege {privilege!r}; "
                             f"have {sorted(ALL_PRIVILEGES)}")
        if not _grantable_at(identifier, privilege):
            raise ValueError(f"privilege {privilege} cannot be granted on "
                             f"identifier {identifier!r}")
        if user == USER_ROOT:
            raise ValueError(f"Cannot change privilege for user {USER_ROOT}")
        users, _ = self._load()
        if user not in users:
            raise ValueError(f"User {user} does not exist")
        self._priv_table().write(self.spark, self.spark.createDataFrame(
            [(user, "USER", identifier, privilege)], _PRIV_SCHEMA))

    def revoke(self, user: str, identifier: str, privilege: str) -> int:
        self.checker().assert_admin()
        if user == USER_ROOT:
            raise ValueError(f"Cannot change privilege for user {USER_ROOT}")
        users, grants = self._load()
        if user not in users:
            raise ValueError(f"User {user} does not exist")
        privilege = privilege.upper()
        # raw-prefix cascade, same predicate the reference builds
        # (revokeImpl: startsWith(identifier)) — a db-scope revoke also
        # removes that db's table-scope grants of the same privilege
        hits = [i for i, ps in grants.get(user, {}).items()
                if privilege in ps and i.startswith(identifier)]
        if not hits:
            raise ValueError(
                f"User {user} does not have privilege {privilege} on "
                f"{identifier!r} (it may hold it at a higher level)")
        self._priv_table().delete_where(self.spark, And([
            P.eq("name", user), P.eq("entity_type", "USER"),
            P.starts_with("identifier", identifier),
            P.eq("privilege", privilege)]))
        return len(hits)

    # -- object lifecycle propagation (objectDropped/objectRenamed) ---
    def object_dropped(self, identifier: str):
        if self.enabled():
            self._priv_table().delete_where(
                self.spark, P.starts_with("identifier", identifier))

    def object_renamed(self, old: str, new: str):
        if not self.enabled() or old == new:
            return
        pt = self._priv_table()
        rows = [r for r in pt.read(self.spark).collect()
                if r["identifier"] == old
                or r["identifier"].startswith(old + ".")]
        if not rows:
            return
        pt.delete_where(self.spark, P.starts_with("identifier", old))
        pt.write(self.spark, self.spark.createDataFrame(
            [(r["name"], r["entity_type"],
              new + r["identifier"][len(old):], r["privilege"])
             for r in rows], _PRIV_SCHEMA))


class PrivilegedCatalog(Catalog):
    """Catalog wrapper enforcing privileges on every operation
    (PrivilegedCatalog.java). When the warehouse has no privilege
    tables, every check passes (privilege system disabled)."""

    def __init__(self, spark, warehouse: str, user: str = USER_ANONYMOUS,
                 password: str = PASSWORD_ANONYMOUS):
        super().__init__(warehouse)
        self.privileges = PrivilegeManager(spark, warehouse, user, password)

    def _checker(self):
        return self.privileges.checker()

    def create_database(self, db, ignore_if_exists=True):
        self._checker().assert_create_database()
        return super().create_database(db, ignore_if_exists)

    def create_table(self, identifier, schema, **kw):
        self._checker().assert_create_table(identifier.split(".", 1)[0])
        t = super().create_table(identifier, schema, **kw)
        return PrivilegedTable(t, self._checker, identifier)

    def get_table(self, identifier):
        t = super().get_table(identifier)
        return PrivilegedTable(t, self._checker, identifier)

    def drop_table(self, identifier, ignore_if_not_exists=True):
        self._checker().assert_drop_table(identifier)
        super().drop_table(identifier, ignore_if_not_exists)
        self.privileges.object_dropped(identifier)

    def rename_table(self, old, new):
        self._checker().assert_alter_table(old)
        super().rename_table(old, new)
        self.privileges.object_renamed(old, new)


class PrivilegedTable:
    """Table proxy: SELECT guards reads, INSERT guards data mutations,
    ALTER_TABLE guards schema changes; everything else delegates."""

    # Mirrors PrivilegedFileStoreTable.java: SELECT guards reads AND
    # metadata listings (tags/branches/consumers, lines 239-251,275);
    # INSERT guards every mutating entry point (lines 82,143-221,257-269)
    # including the raw write builder and snapshot-destroying maintenance.
    _SELECT = ("read", "new_scan", "new_query", "system", "to_view", "incremental",
               "list_tags", "tag_snapshot", "list_branches", "branch_table",
               "list_consumers", "read_consumer")
    _INSERT = ("write", "delete_where", "update_where", "merge_into",
               "truncate", "compact", "drop_partition",
               "new_write", "rollback_to", "create_tag", "delete_tag",
               "create_branch", "fast_forward", "expire_snapshots",
               "remove_orphan_files", "write_consumer", "analyze")

    def __init__(self, table: Table, checker_fn, identifier: str):
        self._table = table
        self._checker_fn = checker_fn
        self._identifier = identifier

    def __getattr__(self, name):
        attr = getattr(self._table, name)
        if name in self._SELECT:
            self._checker_fn().assert_select(self._identifier)
        elif name in self._INSERT:
            self._checker_fn().assert_insert(self._identifier)
        if name == "branch_table":
            # returning the RAW branch table would hand a SELECT-only
            # user an unguarded mutable handle (write/rollback on the
            # branch); the reference wraps switchToBranch results in
            # the proxy too (PrivilegedFileStoreTable.java:275)
            return lambda branch: PrivilegedTable(
                attr(branch), self._checker_fn, self._identifier)
        return attr

    @property
    def schemas(self):
        self._checker_fn().assert_alter_table(self._identifier)
        return self._table.schemas
