"""File-based privilege system (privilege.py) — semantics mirror the
reference's FileBasedPrivilegeManager / PrivilegedCatalog tests:
init → users → grants with hierarchy inheritance → enforcement on
catalog/table ops → revoke cascade → drop propagation."""

import pytest
from pyspark.sql import types as T

from incubator_paimon_spark.privilege import (NoPrivilegeException,
                                              PrivilegedCatalog,
                                              PrivilegedTable,
                                              PrivilegeManager)

SCHEMA = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("v", T.StringType())])


@pytest.fixture()
def wh(tmp_path, spark):
    """An initialized privileged warehouse with one table and one user."""
    warehouse = str(tmp_path / "priv_wh")
    root = PrivilegedCatalog(spark, warehouse, "root", "rootpw")
    # before init: everything allowed (privilege system disabled)
    t = root.create_table("db.t", SCHEMA)
    t.write(spark, spark.createDataFrame([(1, "a")], SCHEMA))
    root.privileges.initialize("rootpw")
    root.privileges.create_user("alice", "alicepw")
    return warehouse


def test_disabled_warehouse_allows_everything(tmp_path, spark):
    cat = PrivilegedCatalog(spark, str(tmp_path / "open_wh"))
    t = cat.create_table("db.open", SCHEMA)
    t.write(spark, spark.createDataFrame([(1, "a")], SCHEMA))
    assert t.read(spark).count() == 1


def test_root_bypasses_all_checks(wh, spark):
    root = PrivilegedCatalog(spark, wh, "root", "rootpw")
    t = root.get_table("db.t")
    assert t.read(spark).count() == 1
    t.write(spark, spark.createDataFrame([(2, "b")], SCHEMA))


def test_wrong_password_rejected(wh, spark):
    bad = PrivilegedCatalog(spark, wh, "alice", "wrong")
    with pytest.raises(ValueError, match="password incorrect"):
        bad.get_table("db.t").read(spark)
    ghost = PrivilegedCatalog(spark, wh, "nobody", "x")
    with pytest.raises(ValueError, match="not found or password"):
        ghost.get_table("db.t").read(spark)


def test_enforcement_and_grant_hierarchy(wh, spark):
    root = PrivilegedCatalog(spark, wh, "root", "rootpw")
    alice = PrivilegedCatalog(spark, wh, "alice", "alicepw")

    # no grants yet: SELECT, INSERT, CREATE TABLE, CREATE DATABASE all fail
    with pytest.raises(NoPrivilegeException, match="SELECT"):
        alice.get_table("db.t").read(spark)
    with pytest.raises(NoPrivilegeException, match="INSERT"):
        alice.get_table("db.t").write(
            spark, spark.createDataFrame([(9, "x")], SCHEMA))
    with pytest.raises(NoPrivilegeException, match="CREATE_TABLE"):
        alice.create_table("db.t2", SCHEMA)
    with pytest.raises(NoPrivilegeException, match="CREATE_DATABASE"):
        alice.create_database("db2", ignore_if_exists=False)

    # table-scope SELECT
    root.privileges.grant("alice", "db.t", "SELECT")
    assert alice.get_table("db.t").read(spark).count() == 1
    with pytest.raises(NoPrivilegeException):
        alice.get_table("db.t").write(
            spark, spark.createDataFrame([(9, "x")], SCHEMA))

    # database-scope INSERT inherits down to the table
    root.privileges.grant("alice", "db", "INSERT")
    alice.get_table("db.t").write(
        spark, spark.createDataFrame([(2, "b")], SCHEMA))
    assert root.get_table("db.t").read(spark).count() == 2

    # ALTER_TABLE guards schema changes
    with pytest.raises(NoPrivilegeException, match="ALTER_TABLE"):
        alice.get_table("db.t").schemas.add_column("extra", T.StringType())
    root.privileges.grant("alice", "db.t", "ALTER_TABLE")
    alice.get_table("db.t").schemas.add_column("extra", T.StringType())

    # non-admin cannot manage users or grants
    with pytest.raises(NoPrivilegeException, match="ADMIN"):
        alice.privileges.create_user("bob", "pw")
    with pytest.raises(NoPrivilegeException, match="ADMIN"):
        alice.privileges.grant("alice", "", "ADMIN")


def test_grant_scope_validation_and_revoke_cascade(wh, spark):
    root = PrivilegedCatalog(spark, wh, "root", "rootpw")
    pm = root.privileges
    with pytest.raises(ValueError, match="cannot be granted"):
        pm.grant("alice", "db.t", "CREATE_TABLE")  # db-target at table scope
    with pytest.raises(ValueError, match="cannot be granted"):
        pm.grant("alice", "db", "ADMIN")  # catalog-target at db scope
    with pytest.raises(ValueError, match="Cannot change privilege"):
        pm.grant("root", "", "ADMIN")

    pm.grant("alice", "db", "SELECT")
    pm.grant("alice", "db.t", "SELECT")
    alice = PrivilegedCatalog(spark, wh, "alice", "alicepw")
    assert alice.get_table("db.t").read(spark).count() == 1
    # db-scope revoke cascades to the table-scope grant (prefix match)
    assert pm.revoke("alice", "db", "SELECT") == 2
    with pytest.raises(NoPrivilegeException):
        alice.get_table("db.t").read(spark)
    with pytest.raises(ValueError, match="does not have privilege"):
        pm.revoke("alice", "db", "SELECT")


def test_drop_and_rename_propagate_to_grants(wh, spark):
    root = PrivilegedCatalog(spark, wh, "root", "rootpw")
    pm = root.privileges
    pm.grant("alice", "db.t", "SELECT")
    root.rename_table("db.t", "db.t9")
    alice = PrivilegedCatalog(spark, wh, "alice", "alicepw")
    assert alice.get_table("db.t9").read(spark).count() == 1  # grant moved
    root.drop_table("db.t9")
    _, grants = pm._load()
    assert not grants.get("alice")  # dropped object's grants cleaned up
    with pytest.raises(ValueError, match="cannot be dropped"):
        pm.drop_user("anonymous")
    pm.drop_user("alice")
    with pytest.raises(ValueError, match="not found"):
        PrivilegedCatalog(spark, wh, "alice", "alicepw") \
            .privileges.checker()


def test_call_procedures_surface(tmp_path, spark):
    from incubator_paimon_spark.procedures import call_sql
    warehouse = str(tmp_path / "proc_wh")
    root = PrivilegedCatalog(spark, warehouse, "root", "rootpw")
    t = root.create_table("db.p", SCHEMA)
    t.write(spark, spark.createDataFrame([(1, "a")], SCHEMA))
    call_sql(spark, root,
             "CALL sys.init_file_based_privilege(root_password => 'rootpw')")
    call_sql(spark, root, "CALL sys.create_privileged_user("
                          "username => 'bob', password => 'bobpw')")
    call_sql(spark, root, "CALL sys.grant_privilege_to_user("
                          "username => 'bob', privilege => 'SELECT', "
                          "database => 'db', table => 'p')")
    bob = PrivilegedCatalog(spark, warehouse, "bob", "bobpw")
    assert bob.get_table("db.p").read(spark).count() == 1
    call_sql(spark, root, "CALL sys.revoke_privilege_from_user("
                          "username => 'bob', privilege => 'SELECT', "
                          "database => 'db', table => 'p')")
    with pytest.raises(NoPrivilegeException):
        bob.get_table("db.p").read(spark)
    call_sql(spark, root,
             "CALL sys.drop_privileged_user(username => 'bob')")


def test_every_mutating_entry_point_requires_insert(wh, spark):
    """ADVICE r7 (high): the proxy must guard the raw write builder and
    the snapshot-mutating maintenance surface with INSERT, and metadata
    listings with SELECT — mirroring PrivilegedFileStoreTable.java's
    assertCanInsert/assertCanSelect coverage (lines 82,143-221,239-275).
    Before the fix, table.new_write() committed data and rollback_to()
    destroyed snapshots with zero grants."""
    root = PrivilegedCatalog(spark, wh, "root", "rootpw")
    alice = PrivilegedCatalog(spark, wh, "alice", "alicepw")
    t = alice.get_table("db.t")
    for name in ("new_write", "rollback_to", "create_tag", "delete_tag",
                 "create_branch", "fast_forward", "expire_snapshots",
                 "remove_orphan_files", "write_consumer", "analyze",
                 "truncate", "compact"):
        with pytest.raises(NoPrivilegeException, match="INSERT"):
            getattr(t, name)
    for name in ("list_tags", "list_branches", "list_consumers",
                 "tag_snapshot", "branch_table", "read_consumer"):
        with pytest.raises(NoPrivilegeException, match="SELECT"):
            getattr(t, name)

    root.privileges.grant("alice", "db.t", "INSERT")
    t2 = alice.get_table("db.t")
    t2.create_tag("priv-tag")  # INSERT now unlocks tag creation
    root.privileges.grant("alice", "db.t", "SELECT")
    assert "priv-tag" in alice.get_table("db.t").list_tags()


def test_branch_table_returns_guarded_proxy(wh, spark):
    """r8 review: branch_table must wrap its result in the proxy — a
    SELECT-only user must NOT get a raw mutable handle to the branch
    (the reference wraps switchToBranch results too,
    PrivilegedFileStoreTable.java:275)."""
    root = PrivilegedCatalog(spark, wh, "root", "rootpw")
    root.get_table("db.t").create_branch("b1")
    root.privileges.grant("alice", "db.t", "SELECT")
    alice = PrivilegedCatalog(spark, wh, "alice", "alicepw")
    bt = alice.get_table("db.t").branch_table("b1")
    assert isinstance(bt, PrivilegedTable)
    with pytest.raises(NoPrivilegeException, match="INSERT"):
        bt.new_write
