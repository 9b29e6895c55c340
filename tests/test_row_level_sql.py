"""Row-level SQL against native-catalog identifiers (r14).

DELETE FROM rides the DSv2-native seam (OptionsTable implements
SupportsDelete -> v1 filters -> bridge -> row_ops.delete_where;
DeleteFromPaimonTableCommand.scala parity). UPDATE / MERGE INTO /
subquery DELETE ride the injected analyzer rule
(PaimonSqlExtensions.java -> bridge -> sql.execute_sql — the
reference's PaimonUpdateTable.scala / PaimonMergeIntoBase.scala seam).
CALL rides Spark 4's ProcedureCatalog (SparkProcedures.java:59-72
parity). ALTER COLUMN TYPE delegates to the Python SchemaManager's
widening matrix over the bridge.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(shutil.which("javac") is None,
                                reason="needs a JDK compiler")


@pytest.fixture(scope="module")
def rl(spark):
    """(python_catalog, extension_session) over one warehouse, catalog
    name `rl` (distinct from test_jvm_catalog's `pa`: CatalogManager
    caches plugin instances by name per session)."""
    from incubator_paimon_spark import Catalog
    from incubator_paimon_spark.jvm_catalog import (install_row_level_sql,
                                                    install_sql_catalog)
    wh = tempfile.mkdtemp(prefix="pmn_rl_wh_")
    cat = Catalog(wh)
    install_sql_catalog(spark, "rl", wh)
    s2 = install_row_level_sql(spark)
    yield cat, s2
    shutil.rmtree(wh, ignore_errors=True)


def test_sql_delete_native_seam(spark, rl, customer):
    """DELETE with pushable conditions needs NO extension — the plain
    session plans DeleteFromTableExec over SupportsDelete."""
    cat, _ = rl
    n0 = customer.count()

    # PK table: -D retraction path
    t = cat.create_table("db.d_pk", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer)
    spark.sql("DELETE FROM rl.db.d_pk WHERE c_custkey <= 10")
    exp = n0 - customer.filter("c_custkey <= 10").count()
    assert spark.sql("SELECT count(*) n FROM rl.db.d_pk"
                     ).collect()[0].n == exp
    # compound + IN conditions push too
    spark.sql("DELETE FROM rl.db.d_pk WHERE c_mktsegment = 'BUILDING' "
              "AND c_custkey > 100")
    spark.sql("DELETE FROM rl.db.d_pk WHERE c_custkey IN (11, 12, 13)")
    exp -= customer.filter("c_mktsegment = 'BUILDING' AND c_custkey > 100"
                           ).count() + 3
    assert spark.sql("SELECT count(*) n FROM rl.db.d_pk"
                     ).collect()[0].n == exp

    # append table: copy-on-write rewrite of touched files only
    t2 = cat.create_table("db.d_cow", customer.schema)
    t2.write(spark, customer)
    spark.sql("DELETE FROM rl.db.d_cow WHERE c_mktsegment = 'BUILDING'")
    assert spark.sql("SELECT count(*) n FROM rl.db.d_cow").collect()[0].n \
        == n0 - customer.filter("c_mktsegment = 'BUILDING'").count()

    # deletion-vectors table: files stay, positions masked
    t3 = cat.create_table("db.d_dv", customer.schema,
                          options={"deletion-vectors.enabled": "true"})
    t3.write(spark, customer)
    spark.sql("DELETE FROM rl.db.d_dv WHERE c_custkey < 5")
    assert spark.sql("SELECT count(*) n FROM rl.db.d_dv").collect()[0].n \
        == n0 - customer.filter("c_custkey < 5").count()

    # whole-table DELETE == truncate; TRUNCATE TABLE rides the same seam
    spark.sql("DELETE FROM rl.db.d_cow")
    assert spark.sql("SELECT count(*) n FROM rl.db.d_cow"
                     ).collect()[0].n == 0
    spark.sql("TRUNCATE TABLE rl.db.d_dv")
    assert spark.sql("SELECT count(*) n FROM rl.db.d_dv"
                     ).collect()[0].n == 0


def test_sql_delete_plan_is_dsv2_native(spark, rl, customer):
    """Plan pin: the non-extension session plans DELETE as
    DeleteFromTable over the catalog's table — no rewrite, no fallback."""
    cat, _ = rl
    t = cat.create_table("db.d_plan", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer.limit(20))
    plan = spark.sql("EXPLAIN DELETE FROM rl.db.d_plan WHERE c_custkey = 3"
                     ).collect()[0][0]
    assert "DeleteFromTable" in plan


def test_sql_update_through_rule(spark, rl, customer):
    cat, s2 = rl
    t = cat.create_table("db.u_pk", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer)
    s2.sql("UPDATE rl.db.u_pk SET c_acctbal = c_acctbal + 100, "
           "c_mktsegment = 'touched' WHERE c_custkey % 10 = 0")
    got = s2.sql("SELECT count(*) n FROM rl.db.u_pk "
                 "WHERE c_mktsegment = 'touched'").collect()[0].n
    exp_rows = customer.filter("c_custkey % 10 = 0")
    assert got == exp_rows.count()
    # expression assignment really used the OLD value
    one = s2.sql("SELECT c_acctbal FROM rl.db.u_pk WHERE c_custkey = 10"
                 ).collect()[0][0]
    base = customer.filter("c_custkey = 10").collect()[0]["c_acctbal"]
    assert abs(one - (base + 100)) < 1e-6
    # the copy-on-write branch: non-PK table
    t2 = cat.create_table("db.u_cow", customer.schema)
    t2.write(spark, customer)
    s2.sql("UPDATE rl.db.u_cow SET c_name = upper(c_name) "
           "WHERE c_custkey < 10")
    up = s2.sql("SELECT count(*) n FROM rl.db.u_cow "
                "WHERE c_name = upper(c_name) AND c_custkey < 10"
                ).collect()[0].n
    assert up == customer.filter("c_custkey < 10").count()


def test_sql_merge_through_rule(spark, rl, customer):
    """Multi-WHEN MERGE INTO through plain spark.sql on the extension
    session: first-match-wins clause order, expressions referencing both
    aliases, NOT MATCHED insert."""
    cat, s2 = rl
    import pandas as pd
    t = cat.create_table("db.m_pk", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer.filter("c_custkey >= 20"))
    (s2.read.parquet("/root/testdata/sf0.001/customer.parquet")
       .filter("c_custkey < 40")
       .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
       .createOrReplaceTempView("m_src"))
    s2.sql("""
        MERGE INTO rl.db.m_pk t USING m_src s ON t.c_custkey = s.c_custkey
        WHEN MATCHED AND t.c_custkey < 25 THEN DELETE
        WHEN MATCHED THEN UPDATE SET c_acctbal = s.c_acctbal
        WHEN NOT MATCHED THEN INSERT *
    """)
    got = (s2.sql("SELECT c_custkey, round(c_acctbal, 2) AS b "
                  "FROM rl.db.m_pk").toPandas()
           .sort_values("c_custkey").reset_index(drop=True))
    # reference semantics computed directly
    base = customer.filter("c_custkey >= 20").toPandas()
    src = (customer.filter("c_custkey < 40").toPandas()
           .assign(c_acctbal=lambda d: d.c_acctbal + 1000))
    keep = base[~base.c_custkey.isin(src.c_custkey)]
    upd = src[(src.c_custkey >= 25) & (src.c_custkey.isin(base.c_custkey))]
    ins = src[~src.c_custkey.isin(base.c_custkey)]
    exp = (pd.concat([keep, upd, ins])[["c_custkey", "c_acctbal"]]
           .assign(b=lambda d: d.c_acctbal.round(2))
           .drop(columns="c_acctbal")
           .sort_values("c_custkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_sql_delete_with_subquery_through_rule(spark, rl, customer):
    cat, s2 = rl
    t = cat.create_table("db.d_sub", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer)
    s2.sql("DELETE FROM rl.db.d_sub WHERE c_custkey IN "
           "(SELECT c_custkey FROM rl.db.d_sub WHERE c_acctbal < 0)")
    neg = customer.filter("c_acctbal < 0").count()
    assert s2.sql("SELECT count(*) n FROM rl.db.d_sub").collect()[0].n \
        == customer.count() - neg


def test_rule_leaves_other_tables_alone(spark, rl, customer):
    """The rule only fires for PaimonSparkCatalog targets: UPDATE on a
    plain session-catalog table must fail with SPARK's own error, not
    route into the engine; reads/writes on the extension session stay
    stock."""
    _, s2 = rl
    s2.sql("CREATE OR REPLACE TEMP VIEW plain_v AS SELECT 1 AS x")
    assert s2.sql("SELECT * FROM plain_v").collect()[0].x == 1
    (s2.read.parquet("/root/testdata/sf0.001/nation.parquet")
       .createOrReplaceTempView("plain_nation_rl"))
    with pytest.raises(Exception) as ei:
        s2.sql("UPDATE plain_nation_rl SET n_name = 'X' WHERE n_nationkey = 1")
    assert "python engine" not in str(ei.value)


def test_sql_call_maintenance_round_trip(spark, rl, customer):
    """Pure-SQL maintenance: compact + tag + rollback + expire via
    Spark 4's native CALL (ProcedureCatalog), VERDICT r13 #3's Done
    criterion."""
    cat, _ = rl
    t = cat.create_table("db.proc", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer)
    t.write(spark, customer.limit(40))
    r = spark.sql("CALL rl.sys.compact(table => 'db.proc', full => true)"
                  ).collect()
    assert len(r) == 1 and "snapshot" in r[0].result
    spark.sql("CALL rl.sys.create_tag(table => 'db.proc', tag => 'v1', "
              "snapshot => 2)")
    assert [r.tag_name for r in t.system(spark, "tags").collect()] == ["v1"]
    t.write(spark, customer.limit(10).withColumn("c_name", F.lit("XX")))
    # positional args map onto the python procedure's parameter order
    spark.sql("CALL rl.sys.rollback('db.proc', 2)")
    assert spark.sql("SELECT count(*) n FROM rl.db.proc "
                     "WHERE c_name = 'XX'").collect()[0].n == 0
    r = spark.sql("CALL rl.sys.expire_snapshots(table => 'db.proc', "
                  "retain_max => 1)").collect()
    assert len(r) == 1  # executed through the dispatcher
    assert t.snapshots.latest_id() == 2  # rollback state intact

    names = {r.procedure_name for r in
             spark.sql("SHOW PROCEDURES IN rl.sys").collect()}
    assert {"compact", "rollback", "create_tag", "expire_snapshots",
            "migrate_table", "remove_orphan_files"} <= names
    with pytest.raises(Exception) as ei:
        spark.sql("CALL rl.sys.not_a_proc()").collect()
    assert "unknown procedure" in str(ei.value)


def test_sql_alter_column_type_bridged(spark, rl):
    """ALTER COLUMN TYPE routes to SchemaManager.update_column_type (the
    Python side owns the widening matrix); old files read back cast."""
    cat, _ = rl
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.db")
    spark.sql("CREATE TABLE rl.db.widen (k int, v string)")
    spark.sql("INSERT INTO rl.db.widen VALUES (1, 'a'), (2147483647, 'b')")
    spark.sql("ALTER TABLE rl.db.widen ALTER COLUMN k TYPE bigint")
    df = spark.sql("SELECT * FROM rl.db.widen ORDER BY k")
    assert df.schema["k"].dataType.simpleString() == "bigint"
    assert [r.k for r in df.collect()] == [1, 2147483647]
    spark.sql("INSERT INTO rl.db.widen VALUES (9999999999, 'c')")
    assert spark.sql("SELECT max(k) m FROM rl.db.widen"
                     ).collect()[0].m == 9999999999
    # schema history: one schema-N per change, python side readable
    t = cat.get_table("db.widen")
    assert t.schema.field_by_name("k").type.simpleString() == "bigint"
    # narrowing rejected (Spark's canUpCast check fires first)
    with pytest.raises(Exception):
        spark.sql("ALTER TABLE rl.db.widen ALTER COLUMN v TYPE int")


def test_row_level_sql_on_generic_session_catalog(spark, customer):
    """The generic `spark_catalog` path (PaimonSparkGenericCatalog
    extends PaimonSparkCatalog) gets the same row-level surface:
    prefix-less DELETE rides the inherited SupportsDelete, UPDATE rides
    the rule (which verifies the identifier IS a warehouse table before
    hijacking — plain session-catalog tables keep Spark's behavior),
    CALL rides the inherited ProcedureCatalog."""
    from incubator_paimon_spark import Catalog
    from incubator_paimon_spark.jvm_catalog import (install_generic_catalog,
                                                    install_row_level_sql)
    wh = tempfile.mkdtemp(prefix="pmn_rl_gen_")
    try:
        cat = Catalog(wh)
        # inject the rule into the shared extensions FIRST, then the
        # generic clone picks up both the rule and the spark_catalog conf
        install_row_level_sql(spark)
        s = install_generic_catalog(spark, wh)
        t = cat.create_table("gdb.c", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2"})
        t.write(spark, customer)
        n0 = customer.count()

        s.sql("DELETE FROM gdb.c WHERE c_custkey < 10")
        exp = n0 - customer.filter("c_custkey < 10").count()
        assert s.sql("SELECT count(*) n FROM gdb.c").collect()[0].n == exp
        s.sql("UPDATE gdb.c SET c_name = 'gen' WHERE c_custkey = 20")
        assert s.sql("SELECT c_name FROM gdb.c WHERE c_custkey = 20"
                     ).collect()[0][0] == "gen"
        r = s.sql("CALL spark_catalog.sys.compact(table => 'gdb.c', "
                  "full => true)").collect()
        assert len(r) == 1 and "snapshot" in r[0].result
        # a plain (non-warehouse) table keeps Spark's own UPDATE error
        s.range(3).createOrReplaceTempView("plain_gen")
        with pytest.raises(Exception) as ei:
            s.sql("UPDATE plain_gen SET id = 0")
        assert "python engine" not in str(ei.value)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_filters_to_predicate_edges(spark, customer):
    """Unit edges of the v1-filter JSON -> Predicate rebuild: De-Morgan
    negations, EqualNullSafe null, In with null member, nested and/or,
    and the constant-filter contract."""
    import json

    from incubator_paimon_spark.bridge import filters_to_predicate
    from incubator_paimon_spark.datasource import _load_table
    from incubator_paimon_spark import Catalog
    import tempfile
    wh = tempfile.mkdtemp(prefix="pmn_f2p_")
    try:
        cat = Catalog(wh)
        t = cat.create_table("db.t", customer.schema)
        schema = t.schema

        def rows(pred):
            return sorted(r.c_custkey for r in customer.filter(
                pred.to_column()).collect())

        def expect(sql):
            return sorted(r.c_custkey for r in customer.filter(sql)
                          .collect())

        p = filters_to_predicate(
            [{"op": "not", "c": {"op": "gt", "col": "c_custkey", "v": 10}}],
            schema)
        assert rows(p) == expect("c_custkey <= 10")
        p = filters_to_predicate(
            [{"op": "not", "c": {"op": "in", "col": "c_custkey",
                                 "vs": [1, 2, 3]}}], schema)
        assert rows(p) == expect("c_custkey NOT IN (1, 2, 3)")
        p = filters_to_predicate(
            [{"op": "or",
              "l": {"op": "and",
                    "l": {"op": "ge", "col": "c_custkey", "v": 5},
                    "r": {"op": "lt", "col": "c_custkey", "v": 8}},
              "r": {"op": "eq", "col": "c_mktsegment", "v": "BUILDING"}}],
            schema)
        assert rows(p) == expect(
            "(c_custkey >= 5 AND c_custkey < 8) OR c_mktsegment = 'BUILDING'")
        # value coercion from JSON strings by schema type
        p = filters_to_predicate(
            [{"op": "eq", "col": "c_acctbal", "v": "0"}], schema)
        assert rows(p) == expect("c_acctbal = 0.0")
        # AlwaysTrue conjuncts drop out; all-true -> None (truncate)
        assert filters_to_predicate([{"op": "true"}], schema) is None
        # non-negatable ops refuse loudly
        with pytest.raises(ValueError):
            filters_to_predicate(
                [{"op": "not", "c": {"op": "starts_with", "col": "c_name",
                                     "v": "x"}}], schema)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_sql_alter_column_position_bridged(spark, rl, customer):
    """ALTER COLUMN ... FIRST / AFTER routes to SchemaManager.move_column
    (metadata-only: field ids anchor reads, old files serve unchanged)."""
    cat, _ = rl
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.db")
    spark.sql("CREATE TABLE rl.db.mv_pos (a int, b string, c double)")
    spark.sql("INSERT INTO rl.db.mv_pos VALUES (1, 'x', 2.5)")
    spark.sql("ALTER TABLE rl.db.mv_pos ALTER COLUMN c FIRST")
    df = spark.sql("SELECT * FROM rl.db.mv_pos")
    assert df.columns == ["c", "a", "b"]
    assert df.collect() == [(2.5, 1, "x")]
    spark.sql("ALTER TABLE rl.db.mv_pos ALTER COLUMN c AFTER a")
    df = spark.sql("SELECT * FROM rl.db.mv_pos")
    assert df.columns == ["a", "c", "b"]
    assert cat.get_table("db.mv_pos").schema.field_names() == ["a", "c", "b"]
    # ADD COLUMN FIRST/AFTER lands placed in ONE schema commit
    sid0 = cat.get_table("db.mv_pos").schema.id
    spark.sql("ALTER TABLE rl.db.mv_pos ADD COLUMN d int AFTER a")
    spark.sql("ALTER TABLE rl.db.mv_pos ADD COLUMN e int FIRST")
    t = cat.get_table("db.mv_pos")
    assert t.schema.field_names() == ["e", "a", "d", "c", "b"]
    assert t.schema.id == sid0 + 2  # one commit per ADD
    assert spark.sql("SELECT * FROM rl.db.mv_pos").collect() == \
        [(None, 1, None, 2.5, "x")]


def test_concurrent_bridged_updates(spark, rl, customer):
    """Three python threads running SQL UPDATE on ONE PK table through
    the bridge: all three must commit (the engine's CAS-retried commit
    arbitrates), and new threads need ensure_thread_classloader —
    pyspark's pinned-thread mode gives each python thread a JVM peer
    whose context classloader cannot see ADD JAR classes."""
    import threading

    from incubator_paimon_spark.jvm_catalog import ensure_thread_classloader
    cat, s2 = rl
    t = cat.create_table("db.conc", customer.schema,
                         primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer)
    errs = []

    def upd(lo, hi, val):
        try:
            ensure_thread_classloader(spark)
            s2.sql(f"UPDATE rl.db.conc SET c_acctbal = {val} "
                   f"WHERE c_custkey >= {lo} AND c_custkey < {hi}")
        except Exception as e:  # noqa: BLE001 — assert after join
            errs.append(str(e)[:200])

    threads = [threading.Thread(target=upd, args=a)
               for a in ((0, 50, 111.0), (50, 100, 222.0),
                         (100, 150, 333.0))]
    for x in threads:
        x.start()
    for x in threads:
        x.join()
    assert errs == []
    for v, lo, hi in ((111.0, 0, 50), (222.0, 50, 100), (333.0, 100, 150)):
        got = s2.sql(f"SELECT count(*) n FROM rl.db.conc "
                     f"WHERE c_acctbal = {v}").collect()[0].n
        assert got == customer.filter(
            f"c_custkey >= {lo} AND c_custkey < {hi}").count()
    assert t.snapshots.latest_id() == 4  # base + three UPDATE commits


def test_sql_alter_column_nullability_bridged(spark, rl, customer):
    """ALTER COLUMN ... SET/DROP NOT NULL delegates to
    SchemaManager.update_column_nullability (SchemaManager.java:309-326
    parity): both directions metadata-only; making a PK column nullable
    refuses."""
    cat, _ = rl
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.db")
    spark.sql("CREATE TABLE rl.db.nn (k int, v string) "
              "TBLPROPERTIES ('primary-key'='k', 'bucket'='1')")
    spark.sql("INSERT INTO rl.db.nn VALUES (1, 'a')")
    # nullable -> NOT NULL is refused by SPARK's own CheckAnalysis for
    # v2 tables (same SQL constraint the reference integration has);
    # the python SchemaManager applies it directly
    with pytest.raises(Exception, match="non-nullable"):
        spark.sql("ALTER TABLE rl.db.nn ALTER COLUMN v SET NOT NULL")
    t = cat.get_table("db.nn")
    t.schemas.update_column_nullability("v", False)
    assert cat.get_table("db.nn").schema.field_by_name("v").nullable is False
    # NOT NULL -> nullable goes through plain SQL (the bridge verb)
    spark.sql("ALTER TABLE rl.db.nn ALTER COLUMN v DROP NOT NULL")
    assert cat.get_table("db.nn").schema.field_by_name("v").nullable is True
    with pytest.raises(Exception, match="primary key"):
        spark.sql("ALTER TABLE rl.db.nn ALTER COLUMN k DROP NOT NULL")
    # data still serves across the nullability history
    assert spark.sql("SELECT * FROM rl.db.nn").collect() == [(1, "a")]


def test_explain_row_level_sql_does_not_execute(spark, rl, customer):
    """r15 (r14 verdict #5 + advice): EXPLAIN of a rule-routed DML
    statement must NEVER mutate the table. The rule sees the wrapper's
    full original text ("EXPLAIN UPDATE ..."), detects the EXPLAIN
    head, and raises a pointed planning error instead of forwarding to
    the engine — for all three verbs."""
    cat, s2 = rl
    t = cat.create_table("db.expl", customer.schema,
                         primary_keys=["c_custkey"],
                         options={"bucket": "2"})
    t.write(spark, customer)
    n0 = customer.count()

    def snapshot_id():
        return t.snapshots.latest_id()

    sid = snapshot_id()
    stmts = [
        "UPDATE rl.db.expl SET c_acctbal = -1 WHERE c_custkey <= 10",
        "DELETE FROM rl.db.expl WHERE c_custkey IN "
        "(SELECT c_custkey FROM rl.db.expl WHERE c_custkey <= 10)",
        "MERGE INTO rl.db.expl t USING (SELECT 1 c_custkey) s "
        "ON t.c_custkey = s.c_custkey WHEN MATCHED THEN DELETE",
    ]
    for stmt in stmts:
        for prefix in ("EXPLAIN ", "EXPLAIN EXTENDED ",
                       "  /* why */ explain "):
            out = "\n".join(r[0] for r in s2.sql(prefix + stmt).collect())
            assert "does not execute" in out, (prefix + stmt, out[:300])
        # no commit happened, no rows changed
        assert snapshot_id() == sid, stmt
        assert s2.sql("SELECT count(*) n FROM rl.db.expl"
                      ).collect()[0].n == n0, stmt
    assert s2.sql("SELECT count(*) n FROM rl.db.expl "
                  "WHERE c_acctbal = -1").collect()[0].n == 0

    # the statements themselves still execute when run directly
    s2.sql(stmts[0])
    assert s2.sql("SELECT count(*) n FROM rl.db.expl "
                  "WHERE c_acctbal = -1").collect()[0].n == \
        customer.filter("c_custkey <= 10").count()


def test_native_update_exists_and_merge_by_target(spark, rl, customer):
    """r15: the widened statement grammar (correlated EXISTS, WHEN NOT
    MATCHED BY TARGET, deep USING nesting) reaches the engine through
    the rule-routed native path too."""
    cat, s2 = rl
    t = cat.create_table("db.wide", customer.schema,
                         primary_keys=["c_custkey"],
                         options={"bucket": "2"})
    t.write(spark, customer)

    s2.sql("UPDATE rl.db.wide SET c_acctbal = -5 WHERE EXISTS "
           "(SELECT 1 FROM rl.db.wide w "
           "WHERE w.c_custkey = wide.c_custkey AND w.c_custkey < 3)")
    assert s2.sql("SELECT count(*) n FROM rl.db.wide WHERE c_acctbal = -5"
                  ).collect()[0].n == customer.filter("c_custkey < 3").count()

    s2.sql("""
        MERGE INTO rl.db.wide t
        USING (SELECT c_custkey FROM (SELECT max(c_custkey) + 1 c_custkey
               FROM (SELECT c_custkey FROM rl.db.wide))) s
        ON t.c_custkey = s.c_custkey
        WHEN NOT MATCHED BY TARGET THEN INSERT (c_custkey) VALUES (s.c_custkey)
    """)
    assert s2.sql("SELECT count(*) n FROM rl.db.wide"
                  ).collect()[0].n == customer.count() + 1
