"""Native Spark SQL catalog (jvm_catalog.py + jvm/PaimonSparkCatalog.java
— SparkCatalog.java:61 surface parity): catalog-qualified SQL with no
attach()/view step, resolved through the Python DataSource engine."""

import shutil

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(shutil.which("javac") is None,
                                reason="needs a JDK compiler")


@pytest.fixture(scope="module")
def sqlcat(spark, tmp_path_factory):
    import tempfile

    from incubator_paimon_spark import Catalog
    from incubator_paimon_spark.jvm_catalog import install_sql_catalog
    wh = tempfile.mkdtemp(prefix="pmn_jvmcat_wh_")
    cat = Catalog(wh)
    install_sql_catalog(spark, "pa", wh)
    yield cat
    shutil.rmtree(wh, ignore_errors=True)


def test_sql_catalog_merged_reads_and_listing(spark, sqlcat, customer):
    t = sqlcat.create_table("db.cust", customer.schema,
                            primary_keys=["c_custkey"],
                            options={"bucket": "2"})
    t.write(spark, customer)
    t.write(spark, customer.limit(25).withColumn("c_acctbal", F.lit(5.5)))

    # merge-on-read through plain catalog-qualified SQL
    n = spark.sql("SELECT count(*) n FROM pa.db.cust").collect()[0].n
    assert n == customer.count()
    upd = spark.sql(
        "SELECT count(*) n FROM pa.db.cust WHERE c_acctbal = 5.5"
    ).collect()[0].n
    assert upd == 25

    # joins against non-catalog relations
    customer.limit(10).select("c_custkey").createOrReplaceTempView("probe")
    j = spark.sql("SELECT count(*) n FROM pa.db.cust c JOIN probe p "
                  "ON c.c_custkey = p.c_custkey").collect()[0].n
    assert j == 10

    assert [r.tableName for r in
            spark.sql("SHOW TABLES IN pa.db").collect()] == ["cust"]
    assert ["db"] == [r.namespace for r in
                      spark.sql("SHOW NAMESPACES IN pa").collect()]


def test_sql_catalog_time_travel(spark, sqlcat, customer):
    import time

    t = sqlcat.create_table("db.tt", customer.select("c_custkey").schema)
    t.write(spark, customer.select("c_custkey").limit(10))
    time.sleep(1.1)  # TIMESTAMP AS OF +0.5s must land between snapshots
    t.write(spark, customer.select("c_custkey").limit(20))
    t.create_tag("v1", snapshot_id=1)

    assert spark.sql("SELECT count(*) n FROM pa.db.tt").collect()[0].n == 30
    assert spark.sql("SELECT count(*) n FROM pa.db.tt VERSION AS OF 1"
                     ).collect()[0].n == 10
    assert spark.sql("SELECT count(*) n FROM pa.db.tt VERSION AS OF 'v1'"
                     ).collect()[0].n == 10
    ts = t.snapshots.read(1).time_millis
    got = spark.sql(
        f"SELECT count(*) n FROM pa.db.tt TIMESTAMP AS OF "
        f"{ts / 1000.0 + 0.5}").collect()[0].n
    assert got == 10


def test_sql_catalog_insert_and_ddl_guard(spark, sqlcat, customer):
    t = sqlcat.create_table("db.w", customer.select("c_custkey",
                                                    "c_name").schema)
    t.write(spark, customer.select("c_custkey", "c_name").limit(5))
    # writes route through the Python DataSource writer
    spark.sql("INSERT INTO pa.db.w VALUES (111111, 'via-sql')")
    assert spark.sql("SELECT count(*) n FROM pa.db.w").collect()[0].n == 6
    assert sqlcat.get_table("db.w").read(spark) \
                 .filter("c_name = 'via-sql'").count() == 1

    # DDL stays on the Python API, loudly
    with pytest.raises(Exception, match="Python API|UNSUPPORTED"):
        spark.sql("DROP TABLE pa.db.w")
    # missing table/namespace resolve to the right errors
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|cannot be found"):
        spark.sql("SELECT * FROM pa.db.nope").collect()


def test_sql_catalog_streaming_follows_commits(spark, sqlcat, customer):
    """readStream.table('pa.db.t') streams commits made AFTER the
    stream initializes (initial offset = latest; scan.mode control
    stays on format('paimon'), whose options construct the source)."""
    import tempfile
    import time

    t = sqlcat.create_table("db.st", customer.select("c_custkey").schema)
    t.write(spark, customer.select("c_custkey").limit(10))
    chk = tempfile.mkdtemp(prefix="pmn_jvmcat_chk_")
    q = (spark.readStream.table("pa.db.st")
         .writeStream.format("memory").queryName("jc_stream")
         .option("checkpointLocation", chk)
         .trigger(processingTime="500 milliseconds").start())
    try:
        time.sleep(6)  # let the stream pin its initial (latest) offset
        t.write(spark, customer.select("c_custkey").limit(4))
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) n FROM jc_stream").collect()[0].n
            if n >= 4:
                break
            time.sleep(1)
        assert q.exception() is None
        assert n == 4
    finally:
        q.stop()
        shutil.rmtree(chk, ignore_errors=True)


def test_sql_catalog_branch_suffix(spark, sqlcat, customer):
    """`pa.db.`t$branch_x`` reads a branch's own state through the SQL
    catalog (branches are copy-on-write table dirs under
    <table>/branch/<name> — the reference's $branch_ suffix)."""
    t = sqlcat.create_table("db.br", customer.select("c_custkey").schema)
    t.write(spark, customer.select("c_custkey").limit(10))
    t.create_branch("dev")
    b = t.branch_table("dev")
    b.write(spark, customer.select("c_custkey").limit(30))
    assert spark.sql("SELECT count(*) n FROM pa.db.br").collect()[0].n == 10
    assert spark.sql("SELECT count(*) n FROM pa.db.`br$branch_dev`"
                     ).collect()[0].n == 40
