"""End-to-end table tests (append + PK) mirroring the reference's Spark
ITCases (SURVEY §5.3: DDLTestBase, InsertOverwriteTableTest,
UpdateTableTestBase, DeleteFromTableTestBase, MergeIntoTableTestBase,
SparkTimeTravelITCase, CompactProcedureTestBase)."""

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark import P


def test_append_lifecycle(spark, catalog, orders):
    o = orders.withColumn("dt", F.to_date(F.date_trunc("month", "o_orderdate")))
    t = catalog.create_table("db.orders", o.schema, partition_keys=["dt"])
    t.write(spark, o.filter(F.col("o_orderkey") % 2 == 0))
    t.write(spark, o.filter(F.col("o_orderkey") % 2 == 1))
    assert t.read(spark).count() == o.count()
    assert t.read(spark, snapshot_id=1).count() == o.filter("o_orderkey % 2 = 0").count()

    # partition pruning prunes the plan, not just rows
    d = o.select("dt").distinct().limit(1).collect()[0][0]
    full_plan = t.new_scan().plan()
    pruned = t.new_scan().plan(P.eq("dt", d))
    assert len(pruned.entries) < len(full_plan.entries)
    assert t.read(spark, predicate=P.eq("dt", d)).count() == \
        o.filter(F.col("dt") == F.lit(d)).count()


def test_stats_file_skipping(spark, catalog, customer):
    t = catalog.create_table("db.c", customer.schema)
    # two commits with disjoint custkey ranges → stats prune one file
    t.write(spark, customer.filter("c_custkey <= 75"))
    t.write(spark, customer.filter("c_custkey > 75"))
    plan = t.new_scan().plan(P.le("c_custkey", 10))
    assert len(plan.entries) == 1


def test_overwrite_static_and_dynamic(spark, catalog, orders):
    t = catalog.create_table("db.o", orders.schema, partition_keys=["o_orderstatus"])
    t.write(spark, orders)
    # dynamic: only the F partition replaced
    repl = orders.filter("o_orderstatus = 'F'").withColumn("o_totalprice", F.lit(1.0))
    t.write(spark, repl, dynamic_overwrite=True)
    out = t.read(spark)
    assert out.filter("o_orderstatus = 'F' AND o_totalprice <> 1.0").count() == 0
    assert out.count() == orders.count()
    # static overwrite all
    t.write(spark, orders.limit(10), overwrite=True)
    assert t.read(spark).count() == 10


def test_pk_upsert_and_bucket_pruning(spark, catalog, customer):
    t = catalog.create_table("db.pk", customer.schema, primary_keys=["c_custkey"],
                             options={"bucket": "4"})
    t.write(spark, customer)
    t.write(spark, customer.limit(30).withColumn("c_acctbal", F.lit(9.0)))
    out = t.read(spark)
    assert out.count() == customer.count()
    assert out.filter("c_acctbal = 9.0").count() == 30


def test_pk_delete_rows(spark, catalog, customer):
    t = catalog.create_table("db.pk2", customer.schema, primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    t.write(spark, customer)
    t.delete_where(spark, P.lt("c_custkey", 20))
    assert t.read(spark).count() == customer.filter("c_custkey >= 20").count()
    # audit log still shows the -D rows
    audit = t.system(spark, "$audit_log")
    assert audit.filter("_row_kind = '-D'").count() > 0


def test_append_cow_delete_update(spark, catalog, customer):
    t = catalog.create_table("db.ap", customer.schema)
    t.write(spark, customer)
    t.delete_where(spark, P.lt("c_custkey", 50))
    assert t.read(spark).count() == customer.filter("c_custkey >= 50").count()
    t.update_where(spark, P.ge("c_custkey", 140), {"c_mktsegment": "XX"})
    assert t.read(spark, predicate=P.eq("c_mktsegment", "XX")).count() == \
        customer.filter("c_custkey >= 140").count()


def test_merge_into_clauses(spark, catalog, customer):
    t = catalog.create_table("db.mi", customer.schema, primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    t.write(spark, customer)
    src = customer.filter("c_custkey % 2 = 0").withColumn("c_acctbal", F.lit(1.0)) \
        .unionByName(customer.filter("c_custkey % 2 = 1")
                     .withColumn("c_custkey", F.col("c_custkey") + 10000))
    t.merge_into(spark, src, on=["c_custkey"],
                 matched_update="*", not_matched_insert="*")
    out = t.read(spark)
    assert out.filter("c_acctbal = 1.0").count() == customer.filter("c_custkey % 2 = 0").count()
    assert out.filter("c_custkey > 10000").count() == customer.filter("c_custkey % 2 = 1").count()

    # matched_delete
    t.merge_into(spark, customer.filter("c_custkey % 2 = 0"), on=["c_custkey"],
                 matched_update=None, matched_delete=True, not_matched_insert=None)
    assert out.count() == t.read(spark).count() + customer.filter("c_custkey % 2 = 0").count()


def test_compaction_and_read_optimized(spark, catalog, customer):
    # write-only: the dedicated-compaction pattern — writers skip the
    # write-time trigger, an explicit compact job does the merging
    t = catalog.create_table("db.cp", customer.schema, primary_keys=["c_custkey"],
                             options={"bucket": "2", "write-only": "true",
                                      "num-sorted-run.compaction-trigger": "3"})
    for i in range(4):
        t.write(spark, customer.filter(F.col("c_custkey") % 4 == i))
    assert t.compact(spark) is not None
    max_level = t.options.num_levels - 1
    assert {e.file.level for e in t.entries_at()} == {max_level}
    assert t.read(spark).count() == customer.count()
    # read-optimized == full read after full compaction
    assert t.system(spark, "$read_optimized").count() == customer.count()


def test_tags_rollback_branches(spark, catalog, customer):
    t = catalog.create_table("db.tg", customer.schema)
    t.write(spark, customer.limit(50))
    t.create_tag("v1")
    t.write(spark, customer)
    assert t.read(spark, tag="v1").count() == 50
    assert t.system(spark, "$tags").count() == 1

    b = t.create_branch("dev", tag="v1")
    b.write(spark, customer.limit(10))
    assert b.read(spark).count() == 60
    assert t.read(spark).count() == 50 + customer.count()  # main untouched

    t.rollback_to(snapshot_id=1)
    assert t.read(spark).count() == 50


def test_expire_snapshots_keeps_reads_valid(spark, catalog, customer):
    t = catalog.create_table("db.ex", customer.schema, primary_keys=["c_custkey"],
                             options={"bucket": "2", "write-only": "true"})
    for i in range(5):
        t.write(spark, customer.limit(20 + i))
    n = t.expire_snapshots(retain_max=2, retain_min=2, older_than_ms=0)
    assert n == 3
    assert t.read(spark).count() == customer.limit(24).count()
    # expired snapshot files physically gone, live ones present
    assert t.remove_orphan_files(older_than_ms=10**15, dry_run=True) == []


def test_truncate(spark, catalog, customer):
    t = catalog.create_table("db.tr", customer.schema)
    t.write(spark, customer)
    t.truncate()
    assert t.read(spark).count() == 0
    assert t.snapshots.latest().commit_kind == "OVERWRITE"


def test_schema_evolution_read(spark, catalog, orders):
    from pyspark.sql import types as T
    t = catalog.create_table("db.ev", orders.select("o_orderkey", "o_totalprice").schema)
    t.write(spark, orders.select("o_orderkey", "o_totalprice").limit(100))
    t.schemas.add_column("note", T.StringType())
    t.schemas.rename_column("o_totalprice", "price")
    t2 = catalog.get_table("db.ev")
    t2.write(spark, orders.select((F.col("o_orderkey") + 100000).alias("o_orderkey"),
                                  F.col("o_totalprice").alias("price"),
                                  F.lit("x").alias("note")).limit(5))
    out = t2.read(spark)
    assert out.columns == ["o_orderkey", "price", "note"]
    assert out.count() == 105
    assert out.filter("note IS NULL").count() == 100


def test_system_tables(spark, catalog, customer):
    t = catalog.create_table("db.st", customer.schema, primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    t.write(spark, customer)
    t.write(spark, customer.limit(5))
    assert t.system(spark, "$snapshots").count() == 2
    assert t.system(spark, "$schemas").count() == 1
    assert t.system(spark, "$files").count() > 0
    assert t.system(spark, "$buckets").count() <= 2
    assert t.system(spark, "$options").filter("key = 'bucket'").count() == 1
    with pytest.raises(ValueError):
        t.system(spark, "$nope")


def test_zorder_sort_compaction(spark, catalog, orders):
    t = catalog.create_table("db.zo", orders.schema)
    t.write(spark, orders)
    t.compact(spark, order_by=["o_custkey", "o_totalprice"], strategy="zorder")
    assert t.read(spark).count() == orders.count()
    assert t.snapshots.latest().commit_kind == "COMPACT"


def test_dynamic_bucket_assignment(spark, catalog, customer):
    t = catalog.create_table("db.dyn", customer.schema, primary_keys=["c_custkey"],
                             options={"bucket": "-1",
                                      "dynamic-bucket.target-row-num": "20",
                                      "dynamic-bucket.assigner-parallelism": "1"})
    t.write(spark, customer.filter("c_custkey < 50"))
    idx = t.index.read_df(spark, t.snapshots.latest(), t.schema)
    d1 = sorted((r["bucket"], r["cnt"]) for r in
                idx.groupBy("bucket").agg(F.count("*").alias("cnt")).collect())
    assert d1 == [(0, 20), (1, 20), (2, 10)], d1

    upd = customer.filter("c_custkey < 20").withColumn("c_acctbal", F.lit(9.99))
    new = customer.filter("c_custkey >= 100")  # 50 new keys
    t.write(spark, upd.unionByName(new))
    idx2 = t.index.read_df(spark, t.snapshots.latest(), t.schema)
    d2 = sorted((r["bucket"], r["cnt"]) for r in
                idx2.groupBy("bucket").agg(F.count("*").alias("cnt")).collect())
    # existing keys keep buckets; bucket 2 fills to 20, then 3, 4 (last=10)
    assert d2 == [(0, 20), (1, 20), (2, 20), (3, 20), (4, 20)], d2
    # a key never moves buckets
    assert idx2.groupBy("kh").agg(F.countDistinct("bucket").alias("n")) \
               .filter("n > 1").count() == 0
    out = t.read(spark)
    assert out.count() == 100
    assert out.filter("c_acctbal = 9.99").count() == 20


def test_cross_partition_upsert(spark, catalog, customer):
    """PK excludes the partition key -> GlobalIndexAssigner semantics: a key
    arriving in a new partition retracts its old-partition row."""
    t = catalog.create_table("db.xp", customer.schema,
                             partition_keys=["c_mktsegment"],
                             primary_keys=["c_custkey"],
                             options={"bucket": "-1",
                                      "dynamic-bucket.target-row-num": "100"})
    t.write(spark, customer)
    n_keys = customer.select("c_custkey").distinct().count()
    assert t.read(spark).count() == n_keys

    # move 30 keys into a different partition
    moved = customer.filter("c_custkey < 30") \
                    .withColumn("c_mktsegment", F.lit("MOVED"))
    t.write(spark, moved)
    out = t.read(spark)
    assert out.count() == n_keys  # still one row per key
    assert out.filter("c_mktsegment = 'MOVED'").count() == 30
    # the old partitions no longer contain the moved keys
    assert out.filter("c_custkey < 30 AND c_mktsegment <> 'MOVED'").count() == 0
    # audit log shows the retractions
    audit = t.system(spark, "$audit_log")
    assert audit.filter("_row_kind = '-D'").count() == 30


def test_deletion_vectors(spark, catalog, customer):
    t = catalog.create_table("db.dv", customer.schema,
                             options={"deletion-vectors.enabled": "true"})
    t.write(spark, customer)
    files_before = {e.file.file_name for e in t.entries_at()}

    t.delete_where(spark, P.lt("c_custkey", 30))
    assert {e.file.file_name for e in t.entries_at()} == files_before, \
        "DV delete must not rewrite data files"
    assert t.read(spark).count() == 120
    assert t.read(spark).filter("c_custkey < 30").count() == 0

    t.delete_where(spark, P.ge("c_custkey", 140))  # accumulate
    assert t.read(spark).count() == 110

    t.update_where(spark, P.eq("c_mktsegment", "BUILDING"),
                   {"c_acctbal": 777.0})
    out = t.read(spark)
    assert out.count() == 110
    bld = out.filter("c_mktsegment = 'BUILDING'")
    assert bld.count() == bld.filter("c_acctbal = 777.0").count()

    # per-snapshot DVs: time travel sees the pre-delete state
    assert t.read(spark, snapshot_id=1).count() == 150
    # physical rewrite keeps results identical
    t.compact(spark)
    assert t.read(spark).count() == 110
    assert t.read(spark).filter("c_custkey < 30").count() == 0


def test_bloom_filter_file_index(spark, catalog, customer):
    t = catalog.create_table("db.bl", customer.schema,
                             options={"file-index.bloom-filter.columns": "c_name"})
    t.write(spark, customer.filter("c_custkey < 50"))
    t.write(spark, customer.filter("c_custkey >= 50 AND c_custkey < 100"))
    t.write(spark, customer.filter("c_custkey >= 100"))
    name = customer.filter("c_custkey = 120").first()["c_name"]
    assert len(t.new_scan().plan(P.eq("c_name", name)).entries) == 1
    assert t.read(spark, predicate=P.eq("c_name", name)).count() == 1
    # absent value -> all files pruned (min/max alone can't do this)
    assert len(t.new_scan().plan(P.eq("c_name", "no-such-name")).entries) == 0
    two = [r["c_name"] for r in
           customer.filter("c_custkey IN (3, 120)").collect()]
    assert t.read(spark, predicate=P.isin("c_name", two)).count() == 2


def test_paimon_metadata_columns(spark, catalog, customer):
    t = catalog.create_table("db.mc", customer.schema)
    t.write(spark, customer)
    df = t.read(spark, file_metadata=True)
    r = df.select("__paimon_file_path", "__paimon_row_index").first()
    assert r["__paimon_file_path"].endswith(".parquet")
    assert df.count() == customer.count()



def test_dynamic_bucket_parallel_assigners(spark, catalog, customer):
    """A>1: each assigner owns buckets b % A == a; keys stay stable and no
    bucket exceeds the target."""
    t = catalog.create_table("db.dynp", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "-1",
                                      "dynamic-bucket.target-row-num": "20",
                                      "dynamic-bucket.assigner-parallelism": "4"})
    t.write(spark, customer)
    idx = t.index.read_df(spark, t.snapshots.latest(), t.schema)
    per_bucket = {r["bucket"]: r["cnt"] for r in
                  idx.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert all(c <= 20 for c in per_bucket.values()), per_bucket
    # ownership invariant: bucket of a key == its assigner mod A
    bad = idx.filter(F.pmod(F.col("bucket"), F.lit(4))
                     != F.pmod(F.col("kh"), F.lit(4))).count()
    assert bad == 0
    # upsert: keys keep buckets
    t.write(spark, customer.withColumn("c_acctbal", F.lit(1.0)))
    idx2 = t.index.read_df(spark, t.snapshots.latest(), t.schema)
    assert idx2.count() == customer.count()
    assert t.read(spark).count() == customer.count()


def test_hilbert_curve_properties():
    """Skilling transform sanity: on a full 2^bits x 2^bits grid the index
    is a bijection and consecutive indices are Manhattan-adjacent cells."""
    import numpy as np
    from incubator_paimon_spark.compact import _hilbert_transpose
    bits = 4
    side = 1 << bits
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    X = np.stack([xs.ravel(), ys.ravel()], axis=1)
    h = _hilbert_transpose(X, bits)
    assert sorted(h.tolist()) == list(range(side * side))
    order = np.argsort(h)
    steps = np.abs(np.diff(X[order], axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_hilbert_sort_compaction(spark, catalog, orders):
    t = catalog.create_table("db.hil", orders.schema)
    t.write(spark, orders)
    t.compact(spark, order_by=["o_custkey", "o_totalprice"], strategy="hilbert")
    assert t.read(spark).count() == orders.count()
    assert t.snapshots.latest().commit_kind == "COMPACT"


def test_scan_mode_compacted_full_and_from_watermark(spark, catalog, orders):
    """StaticFromCompactedStartingScanner / StaticFromWatermarkStartingScanner."""
    t = catalog.create_table("db.sm", orders.schema,
                             primary_keys=["o_orderkey"], options={"bucket": "2"})
    t.write(spark, orders.limit(100), watermark=1000)
    t.compact(spark, full=True)           # snapshot 2: COMPACT
    t.write(spark, orders.limit(300), watermark=2000)  # snapshot 3
    # compacted-full pins the latest COMPACT snapshot → sees only 100 rows
    assert t.read(spark, scan_mode="compacted-full").count() == 100
    assert t.read(spark).count() == 300
    # from-watermark: earliest snapshot with watermark >= T
    assert t.read(spark, watermark=1500).count() == 300
    assert t.read(spark, watermark=500).count() == 100
    assert t.read(spark, watermark=99999).count() == 0


def test_orc_file_format(spark, catalog, customer):
    """file.format=orc: write, stats-based pruning, merge-on-read, compact."""
    t = catalog.create_table("db.orc", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2", "file.format": "orc"})
    t.write(spark, customer)
    t.write(spark, customer.limit(10).withColumn("c_acctbal", F.lit(9.9)))
    assert t.read(spark).count() == customer.count()
    assert t.read(spark).filter("c_acctbal = 9.9").count() >= 10
    files = [e.file.file_name for e in t.entries_at()]
    assert all(f.endswith(".orc") for f in files), files
    # stats survived: manifest min/max prune on c_custkey
    plan = t.new_scan().plan(P.eq("c_custkey", -12345))
    assert len(plan.entries) == 0
    t.compact(spark, full=True)
    assert t.read(spark).count() == customer.count()
    # avro is now a supported format (pure-Python codec); a genuinely
    # unknown format still fails loudly
    with pytest.raises(ValueError):
        catalog.create_table("db.csvv", customer.schema,
                             options={"file.format": "csv"})


def test_char_varchar_length_enforcement(spark, catalog):
    from pyspark.sql import types as T
    import pyspark.errors
    sch = T.StructType([T.StructField("k", T.LongType(), False),
                        T.StructField("code", T.CharType(3)),
                        T.StructField("name", T.VarcharType(5))])
    t = catalog.create_table("db.cv", sch)
    t.write(spark, spark.createDataFrame([(1, "ab", "hello")], "k long, code string, name string"))
    r = t.read(spark).collect()[0]
    assert r["code"] == "ab "       # CHAR(3) right-padded
    assert r["name"] == "hello"
    with pytest.raises(Exception) as ei:
        t.write(spark, spark.createDataFrame([(2, "toolong", "x")],
                                             "k long, code string, name string"))
    assert "too long" in str(ei.value)
    # reopened table round-trips the declared types
    t2 = catalog.get_table("db.cv")
    assert t2.schema.field_by_name("code").type.simpleString() == "char(3)"


def test_murmur_matches_spark_hash(spark):
    """Driver-side murmur3 must equal F.hash (seed 42) for pruning to be safe."""
    from incubator_paimon_spark.murmur import spark_hash
    import datetime
    rows = [(1, 2**40 + 7, "hello", datetime.date(2021, 3, 4)),
            (-5, -9999999999, "", datetime.date(1969, 12, 31)),
            (0, 0, "日本語テキスト", datetime.date(1970, 1, 1)),
            (2**31 - 1, -(2**62), "x" * 37, datetime.date(2038, 1, 19))]
    df = spark.createDataFrame(rows, "i int, l long, s string, d date")
    got = df.select(
        F.hash("i").alias("hi"), F.hash("l").alias("hl"),
        F.hash("s").alias("hs"), F.hash("d").alias("hd"),
        F.hash("i", "l", "s").alias("hm")).collect()
    for (i, l, s, d), r in zip(rows, got):
        assert spark_hash([i], ["int"]) == r["hi"]
        assert spark_hash([l], ["bigint"]) == r["hl"]
        assert spark_hash([s], ["string"]) == r["hs"]
        assert spark_hash([d], ["date"]) == r["hd"]
        assert spark_hash([i, l, s], ["int", "bigint", "string"]) == r["hm"]


def test_bucket_pruning(spark, catalog, customer):
    """PK equality scans exactly one bucket's files (ScanBucketFilter)."""
    t = catalog.create_table("db.bp", customer.schema,
                             primary_keys=["c_custkey"], options={"bucket": "8"})
    t.write(spark, customer)
    all_entries = t.new_scan().plan().entries
    plan = t.new_scan().plan(P.eq("c_custkey", 77))
    buckets = {e.bucket for e in plan.entries}
    assert len(buckets) == 1, buckets
    assert len(plan.entries) < len(all_entries)
    got = t.read(spark, predicate=P.eq("c_custkey", 77)).collect()
    assert len(got) == 1 and got[0]["c_custkey"] == 77
    # non-equality predicates must not prune buckets
    assert len(t.new_scan().plan(P.lt("c_custkey", 77)).entries) == len(all_entries)


def test_pk_value_filter_merge_safe(spark, catalog, customer):
    """Value-column stats pruning must not resurrect stale versions: write
    v=1 then upsert v=2; querying v=1 must return 0 rows even though the
    v=2 file's stats fail the predicate (KeyValueFileStoreScan keys-only
    per-file filter + whole-bucket value filter)."""
    t = catalog.create_table("db.stale", customer.schema,
                             primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer.withColumn("c_acctbal", F.lit(1.0)))
    t.write(spark, customer.withColumn("c_acctbal", F.lit(2.0)))
    # the old-version file must NOT satisfy the query
    assert t.read(spark, predicate=P.eq("c_acctbal", 1.0)).count() == 0
    assert t.read(spark, predicate=P.eq("c_acctbal", 2.0)).count() == customer.count()
    # whole-bucket value pruning still fires when NO file can match
    assert t.new_scan().plan(P.eq("c_acctbal", 99.0)).entries == []
    # key-field pruning still applies per-file
    assert t.new_scan().plan(P.gt("c_custkey", 10**9)).entries == []


def test_rowkind_field(spark, catalog, customer):
    """rowkind.field: a string data column drives +I/-U/+U/-D semantics
    (RowKindGenerator.java:38-66)."""
    from pyspark.sql import types as T
    sch = T.StructType(list(customer.schema.fields) +
                       [T.StructField("op", T.StringType(), True)])
    t = catalog.create_table("db.rk", sch, primary_keys=["c_custkey"],
                             options={"rowkind.field": "op"})
    t.write(spark, customer.withColumn("op", F.lit("+I")))
    # -D deletes keys < 20, +U bumps acctbal for keys 20..29
    changes = (customer.filter("c_custkey < 30")
               .withColumn("op", F.when(F.col("c_custkey") < 20, "-D").otherwise("+U"))
               .withColumn("c_acctbal", F.lit(777.0)))
    t.write(spark, changes)
    out = t.read(spark)
    assert out.filter("c_custkey < 20").count() == 0
    got = out.filter("c_custkey >= 20 AND c_custkey < 30")
    assert got.count() == 10 and got.filter("c_acctbal = 777.0").count() == 10
    assert out.count() == customer.count() - 20
    # invalid kind value raises
    with pytest.raises(Exception):
        t.write(spark, customer.limit(1).withColumn("op", F.lit("??")))
    # non-string rowkind.field rejected
    with pytest.raises(ValueError):
        t2 = catalog.create_table("db.rk2", customer.schema,
                                  primary_keys=["c_custkey"],
                                  options={"rowkind.field": "c_acctbal"})
        t2.write(spark, customer)


def test_filter_devolution_prunes_renamed_column(spark, catalog):
    """Predicates on a renamed column devolve by field id to each file's
    write-time schema, so stats pruning survives the rename
    (SchemaEvolutionUtil.createDataFilters)."""
    from pyspark.sql import types as T

    from incubator_paimon_spark.read import devolve_predicate

    t = catalog.create_table("db.devo", T.StructType.fromDDL("k bigint, v bigint"))
    t.write(spark, spark.createDataFrame([(i, i) for i in range(100)],
                                         "k long, v long").coalesce(1))
    t.write(spark, spark.createDataFrame([(i, i) for i in range(100, 200)],
                                         "k long, v long").coalesce(1))
    t.schemas.rename_column("v", "val")
    t2 = catalog.get_table("db.devo")

    plan = t2.new_scan().plan(P.ge("val", 150))
    assert len(plan.entries) == 1  # file with v in [0,100) pruned via old name
    got = sorted(r["val"] for r in t2.read(spark, predicate=P.ge("val", 150)).collect())
    assert got == list(range(150, 200))

    # added-later column: leaf drops, AND keeps the translatable remainder
    t2.schemas.add_column("extra", T.StringType())
    t3 = catalog.get_table("db.devo")
    old_schema = t3.schema_at(0)
    dev = devolve_predicate(P.ge("val", 150) & P.eq("extra", "x"),
                            t3.schema, old_schema)
    assert dev is not None and dev.fields() == {"v"}
    # OR with an untranslatable child abandons the branch (keep everything)
    assert devolve_predicate(P.ge("val", 150) | P.eq("extra", "x"),
                             t3.schema, old_schema) is None


def test_write_rolls_files_at_max_records(spark, catalog, customer):
    """write.max-records-per-file rolls data files within one task
    (RollingFileWriter parity via Spark's maxRecordsPerFile)."""
    t = catalog.create_table("db.roll", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1",
                                      "write.max-records-per-file": "100"})
    t.write(spark, customer)
    entries = t.entries_at()
    assert all(e.file.row_count <= 100 for e in entries)
    assert len(entries) >= customer.count() // 100
    assert t.read(spark).count() == customer.count()


def test_dynamic_bucket_partitioned_index_prune(spark, catalog, customer):
    """Partitioned HASH_DYNAMIC: a batch touching ONE partition reads only
    that partition's index slice (VERDICT r4 #7), keeps existing keys in
    their buckets, and leaves other partitions' index entries intact."""
    t = catalog.create_table("db.dynp", customer.schema,
                             partition_keys=["c_mktsegment"],
                             primary_keys=["c_custkey", "c_mktsegment"],
                             options={"bucket": "-1",
                                      "dynamic-bucket.target-row-num": "50"})
    t.write(spark, customer)
    idx1 = t.index.read_df(spark, t.snapshots.latest(), t.schema)
    seg = customer.select("c_mktsegment").first()[0]
    other = {(r["kh"], r["c_mktsegment"], r["bucket"])
             for r in idx1.collect() if r["c_mktsegment"] != seg}
    before = {(r["kh"], r["bucket"])
              for r in idx1.collect() if r["c_mktsegment"] == seg}

    upd = customer.filter(F.col("c_mktsegment") == seg) \
                  .withColumn("c_acctbal", F.lit(1.23))
    t.write(spark, upd)
    idx2 = t.index.read_df(spark, t.snapshots.latest(), t.schema)
    after_other = {(r["kh"], r["c_mktsegment"], r["bucket"])
                   for r in idx2.collect() if r["c_mktsegment"] != seg}
    after = {(r["kh"], r["bucket"])
             for r in idx2.collect() if r["c_mktsegment"] == seg}
    assert after_other == other      # untouched partitions unchanged
    assert before <= after           # existing keys kept their buckets
    out = t.read(spark)
    assert out.count() == customer.count()
    n_seg = customer.filter(F.col("c_mktsegment") == seg).count()
    assert out.filter("c_acctbal = 1.23").count() == n_seg


def test_orphan_removal_spares_index_and_dv(spark, catalog, customer, orders):
    """remove_orphan_files must treat index/ and dv/ artifacts as
    referenced through their per-snapshot JSON manifests — deleting live
    index or deletion-vector parquet corrupts the table."""
    t = catalog.create_table("db.oidx", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "-1",
                                      "dynamic-bucket.target-row-num": "50"})
    for i in range(3):
        t.write(spark, customer.filter(F.col("c_custkey") % 3 == i))
    from incubator_paimon_spark import P
    tdv = catalog.create_table("db.odv", orders.schema,
                               options={"deletion-vectors.enabled": "true"})
    tdv.write(spark, orders)
    tdv.delete_where(spark, P.lt("o_orderkey", 500))

    for tbl in (t, tdv):
        orphans = tbl.remove_orphan_files(older_than_ms=0, dry_run=True)
        assert not [o for o in orphans if "/index/" in o or "/dv/" in o], orphans
        tbl.remove_orphan_files(older_than_ms=0)
    assert t.read(spark).count() == customer.count()
    n_live = tdv.read(spark).count()
    assert n_live == orders.filter("o_orderkey >= 500").count()


def test_index_compaction_bounds_dir_count(spark, catalog, customer):
    """every commit adds an index dir; past the threshold the live index is
    rewritten into ONE dir so assignment cost stays flat over table
    lifetime. Superseded dirs become orphans once their snapshots expire."""
    t = catalog.create_table("db.icmp", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "-1",
                                      "dynamic-bucket.target-row-num": "50"})
    for i in range(12):
        t.write(spark, customer.filter(F.col("c_custkey") % 12 == i))
    files = t.index.read_files(t.snapshots.latest())
    assert len(files) <= 8, files
    # keys stable through compactions: one bucket per key
    idx = t.index.read_df(spark, t.snapshots.latest(), t.schema)
    assert idx.groupBy("kh").agg(F.count_distinct("bucket").alias("n")) \
              .filter("n > 1").count() == 0
    assert t.read(spark).count() == customer.count()
    # after expiring history, superseded index dirs are removable orphans
    t.expire_snapshots(retain_max=1, retain_min=1, older_than_ms=0)
    t.remove_orphan_files(older_than_ms=0)
    assert t.read(spark).count() == customer.count()
    t.write(spark, customer.limit(5))
    assert t.read(spark).count() == customer.count()


def test_dv_dir_compaction_bounds_count(spark, catalog, customer):
    """each row-level delete adds one DV dir; past the threshold the live
    bitmap set rewrites into one dir with identical visible rows."""
    from incubator_paimon_spark import P
    t = catalog.create_table("db.dvc", customer.schema,
                             options={"deletion-vectors.enabled": "true"})
    t.write(spark, customer)
    n = customer.count()
    for i in range(10):
        t.delete_where(spark, P.eq("c_custkey", i))
    m = t.dv.read_manifest(t.snapshots.latest())
    assert len(m["dirs"]) <= 8, m["dirs"]
    deleted = customer.filter("c_custkey < 10").count()
    assert t.read(spark).count() == n - deleted


def test_write_merge_schema(spark, catalog):
    """write.merge-schema: an incoming DataFrame with new or wider columns
    evolves the table schema before the write (WriteIntoPaimonTable /
    SchemaHelper.mergeAndCommitSchema); old rows read NULL for appended
    columns, and a narrower input type casts without a schema change."""
    import pyspark.sql.types as T
    t = catalog.create_table(
        "db.ms", T.StructType.fromDDL("k bigint, v int"),
        primary_keys=["k"],
        options={"bucket": "1", "write.merge-schema": "true"})
    t.write(spark, spark.createDataFrame([(1, 10)], "k long, v int"))
    # new column + wider type for v (int -> long)
    t.write(spark, spark.createDataFrame([(2, 20, "x")],
                                         "k long, v long, note string"))
    got = {r["k"]: r for r in t.read(spark).collect()}
    assert got[1]["v"] == 10 and got[1]["note"] is None
    assert got[2]["v"] == 20 and got[2]["note"] == "x"
    assert t.schema.field_by_name("v").type.simpleString() == "bigint"
    # narrower input (int into bigint) casts; no schema change
    sid = t.schema.id
    t.write(spark, spark.createDataFrame([(3, 30, "y")],
                                         "k long, v int, note string"))
    assert t.schema.id == sid
    assert t.read(spark).count() == 3


def test_write_merge_schema_rejects_void_column(spark, catalog):
    import pytest
    import pyspark.sql.types as T
    from pyspark.sql import functions as F
    t = catalog.create_table(
        "db.msv", T.StructType.fromDDL("k bigint"),
        options={"write.merge-schema": "true"})
    df = spark.range(1).select(F.col("id").alias("k"),
                               F.lit(None).alias("tag"))
    with pytest.raises(ValueError, match="all-NULL"):
        t.write(spark, df)
    # no schema version was committed
    assert t.schema.id == 0


def test_catalog_attach_sql_views(spark, catalog):
    """catalog.attach(spark) registers <db>_<table> temp views so plain
    spark.sql works for reads, and every commit path made through this
    process re-binds the view to the new snapshot — no stale file lists
    (VERDICT r5 'What's missing' #1, SparkCatalog.java ergonomics within
    Python-API limits)."""
    import pyspark.sql.types as T
    sch_o = T.StructType.fromDDL("k long, region string")
    sch_s = T.StructType.fromDDL("k long, amount double")
    to = catalog.create_table("db.att_dim", sch_o)
    ts = catalog.create_table("db.att_fact", sch_s, primary_keys=["k"],
                              options={"bucket": "2"})
    to.write(spark, spark.createDataFrame(
        [(1, "eu"), (2, "us")], schema=sch_o))
    ts.write(spark, spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], schema=sch_s))

    views = catalog.attach(spark)
    assert "db_att_dim" in views and "db_att_fact" in views

    got = spark.sql("""
        SELECT d.region, sum(f.amount) AS total
        FROM db_att_fact f JOIN db_att_dim d ON f.k = d.k
        GROUP BY d.region ORDER BY d.region
    """).collect()
    assert [(r["region"], r["total"]) for r in got] == [("eu", 10.0), ("us", 20.0)]

    # a PK upsert through the table API refreshes the view in place
    ts.write(spark, spark.createDataFrame([(1, 99.0)], schema=sch_s))
    got2 = spark.sql("SELECT amount FROM db_att_fact WHERE k = 1").collect()
    assert got2[0]["amount"] == 99.0

    # a row-level DELETE (different commit path) refreshes too
    from incubator_paimon_spark import P
    ts.delete_where(spark, P.eq("k", 2))
    assert spark.sql("SELECT count(*) c FROM db_att_fact").collect()[0]["c"] == 1


def test_sql_incremental_tvf(spark, catalog):
    """paimon_incremental_query('db.t', a, b) in catalog.sql reads the
    delta between two snapshots (PaimonTableValuedFunctions.scala:39-113
    parity via temp-view rewrite)."""
    import pyspark.sql.types as T
    sch = T.StructType.fromDDL("k long, v string")
    t = catalog.create_table("db.tvf", sch)
    t.write(spark, spark.createDataFrame([(1, "a")], schema=sch))
    t.write(spark, spark.createDataFrame([(2, "b")], schema=sch))
    t.write(spark, spark.createDataFrame([(3, "c")], schema=sch))
    got = catalog.sql(
        spark,
        "SELECT k, v FROM paimon_incremental_query('db.tvf', 1, 3) "
        "ORDER BY k").collect()
    assert [(r["k"], r["v"]) for r in got] == [(2, "b"), (3, "c")]
    # literal trap: the TVF name inside a string must NOT rewrite
    trap = catalog.sql(
        spark,
        "SELECT 'paimon_incremental_query(''db.tvf'', 1, 3)' AS s "
        "FROM db.tvf WHERE k = 1").collect()
    assert trap[0]["s"] == "paimon_incremental_query('db.tvf', 1, 3)"


def test_catalog_attach_cross_process_freshness(spark, catalog):
    """A commit made through a SECOND Catalog instance (simulating another
    process — no shared commit hooks) becomes visible to the first
    session's attached view without re-attach: synchronously via
    refresh_views(), and automatically via the background watcher."""
    import contextlib
    import time

    import pyspark.sql.types as T

    from incubator_paimon_spark import Catalog
    from incubator_paimon_spark.metadata import commit as C

    @contextlib.contextmanager
    def foreign_process():
        """Commit hooks are process-global, so a second Catalog instance
        alone still fires them; silencing the listener map during the
        write reproduces exactly what a commit from another process looks
        like to this one — files move on disk, no in-process signal."""
        saved, C._COMMIT_LISTENERS = dict(C._COMMIT_LISTENERS), {}
        try:
            yield
        finally:
            C._COMMIT_LISTENERS.clear()
            C._COMMIT_LISTENERS.update(saved)

    sch = T.StructType.fromDDL("k long, v string")
    t = catalog.create_table("db.att_xp", sch)
    t.write(spark, spark.createDataFrame([(1, "a")], schema=sch))
    catalog.attach(spark, watch_interval=0.2)
    assert spark.sql("SELECT count(*) c FROM db_att_xp").first()["c"] == 1

    other = Catalog(catalog.warehouse)
    with foreign_process():
        other.get_table("db.att_xp").write(
            spark, spark.createDataFrame([(2, "b")], schema=sch))

    # deterministic path: one synchronous sweep re-binds the moved view
    catalog.refresh_views()
    assert spark.sql("SELECT count(*) c FROM db_att_xp").first()["c"] == 2

    # automatic path: the watcher picks up the next cross-process commit
    with foreign_process():
        other.get_table("db.att_xp").write(
            spark, spark.createDataFrame([(3, "c")], schema=sch))
    deadline = time.time() + 15
    while time.time() < deadline:
        if spark.sql("SELECT count(*) c FROM db_att_xp").first()["c"] == 3:
            break
        time.sleep(0.2)
    else:
        raise AssertionError("watcher never re-bound the stale view")

    # a table CREATED by the other process appears too (no re-attach)
    t2 = other.create_table("db.att_xp2", sch)
    t2.write(spark, spark.createDataFrame([(9, "z")], schema=sch))
    deadline = time.time() + 15
    while time.time() < deadline:
        try:
            if spark.sql("SELECT v FROM db_att_xp2").first()["v"] == "z":
                break
        except Exception:
            pass
        time.sleep(0.2)
    else:
        raise AssertionError("watcher never bound the new table's view")


def test_catalog_attach_binds_new_tables(spark, catalog):
    """A table created through the SAME catalog object after attach() gets
    its view immediately (and it refreshes on commit like the rest)."""
    import pyspark.sql.types as T
    catalog.create_database("db")
    catalog.attach(spark)
    sch = T.StructType.fromDDL("k long, v string")
    t = catalog.create_table("db.att_late", sch)
    t.write(spark, spark.createDataFrame([(1, "x")], schema=sch))
    assert spark.sql("SELECT v FROM db_att_late").collect()[0]["v"] == "x"


def test_time_type_round_trip(spark, catalog):
    """Spark 4.1 TIME columns (unlocked via spark.sql.timeType.enabled in
    get_spark) work end-to-end: append round-trip, predicate read, and
    PK merge — closing the SURVEY §1.2 TIME-type deviation."""
    import datetime

    import pyspark.sql.types as T

    from incubator_paimon_spark import P
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("t", T.TimeType())])
    df = spark.createDataFrame(
        [(1, datetime.time(9, 30, 15)), (2, datetime.time(23, 59, 59))], sch)
    tb = catalog.create_table("db.timety", sch)
    tb.write(spark, df)
    got = sorted((r["k"], str(r["t"])) for r in tb.read(spark).collect())
    assert got == [(1, "09:30:15"), (2, "23:59:59")]
    assert tb.read(spark,
                   predicate=P.gt("t", datetime.time(12, 0))).count() == 1

    tb2 = catalog.create_table("db.timety_pk", sch, primary_keys=["k"],
                               options={"bucket": "1"})
    tb2.write(spark, df)
    tb2.write(spark, spark.createDataFrame([(1, datetime.time(1, 2, 3))], sch))
    got2 = sorted((r["k"], str(r["t"])) for r in tb2.read(spark).collect())
    assert got2 == [(1, "01:02:03"), (2, "23:59:59")]


def test_write_time_universal_compaction_trigger(spark, catalog, customer):
    """MergeTreeWriter parity: a non-write-only PK writer triggers universal
    compaction once a bucket's sorted runs reach
    num-sorted-run.compaction-trigger; write-only opts out
    (MergeTreeWriter.java flushWriteBuffer / UniversalCompaction.pick)."""
    import pyspark.sql.functions as F

    t = catalog.create_table("db.autoc", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1"})
    for i in range(7):
        t.write(spark, customer.filter(F.col("c_custkey") % 7 == i))
    kinds = [s.commit_kind for s in t.snapshots.list_all()]
    assert "COMPACT" in kinds, kinds
    # merged state is unchanged by the inline compactions
    assert t.read(spark).count() == customer.count()
    # runs stay bounded: strictly fewer files than commits
    assert len(t.entries_at()) < 7

    wo = catalog.create_table("db.autoc_wo", customer.schema,
                              primary_keys=["c_custkey"],
                              options={"bucket": "1", "write-only": "true"})
    for i in range(7):
        wo.write(spark, customer.filter(F.col("c_custkey") % 7 == i))
    assert [s.commit_kind for s in wo.snapshots.list_all()] == ["APPEND"] * 7
    assert len(wo.entries_at()) == 7


def test_rewrite_file_index(spark, catalog, customer):
    """CALL sys.rewrite_file_index adds blooms to existing files without
    rewriting data (file-index.md Procedure / RewriteFileIndexProcedure)."""
    t = catalog.create_table("db.rfi", customer.schema)  # no bloom option
    t.write(spark, customer.filter("c_custkey < 50"))
    t.write(spark, customer.filter("c_custkey >= 50 AND c_custkey < 100"))
    t.write(spark, customer.filter("c_custkey >= 100"))
    assert all(not e.file.file_index for e in t.entries_at())
    with pytest.raises(ValueError, match="bloom-filter.columns"):
        catalog.sql(spark, "CALL sys.rewrite_file_index(table => 'db.rfi')")
    catalog.sql(spark, "ALTER TABLE db.rfi SET TBLPROPERTIES ("
                       "'file-index.bloom-filter.columns'='c_name')")
    catalog.sql(spark, "CALL sys.rewrite_file_index(table => 'db.rfi')")
    t = catalog.get_table("db.rfi")
    assert all("c_name" in e.file.file_index for e in t.entries_at())
    name = customer.filter("c_custkey = 120").first()["c_name"]
    assert len(t.new_scan().plan(P.eq("c_name", name)).entries) == 1
    assert len(t.new_scan().plan(P.eq("c_name", "no-such")).entries) == 0
    # metadata-only snapshot: state unchanged, empty delta, COMPACT kind
    assert t.read(spark).count() == customer.count()
    s = t.snapshots.latest()
    assert s.commit_kind == "COMPACT" and s.delta_record_count == 0
    assert s.total_record_count == customer.count()
    # idempotent: a second call finds nothing and commits nothing
    catalog.sql(spark, "CALL sys.rewrite_file_index(table => 'db.rfi')")
    assert catalog.get_table("db.rfi").snapshots.latest().id == s.id


def test_rewrite_file_index_null_column_converges(spark, catalog, customer):
    """A file whose bloom column is entirely NULL gets an EMPTY bloom
    (nothing inserted → equality probes prune it, which is exact), and the
    procedure converges instead of committing a no-op snapshot forever."""
    t = catalog.create_table("db.rfin", customer.schema)
    t.write(spark, customer.filter("c_custkey < 50")
            .withColumn("c_name", F.lit(None).cast("string")))
    t.write(spark, customer.filter("c_custkey >= 50"))
    catalog.sql(spark, "ALTER TABLE db.rfin SET TBLPROPERTIES ("
                       "'file-index.bloom-filter.columns'='c_name')")
    got = catalog.sql(spark,
                      "CALL sys.rewrite_file_index(table => 'db.rfin')")
    assert got["files_indexed"] == 2
    t = catalog.get_table("db.rfin")
    assert all("c_name" in e.file.file_index for e in t.entries_at())
    sid = t.snapshots.latest().id
    # converged: the all-NULL file never re-enters the todo set
    got = catalog.sql(spark,
                      "CALL sys.rewrite_file_index(table => 'db.rfin')")
    assert got["files_indexed"] == 0
    assert catalog.get_table("db.rfin").snapshots.latest().id == sid
    # the empty bloom prunes every equality probe on the NULL file
    name = customer.filter("c_custkey = 120").first()["c_name"]
    assert len(t.new_scan().plan(P.eq("c_name", name)).entries) == 1


def test_bucketed_append_table(spark, catalog, orders):
    """Bucketed append (bucketed-append.md): bucket-key routes rows to
    fixed buckets — equality filters bucket-prune, per-bucket compaction
    keeps layouts, and rescale rules apply like the PK path."""
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    t = catalog.create_table("db.bapp", o.schema,
                             options={"bucket": "4",
                                      "bucket-key": "o_custkey"})
    t.write(spark, o)
    t.write(spark, o.limit(50))
    assert {e.bucket for e in t.entries_at()} == {0, 1, 2, 3}
    assert {e.file.total_buckets for e in t.entries_at()} == {4}
    assert t.read(spark).count() == o.count() + 50

    # bucket pruning on the bucket-key equality
    k = o.select("o_custkey").first()[0]
    full = t.new_scan().plan()
    pruned = t.new_scan().plan(P.eq("o_custkey", k))
    assert len(pruned.entries) < len(full.entries)
    # pruned read loses nothing vs an unpruned scan filtered post-hoc
    assert t.read(spark, predicate=P.eq("o_custkey", k)).count() == \
        t.read(spark).filter(F.col("o_custkey") == k).count()

    # bucket>0 without bucket-key on an append table is rejected
    t2 = catalog.create_table("db.bapp2", o.schema,
                              options={"bucket": "4"})
    with pytest.raises(ValueError, match="bucket-key"):
        t2.write(spark, o.limit(5))

    # rescale applies: stale layout guarded, overwrite reorganizes
    catalog.sql(spark,
                "ALTER TABLE db.bapp SET TBLPROPERTIES ('bucket'='8')")
    t = catalog.get_table("db.bapp")
    with pytest.raises(ValueError, match="bucket num"):
        t.write(spark, o.limit(5))
    t.write(spark, o, overwrite=True)
    assert {e.file.total_buckets for e in t.entries_at()} == {8}
    assert t.read(spark).count() == o.count()


def test_bucketed_append_compaction_keeps_layout(spark, catalog, orders):
    from incubator_paimon_spark.compact import compact_table
    o = orders.select("o_orderkey", "o_custkey").limit(200)
    t = catalog.create_table("db.bappc", o.schema,
                             options={"bucket": "2",
                                      "bucket-key": "o_custkey",
                                      "write-only": "true"})
    for i in range(8):  # many small files per bucket
        t.write(spark, o)
    before = len(t.entries_at())
    compact_table(spark, t)
    after = t.entries_at()
    assert len(after) < before
    assert {e.file.total_buckets for e in after} == {2}
    assert {e.bucket for e in after} == {0, 1}
    assert t.read(spark).count() == 8 * 200
