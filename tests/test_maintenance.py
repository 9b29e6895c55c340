"""Maintenance features: tag automation, record-level TTL, changelog
expiration, ANALYZE (TagAutoCreation.java:48, RecordLevelExpire.java:35,
ExpireChangelogImpl, PaimonAnalyzeTableColumnCommand)."""

import time

from pyspark.sql import functions as F

from incubator_paimon_spark.procedures import call

from tests.conftest import SF_DIR


def _events(spark):
    import __spark_entry__ as E
    return E._t(spark, SF_DIR, "events")


def test_tag_automation(spark, catalog, customer):
    t = catalog.create_table("db.tags", customer.schema,
                             options={"tag.automatic-creation": "process-time",
                                      "tag.creation-period": "daily",
                                      "tag.num-retained-max": "3"})
    t.write(spark, customer.limit(10))
    tags = t.list_tags()
    assert len(tags) == 1
    assert t.read(spark, tag=tags[0]).count() == 10
    t.write(spark, customer.limit(5))   # same period → no duplicate tag
    assert len(t.list_tags()) == 1


def test_record_level_ttl_on_compaction(spark, catalog):
    ev = _events(spark)
    t = catalog.create_table("db.ttl", ev.schema, primary_keys=["event_id"],
                             options={"bucket": "2",
                                      "record-level.expire-time": "1 s",
                                      "record-level.time-field": "ts"})
    t.write(spark, ev.limit(200))
    assert t.read(spark).count() > 0
    t.compact(spark, full=True)
    assert t.read(spark).count() == 0  # fixture events are years old


def test_expire_changelogs_keeps_data(spark, catalog, customer):
    t = catalog.create_table("db.cl", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2",
                                      "changelog-producer": "input"})
    t.write(spark, customer.withColumn("_row_kind", F.lit("+I")))
    assert t.snapshots.latest().changelog_manifest_list
    n = call(spark, catalog, "sys.expire_changelogs", table="db.cl",
             older_than=int(time.time() * 1000) + 10_000)
    assert n == 1
    # input-producer changelog shares data files — table reads unaffected
    assert t.read(spark).count() == customer.count()


def test_analyze_statistics(spark, catalog, customer):
    t = catalog.create_table("db.an", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    t.write(spark, customer)
    snap = t.analyze(spark)
    assert snap.commit_kind == "ANALYZE"
    st = {r["column"]: r for r in t.system(spark, "$statistics").collect()}
    assert st["c_custkey"]["null_count"] == 0
    assert abs(st["c_custkey"]["distinct_count"] - customer.count()) < 20
    assert st["c_name"]["avg_len"] is not None
    assert t.read(spark).count() == customer.count()  # ANALYZE is metadata-only


def test_procedure_registry_covers_surface(catalog):
    from incubator_paimon_spark.procedures import _PROCEDURES
    for name in ("compact", "expire_snapshots", "expire_partitions",
                 "create_tag", "delete_tag", "rollback", "create_branch",
                 "delete_branch", "fast_forward", "remove_orphan_files",
                 "reset_consumer", "migrate_table", "migrate_file",
                 "expire_changelogs",
                 "create_tag_from_timestamp", "analyze"):
        assert name in _PROCEDURES, name


def test_repair_procedure(spark, catalog, customer):
    """CALL sys.repair: rewrites a stale LATEST hint and sweeps old staging
    dirs (RepairProcedure.java parity for the filesystem catalog)."""
    import os

    from incubator_paimon_spark.procedures import call_sql

    t = catalog.create_table("db.rep", customer.schema)
    t.write(spark, customer.limit(10))
    t.write(spark, customer.limit(20))
    hint = os.path.join(t.snapshots.dir, "LATEST")
    with open(hint, "w") as f:
        f.write("1")  # stale
    stale_dir = os.path.join(t.path, ".staging", "dead")
    os.makedirs(stale_dir)
    os.utime(os.path.join(t.path, ".staging", "dead"), (0, 0))

    fixed = call_sql(spark, catalog, "CALL sys.repair(database_or_table => 'db.rep')")
    assert "db.rep" in fixed
    assert open(hint).read().strip() == "2"
    assert not os.path.exists(stale_dir)
    # idempotent second run repairs nothing
    assert call_sql(spark, catalog, "CALL sys.repair(database_or_table => 'db')") == []


def test_drop_partition(spark, catalog, orders):
    """Table.drop_partition + CALL sys.drop_partition drop whole partitions
    in one OVERWRITE commit (PaimonPartitionManagement.dropPartitions)."""
    from pyspark.sql import functions as F

    from incubator_paimon_spark.procedures import call_sql

    o = orders.withColumn("dt", F.to_date(F.date_trunc("month", "o_orderdate")))
    t = catalog.create_table("db.dp", o.schema, partition_keys=["dt"])
    t.write(spark, o)
    dts = sorted(r["dt"] for r in o.select("dt").distinct().collect())
    victim = dts[0]

    snap = t.drop_partition({"dt": str(victim)})
    assert snap is not None and snap.commit_kind == "OVERWRITE"
    t2 = catalog.get_table("db.dp")
    assert t2.read(spark).filter(F.col("dt") == victim).count() == 0
    assert t2.read(spark).count() == o.filter(F.col("dt") != victim).count()

    # CALL surface + multi-spec; unknown key rejected
    call_sql(spark, catalog,
             f"CALL sys.drop_partition(table => 'db.dp', "
             f"partitions => 'dt={dts[1]};dt={dts[2]}')")
    t3 = catalog.get_table("db.dp")
    assert t3.read(spark).count() == o.filter(~F.col("dt").isin(dts[:3])).count()
    import pytest as _pt
    with _pt.raises(ValueError, match="not partition keys"):
        t3.drop_partition({"nope": "1"})


def test_migrate_file_into_existing_table(spark, catalog, customer):
    """CALL sys.migrate_file: zero-copy append of a parquet dir's files
    into an existing append table (MigrateFileProcedure parity)."""
    import tempfile
    from incubator_paimon_spark.procedures import call_sql

    t = catalog.create_table("db.mf", customer.schema)
    t.write(spark, customer.limit(40))
    src = tempfile.mkdtemp(prefix="pmn_mf_")
    customer.limit(25).write.mode("overwrite").parquet(src)
    call_sql(spark, catalog,
             f"CALL sys.migrate_file(source_dir => '{src}', "
             f"target_table => 'db.mf')")
    assert t.read(spark).count() == 65
    assert t.snapshots.latest().id == 2
    # PK tables are rejected (they need the bucket shuffle)
    tp = catalog.create_table("db.mfpk", customer.schema,
                              primary_keys=["c_custkey"])
    import pytest as _pt
    with _pt.raises(ValueError, match="append"):
        call_sql(spark, catalog,
                 f"CALL sys.migrate_file(source_dir => '{src}', "
                 f"target_table => 'db.mfpk')")


def test_lifecycle_soak_many_commits(spark, catalog):
    """Metadata-layer soak: 40 mixed commits (upserts, deletes, updates)
    with periodic compaction, snapshot expiration, tagging, and orphan
    cleanup along the way — the invariants a long-lived table must hold:
    merged row count always equals the model, time travel to a tag
    reproduces the tagged state, expiration never breaks the live read,
    and orphan removal never deletes a live file."""
    import pyspark.sql.types as T
    from incubator_paimon_spark import P

    sch = T.StructType.fromDDL("k long, v long")
    t = catalog.create_table("db.soak", sch, primary_keys=["k"],
                             options={"bucket": "4"})
    model = {}

    def write(rows):
        t.write(spark, spark.createDataFrame(rows, schema=sch))
        model.update(dict(rows))

    for i in range(40):
        base = (i * 13) % 50
        write([(base + j, i * 100 + j) for j in range(8)])
        if i == 10:
            t.create_tag("t10")
            tagged = dict(model)
        if i % 9 == 4:
            t.compact(spark, full=(i % 18 == 4))
        if i % 15 == 14:
            t.expire_snapshots(retain_max=10, retain_min=5)
        if i == 25:
            t.delete_where(spark, P.lt("k", 5))
            for k in list(model):
                if k < 5:
                    del model[k]

    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == model, (len(got), len(model))

    # tag still reproduces the state at commit 11 exactly
    tag_read = {r["k"]: r["v"] for r in t.read(spark, tag="t10").collect()}
    assert tag_read == tagged

    # orphan cleanup removes nothing live
    t.remove_orphan_files(older_than_ms=0)
    got2 = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got2 == model
    assert {r["k"]: r["v"] for r in t.read(spark, tag="t10").collect()} == tagged


def test_compact_database_and_rollback_to(spark, catalog, customer):
    """CALL sys.compact_database with db/table regexes
    (CompactDatabaseProcedure) + the rollback_to procedure alias."""
    for name in ("ca", "cb", "skipme"):
        t = catalog.create_table(f"db.{name}", customer.schema,
                                 primary_keys=["c_custkey"],
                                 options={"bucket": "1"})
        for _ in range(6):  # enough sorted runs to trigger the picker
            t.write(spark, customer.limit(30))
    got = catalog.sql(spark, "CALL sys.compact_database("
                             "including_databases => 'db', "
                             "including_tables => 'c.*', "
                             "excluding_tables => 'cb', full => true)")
    assert set(got) == {"db.ca"} and got["db.ca"] is not None
    t = catalog.get_table("db.ca")
    max_level = t.schema.core_options.num_levels - 1
    assert {e.file.level for e in t.entries_at()} == {max_level}
    # untouched tables keep their level-0 runs
    assert 0 in {e.file.level
                 for e in catalog.get_table("db.cb").entries_at()}

    before = t.read(spark).count()
    sid = t.snapshots.latest().id
    t.write(spark, customer.limit(5).withColumn(
        "c_custkey", F.col("c_custkey") + 90_000))
    catalog.sql(spark, f"CALL sys.rollback_to(table => 'db.ca', "
                       f"version => {sid})")
    assert catalog.get_table("db.ca").read(spark).count() == before


def test_tag_time_retention(spark, catalog, customer):
    """tag.default-time-retained deletes tags whose tagged snapshot aged
    out (manage-tags.md); fresh tags survive."""
    from incubator_paimon_spark.maintenance import expire_tags_by_time
    t = catalog.create_table(
        "db.tagttl", customer.schema,
        options={"tag.default-time-retained": "1 h"})
    t.write(spark, customer.limit(20))
    t.write(spark, customer.limit(40))
    t.create_tag("old", 1)
    t.create_tag("fresh", 2)
    now = t.tag_snapshot("fresh").time_millis
    # both tags were just created: inside the 1h window
    assert expire_tags_by_time(t, now_ms=now + 10_000) == []
    assert set(t.list_tags()) == {"old", "fresh"}
    # pretend 2h passed: both tags aged out of the table default
    aged_now = t.tag_snapshot("old").time_millis + 2 * 3600 * 1000
    assert set(expire_tags_by_time(t, now_ms=aged_now)) == {"old", "fresh"}
    assert t.list_tags() == []
    # per-tag time_retained overrides the table default (create_tag arg /
    # CALL sys.create_tag time_retained): '1 m' expires while the sibling
    # under the 1h default survives the same clock
    t.create_tag("short", 1, time_retained="1 m")
    t.create_tag("long", 2)
    later = now + 10 * 60 * 1000  # 10 minutes on
    assert expire_tags_by_time(t, now_ms=later) == ["short"]
    assert t.list_tags() == ["long"]


def test_tag_ttl_expires_from_commit_hook(spark, catalog, customer):
    """Time-based tag expiry runs on commit even WITHOUT
    tag.automatic-creation: a manual tag with a tiny time_retained is
    gone after the next write; tags without TTL are untouched and (with
    no table default) their snapshot files are never even read."""
    t = catalog.create_table("db.taghook", customer.schema)
    t.write(spark, customer.limit(10))
    t.create_tag("keep", 1)
    t.create_tag("fleeting", 1, time_retained="1 ms")
    import time as _t
    _t.sleep(0.05)
    t.write(spark, customer.limit(5))  # post-commit hook fires expiry
    assert t.list_tags() == ["keep"]


def test_tag_ttl_expires_in_watermark_mode_without_watermark(spark, catalog,
                                                             customer):
    """tag.automatic-creation=watermark + commits carrying no watermark:
    time-based expiry must still run from the post-commit hook (it is
    independent of auto-creation), so TTL tags age out."""
    t = catalog.create_table(
        "db.tagwm", customer.schema,
        options={"tag.automatic-creation": "watermark"})
    t.write(spark, customer.limit(10))
    t.create_tag("fleeting", 1, time_retained="1 ms")
    import time as _t
    _t.sleep(0.05)
    t.write(spark, customer.limit(5))  # snapshot.watermark is None
    assert t.list_tags() == []


def test_mark_partition_done(spark, catalog, customer):
    """Success-file markers (MarkPartitionDoneProcedure.java:46): mark →
    $partitions.done, idempotent re-mark keeps creationTime, drop/expire
    clears the marker."""
    from incubator_paimon_spark.metadata.util import loads
    from incubator_paimon_spark.maintenance import partition_done
    from incubator_paimon_spark.procedures import call_sql

    t = catalog.create_table(
        "db.mpd", customer.select("c_custkey", "c_name",
                                  "c_mktsegment").schema,
        partition_keys=["c_mktsegment"])
    t.write(spark, customer.select("c_custkey", "c_name", "c_mktsegment"))
    segs = [r.c_mktsegment for r in
            t.read(spark).select("c_mktsegment").distinct().collect()]
    seg = sorted(segs)[0]

    done = {r.partition: r.done
            for r in t.system(spark, "partitions").collect()}
    assert set(done.values()) == {False}

    marked = call_sql(spark, catalog,
                      f"CALL sys.mark_partition_done(table => 'db.mpd', "
                      f"partitions => 'c_mktsegment={seg}')")
    assert marked == [f"c_mktsegment={seg}/_SUCCESS"]
    done = {r.partition: r.done
            for r in t.system(spark, "partitions").collect()}
    assert sum(done.values()) == 1
    assert partition_done(t, {"c_mktsegment": seg})

    # idempotent re-mark: creationTime survives, modificationTime moves
    import os
    p = os.path.join(t.path, marked[0])
    first = loads(open(p).read())
    time.sleep(0.01)
    call_sql(spark, catalog,
             f"CALL sys.mark_partition_done(table => 'db.mpd', "
             f"partitions => 'c_mktsegment={seg}')")
    second = loads(open(p).read())
    assert second["creationTime"] == first["creationTime"]
    assert second["modificationTime"] >= first["modificationTime"]

    # unknown / partial specs are rejected
    import pytest as _pt
    with _pt.raises(ValueError, match="bind exactly"):
        call_sql(spark, catalog,
                 "CALL sys.mark_partition_done(table => 'db.mpd', "
                 "partitions => 'nope=1')")

    # drop clears the marker
    t.drop_partition({"c_mktsegment": seg})
    assert not partition_done(t, {"c_mktsegment": seg})


def test_migrate_database(spark, catalog, customer, orders, tmp_path):
    """MigrateDatabaseProcedure.java:31: every Parquet dir under
    source_dir becomes <db>.<dirname>, zero-copy."""
    from incubator_paimon_spark.procedures import call_sql
    c = customer.select("c_custkey", "c_name")
    o = orders.select("o_orderkey", "o_totalprice")
    c.write.parquet(str(tmp_path / "cust"))
    o.write.parquet(str(tmp_path / "ords"))
    (tmp_path / "not_a_table").mkdir()

    got = call_sql(spark, catalog,
                   f"CALL sys.migrate_database(database => 'mig', "
                   f"source_dir => '{tmp_path}')")
    assert got == ["mig.cust", "mig.ords"]
    assert catalog.get_table("mig.cust").read(spark).count() == c.count()
    assert catalog.get_table("mig.ords").read(spark).count() == o.count()


def test_drop_clears_marker_even_without_files(spark, catalog, customer):
    """A done-marker on a partition with no live files must not survive
    DROP PARTITION (a re-created partition would look done)."""
    from incubator_paimon_spark.maintenance import (mark_partition_done,
                                                    partition_done)
    t = catalog.create_table(
        "db.mpd2", customer.select("c_custkey", "c_mktsegment").schema,
        partition_keys=["c_mktsegment"])
    # marker on a partition that has never had files
    mark_partition_done(t, {"c_mktsegment": "GHOST"})
    assert partition_done(t, {"c_mktsegment": "GHOST"})
    assert t.drop_partition({"c_mktsegment": "GHOST"}) is None  # no victims
    assert not partition_done(t, {"c_mktsegment": "GHOST"})


def test_clone_uri_requires_warehouse(spark, catalog, customer):
    from incubator_paimon_spark.procedures import call_sql
    t = catalog.create_table(
        "db.cu", customer.select("c_custkey", "c_name").schema)
    t.write(spark, customer.select("c_custkey", "c_name").limit(5))
    import pytest as _pt
    with _pt.raises(ValueError, match="requires target_warehouse"):
        call_sql(spark, catalog,
                 "CALL sys.clone(table => 'db.cu', target_table => "
                 "'db.cu2', target_metastore_uri => '/tmp/nope.sqlite')")


def test_migrate_partitioned_hive_layout(spark, catalog, orders, tmp_path):
    """migrate_table over a hive-partitioned parquet dir (the common
    migrate case): partition values come from the k=v path segments, the
    file bytes stay zero-copy WITHOUT the partition columns
    (partitionInData=false), the reader injects them, and partition
    pruning actually prunes (r12; reference migrate/ keeps hive files
    and fills partition fields reader-side)."""
    from incubator_paimon_spark import P
    from incubator_paimon_spark.procedures import call_sql

    src = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    src.write.partitionBy("o_orderstatus").parquet(str(tmp_path / "hive"))

    t = call_sql(spark, catalog,
                 f"CALL sys.migrate_table(table => 'db.mig_part', "
                 f"source_dir => '{tmp_path / 'hive'}', "
                 f"partition_keys => 'o_orderstatus')")
    got = t.read(spark)
    # full equality with the source, partition column reconstructed
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in got.select(*src.columns).collect())
    assert a == b

    # pruning: only the 'F' partition's files are planned
    plan_all = t.new_scan().plan()
    plan_f = t.new_scan().plan(P.eq("o_orderstatus", "F"))
    assert 0 < len(plan_f.entries) < len(plan_all.entries)
    assert all(e.partition == {"o_orderstatus": "F"}
               for e in plan_f.entries)
    assert all(not e.file.partition_in_data for e in plan_all.entries)
    n_f = src.filter("o_orderstatus = 'F'").count()
    assert t.read(spark, predicate=P.eq("o_orderstatus", "F")).count() == n_f

    # both planners pick identical entries over migrated manifests
    dd = t.new_scan().plan(P.eq("o_orderstatus", "F"), planner="dataframe")
    assert (sorted(e.identifier() for e in dd.entries)
            == sorted(e.identifier() for e in plan_f.entries))

    # $partitions aggregates by the reconstructed partitions
    parts = {r.partition: r.record_count
             for r in t.system(spark, "partitions").collect()}
    assert parts['{"o_orderstatus": "F"}'] == n_f

    # a declared key missing from the path fails loudly
    src.limit(5).coalesce(1).write.parquet(str(tmp_path / "flat"))
    import pytest as _pt
    with _pt.raises(ValueError, match="not found in hive path"):
        call_sql(spark, catalog,
                 f"CALL sys.migrate_table(table => 'db.mig_bad', "
                 f"source_dir => '{tmp_path / 'flat'}', "
                 f"partition_keys => 'o_orderstatus')")


def test_migrated_hive_table_through_datasource(spark, catalog, orders,
                                                tmp_path):
    """format('paimon') batch + readStream over a hive-migrated table:
    the executor-side readers inject the path-derived partition columns
    (split.inject), matching Table.read exactly."""
    from incubator_paimon_spark.datasource import register
    from incubator_paimon_spark.procedures import call_sql
    register(spark)

    src = orders.select("o_orderkey", "o_totalprice", "o_orderstatus") \
                .limit(600)
    src.write.partitionBy("o_orderstatus").parquet(str(tmp_path / "h2"))
    t = call_sql(spark, catalog,
                 f"CALL sys.migrate_table(table => 'db.mig_ds', "
                 f"source_dir => '{tmp_path / 'h2'}', "
                 f"partition_keys => 'o_orderstatus')")

    a = sorted(tuple(r) for r in t.read(spark)
               .select("o_orderkey", "o_orderstatus").collect())
    ds = (spark.read.format("paimon").load(t.path)
          .select("o_orderkey", "o_orderstatus"))
    assert sorted(tuple(r) for r in ds.collect()) == a
    # no NULL partition values anywhere
    assert ds.where("o_orderstatus IS NULL").count() == 0

    # streaming source over the migrated snapshot
    q = (spark.readStream.format("paimon")
         .option("scan.mode", "earliest").load(t.path)
         .groupBy("o_orderstatus").count())
    import tempfile
    chk = tempfile.mkdtemp(prefix="pmn_mig_chk_")
    sq = (q.writeStream.format("memory").queryName("mig_stream")
          .outputMode("complete").option("checkpointLocation", chk)
          .trigger(availableNow=True).start())
    sq.awaitTermination(120)
    got = {r.o_orderstatus: r["count"]
           for r in spark.sql("SELECT * FROM mig_stream").collect()}
    want = {r.o_orderstatus: r["count"] for r in
            src.groupBy("o_orderstatus").count().collect()}
    assert got == want


def test_migrate_autodetects_hive_partitions(spark, catalog, orders,
                                             tmp_path):
    """migrate_table/migrate_database without partition_keys sniff the
    hive k=v layout from the file paths (the reference reads the spec
    from the hive metastore) — a database sweep picks up partitioned
    and flat tables alike."""
    from incubator_paimon_spark.procedures import call_sql
    src = orders.select("o_orderkey", "o_orderstatus").limit(300)
    src.write.partitionBy("o_orderstatus").parquet(str(tmp_path / "hp"))
    orders.select("o_orderkey").limit(50).write.parquet(
        str(tmp_path / "flat"))

    got = call_sql(spark, catalog,
                   f"CALL sys.migrate_database(database => 'adb', "
                   f"source_dir => '{tmp_path}')")
    assert sorted(got) == ["adb.flat", "adb.hp"]
    hp = catalog.get_table("adb.hp")
    assert hp.schema.partition_keys == ["o_orderstatus"]
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in hp.read(spark)
               .select("o_orderkey", "o_orderstatus").collect())
    assert a == b
    assert catalog.get_table("adb.flat").schema.partition_keys == []


def test_migrate_file_into_partitioned_table(spark, catalog, orders,
                                             tmp_path):
    """migrate_file into a PARTITIONED append table (r12): the hive
    source's k=v paths bind the target's partition keys; a flat source
    is rejected loudly."""
    from incubator_paimon_spark import P
    from incubator_paimon_spark.procedures import call_sql

    src = orders.select("o_orderkey", "o_orderstatus")
    t = catalog.create_table("db.mfp", src.schema,
                             partition_keys=["o_orderstatus"])
    t.write(spark, src.limit(100))
    extra = src.filter("o_orderkey % 7 = 3").limit(200)
    extra.write.partitionBy("o_orderstatus").parquet(str(tmp_path / "hsrc"))
    call_sql(spark, catalog,
             f"CALL sys.migrate_file(source_dir => '{tmp_path / 'hsrc'}', "
             f"target_table => 'db.mfp')")
    t2 = catalog.get_table("db.mfp")
    assert t2.read(spark).count() == 100 + extra.count()
    # pruning sees the migrated files' partitions
    n_f = t2.read(spark, predicate=P.eq("o_orderstatus", "F")).count()
    want = (src.limit(100).filter("o_orderstatus = 'F'").count()
            + extra.filter("o_orderstatus = 'F'").count())
    assert n_f == want

    # flat source into a partitioned target fails loudly
    src.limit(5).coalesce(1).write.parquet(str(tmp_path / "flat2"))
    import pytest as _pt
    with _pt.raises(ValueError, match="not found in hive path"):
        call_sql(spark, catalog,
                 f"CALL sys.migrate_file(source_dir => '{tmp_path / 'flat2'}',"
                 f" target_table => 'db.mfp')")


def test_migrate_orc_sources(spark, catalog, orders, tmp_path):
    """migrate_table / migrate_file accept ORC sources (the reference's
    migrate handles both hive formats): zero-copy link, stats computed
    from one read (pyarrow exposes no ORC column stats), pruning works,
    mixed-format dirs are rejected."""
    from incubator_paimon_spark import P
    from incubator_paimon_spark.procedures import call_sql

    src = orders.select("o_orderkey", "o_totalprice", "o_orderstatus") \
                .limit(400)
    src.write.partitionBy("o_orderstatus").orc(str(tmp_path / "ho"))
    t = call_sql(spark, catalog,
                 f"CALL sys.migrate_table(table => 'db.mig_orc', "
                 f"source_dir => '{tmp_path / 'ho'}')")
    assert t.schema.partition_keys == ["o_orderstatus"]
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in t.read(spark).select(*src.columns).collect())
    assert a == b
    # stats-based skipping has real min/max from the ORC read
    es = t.new_scan().plan().entries
    assert all("min" in e.file.stats.get("o_orderkey", {}) for e in es)
    n_f = src.filter("o_orderstatus = 'F'").count()
    assert t.read(spark, predicate=P.eq("o_orderstatus", "F")).count() == n_f

    # migrate_file with an ORC source into an existing append table
    t2 = catalog.create_table("db.mfo", src.select("o_orderkey").schema)
    src.select("o_orderkey").limit(60).write.orc(str(tmp_path / "fo"))
    call_sql(spark, catalog,
             f"CALL sys.migrate_file(source_dir => '{tmp_path / 'fo'}', "
             f"target_table => 'db.mfo')")
    assert catalog.get_table("db.mfo").read(spark).count() == 60

    # mixed formats rejected
    src.limit(5).coalesce(1).write.parquet(str(tmp_path / "mx" / "p"))
    src.limit(5).coalesce(1).write.orc(str(tmp_path / "mx" / "o"))
    import pytest as _pt
    with _pt.raises(ValueError, match="mixed parquet/orc"):
        call_sql(spark, catalog,
                 f"CALL sys.migrate_table(table => 'db.mig_mx', "
                 f"source_dir => '{tmp_path / 'mx'}')")


def test_expire_partitions_time_extraction(spark, catalog, orders):
    """Partition expiration (PartitionExpire.java:45) with the
    PartitionTimeExtractor forms: default = FIRST partition value parsed
    as date/timestamp text; $key pattern composes several columns;
    unparseable partitions are skipped, never dropped."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from incubator_paimon_spark.procedures import call_sql

    # default extraction over a date-typed single key
    o = orders.select("o_orderkey", "o_orderdate").limit(2000) \
              .withColumn("dt", F.col("o_orderdate"))
    t = catalog.create_table("db.pe1", o.schema, partition_keys=["dt"])
    t.write(spark, o)
    n_parts = t.read(spark).select("dt").distinct().count()
    # fixture dates are 1992-1998: everything older than ~9000 days ago
    # expires; nothing younger does
    snap = call_sql(spark, catalog,
                    "CALL sys.expire_partitions(table => 'db.pe1', "
                    "expiration_time => '100000 d')")
    assert snap is None  # nothing that old
    call_sql(spark, catalog,
             "CALL sys.expire_partitions(table => 'db.pe1', "
             "expiration_time => '1 d')")
    assert catalog.get_table("db.pe1").read(spark).count() == 0

    # $pattern over (year, month) string columns
    o2 = (orders.select("o_orderkey", "o_orderdate").limit(2000)
          .withColumn("y", F.date_format("o_orderdate", "yyyy"))
          .withColumn("m", F.date_format("o_orderdate", "MM")))
    t2 = catalog.create_table("db.pe2", o2.schema, partition_keys=["y", "m"])
    t2.write(spark, o2)
    years = {r.y for r in t2.read(spark).select("y").distinct().collect()}
    cut_year = sorted(years)[1]
    days = (datetime.now() - datetime(int(cut_year), 1, 1)).days
    call_sql(spark, catalog,
             f"CALL sys.expire_partitions(table => 'db.pe2', "
             f"expiration_time => '{days} d', "
             f"timestamp_pattern => '$y-$m-01')")
    left = catalog.get_table("db.pe2").read(spark)
    assert left.filter(F.col("y") < cut_year).count() == 0
    assert left.filter(F.col("y") >= cut_year).count() > 0

    # a non-time partition value never expires (skipped, logged-not-dropped)
    o3 = orders.select("o_orderkey", "o_orderstatus").limit(100)
    t3 = catalog.create_table("db.pe3", o3.schema,
                              partition_keys=["o_orderstatus"])
    t3.write(spark, o3)
    assert call_sql(spark, catalog,
                    "CALL sys.expire_partitions(table => 'db.pe3', "
                    "expiration_time => '1 d')") is None
    assert catalog.get_table("db.pe3").read(spark).count() == 100


def test_auto_expire_on_commit(spark, catalog, customer):
    """Snapshot expiration runs on every commit like the reference
    (TableCommitImpl's expireSnapshots runnable), bounded by
    snapshot.expire.limit; default retention expires nothing on young
    tables."""
    c = customer.select("c_custkey", "c_name").limit(10)
    t = catalog.create_table("db.aexp", c.schema,
                             options={"snapshot.num-retained.max": "3",
                                      "snapshot.num-retained.min": "2"})
    for i in range(6):
        t.write(spark, c)
    ids = [s.id for s in t.snapshots.list_all()]
    # 6 writes (+ a possible hook compaction); only the newest <=3 remain
    assert len(ids) <= 3 and max(ids) >= 6
    assert t.read(spark).count() == 60  # expiry never touches live data

    # defaults: nothing expires within snapshot.time-retained
    t2 = catalog.create_table("db.aexp2", c.schema)
    for i in range(12):
        t2.write(spark, c)
    # every commit (writes + hook compactions) survives: all young
    assert len(t2.snapshots.list_all()) == t2.snapshots.latest().id

    # snapshot.expire.limit bounds one sweep
    t3 = catalog.create_table("db.aexp3", c.schema,
                              options={"snapshot.num-retained.max": "1",
                                       "snapshot.num-retained.min": "1",
                                       "snapshot.expire.limit": "1"})
    for i in range(5):
        t3.write(spark, c)
    # each commit expired at most ONE old snapshot: 5 commits - 3 sweeps
    # that had work = monotone shrink toward 1, never a mass delete
    assert 1 <= len(t3.snapshots.list_all()) <= 2


def test_stale_consumer_expires_and_unpins_history(spark, catalog,
                                                   customer):
    """consumer.expiration-time (ConsumerManager.expire): a crashed
    reader's progress file goes stale by mtime and is dropped during
    the expiry sweep, unpinning snapshot history; a fresh consumer
    still pins."""
    import os

    from incubator_paimon_spark.maintenance import expire_stale_consumers

    c = customer.select("c_custkey", "c_name").limit(10)
    t = catalog.create_table("db.cexp", c.schema,
                             options={"snapshot.num-retained.max": "2",
                                      "snapshot.num-retained.min": "1",
                                      "consumer.expiration-time": "1 h"})
    t.write(spark, c)
    t.write_consumer("crashed", 1)
    t.write_consumer("alive", 1)
    # age ONLY the crashed consumer's file
    p = t.consumer_path("crashed")
    os.utime(p, (0, 0))
    for _ in range(4):
        t.write(spark, c)
    # the live consumer still pins history: nothing expired
    assert "crashed" not in t.list_consumers()
    assert "alive" in t.list_consumers()
    assert len(t.snapshots.list_all()) == 5
    # the live one advances -> history shrinks on the next commit
    t.write_consumer("alive", 100)
    t.write(spark, c)
    assert len(t.snapshots.list_all()) <= 2

    # without the option, nothing ever expires
    t2 = catalog.create_table("db.cexp2", c.schema)
    t2.write(spark, c)
    t2.write_consumer("old", 1)
    os.utime(t2.consumer_path("old"), (0, 0))
    assert expire_stale_consumers(t2) == 0
    assert "old" in t2.list_consumers()
