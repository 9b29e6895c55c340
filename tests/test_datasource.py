"""Python DataSource integration: spark.read/readStream.format("paimon")
(PaimonMicroBatchStream.scala:32 / SparkTable DSv2 parity)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from incubator_paimon_spark.datasource import register
    register(spark)


def test_batch_read_merges_pk(spark, catalog, customer):
    t = catalog.create_table("db.dspk", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "4"})
    t.write(spark, customer)
    t.write(spark, customer.limit(30).withColumn("c_acctbal", F.lit(5.0)))
    df = spark.read.format("paimon").load(t.path)
    assert df.count() == customer.count()
    assert df.filter("c_acctbal = 5.0").count() == 30


def test_stream_changelog_and_resume(spark, catalog, customer):
    t = catalog.create_table("db.dsst", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    t.write(spark, customer)
    t.write(spark, customer.limit(30).withColumn("c_acctbal", F.lit(5.0)))

    st_cl = (spark.readStream.format("paimon")
             .option("scan.mode", "earliest")
             .option("read.changelog", "true").load(t.path))
    q = (st_cl.writeStream.format("memory").queryName("ds_cl")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT count(*) n, "
        "sum(CASE WHEN _row_kind = '+I' THEN 1 ELSE 0 END) ins FROM ds_cl"
    ).first()
    assert got["n"] == customer.count() + 30
    assert got["ins"] == got["n"]  # inserts only in this history

    # exactly-once resume via checkpoint (file sink; memory sink can't recover)
    out = tempfile.mkdtemp(prefix="pmn_dsout_")
    ck = tempfile.mkdtemp(prefix="pmn_dsck_")
    try:
        st = (spark.readStream.format("paimon")
              .option("scan.mode", "earliest").load(t.path))

        def run():
            qq = (st.writeStream.format("parquet").option("path", out)
                  .option("checkpointLocation", ck)
                  .trigger(availableNow=True).start())
            qq.awaitTermination(180)

        run()
        assert spark.read.parquet(out).count() == customer.count() + 30
        t.write(spark, customer.limit(7).withColumn("c_acctbal", F.lit(8.0)))
        run()
        assert spark.read.parquet(out).count() == customer.count() + 37
        run()  # no new commits -> no duplicates
        assert spark.read.parquet(out).count() == customer.count() + 37
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_stream_read_limits_and_consumer(spark, catalog, customer):
    import glob
    import time as _time
    t = catalog.create_table("db.dslim", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    for i in range(4):
        t.write(spark, customer.filter(f"c_custkey % 4 = {i}"))
    out = tempfile.mkdtemp(prefix="pmn_dsl_o_")
    ck = tempfile.mkdtemp(prefix="pmn_dsl_ck_")
    try:
        st = (spark.readStream.format("paimon")
              .option("scan.mode", "earliest")
              .option("read.stream.maxSnapshotsPerTrigger", "1")
              .option("consumer-id", "ci1").load(t.path))
        q = (st.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(processingTime="1 second").start())
        deadline = _time.time() + 60
        while _time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= customer.count():
                    break
            except Exception:
                pass
            _time.sleep(2)
        q.stop()
        assert spark.read.parquet(out).count() == customer.count()
        # one snapshot per trigger (PaimonReadLimits parity)
        assert len(glob.glob(ck + "/offsets/*")) >= 4
        # durable consumer progress advanced (conservative: lags the
        # in-flight batch, which is exactly the expiration-safe bound)
        assert (t.read_consumer("ci1") or 0) >= 2
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_stream_sink_paimon_to_paimon(spark, catalog, customer):
    src = catalog.create_table("db.sksrc", customer.schema)
    src.write(spark, customer)
    sink = catalog.create_table("db.sksink", customer.schema)
    ck = tempfile.mkdtemp(prefix="pmn_sk_ck_")
    try:
        st = (spark.readStream.format("paimon")
              .option("scan.mode", "earliest").load(src.path))

        def run():
            q = (st.writeStream.format("paimon").option("path", sink.path)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        run()
        assert sink.read(spark).count() == customer.count()
        assert sink.snapshots.latest().commit_identifier >= 0
        src.write(spark, customer.limit(20))
        run()  # resume: only the delta lands, exactly once
        assert sink.read(spark).count() == customer.count() + 20
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def test_call_sql_and_aggregation_fields(spark, catalog, customer):
    from incubator_paimon_spark.procedures import call_sql
    t = catalog.create_table("db.cs", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2",
                                      "merge-engine": "aggregation",
                                      "fields.c_acctbal.aggregate-function": "sum"})
    af = {r["field_name"]: r["function"]
          for r in t.system(spark, "$aggregation_fields").collect()}
    assert af["c_acctbal"] == "sum"
    assert af["c_custkey"] == "primary-key"
    t.write(spark, customer)
    call_sql(spark, catalog, "CALL sys.compact(table => 'db.cs', full => true)")
    assert t.snapshots.latest().commit_kind == "COMPACT"


def test_stream_read_limits_bytes_files_minrows(spark, catalog, customer):
    """PaimonReadLimits parity: maxBytes/maxFiles bound a trigger; minRows +
    maxTriggerDelay hold a trigger until backlog or timeout (unit-level on
    PaimonStreamReader.read — no streaming engine needed)."""
    from incubator_paimon_spark.datasource import PaimonStreamReader

    t = catalog.create_table("db.dslim2", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    for i in range(4):
        t.write(spark, customer.filter(f"c_custkey % 4 = {i}"))

    # maxBytes: 1 byte budget → the crossing snapshot is included, one per call
    r = PaimonStreamReader({"path": t.path, "scan.mode": "earliest",
                            "read.stream.maxBytesPerTrigger": "1"}, False)
    start = r.initialOffset()
    _, end = r.read(start)
    assert end["snapshot_id"] == start["snapshot_id"] + 1

    # maxFiles: every snapshot wrote 2 buckets → 2 files crosses a 2-file cap
    r = PaimonStreamReader({"path": t.path, "scan.mode": "earliest",
                            "read.stream.maxFilesPerTrigger": "2"}, False)
    _, end = r.read(r.initialOffset())
    assert end["snapshot_id"] == start["snapshot_id"] + 1

    # minRows larger than the whole backlog + long delay → batch held
    r = PaimonStreamReader({"path": t.path, "scan.mode": "earliest",
                            "read.stream.minRowsPerTrigger": "10000000",
                            "read.stream.maxTriggerDelayMs": "3600000"}, False)
    start = r.initialOffset()
    it, end = r.read(start)
    assert end == start and list(it) == []
    # delay expired → admitted despite minRows
    r._last_trigger_ms = 0
    _, end = r.read(start)
    assert end["snapshot_id"] == 4

    # no limits → drain everything in one trigger
    r = PaimonStreamReader({"path": t.path, "scan.mode": "earliest"}, False)
    _, end = r.read(r.initialOffset())
    assert end["snapshot_id"] == 4


def test_batch_read_raw_split_and_dv(spark, catalog, customer):
    """format('paimon') batch path: compacted PK tables split per-file with
    no Python merge; append tables apply deletion vectors in the workers;
    non-mergeable engines raise toward Table.read."""
    from incubator_paimon_spark.datasource import PaimonBatchReader

    # compacted PK table → every split is raw (pks == [])
    t = catalog.create_table("db.dsraw", customer.schema,
                             primary_keys=["c_custkey"], options={"bucket": "2"})
    t.write(spark, customer)
    t.compact(spark, full=True)
    r = PaimonBatchReader({"path": t.path}, False)
    splits = r.partitions()
    assert splits and all(s.pks == [] for s in splits)
    assert all(len(s.files) == 1 for s in splits)
    got = spark.read.format("paimon").load([t.path])
    assert got.count() == customer.count()

    # append table + DV delete → workers drop deleted positions
    a = catalog.create_table("db.dsdv", customer.schema,
                             options={"deletion-vectors.enabled": "true"})
    a.write(spark, customer)
    from incubator_paimon_spark import P
    a.delete_where(spark, P.lt("c_custkey", 100))
    a2 = catalog.get_table("db.dsdv")
    want = a2.read(spark).count()
    assert want == customer.filter("c_custkey >= 100").count()
    got = spark.read.format("paimon").load([a2.path])
    assert got.count() == want

    # first-row engine merges via head(1)
    fr = catalog.create_table("db.dsfr", customer.schema,
                              primary_keys=["c_custkey"],
                              options={"merge-engine": "first-row"})
    fr.write(spark, customer.withColumn("c_acctbal", F.lit(1.0)))
    fr.write(spark, customer.withColumn("c_acctbal", F.lit(2.0)))
    got = spark.read.format("paimon").load([fr.path])
    assert got.count() == customer.count()
    assert got.agg(F.max("c_acctbal")).collect()[0][0] == 1.0

    # partial-update: clear error pointing at Table.read
    pu = catalog.create_table("db.dspu", customer.schema,
                              primary_keys=["c_custkey"],
                              options={"merge-engine": "partial-update"})
    pu.write(spark, customer)
    r = PaimonBatchReader({"path": pu.path}, False)
    with pytest.raises(ValueError, match="temp view"):
        r.partitions()


def test_batch_write_format_paimon(spark, catalog, orders):
    """df.write.format('paimon'): append + overwrite on (partitioned) append
    tables; PK tables point at Table.write."""
    o = orders.withColumn("dt", F.to_date(F.date_trunc("month", "o_orderdate")))
    t = catalog.create_table("db.dswr", o.schema, partition_keys=["dt"])
    o.write.format("paimon").mode("append").save(t.path)
    assert catalog.get_table("db.dswr").read(spark).count() == o.count()
    # partition layout + pruning intact
    d = o.select("dt").distinct().limit(1).collect()[0][0]
    t2 = catalog.get_table("db.dswr")
    from incubator_paimon_spark import P
    pruned = t2.new_scan().plan(P.eq("dt", d))
    assert 0 < len(pruned.entries) < len(t2.new_scan().plan().entries)

    # r13 (CoreOptions parity, same rule catalog.sql applies): a
    # spec-less OVERWRITE of a PARTITIONED table is DYNAMIC by default —
    # only the partitions present in the new data are replaced
    one_dt = o.select("dt").distinct().orderBy("dt").limit(1) \
              .collect()[0][0]
    small = o.filter(F.col("dt") == one_dt).filter("o_orderkey % 10 = 0")
    small.write.format("paimon").mode("overwrite").save(t.path)
    t3 = catalog.get_table("db.dswr")
    exp = small.count() + o.filter(F.col("dt") != one_dt).count()
    assert t3.read(spark).count() == exp
    assert t3.snapshots.latest().commit_kind == "OVERWRITE"

    # dynamic-partition-overwrite=false restores whole-table replacement
    t3.schemas.update_options({"dynamic-partition-overwrite": "false"})
    small.write.format("paimon").mode("overwrite").save(t.path)
    t4 = catalog.get_table("db.dswr")
    assert t4.read(spark).count() == small.count()

    # dynamic-bucket PK table: raw-staged, committed through
    # Table.write's own assigner (r13)
    pk = catalog.create_table("db.dswrpk", orders.schema,
                              primary_keys=["o_orderkey"])
    orders.write.format("paimon").mode("append").save(pk.path)
    got = catalog.get_table("db.dswrpk").read(spark).count()
    assert got == orders.select("o_orderkey").distinct().count()


def test_batch_read_time_travel_options(spark, catalog, customer):
    """scan.tag-name / scan.timestamp-millis / snapshot-id options mirror
    the reference's Spark read options."""
    t = catalog.create_table("db.dstt", customer.schema,
                             primary_keys=["c_custkey"])
    t.write(spark, customer.filter("c_custkey % 2 = 0"))
    t.create_tag("v1")
    t.write(spark, customer.filter("c_custkey % 2 = 1"))
    half = customer.filter("c_custkey % 2 = 0").count()
    assert (spark.read.format("paimon").option("scan.tag-name", "v1")
            .load([t.path]).count() == half)
    assert (spark.read.format("paimon").option("snapshot-id", "1")
            .load([t.path]).count() == half)
    assert (spark.read.format("paimon").load([t.path]).count()
            == customer.count())

    # fully-compacted aggregation table reads raw through the native path
    from pyspark.sql import functions as F
    agg = catalog.create_table(
        "db.dsagg", customer.select("c_custkey", "c_acctbal").schema,
        primary_keys=["c_custkey"],
        options={"merge-engine": "aggregation",
                 "fields.c_acctbal.aggregate-function": "sum"})
    agg.write(spark, customer.select("c_custkey", "c_acctbal"))
    agg.compact(spark, full=True)
    got = (spark.read.format("paimon").load([agg.path])
           .agg(F.sum("c_acctbal")).collect()[0][0])
    want = customer.agg(F.sum("c_acctbal")).collect()[0][0]
    assert abs(got - want) < 1e-6


def test_batch_read_orc_table(spark, catalog, customer):
    """format('paimon') reads ORC-format tables (stripe-streamed raw path +
    pandas merge path)."""
    t = catalog.create_table("db.dsorc", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2", "file.format": "orc"})
    t.write(spark, customer)
    t.write(spark, customer.limit(30).withColumn("c_acctbal", F.lit(7.0)))
    got = spark.read.format("paimon").load([t.path])
    assert got.count() == customer.count()
    assert got.filter("c_acctbal = 7.0").count() == 30


def test_batch_read_branch_option(spark, catalog, customer):
    """format('paimon').option('branch', ...) reads a branch table."""
    t = catalog.create_table("db.dsbr", customer.schema)
    t.write(spark, customer.limit(40))
    t.create_tag("base")
    b = t.create_branch("dev", tag="base")
    b.write(spark, customer.limit(10))
    assert (spark.read.format("paimon").option("branch", "dev")
            .load([t.path]).count() == 50)
    assert spark.read.format("paimon").load([t.path]).count() == 40


def test_batch_read_empty_table(spark, catalog, customer):
    """A table whose live set is empty (all rows deleted / fresh) reads as
    0 rows — pyspark passes a None partition when partitions() is empty."""
    from incubator_paimon_spark import P

    t = catalog.create_table("db.dsempty", customer.schema,
                             primary_keys=["c_custkey"], options={"bucket": "2"})
    assert spark.read.format("paimon").load([t.path]).count() == 0  # fresh
    t.write(spark, customer.limit(10))
    t.delete_where(spark, P.ge("c_custkey", 0))
    t2 = catalog.get_table("db.dsempty")
    assert t2.read(spark).count() == 0
    assert spark.read.format("paimon").load([t2.path]).count() == 0


def test_batch_reader_filter_pushdown(spark, catalog, customer):
    """pushFilters maps Spark filters onto the Predicate IR: partition and
    stats pruning shrink the split list; every filter is still returned so
    Spark re-applies it post-scan (PaimonScanBuilder parity)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan
    from incubator_paimon_spark.datasource import PaimonBatchReader

    t = catalog.create_table("db.dspf", customer.schema,
                             partition_keys=["c_mktsegment"])
    t.write(spark, customer)

    r = PaimonBatchReader({"path": t.path}, False)
    n_all = len(r.partitions())
    r2 = PaimonBatchReader({"path": t.path}, False)
    seg = customer.select("c_mktsegment").first()[0]
    rest = list(r2.pushFilters([EqualTo(("c_mktsegment",), seg),
                                GreaterThan(("c_custkey",), -1)]))
    assert len(rest) == 2  # all filters handed back for re-evaluation
    assert len(r2.partitions()) < n_all
    # impossible predicate prunes to the empty-split placeholder
    r3 = PaimonBatchReader({"path": t.path}, False)
    list(r3.pushFilters([EqualTo(("c_custkey",), -123456)]))
    splits = r3.partitions()
    assert sum(len(s.files) for s in splits) == 0

    # end-to-end through the engine (worker-side pushFilters): results match
    df = spark.read.format("paimon").load(t.path)
    got = df.filter(F.col("c_mktsegment") == seg).count()
    assert got == customer.filter(F.col("c_mktsegment") == seg).count()


def test_batch_reader_pushdown_in_filter(spark, catalog, customer):
    """IN filters push down without crashing (pyspark's In stores its tuple
    in `value`, not `values` — r5 review) and results stay exact."""
    t = catalog.create_table("db.dsin", customer.schema)
    t.write(spark, customer)
    df = spark.read.format("paimon").load(t.path)
    got = df.filter(F.col("c_custkey").isin(1, 2, 3)).count()
    assert got == customer.filter(F.col("c_custkey").isin(1, 2, 3)).count()


def test_stream_restart_mid_backfill_exactly_once(spark, catalog, customer):
    """Kill a readStream.format('paimon') query PART-WAY through a
    multi-batch backfill and restart it on the same checkpoint: the
    offset logic (PaimonStreamReaderDist — the engine replays the last
    batch via partitions(start, end) first, which re-seeds the window
    base; latestOffset/partitions never move the window backwards) must
    resume from the checkpointed offset — every source row lands exactly
    once across three query incarnations (VERDICT r5 #8).

    Note: the limited incarnations use processingTime triggers. Under
    availableNow the engine takes ONE latestOffset result as the whole
    run's terminal target (PythonMicroBatchStream implements neither
    SupportsAdmissionControl nor SupportsTriggerAvailableNow), so a
    per-trigger read limit bounds the entire run — documented upstream
    API limitation, covered by test_stream_availablenow_with_limits."""
    import time as _time
    t = catalog.create_table("db.dsrestart", customer.schema)
    n_total = customer.count()
    for i in range(8):  # 8 disjoint slices -> 8 snapshots
        t.write(spark, customer.filter(f"c_custkey % 8 = {i}"))
    out = tempfile.mkdtemp(prefix="pmn_dsr_o_")
    ck = tempfile.mkdtemp(prefix="pmn_dsr_ck_")
    try:
        st = (spark.readStream.format("paimon")
              .option("scan.mode", "earliest")
              .option("read.stream.maxSnapshotsPerTrigger", "1")
              .load(t.path))

        def run_until(pred, timeout=120):
            q = (st.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(processingTime="200 milliseconds").start())
            deadline = _time.time() + timeout
            n = 0
            while _time.time() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if pred(n):
                    break
                _time.sleep(0.2)
            q.stop()
            return n

        seen = run_until(lambda n: n > 0)
        assert 0 < seen < n_total, f"want a partial backfill, got {seen}"

        # restart on the same checkpoint; march the rest of the snapshots
        final = run_until(lambda n: n >= n_total)
        assert final == n_total, (final, n_total)
        got = spark.read.parquet(out)
        assert got.select("c_custkey").distinct().count() == n_total

        # third incarnation (unlimited, availableNow) must add NOTHING —
        # the checkpoint already covers every snapshot
        st2 = (spark.readStream.format("paimon")
               .option("scan.mode", "earliest").load(t.path))
        q3 = (st2.writeStream.format("parquet").option("path", out)
              .option("checkpointLocation", ck)
              .trigger(availableNow=True).start())
        q3.awaitTermination(120)
        assert spark.read.parquet(out).count() == n_total
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_stream_availablenow_with_limits(spark, catalog, customer):
    """Documented interaction: with a per-trigger read limit, ONE
    availableNow run advances at most one limit window (the engine takes
    a single latestOffset as the run's target — upstream Python-API gap);
    repeated runs on the same checkpoint still converge to a complete,
    exactly-once drain."""
    t = catalog.create_table("db.dsan", customer.schema)
    n_total = customer.count()
    for i in range(4):
        t.write(spark, customer.filter(f"c_custkey % 4 = {i}"))
    out = tempfile.mkdtemp(prefix="pmn_dsan_o_")
    ck = tempfile.mkdtemp(prefix="pmn_dsan_ck_")
    try:
        st = (spark.readStream.format("paimon")
              .option("scan.mode", "earliest")
              .option("read.stream.maxSnapshotsPerTrigger", "2")
              .load(t.path))
        counts = []
        for _ in range(4):
            q = (st.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            counts.append(spark.read.parquet(out).count())
            if counts[-1] >= n_total:
                break
        assert counts[-1] == n_total, counts
        assert len(counts) > 1  # the limit really did bound each run
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_batch_writer_pk_buckets_without_shuffle(spark, warehouse, customer):
    """df.write.format('paimon') on a fixed-bucket PK table with NO
    clustered distribution (no catalog): the writer's per-row murmur
    bucket computation is the correctness authority, so rows still land
    in their engine bucket (more files, same answer) and PK equality
    still bucket-prunes."""
    import pandas as pd
    from incubator_paimon_spark import Catalog, P
    from incubator_paimon_spark.datasource import register

    register(spark)
    cat = Catalog(warehouse)
    t = cat.create_table("db.dw_pk", customer.schema,
                         primary_keys=["c_custkey"],
                         options={"bucket": "2"})
    (customer.repartition(8).write.format("paimon")
     .mode("append").option("path", t.path).save())

    a = (t.read(spark).toPandas()
         .sort_values("c_custkey").reset_index(drop=True))
    e = (customer.toPandas()
         .sort_values("c_custkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[sorted(a.columns)], e[sorted(e.columns)])

    full = t.new_scan().plan()
    pruned = t.new_scan().plan(P.eq("c_custkey", 5))
    assert {e2.bucket for e2 in pruned.entries} == {
        e2.bucket for e2 in full.entries
        if e2.bucket == pruned.entries[0].bucket}
    assert len({e2.bucket for e2 in pruned.entries}) == 1


def test_batch_writer_bucketed_append_routing(spark, warehouse, customer):
    """Bucketed APPEND tables (bucket > 0 + bucket-key, no PK) through the
    DataSource writer route rows into their murmur bucket — equality
    filters on the bucket key prune to one bucket and still see every
    row."""
    from incubator_paimon_spark import Catalog, P
    from incubator_paimon_spark.datasource import register

    register(spark)
    cat = Catalog(warehouse)
    t = cat.create_table("db.dw_ba", customer.schema,
                         options={"bucket": "4",
                                  "bucket-key": "c_custkey"})
    (customer.write.format("paimon")
     .mode("append").option("path", t.path).save())

    assert t.read(spark).count() == customer.count()
    pruned = t.new_scan().plan(P.eq("c_custkey", 17))
    assert len({e.bucket for e in pruned.entries}) == 1
    got = t.read(spark).where("c_custkey = 17").count()
    assert got == customer.where("c_custkey = 17").count()


def test_stream_writer_pk_upserts(spark, warehouse, customer):
    """r13: writeStream.format('paimon') into a fixed-bucket PK table —
    each micro-batch stages sorted per-bucket level-0 files, reads its
    LSN base from the latest snapshot, and commits exactly-once with
    commit_identifier = batchId; merge-on-read returns the upserted
    state."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from incubator_paimon_spark import Catalog
    from incubator_paimon_spark.datasource import register

    register(spark)
    cat = Catalog(warehouse)
    src = customer.select("c_custkey", "c_name").limit(40)
    t = cat.create_table("db.st_pk", src.schema,
                         primary_keys=["c_custkey"],
                         options={"bucket": "2"})
    t.write(spark, src)  # batch base: 40 keys

    sdir = tempfile.mkdtemp(prefix="pmn_stw_src_")
    chk = tempfile.mkdtemp(prefix="pmn_stw_chk_")
    # stream an UPDATE for half the keys through the native sink
    upd = src.filter("c_custkey % 2 = 0").withColumn("c_name",
                                                     F.lit("STREAMED"))
    upd.write.mode("overwrite").parquet(sdir)
    q = (spark.readStream.schema(src.schema).parquet(sdir)
         .writeStream.format("paimon").option("path", t.path)
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = t.read(spark)
    assert got.count() == 40  # upsert, not append
    n_upd = got.filter("c_name = 'STREAMED'").count()
    assert n_upd == src.filter("c_custkey % 2 = 0").count()
    # per-bucket layout held
    buckets = {e.bucket for e in t.new_scan().plan().entries}
    assert buckets <= {0, 1}


def test_stream_writer_partitioned_append_layout(spark, warehouse, orders):
    """r13 fix: the native streaming sink previously committed every
    file under bucket-0 with an EMPTY partition spec even on partitioned
    tables; it now stages per (partition, bucket) so partition pruning
    stays exact."""
    import tempfile

    from incubator_paimon_spark import Catalog, P
    from incubator_paimon_spark.datasource import register

    register(spark)
    cat = Catalog(warehouse)
    src = orders.select("o_orderkey", "o_orderstatus").limit(300)
    t = cat.create_table("db.st_part", src.schema,
                         partition_keys=["o_orderstatus"])
    sdir = tempfile.mkdtemp(prefix="pmn_stp_src_")
    chk = tempfile.mkdtemp(prefix="pmn_stp_chk_")
    src.write.mode("overwrite").parquet(sdir)
    q = (spark.readStream.schema(src.schema).parquet(sdir)
         .writeStream.format("paimon").option("path", t.path)
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    assert t.read(spark).count() == 300
    pruned = t.new_scan().plan(P.eq("o_orderstatus", "F"))
    assert pruned.entries and all(
        e.partition == {"o_orderstatus": "F"} for e in pruned.entries)
    exp = src.filter("o_orderstatus = 'F'").count()
    assert t.read(spark).filter("o_orderstatus = 'F'").count() == exp


def test_batch_writer_honors_file_format(spark, warehouse, customer):
    """r13: SQL/df writes through the DataSource writer honor
    `file.format` — orc staged directly, avro staged as parquet and
    transcoded at commit (the same order Table.write uses) — and
    merge-on-read returns the upserted state through either format."""
    from incubator_paimon_spark import Catalog
    from incubator_paimon_spark.datasource import register

    register(spark)
    cat = Catalog(warehouse)
    for fmt in ("orc", "avro"):
        t = cat.create_table(f"db.fmt_{fmt}", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2",
                                      "file.format": fmt})
        (customer.write.format("paimon").mode("append")
         .option("path", t.path).save())
        files = [e.file.file_name for e in t.new_scan().plan().entries]
        assert files and all(f.endswith(f".{fmt}") for f in files), files
        assert t.read(spark).count() == customer.count()


def test_held_handle_filtered_then_unfiltered(spark, catalog, customer):
    """r15 (r14 verdict missing #1): ONE held DataFrame handle, a
    filtered query then an unfiltered one (and other orders), must not
    serve the second query the first one's pruned file list — the
    QueryExecutionListener installed by register() clears pyspark's
    one-shot read-plan memo after every query."""
    seg = customer.select("c_mktsegment").first()[0]
    n_all = customer.count()
    n_seg = customer.filter(F.col("c_mktsegment") == seg).count()

    t = catalog.create_table("db.heldh", customer.schema,
                             partition_keys=["c_mktsegment"])
    t.write(spark, customer)

    # poisoning order: filtered FIRST, then unfiltered on the SAME handle
    df = spark.read.format("paimon").load(t.path)
    assert df.filter(F.col("c_mktsegment") == seg).count() == n_seg
    assert df.count() == n_all
    # and again the other way, plus a second different filter
    assert df.count() == n_all
    assert df.filter(F.col("c_mktsegment") == seg).count() == n_seg
    assert df.filter(F.col("c_mktsegment") != seg).count() == n_all - n_seg
    # aggregation after a filtered query on the same handle
    assert df.groupBy().count().collect()[0][0] == n_all
