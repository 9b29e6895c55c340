"""Rescale-bucket tests (docs/content/maintenance/rescale-bucket.md):
ALTER TABLE SET ('bucket'=N) is metadata-only; INSERT OVERWRITE reorganizes
a partition into the new layout; plain INSERT INTO a stale-layout partition
must fail (the reference raises TableException from the Flink sink); reads
and bucket pruning stay exact across partitions with different counts."""

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark import P
from incubator_paimon_spark.predicate import And


def _mk(spark, catalog, orders, bucket=2):
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice",
                      "o_orderstatus")
    t = catalog.create_table(
        "db.resc", o.schema, primary_keys=["o_orderkey", "o_orderstatus"],
        partition_keys=["o_orderstatus"], options={"bucket": str(bucket)})
    t.write(spark, o)
    return t, o


def _rescale(spark, catalog, ident, n):
    catalog.sql(spark,
                f"ALTER TABLE {ident} SET TBLPROPERTIES ('bucket'='{n}')")
    return catalog.get_table(ident)


def _layouts(t):
    by_part = {}
    for e in t.entries_at():
        by_part.setdefault(e.partition.get("o_orderstatus"), set()).add(
            e.file.total_buckets)
    return by_part


def test_rescale_guard_and_overwrite(spark, catalog, orders):
    t, o = _mk(spark, catalog, orders)
    live = t.entries_at()
    assert {e.file.total_buckets for e in live} == {2}
    assert {e.bucket for e in live} == {0, 1}

    t = _rescale(spark, catalog, "db.resc", 4)
    # metadata-only: reads still correct against the old layout
    assert t.read(spark).count() == o.count()

    # plain INSERT INTO a stale-layout partition raises
    with pytest.raises(ValueError, match="bucket num"):
        t.write(spark, o.filter("o_orderstatus = 'F'").limit(5))

    # INSERT OVERWRITE of one partition reorganizes it
    t.write(spark, o.filter("o_orderstatus = 'F'"),
            overwrite={"o_orderstatus": "F"})
    by_part = _layouts(t)
    assert by_part["F"] == {4}
    assert by_part["O"] == {2}  # untouched partition keeps the old layout

    # mixed-layout table reads exactly
    got = t.read(spark).agg(F.count("*"), F.sum("o_totalprice")).collect()[0]
    exp = o.agg(F.count("*"), F.sum("o_totalprice")).collect()[0]
    assert (got[0], round(got[1], 2)) == (exp[0], round(exp[1], 2))

    # INSERT INTO the rescaled partition now works; the stale one still fails
    extra = o.filter("o_orderstatus = 'F'").limit(3).withColumn(
        "o_totalprice", F.lit(0.5))
    t.write(spark, extra)
    assert t.read(spark).filter("o_totalprice = 0.5").count() == 3
    with pytest.raises(ValueError, match="bucket num"):
        t.write(spark, o.filter("o_orderstatus = 'O'").limit(5))


def test_rescale_bucket_pruning_per_layout(spark, catalog, orders):
    t, o = _mk(spark, catalog, orders)
    t = _rescale(spark, catalog, "db.resc", 4)
    t.write(spark, o.filter("o_orderstatus = 'F'"),
            overwrite={"o_orderstatus": "F"})

    # keys from both layouts: pruned plans return exactly the merged row
    for status in ("F", "O"):
        row = o.filter(F.col("o_orderstatus") == status).limit(1).collect()[0]
        pred = And([P.eq("o_orderkey", row.o_orderkey),
                    P.eq("o_orderstatus", status)])
        plan_all = t.new_scan().plan(P.eq("o_orderstatus", status))
        plan = t.new_scan().plan(pred)
        assert len(plan.entries) <= len(plan_all.entries)
        got = t.read(spark, predicate=pred).collect()
        assert len(got) == 1 and got[0].o_orderkey == row.o_orderkey

    # point lookup resolves keys in both layouts
    q = t.new_query()
    for status in ("F", "O"):
        row = o.filter(F.col("o_orderstatus") == status).limit(1).collect()[0]
        hit = q.lookup({"o_orderkey": row.o_orderkey,
                        "o_orderstatus": status})
        assert hit is not None and hit["o_custkey"] == row.o_custkey


def test_rescale_compaction_preserves_layout(spark, catalog, orders):
    from incubator_paimon_spark.compact import compact_table
    t, o = _mk(spark, catalog, orders)
    t = _rescale(spark, catalog, "db.resc", 4)
    t.write(spark, o.filter("o_orderstatus = 'F'"),
            overwrite={"o_orderstatus": "F"})
    # several appends into the rescaled partition to give compaction work
    for i in range(4):
        t.write(spark, o.filter("o_orderstatus = 'F'")
                .withColumn("o_totalprice", F.col("o_totalprice") + i))
    compact_table(spark, t, full=True)
    by_part = _layouts(t)
    assert by_part["F"] == {4}
    assert by_part["O"] == {2}
    # merged result: last write wins per key in F
    out = t.read(spark).filter("o_orderstatus = 'F'")
    exp = o.filter("o_orderstatus = 'F'").withColumn(
        "o_totalprice", F.col("o_totalprice") + 3)
    assert out.count() == exp.count()
    assert out.agg(F.sum("o_totalprice")).collect()[0][0] == \
        pytest.approx(exp.agg(F.sum("o_totalprice")).collect()[0][0])


def test_rescale_via_sql(spark, catalog, orders):
    o = orders.select("o_orderkey", "o_totalprice").limit(100)
    catalog.sql(spark, """
        CREATE TABLE db.sresc (o_orderkey BIGINT, o_totalprice DOUBLE)
        TBLPROPERTIES ('primary-key'='o_orderkey', 'bucket'='2')""")
    t = catalog.get_table("db.sresc")
    t.write(spark, o)
    catalog.sql(spark, "ALTER TABLE db.sresc SET TBLPROPERTIES ('bucket'='8')")
    with pytest.raises(ValueError, match="bucket num"):
        catalog.sql(spark, "INSERT INTO db.sresc SELECT 1 AS o_orderkey, "
                           "2.0 AS o_totalprice")
    catalog.sql(spark, "INSERT OVERWRITE db.sresc SELECT * FROM db.sresc")
    t2 = catalog.get_table("db.sresc")
    assert {e.file.total_buckets for e in t2.entries_at()} == {8}
    assert {e.bucket for e in t2.entries_at()} <= set(range(8))
    assert t2.read(spark).count() == 100


def test_rescale_protects_legacy_files(spark, catalog, orders):
    """Files written before totalBuckets was recorded (None in the
    manifest) resolve their layout from their WRITE-TIME schema's bucket
    option — so pre-feature tables are guarded and pruned exactly too."""
    import dataclasses
    t, o = _mk(spark, catalog, orders)
    # simulate a pre-feature table: strip the recorded layout
    t.commit.rewrite_metadata(lambda live: [
        dataclasses.replace(e, file=dataclasses.replace(
            e.file, total_buckets=None)) for e in live])
    t = catalog.get_table("db.resc")
    assert {e.file.total_buckets for e in t.entries_at()} == {None}

    t = _rescale(spark, catalog, "db.resc", 4)
    # guard: legacy layout (schema-0 bucket=2) != new option
    with pytest.raises(ValueError, match="bucket num"):
        t.write(spark, o.filter("o_orderstatus = 'F'").limit(5))
    # pruned reads and point lookups still resolve the legacy layout
    row = o.filter("o_orderstatus = 'F'").limit(1).collect()[0]
    from incubator_paimon_spark.predicate import And
    pred = And([P.eq("o_orderkey", row.o_orderkey),
                P.eq("o_orderstatus", "F")])
    got = t.read(spark, predicate=pred).collect()
    assert len(got) == 1 and got[0].o_custkey == row.o_custkey
    q = t.new_query()
    hit = q.lookup({"o_orderkey": row.o_orderkey, "o_orderstatus": "F"})
    assert hit is not None and hit["o_custkey"] == row.o_custkey
    # after OVERWRITE the partition is stamped with the new layout
    t.write(spark, o.filter("o_orderstatus = 'F'"),
            overwrite={"o_orderstatus": "F"})
    assert _layouts(t)["F"] == {4}
    assert t.read(spark).count() == o.count()


def test_bucket_transition_validation(spark, catalog, orders):
    """ALTER-time bucket guard (SchemaValidation.java:539-565): -1 <->
    fixed transitions are rejected (dynamic-index / bucket-unaware files
    cannot coexist with hash-routed files), bucket=0 is rejected, and the
    reference's immutable options (CoreOptions @Immutable) cannot change."""
    o = orders.select("o_orderkey", "o_totalprice").limit(50)
    # dynamic PK table: -1 -> fixed rejected
    t = catalog.create_table("db.dynv", o.schema, primary_keys=["o_orderkey"])
    t.write(spark, o)
    with pytest.raises(ValueError, match="-1"):
        t.schemas.update_options({"bucket": "4"})
    # fixed -> -1 rejected; bucket 0 rejected; fixed -> fixed allowed
    t2 = catalog.create_table("db.fixv", o.schema,
                              primary_keys=["o_orderkey"],
                              options={"bucket": "2"})
    with pytest.raises(ValueError, match="-1"):
        t2.schemas.update_options({"bucket": "-1"})
    with pytest.raises(ValueError, match="greater than 0"):
        t2.schemas.update_options({"bucket": "0"})
    t2.schemas.update_options({"bucket": "2"})   # same value: no-op
    t2.schemas.update_options({"bucket": "8"})   # rescale path stays open
    # bucket-unaware append table -> fixed is also a -1 transition
    a = catalog.create_table("db.appv", o.schema)
    with pytest.raises(ValueError, match="-1"):
        a.schemas.update_options({"bucket": "4"})
    # immutable options (SchemaManager.checkAlterTableOption)
    with pytest.raises(ValueError, match="not supported"):
        t2.schemas.update_options({"merge-engine": "partial-update"})
    with pytest.raises(ValueError, match="not supported"):
        t2.schemas.update_options({"sequence.field": "o_totalprice"})


def test_legacy_dynamic_layout_unprunable_and_write_guarded(spark, catalog,
                                                            orders):
    """A legacy dynamic-layout file under a (historically corrupted)
    fixed 'bucket' option: reads must NOT bucket-prune it away — its
    write-time schema resolves to -1, not the current count — and plain
    INSERT INTO must raise a layout conflict instead of silently mixing
    hash-routed rows with index-assigned rows."""
    import dataclasses
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice").limit(200)
    t = catalog.create_table("db.legdyn", o.schema,
                             primary_keys=["o_orderkey"])  # dynamic (-1)
    t.write(spark, o)
    # strip recorded layouts (pre-feature files) and force the corrupt
    # option state directly, bypassing the (new) ALTER validation
    t.commit.rewrite_metadata(lambda live: [
        dataclasses.replace(e, file=dataclasses.replace(
            e.file, total_buckets=None)) for e in live])
    base = t.schemas.latest()
    s = t.schemas._next(base)
    s.options["bucket"] = "4"
    t.schemas.commit_new(s)
    t = catalog.get_table("db.legdyn")

    # key-equality read: every legacy file is unprunable -> exact result
    row = o.limit(1).collect()[0]
    got = t.read(spark, predicate=P.eq("o_orderkey", row.o_orderkey)).collect()
    assert len(got) == 1 and got[0].o_custkey == row.o_custkey
    # point lookup resolves too
    hit = t.new_query().lookup({"o_orderkey": row.o_orderkey})
    assert hit is not None and hit["o_custkey"] == row.o_custkey
    # plain INSERT INTO raises the layout conflict
    with pytest.raises(ValueError, match="dynamic/bucket-unaware"):
        t.write(spark, o.limit(5))
