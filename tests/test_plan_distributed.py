"""Executor-side planner (plan_distributed.py) — output equality with the
driver-side Python planner, pinned across the stages that matter: ADD/DELETE
cancellation, partition pruning, fixed-bucket pruning, per-file key-stats +
bloom skipping with per-write-schema devolution, merge-safe whole-bucket
value pruning, and the rescaled mixed-layout case."""

import pytest

from incubator_paimon_spark import P


def _idents(plan):
    return sorted(e.identifier() for e in plan.entries)


def _compare(t, pred, **scan_kw):
    py = t.new_scan(**scan_kw).plan(pred, planner="python")
    df = t.new_scan(**scan_kw).plan(pred, planner="dataframe")
    assert _idents(py) == _idents(df)
    return py, df


def test_append_partition_and_stats(spark, catalog, orders):
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice",
                      "o_orderstatus")
    t = catalog.create_table("db.app", o.schema,
                             partition_keys=["o_orderstatus"])
    for s in ("F", "O", "P"):
        t.write(spark, o.filter(f"o_orderstatus = '{s}'"))

    py, df = _compare(t, P.eq("o_orderstatus", "F"))
    assert len(py.entries) > 0
    assert all(e.partition["o_orderstatus"] == "F" for e in df.entries)

    # stats predicate on a value column (per-file pruning on append tables)
    _compare(t, P.eq("o_orderstatus", "O") & P.lt("o_orderkey", 100))
    # no partition leaf at all: pure stats predicate, no native prefilter
    _compare(t, P.between("o_totalprice", 0.0, 1000.0))
    # int-literal prefilter shape + null-safe: o_custkey is int
    _compare(t, P.eq("o_custkey", 5))


def test_pk_delete_entries_and_value_pruning(spark, catalog, orders):
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice",
                      "o_orderstatus").limit(2000)
    t = catalog.create_table(
        "db.pk", o.schema, primary_keys=["o_orderkey", "o_orderstatus"],
        partition_keys=["o_orderstatus"], options={"bucket": "2"})
    t.write(spark, o)
    t.write(spark, o.limit(500))  # second LSM run
    # full compaction rewrites files -> DELETE entries in the delta
    t.compact(spark, full=True)
    t.write(spark, o.limit(100))  # post-compaction run

    snap = t.snapshots.latest()
    raw = (t.manifests.read_all_entries(snap.base_manifest_list)
           + t.manifests.read_all_entries(snap.delta_manifest_list))
    assert any(e.kind == "DELETE" for e in raw), "need cancellation coverage"

    _compare(t, P.eq("o_orderstatus", "F"))
    # key predicate -> per-file stats skip; bucket pinned by pk equality
    # needs every bucket key: (o_orderkey, o_orderstatus)
    _compare(t, P.eq("o_orderkey", 7) & P.eq("o_orderstatus", "O"))
    # value predicate on a deduplicate engine -> whole-bucket pruning
    py, df = _compare(t, P.lt("o_totalprice", -1.0))
    assert len(df.entries) == 0  # every bucket fails the impossible band


def test_schema_evolution_devolved_predicate(spark, catalog, orders):
    o = orders.select("o_orderkey", "o_totalprice")
    t = catalog.create_table("db.evo", o.schema, primary_keys=["o_orderkey"],
                             options={"bucket": "1"})
    t.write(spark, o.limit(300))
    catalog.sql(spark, "ALTER TABLE db.evo RENAME COLUMN o_orderkey TO okey")
    t = catalog.get_table("db.evo")
    t.write(spark, o.limit(50).withColumnRenamed("o_orderkey", "okey"))
    # files exist under both schema ids; predicate names the NEW column
    _compare(t, P.between("okey", 1, 40))


def test_rescaled_mixed_layout_bucket_pruning(spark, catalog, orders):
    o = orders.select("o_orderkey", "o_custkey", "o_orderstatus")
    t = catalog.create_table(
        "db.mix", o.schema, primary_keys=["o_orderkey", "o_orderstatus"],
        partition_keys=["o_orderstatus"], options={"bucket": "2"})
    t.write(spark, o)
    catalog.sql(spark,
                "ALTER TABLE db.mix SET TBLPROPERTIES ('bucket'='4')")
    t = catalog.get_table("db.mix")
    t.write(spark, o.filter("o_orderstatus = 'F'"),
            overwrite={"o_orderstatus": "F"})
    # layouts now differ per partition; bucket pruning must stay per-file
    _compare(t, P.eq("o_orderkey", 33) & P.eq("o_orderstatus", "F"))
    _compare(t, P.eq("o_orderkey", 33) & P.eq("o_orderstatus", "O"))


def test_auto_threshold_and_fallbacks(spark, catalog, orders):
    o = orders.select("o_orderkey", "o_totalprice")
    t = catalog.create_table("db.small", o.schema)
    t.write(spark, o.limit(100))
    # under the threshold auto takes the python path (observable: both give
    # the same plan; the point is it doesn't error without forcing)
    p1 = t.new_scan().plan(P.lt("o_orderkey", 50))
    p2 = t.new_scan().plan(P.lt("o_orderkey", 50), planner="dataframe")
    assert _idents(p1) == _idents(p2)

    # opaque predicate (not the Leaf/And/Or IR) -> dataframe path declines,
    # python path still answers
    class Opaque(P.eq("o_orderkey", 1).__class__.__mro__[1]):  # Predicate
        def test_value(self, row):
            return True

        def test_stats(self, stats):
            return True

        def fields(self):
            return set()

    from incubator_paimon_spark.plan_distributed import plan_entries_distributed
    snap = t.snapshots.latest()
    assert plan_entries_distributed(spark, t, snap, t.schema, Opaque(),
                                    False) is None


def test_read_optimized_level_filter(spark, catalog, orders):
    o = orders.select("o_orderkey", "o_totalprice")
    t = catalog.create_table("db.ro", o.schema, primary_keys=["o_orderkey"],
                             options={"bucket": "1"})
    t.write(spark, o.limit(400))
    t.compact(spark, full=True)
    t.write(spark, o.limit(80))  # level-0 run on top of the compacted max
    py = t.new_scan(read_optimized=True).plan(P.gt("o_orderkey", 0),
                                              planner="python")
    df = t.new_scan(read_optimized=True).plan(P.gt("o_orderkey", 0),
                                              planner="dataframe")
    assert _idents(py) == _idents(df)
    assert len(py.entries) > 0
    max_level = t.schema.core_options.num_levels - 1
    assert all(e.file.level == max_level for e in df.entries)


def test_files_df_distributed_matches_driver_path(spark, catalog, orders):
    """$files served from the manifests as a distributed frame equals the
    driver-materialized rows, including after compaction DELETEs."""
    from incubator_paimon_spark.plan_distributed import files_df_distributed
    o = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    t = catalog.create_table("db.fdf", o.schema,
                             primary_keys=["o_orderkey", "o_orderstatus"],
                             partition_keys=["o_orderstatus"],
                             options={"bucket": "2"})
    t.write(spark, o.limit(1000))
    t.write(spark, o.limit(300))
    t.compact(spark, full=True)     # DELETE entries enter the chain
    t.write(spark, o.limit(50))

    driver = t.system(spark, "files")
    dist = files_df_distributed(spark, t)
    assert dist is not None
    assert driver.columns == dist.columns
    key = ["file_path", "record_count", "file_size_in_bytes", "level",
           "bucket", "schema_id", "min_sequence_number",
           "max_sequence_number"]
    a = sorted(tuple(r) for r in driver.select(*key).collect())
    b = sorted(tuple(r) for r in dist.select(*key).collect())
    assert a == b and len(a) > 0
    # both paths serialize partition/stats with the SAME codec, so the
    # string columns are byte-identical too
    pa = sorted((r.file_path, r.partition, r.stats)
                for r in driver.collect())
    pb = sorted((r.file_path, r.partition, r.stats)
                for r in dist.collect())
    assert pa == pb


def test_numeric_partition_literal_not_misprefiltered(spark, catalog):
    """A numeric literal against a double-typed partition value must not
    be dropped by the JVM prefilter (5 vs JSON text '5.0'): the string
    prefilter is restricted to string literals, and plan equality holds
    for the numeric shapes."""
    df = spark.createDataFrame(
        [(float(p), i, i * 2.0) for p in range(3) for i in range(10)],
        "p double, id long, v double")
    t = catalog.create_table("db.nump", df.schema, partition_keys=["p"])
    for p in range(3):
        t.write(spark, df.filter(f"p = {p}.0"))
    py = t.new_scan().plan(P.eq("p", 1), planner="python")
    dd = t.new_scan().plan(P.eq("p", 1), planner="dataframe")
    assert _idents(py) == _idents(dd)
    assert len(py.entries) > 0  # int literal matches the double partition
    py2 = t.new_scan().plan(P.eq("p", 1.0), planner="python")
    dd2 = t.new_scan().plan(P.eq("p", 1.0), planner="dataframe")
    assert _idents(py2) == _idents(dd2) == _idents(py)


def test_partitions_buckets_distributed_match_driver(spark, catalog, orders,
                                                     monkeypatch):
    """$partitions/$buckets served by the distributed groupBy (above the
    manifest-cache bound) are row-identical to the driver entry parse,
    including the mark_partition_done `done` column (VERDICT r11 #3)."""
    import incubator_paimon_spark.plan_distributed as PD
    from incubator_paimon_spark.maintenance import mark_partition_done
    o = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    t = catalog.create_table("db.pbd", o.schema,
                             primary_keys=["o_orderkey", "o_orderstatus"],
                             partition_keys=["o_orderstatus"],
                             options={"bucket": "2"})
    t.write(spark, o.limit(1000))
    t.write(spark, o.limit(300))
    t.compact(spark, full=True)     # DELETE entries enter the chain
    t.write(spark, o.limit(50))
    mark_partition_done(t, {"o_orderstatus": "O"})

    drv_p = sorted(tuple(r) for r in t.system(spark, "partitions").collect())
    drv_b = sorted(tuple(r) for r in t.system(spark, "buckets").collect())
    assert len(drv_p) == 3 and len(drv_b) == 6

    calls = []
    orig = PD.files_df_distributed
    monkeypatch.setattr(PD, "PLAN_DF_MIN_MANIFESTS", 1)
    monkeypatch.setattr(PD, "files_df_distributed",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    dist_p = sorted(tuple(r) for r in t.system(spark, "partitions").collect())
    dist_b = sorted(tuple(r) for r in t.system(spark, "buckets").collect())
    assert calls, "distributed path did not engage"
    assert dist_p == drv_p
    assert dist_b == drv_b
    # done flag flows through the distributed path
    assert {r[0]: r[5] for r in dist_p}['{"o_orderstatus": "O"}'] is True
