"""Probe: driver-side plan() cost at 10^6 manifest entries (VERDICT r10 #1).

A 100-TB table holds O(10^6) data files. The planner is a pure-Python pass
over manifest entries (read.py plan()); this probe fabricates a
metadata-only table with 1,000,000 DataFileMeta entries (no data files are
written) and measures cold / warm plan() with a partition + stats
predicate, plus the unpredicated full plan.

Run: python tools/probe_planner_scale.py [n_entries]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from incubator_paimon_spark import Catalog
from incubator_paimon_spark.metadata.commit import CommitMessage, FileStoreCommit
from incubator_paimon_spark.metadata.manifest import (
    DataFileMeta, ManifestEntry, ManifestStore)
from incubator_paimon_spark.predicate import P


def build_table(wh: str, n: int):
    cat = Catalog(wh)
    schema = T.StructType([
        T.StructField("dt", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    t = cat.create_table("probe.big", schema, partition_keys=["dt"])
    # 365 partitions x ~2740 files each; ids strictly increasing so the
    # stats predicate prunes to a narrow band within the partition
    n_parts = 365
    per_part = n // n_parts
    entries = []
    fid = 0
    for p in range(n_parts):
        dt = f"2025-{p // 31 + 1:02d}-{p % 31 + 1:02d}"
        for i in range(per_part):
            lo = fid * 1000
            entries.append(ManifestEntry(
                "ADD", {"dt": dt}, 0,
                DataFileMeta(
                    file_name=f"dt={dt}/bucket-0/f{fid}.parquet",
                    file_size=128 << 20, row_count=100_000,
                    schema_id=0, level=0,
                    stats={"id": {"min": lo, "max": lo + 999, "null_count": 0},
                           "v": {"min": 0.0, "max": 1.0, "null_count": 0}},
                )))
            fid += 1
    t0 = time.time()
    FileStoreCommit(t.path).commit(CommitMessage(add=entries), schema_id=0)
    print(f"committed {len(entries):,} entries in {time.time()-t0:.1f}s "
          f"({len(ManifestStore(t.path).read_manifest_list(t.snapshots.latest().delta_manifest_list))} manifests)")
    return t


def timed_plan(t, pred, label, planner="python"):
    t0 = time.time()
    plan = t.new_scan().plan(pred, planner=planner)
    dt = time.time() - t0
    print(f"{label:55s} {dt*1000:9.0f} ms  -> {len(plan.entries):,} files")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    wh = tempfile.mkdtemp(prefix="pmn_probe_planner_")
    try:
        t = build_table(wh, n)
        # partition 2025-06-15 is p=169: its files span ids ~[463.0M, 465.7M)
        pred = P.eq("dt", "2025-06-15") & P.between("id", 463_100_000, 463_600_000)
        ManifestStore._CACHE.clear()
        timed_plan(t, pred, "python cold plan (partition+stats predicate)")
        timed_plan(t, pred, "python warm plan (partition+stats predicate)")
        timed_plan(t, P.eq("dt", "2025-06-15"), "python warm plan (partition only)")
        timed_plan(t, None, "python warm plan (no predicate)")

        from incubator_paimon_spark import get_spark
        spark = get_spark("probe_planner", cpus=32)
        spark.sparkContext.setLogLevel("ERROR")
        ManifestStore._CACHE.clear()
        timed_plan(t, pred, "dataframe cold plan (partition+stats predicate)",
                   planner="dataframe")
        timed_plan(t, pred, "dataframe warm plan (partition+stats predicate)",
                   planner="dataframe")
        timed_plan(t, P.eq("dt", "2025-06-15"),
                   "dataframe warm plan (partition only)", planner="dataframe")
        # equality pin at probe scale
        a = t.new_scan().plan(pred, planner="python").entries
        b = t.new_scan().plan(pred, planner="dataframe").entries
        ia = sorted(e.identifier() for e in a)
        ib = sorted(e.identifier() for e in b)
        print(f"equality: python={len(ia)} dataframe={len(ib)} "
              f"match={ia == ib}")

        # steady-state commit cost on the 1M-entry table: a small append
        # reads only the manifest NAME list (not entries), so it must be
        # O(delta), not O(live files)
        small = [ManifestEntry(
            "ADD", {"dt": "2025-06-15"}, 0,
            DataFileMeta(file_name=f"dt=2025-06-15/bucket-0/x{i}.parquet",
                         file_size=1 << 20, row_count=1000))
            for i in range(100)]
        t0 = time.time()
        FileStoreCommit(t.path).commit(CommitMessage(add=small), schema_id=0)
        print(f"steady-state 100-file commit on 1M-entry table: "
              f"{(time.time()-t0)*1000:.0f} ms")

        # delete-bearing commit (compaction shape): conflict check +
        # next-commit manifest compaction must run on columnar identifier
        # triples, not a full entry parse
        from incubator_paimon_spark.types import ENTRY_DELETE
        victims = t.manifests.read_manifest(
            t.manifests.read_manifest_list(
                t.snapshots.latest().base_manifest_list)[0])[:2]
        for rep, v in enumerate(victims):
            msg = CommitMessage(
                add=[ManifestEntry("ADD", v.partition, 0, DataFileMeta(
                    file_name=f"{list(v.partition.values())[0]}/bucket-0/"
                              f"rw{rep}.parquet",
                    file_size=1, row_count=v.file.row_count, level=5))],
                delete=[ManifestEntry(ENTRY_DELETE, v.partition, v.bucket,
                                      v.file)])
            t0 = time.time()
            FileStoreCommit(t.path).commit(msg, schema_id=0, kind="COMPACT")
            print(f"delete-bearing commit rep{rep}: "
                  f"{(time.time()-t0)*1000:.0f} ms")
        try:  # conflict detection still fires on a dead file
            FileStoreCommit(t.path).commit(
                CommitMessage(delete=[victims[0]]), schema_id=0)
            print("ERROR: conflict not detected")
        except Exception as exc:  # noqa: BLE001
            print(f"conflict correctly raised: {type(exc).__name__}")

        # write-time hook inputs: touched-bucket filtered read + roll
        # totals (the per-commit costs of the post-commit picker)
        from incubator_paimon_spark.metadata.util import dumps
        snap2 = t.snapshots.latest()
        names = (t.manifests.read_manifest_list(snap2.base_manifest_list)
                 + t.manifests.read_manifest_list(snap2.delta_manifest_list))
        wanted = {(dumps({"dt": "2025-06-15"}), 0)}
        for rep in range(2):
            ManifestStore._CACHE.clear()
            t0 = time.time()
            es = t.manifests.read_entries_filtered(names, wanted)
            t1 = time.time()
            t.manifests.read_add_totals(names)
            t2 = time.time()
            print(f"hook rep{rep}: touched-bucket read {len(es)} files "
                  f"{(t1-t0)*1000:.0f} ms; roll totals "
                  f"{(t2-t1)*1000:.0f} ms")

        # $partitions / $buckets above the cache bound: one distributed
        # groupBy over the manifest parquet vs the driver entry parse
        import incubator_paimon_spark.plan_distributed as PD
        ManifestStore._CACHE.clear()
        t0 = time.time()
        parts = t.system(spark, "partitions").collect()
        t1 = time.time()
        bks = t.system(spark, "buckets").collect()
        t2 = time.time()
        print(f"$partitions distributed: {len(parts)} rows "
              f"{(t1-t0)*1000:.0f} ms; $buckets {len(bks)} rows "
              f"{(t2-t1)*1000:.0f} ms")
        old = PD.PLAN_DF_MIN_MANIFESTS
        try:
            PD.PLAN_DF_MIN_MANIFESTS = 10**9  # force the driver path
            t0 = time.time()
            parts_drv = t.system(spark, "partitions").collect()
            t1 = time.time()
            bks_drv = t.system(spark, "buckets").collect()
            t2 = time.time()
        finally:
            PD.PLAN_DF_MIN_MANIFESTS = old
        print(f"$partitions driver:      {len(parts_drv)} rows "
              f"{(t1-t0)*1000:.0f} ms; $buckets {len(bks_drv)} rows "
              f"{(t2-t1)*1000:.0f} ms")
        print(f"equality: partitions={sorted(map(tuple, parts)) == sorted(map(tuple, parts_drv))} "
              f"buckets={sorted(map(tuple, bks)) == sorted(map(tuple, bks_drv))}")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
