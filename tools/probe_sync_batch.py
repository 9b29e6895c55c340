"""Probe: batched vs per-snapshot changelog replay (VERDICT r8 #3).

A streaming sink committing every 30 s gives a nightly index sync
~2,880 source snapshots; the pre-r9 `replay_changelog` ran one Spark
job + one derived-table commit PER snapshot. This probe builds a source
with N micro-commits and times syncing a DSIR counts table (a) batched
(one netted incremental read + one commit per 64-snapshot chunk — the
r9 default) vs (b) per-snapshot (`max_batch_snapshots=1`), checking
both produce byte-identical counts.

Usage: python tools/probe_sync_batch.py [n_commits] [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from incubator_paimon_spark import Catalog, get_spark
    from incubator_paimon_spark.operators import sampling as SA

    spark = get_spark("probe-sync-batch", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    rows = docs.orderBy("doc_id").limit(2 * n_commits).collect()
    wh = tempfile.mkdtemp(prefix="probe_sync_")
    cat = Catalog(wh)

    def build_source(name):
        src = cat.create_table(name, docs.schema, primary_keys=["doc_id"],
                               options={"bucket": "2",
                                        "changelog-producer": "lookup",
                                        "write-only": "true"})
        for i in range(n_commits):
            batch = rows[2 * i:2 * i + 2]
            src.write(spark, spark.createDataFrame(batch, docs.schema))
        return src

    # ONE source, two consumers: the sync modes replay the identical
    # changelog, so the build cost (N micro-commits) is paid once
    t0 = time.time()
    src = build_source("db.src")
    print(f"built {n_commits}-commit source in {time.time()-t0:.1f}s")
    results = {}
    for label, kw in (("batched", {}),
                      ("per_snapshot", {"max_batch_snapshots": 1})):
        qt = SA.create_dsir_counts_table(cat, f"db.q_{label}", buckets=512)
        cid = f"index:{label}"
        src.write_consumer(cid, 0)
        t0 = time.time()
        covered = SA.sync_dsir_counts(spark, src, qt, "text", "doc_id",
                                      consumer_id=cid, **kw)
        dt = time.time() - t0
        commits = len(qt.snapshots.list_all())
        counts = frozenset((r["bucket"], r["n"])
                           for r in qt.read(spark).collect() if r["n"] != 0)
        results[label] = (dt, covered, commits, counts)
        print(f"{label:13s} sync={dt:7.2f}s covered={covered} "
              f"derived_commits={commits}", flush=True)

    assert results["batched"][3] == results["per_snapshot"][3], \
        "batched and per-snapshot syncs disagree"
    speedup = results["per_snapshot"][0] / results["batched"][0]
    print(f"speedup {speedup:.1f}x; counts identical "
          f"({len(results['batched'][3])} non-zero buckets)")


if __name__ == "__main__":
    main()
