"""Scale probe for streaming near-dup dedup-on-ingest (VERDICT r6 #8).

Builds an N× replica of the sf0.1 documents corpus where every original
document becomes an N-copy near-dup clique (copy k appends k distinct
filler words, so copies agree on most — not all — bands), streams it
through `streaming_neardup_claims` in micro-batches with the RocksDB
state store provider, and reports per-batch latency plus state size from
the query progress metrics.

Usage: python tools/probe_stream_neardup.py [replicas] [state_buckets]
Prints one JSON line:
  {"docs": ..., "batches": ..., "batch_sec": {min, median, max},
   "state_rows": ..., "state_bytes": ..., "kept": ..., "wall_sec": ...}
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from pyspark.sql import functions as F

    from incubator_paimon_spark import get_spark
    from incubator_paimon_spark.streaming.stateful import (
        neardup_keep, streaming_neardup_claims)

    spark = get_spark("probe_stream_neardup")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
                     .select("doc_id", "text")
    n_src = docs.count()

    src = tempfile.mkdtemp(prefix="pmn_ndp_src_")
    out = tempfile.mkdtemp(prefix="pmn_ndp_out_")
    ck = tempfile.mkdtemp(prefix="pmn_ndp_ck_")
    try:
        # one parquet file per replica wave = one micro-batch per wave
        # (maxFilesPerTrigger=1); copy k of a doc perturbs the tail so
        # cliques are NEAR-duplicates, not byte copies
        for k in range(replicas):
            (docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" "),
                         F.concat_ws(" ", *[F.lit(f"filler{k}w{j}")
                                            for j in range(k % 4)]))
                .alias("text"))
             .coalesce(1).write.mode("append").parquet(src))

        st = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
        claims = streaming_neardup_claims(st, "text", "doc_id",
                                          state_buckets=buckets)

        def sink(batch_df, _bid):
            neardup_keep(batch_df, "doc_id") \
                .write.mode("append").parquet(out)

        t0 = time.time()
        q = (claims.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        finished = q.awaitTermination(3600)
        wall = time.time() - t0
        if not finished:
            q.stop()
            raise TimeoutError("probe stream did not finish in 1h")

        batch_secs, state_rows, state_bytes = [], 0, 0
        for p in q.recentProgress:
            if p.get("numInputRows", 0) > 0:
                batch_secs.append(
                    p["durationMs"].get("triggerExecution", 0) / 1000.0)
            for op in p.get("stateOperators", []):
                state_rows = max(state_rows, op.get("numRowsTotal", 0))
                state_bytes = max(state_bytes,
                                  op.get("stateMemory",
                                         op.get("memoryUsedBytes", 0)))
        kept = spark.read.parquet(out).count()
        print(json.dumps({
            "docs": n_src * replicas,
            "cliques": n_src,
            "replicas": replicas,
            "state_buckets": buckets,
            "batches": len(batch_secs),
            "batch_sec": {
                "min": round(min(batch_secs), 2),
                "median": round(statistics.median(batch_secs), 2),
                "max": round(max(batch_secs), 2)},
            "state_rows": state_rows,
            "state_bytes": state_bytes,
            "kept": kept,
            "wall_sec": round(wall, 1)}))
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
