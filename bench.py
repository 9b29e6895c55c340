"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric", "value", "unit", "queries", "sf", ...}.
Mapping to BASELINE.md anchors:
- pk_write_upsert  ↔ write Parquet 64.8 K rows/s (LSM PK write incl. commit)
- pk_read_full     ↔ read Parquet full row 975 K rows/s (merge-on-read scan)
- pk_read_projected↔ read ORC projected (column pruning path)
- compact_full     ↔ write ORC 94.3 K rows/s (compaction rewrite)
Plus engine analytics (q1/q5 equivalents) and LLM operators at scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from incubator_paimon_spark import Catalog, get_spark
    from incubator_paimon_spark.operators import dedup as D
    from incubator_paimon_spark.operators import similarity as S
    import __spark_entry__ as E

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    wh = tempfile.mkdtemp(prefix="pmn_bench_")
    cat = Catalog(wh)
    times: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn, reps=1):
        """reps>1 (read-only paths): best-of-N, matching the reference
        micro-benchmarks' best/avg convention (TableReadBenchmark JMH)."""
        best, out = None, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        times[name] = round(best, 3)
        return out

    lineitem = E._t(spark, sf_dir, "lineitem")
    n_lineitem = lineitem.count()

    # --- PK write (upsert path: repartition by bucket, sort, stats, commit)
    t = cat.create_table("bench.li_pk", lineitem.schema,
                         primary_keys=["l_orderkey", "l_linenumber"],
                         options={"bucket": "16"})
    timed("pk_write_upsert", lambda: t.write(spark, lineitem))
    extra["pk_write_rows_per_sec"] = round(n_lineitem / times["pk_write_upsert"])

    # second commit (overlapping keys) so reads exercise a real merge
    upd = lineitem.filter(F.col("l_orderkey") % 7 == 0) \
                  .withColumn("l_quantity", F.col("l_quantity") + 1)
    n_upd = upd.count()
    timed("pk_write_second_commit", lambda: t.write(spark, upd))

    # --- PK merge-on-read full scan
    cnt = timed("pk_read_full", lambda: t.read(spark).count(), reps=3)
    extra["pk_read_rows_per_sec"] = round(cnt / times["pk_read_full"])

    # --- projected scan (2 cols through the merge)
    timed("pk_read_projected",
          lambda: t.read(spark, projection=["l_orderkey", "l_quantity"])
                   .agg(F.sum("l_quantity")).collect(), reps=3)

    # --- compaction rewrite
    timed("compact_full", lambda: t.compact(spark, full=True))
    extra["compact_rows_per_sec"] = round((n_lineitem + n_upd) / times["compact_full"])

    # --- read-optimized scan after compaction (raw path, no merge)
    timed("read_optimized", lambda: t.read(spark).count(), reps=3)

    # --- analytics on raw parquet (host-engine surface)
    timed("q1_pricing_summary",
          lambda: E.q_pricing_summary(spark, sf_dir).collect(), reps=3)
    timed("q5_local_supplier",
          lambda: E.q_local_supplier_volume(spark, sf_dir).collect(), reps=3)
    timed("events_sessions",
          lambda: E.q_events_sessions(spark, sf_dir).collect(), reps=3)

    # --- LLM operators at scale
    docs = E._t(spark, sf_dir, "documents")
    timed("minhash_lsh_pairs",
          lambda: D.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16,
                                      bands=4, min_est_jaccard=0.7).count(), reps=3)
    timed("dedup_clusters",
          lambda: D.dedup_clusters(docs, "text", "doc_id").count())
    emb = E._t(spark, sf_dir, "embeddings")
    timed("cosine_topk",
          lambda: S.cosine_topk(emb, "embedding", E.QUERY_VEC, 10).collect(), reps=3)
    timed("exact_dedup", lambda: D.exact_duplicates(docs, "text", "doc_id").count(), reps=3)

    # --- row-level ops + new write modes
    from incubator_paimon_spark import P
    orders = E._t(spark, sf_dir, "orders")
    n_orders = orders.count()
    tdv = cat.create_table("bench.dv", orders.schema,
                           options={"deletion-vectors.enabled": "true"})
    tdv.write(spark, orders)
    timed("dv_delete", lambda: tdv.delete_where(spark, P.lt("o_orderkey", 1000)))
    timed("dv_read", lambda: tdv.read(spark).count(), reps=3)

    tdyn = cat.create_table("bench.dyn", orders.schema,
                            primary_keys=["o_orderkey"],
                            options={"bucket": "-1",
                                     "dynamic-bucket.target-row-num":
                                         str(max(n_orders // 16, 1)),
                                     "dynamic-bucket.assigner-parallelism":
                                         "16"})
    timed("dynamic_bucket_write", lambda: tdyn.write(spark, orders))
    extra["dyn_write_rows_per_sec"] = round(
        n_orders / times["dynamic_bucket_write"])

    torc = cat.create_table("bench.orc", lineitem.schema,
                            primary_keys=["l_orderkey", "l_linenumber"],
                            options={"bucket": "16", "file.format": "orc"})
    timed("orc_write", lambda: torc.write(spark, lineitem))
    extra["orc_write_rows_per_sec"] = round(n_lineitem / times["orc_write"])
    timed("orc_read", lambda: torc.read(spark).count(), reps=3)

    tz = cat.create_table("bench.zo", lineitem.schema)
    tz.write(spark, lineitem)
    timed("zorder_compact",
          lambda: tz.compact(spark, order_by=["l_orderkey", "l_partkey"],
                             strategy="zorder"))
    timed("incremental_read",
          lambda: __import__(
              "incubator_paimon_spark.streaming.source",
              fromlist=["incremental_between"])
          .incremental_between(spark, t, 1, 2).count(), reps=3)

    shutil.rmtree(wh, ignore_errors=True)

    total = round(sum(times.values()), 3)
    result = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "rows": {"lineitem": n_lineitem},
        "derived": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
