"""r8 probe: does the maintained MinHash signature index make nightly
cross-corpus dedup cost O(|new crawl|) instead of O(|standing corpus|)?

Reconstructs the r7 between-corpus probe corpus (sf0.1 documents
replicated into 100-copy cliques = 500 K standing docs; the 5 K
originals play "tonight's crawl") and measures:

  A. from-scratch `minhash_lsh_pairs_between(new, base)`  (r7: 386 s)
  B. one-time `build_minhash_index(base)`                 (amortized)
  C. index-backed query `(new, base_index=...)`           (the nightly cost)
  D. incremental `sync_minhash_index` after a small delta commit

Expected: C ≈ O(new) seconds regardless of base size; A ≈ B (both pay
the one O(base) signature pass, but B pays it ONCE per corpus, not per
crawl). Run: PYTHONPATH=/root/repo python tools/probe_minhash_index.py
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main():
    from incubator_paimon_spark import Catalog, get_spark
    from incubator_paimon_spark.operators import dedup as D
    from incubator_paimon_spark.operators import dedup_index as DI

    spark = get_spark("probe_mh_index", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
                     .select("doc_id", "text")
    n_orig = docs.count()
    # 100-copy cliques: same construction as the r7 probe
    base = (docs.crossJoin(spark.range(100).select(F.col("id").alias("rep")))
                .select((F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
                        "text"))
    new = docs  # the originals replay as tonight's crawl
    print(f"standing corpus = {n_orig * 100:,} docs, crawl = {n_orig:,}")

    t0 = time.time()
    scratch = D.minhash_lsh_pairs_between(new, base, "text", "doc_id",
                                          num_hashes=16, bands=4,
                                          min_est_jaccard=0.5)
    n_scratch = scratch.count()
    t_scratch = time.time() - t0
    print(f"A from-scratch: {n_scratch:,} pairs in {t_scratch:.1f} s")

    wh = tempfile.mkdtemp(prefix="probe_mh_idx_")
    try:
        cat = Catalog(wh)
        t0 = time.time()
        idx = DI.build_minhash_index(spark, cat, "db.idx", base,
                                     "text", "doc_id",
                                     options={"bucket": "32"})
        t_build = time.time() - t0
        print(f"B index build (one-time): {t_build:.1f} s")

        t0 = time.time()
        bi = DI.read_minhash_index(spark, idx, 16, 4, 3)
        indexed = D.minhash_lsh_pairs_between(new, None, "text", "doc_id",
                                              num_hashes=16, bands=4,
                                              min_est_jaccard=0.5,
                                              base_index=bi)
        n_indexed = indexed.count()
        t_indexed = time.time() - t0
        print(f"C index-backed: {n_indexed:,} pairs in {t_indexed:.1f} s "
              f"({t_scratch / max(t_indexed, 1e-9):.1f}x faster; "
              f"match={n_indexed == n_scratch})")

        # D: a delta commit of 1% new docs synced into the index
        src = cat.create_table("db.src", base.schema,
                               primary_keys=["doc_id"],
                               options={"bucket": "32"})
        src.write(spark, base)
        src.write_consumer("index:idx", src.snapshots.latest().id)
        delta = (docs.limit(max(n_orig // 100, 1))
                     .select((F.col("doc_id") + 100_000_000).alias("doc_id"),
                             "text"))
        src.write(spark, delta)
        t0 = time.time()
        applied = DI.sync_minhash_index(spark, src, idx,
                                        consumer_id="index:idx")
        t_sync = time.time() - t0
        print(f"D delta sync ({delta.count():,} docs, {applied} snapshot): "
              f"{t_sync:.1f} s")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
