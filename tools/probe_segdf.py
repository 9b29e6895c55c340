"""r8 probe: does the maintained segment doc-frequency table make
nightly boilerplate removal cost O(|new crawl|) instead of
O(|standing corpus|)?

Corpus = sf0.1 documents replicated 100× (≈475 K docs — replication
makes every segment corpus-frequent, the boilerplate-heavy worst
case); "tonight's crawl" = the 5 % of originals held out of the
replication. Measures:

  A. from-scratch `remove_frequent_segments(standing ∪ crawl)`
     (the recount every nightly run would pay without the table)
  B. one-time `update_segment_df_counts(standing)` (amortized build)
  C. `remove_frequent_segments_from_table(crawl)` (the nightly cost)

Expected: C ≈ O(crawl) seconds regardless of standing size; A scales
with the standing corpus. Run:
PYTHONPATH=/root/repo python tools/probe_segdf.py
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

    spark = get_spark("probe_segdf", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
                     .select("doc_id", "text")
    crawl = docs.filter(F.col("doc_id") % 20 == 0)
    standing_src = docs.filter(F.col("doc_id") % 20 != 0)
    standing = (standing_src
                .crossJoin(spark.range(100).select(F.col("id").alias("rep")))
                .select((F.col("doc_id") * 100 + F.col("rep"))
                        .alias("doc_id"), "text"))
    n_standing, n_crawl = standing.count(), crawl.count()
    print(f"standing corpus = {n_standing:,} docs, crawl = {n_crawl:,}")

    t0 = time.time()
    n_a = (D.remove_frequent_segments(standing.unionByName(crawl),
                                      "text", "doc_id",
                                      segment_words=10, max_doc_freq=2)
           .filter("removed_segments > 0").count())
    t_a = time.time() - t0
    print(f"A from-scratch recount over standing+crawl: {t_a:.1f}s "
          f"({n_a:,} docs touched)")

    wh = tempfile.mkdtemp(prefix="pmn_segdf_probe_")
    cat = Catalog(wh)
    t = D.create_segment_df_table(cat, "db.segdf", segment_words=10,
                                  num_buckets=8)
    t0 = time.time()
    D.update_segment_df_counts(spark, t, standing, "text", "doc_id")
    t_b = time.time() - t0
    print(f"B one-time counts build over standing: {t_b:.1f}s")

    t0 = time.time()
    n_c = (D.remove_frequent_segments_from_table(spark, crawl, t,
                                                 "text", "doc_id",
                                                 max_doc_freq=2)
           .filter("removed_segments > 0").count())
    t_c = time.time() - t0
    print(f"C table-backed crawl clean: {t_c:.1f}s ({n_c:,} docs touched)"
          f" -> {t_a / max(t_c, 1e-9):.0f}x vs nightly recount")

    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
