"""Fresh-session executor-storage release check (VERDICT r7 #3 / r8 #2).

Asserts, in a JVM nothing else has touched:
- dsir_logweights's in-call caches (count tables + the r15 feature-array
  persist) are explicitly unpersisted before it returns, and its
  checkpointed result is GC-reclaimable once dropped (r15: the result
  is localCheckpoint'd so the feature arrays can be released
  immediately — the semdedup lifecycle, not a pinned persist);
- semdedup's per-call localCheckpoint is GC-reclaimable once the result
  is dropped — the old persist() leak pinned one n×vector projection
  PER CALL forever, so the leak signature is call 1's entry surviving
  the whole loop.

Run by tests/test_operators.py::test_dsir_and_semdedup_release_executor_storage
as a subprocess: the property is about the operators' own lifecycle, and
asserting GC behavior inside the shared full-suite JVM is
order-sensitive no matter how the baseline is scoped (r8 and r9 both
flaked there); a fresh session makes the measurement deterministic.
Prints STORAGE_RELEASE_OK and exits 0 on success.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from incubator_paimon_spark import get_spark
    from incubator_paimon_spark.operators import sampling as SA
    from incubator_paimon_spark.operators import similarity as S

    spark = get_spark("storage-release-check", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    jmap = spark.sparkContext._jsc.getPersistentRDDs

    def persisted_ids() -> set:
        return {int(k) for k in jmap().keySet().toArray()}

    def settle(pred, tries=120) -> bool:
        # generous ceiling (60 s): the ContextCleaner's weak-ref queue
        # starves under host load and the suite may run concurrently
        # with other Spark work; a quiet host exits in 1-3 iterations
        for _ in range(tries):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            if pred():
                return True
            time.sleep(0.5)
        return False

    SA.dsir_logweights(d, d.limit(10), "text", "doc_id", buckets=256).count()
    # the result checkpoint (dropped above) must be GC-reclaimable; the
    # in-call caches must already be gone — a pinned persist would
    # survive the settle loop
    assert settle(lambda: not persisted_ids()), \
        "dsir left persisted RDDs behind"

    seen: set = set()
    first_call_ids: set = set()
    for i in range(3):
        S.semdedup(e, "embedding", "vec_id", num_centroids=4,
                   threshold=0.99, dim=64).count()
        if i == 0:
            first_call_ids = persisted_ids() - seen
            assert first_call_ids, "expected call 1 to checkpoint"
        seen |= persisted_ids()
    assert settle(lambda: not (first_call_ids & persisted_ids())), \
        "call-1 checkpoint never reclaimed (per-call persist leak)"

    print("STORAGE_RELEASE_OK")


if __name__ == "__main__":
    main()
