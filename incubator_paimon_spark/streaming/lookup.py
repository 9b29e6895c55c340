"""Lookup join: enrich a stream (or batch) against a Paimon table.

Parity with paimon-flink/.../lookup/FileStoreLookupFunction.java:78 and
PrimaryKeyPartialLookupTable — Spark-first: instead of a per-key RocksDB
cache on each task, the table's current snapshot becomes the build side of
a broadcast (or AQE-chosen) join, refreshed per micro-batch. Spark's
stream-static join semantics match Flink's processing-time lookup: each
batch sees the table state at its own planning time.

`max_pt=True` mirrors the Flink connector's `scan.partitions = max_pt()`
dim-table idiom: only the latest partition is loaded.

Usage (streaming):
    def enrich(batch_df, batch_id):
        out = lookup_join(batch_df, dim_table, spark, on=["k"])
        ...
    stream.writeStream.foreachBatch(enrich).start()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lookup_join(df: DataFrame, table, spark: SparkSession,
                on: list[str], how: str = "left",
                projection: list[str] | None = None,
                max_pt: bool = False,
                broadcast: bool = True) -> DataFrame:
    """Join `df` against the CURRENT state of `table` (re-resolved at every
    call — call inside foreachBatch for per-batch refresh).

    broadcast=True hints the dim side (the common lookup shape); pass False
    for huge build sides and let AQE pick the strategy."""
    predicate = None
    if max_pt:
        pts = sorted({tuple(sorted(e.partition.items()))
                      for e in table.entries_at()})
        if pts:
            from ..predicate import P
            latest = dict(pts[-1])
            pred = None
            for k, v in latest.items():
                leaf = P.eq(k, v)
                pred = leaf if pred is None else (pred & leaf)
            predicate = pred
    dim = table.read(spark, predicate=predicate, projection=projection)
    if projection:
        missing = [k for k in on if k not in projection]
        if missing:
            dim = table.read(spark, predicate=predicate,
                             projection=projection + missing)
    if broadcast:
        dim = F.broadcast(dim)
    return df.join(dim, on, how)
