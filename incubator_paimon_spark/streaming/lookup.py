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


class PartialLookup:
    """PrimaryKeyPartialLookupTable parity (paimon-flink/.../lookup/
    PrimaryKeyPartialLookupTable.java, backed by LocalTableQuery): enrich
    each micro-batch by looking up ONLY the batch's keys against the PK LSM
    instead of loading the whole dim table per batch.

    Right when the batch's key cardinality ≪ the table size (the classic
    lookup-join shape). The per-file hash indexes inside LocalTableQuery
    persist ACROSS batches (the reference's local RocksDB/hash-file cache),
    so steady-state cost per batch is O(new keys × hash probes) plus an
    O(manifest) refresh when the dim table committed since the last batch.

    `on` must cover the table's primary key (trimmed PK + partition keys) —
    the same restriction the reference places on partial lookup mode.

    Usage (inside foreachBatch)::

        pl = PartialLookup(dim_table, on=["k"])      # once, outside
        def enrich(batch_df, batch_id):
            out = pl.join(batch_df, spark)           # per batch
    """

    def __init__(self, table, on: list[str],
                 projection: list[str] | None = None,
                 max_keys: int = 100_000,
                 max_cached_rows: int = 2_000_000):
        schema = table.schema
        need = set(schema.trimmed_primary_keys()) | set(schema.partition_keys)
        if set(on) != need:
            raise ValueError(
                f"partial lookup joins on the full primary key {sorted(need)} "
                f"(got {sorted(on)}); use lookup_join() for non-PK joins "
                "(PrimaryKeyPartialLookupTable restriction)")
        if projection is not None:
            projection = list(dict.fromkeys(list(projection) + list(on)))
        self.table = table
        self.on = list(on)
        self.projection = projection
        self.max_keys = max_keys
        self.query = table.new_query(projection=projection,
                                     max_cached_rows=max_cached_rows)

    def join(self, df: DataFrame, spark: SparkSession,
             how: str = "left") -> DataFrame:
        # follow new dim-table commits between batches (the reference's
        # refreshFiles on the lookup file store)
        latest = self.table.snapshots.latest_id()
        pinned = self.query._snapshot.id if self.query._snapshot else None
        if latest != pinned:
            self.query.refresh()

        keys = [tuple(r) for r in
                df.select(*self.on).distinct().limit(self.max_keys + 1).collect()]
        if len(keys) > self.max_keys:
            raise ValueError(
                f"batch has more than {self.max_keys} distinct keys; "
                "partial lookup would collect them on the driver — use "
                "lookup_join() (full-cache mode) for high-cardinality batches")
        # lookup_many prefetches all candidate files with concurrent
        # columnar reads before probing — a cold batch touching many
        # buckets pays max(file reads), not a sequential sum (r8 #4)
        rows = [r for r in
                self.query.lookup_many([dict(zip(self.on, k))
                                        for k in keys])
                if r is not None]

        full = self.table.schema.spark_schema()
        if self.projection is None:
            dim_schema = full
        else:
            import pyspark.sql.types as T
            by_name = {f.name: f for f in full.fields}
            dim_schema = T.StructType([by_name[c] for c in self.projection])
        dim = spark.createDataFrame(rows, dim_schema)
        return df.join(F.broadcast(dim), self.on, how)
