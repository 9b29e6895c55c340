"""Dynamic-bucket / cross-partition hash index storage.

Mirrors the reference's index-file layer (paimon-core/.../index/
HashIndexFile.java, IndexFileHandler; global index
crosspartition/GlobalIndexAssigner.java:76) re-expressed as parquet index
tables: each commit that assigns or moves keys writes one parquet directory
of (kh, partition..., bucket, ver) rows under <table>/index/, and an index
manifest (JSON list of live index dirs) referenced from the snapshot
(Snapshot.indexManifest).

kh is the 32-bit murmur3 hash of the trimmed primary key — the same
collision semantics as the reference's int-hash index: two keys that collide
share a bucket assignment, which only affects distribution, never
correctness (the merge is by full key).

`ver` orders entries for the same key: cross-partition upsert replaces a
key's (partition, bucket) by writing a newer entry; readers keep max-ver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import atomic_write_json, new_uuid, read_json


def index_schema(table_schema) -> T.StructType:
    fields = [T.StructField("kh", T.IntegerType(), False)]
    for c in table_schema.partition_keys:
        fields.append(T.StructField(c, table_schema.field_by_name(c).type, True))
    fields.append(T.StructField("bucket", T.IntegerType(), False))
    fields.append(T.StructField("ver", T.LongType(), False))
    return T.StructType(fields)


class IndexStore:
    def __init__(self, table_path: str):
        from ..fileio import for_path
        self.table_path = table_path
        self.dir = os.path.join(table_path, "index")
        self.io = for_path(table_path)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def read_files(self, snapshot) -> list[str]:
        if snapshot is None or snapshot.index_manifest is None:
            return []
        return read_json(self._manifest_path(snapshot.index_manifest))

    def read_df(self, spark: SparkSession, snapshot, table_schema,
                global_key: bool = False) -> DataFrame:
        """Live index as a DataFrame, latest entry per key.

        Key scope: (kh, partition...) for in-partition dynamic bucketing —
        the same trimmed-pk hash names distinct logical keys in distinct
        partitions; kh alone for cross-partition mode, so a moved key's
        newer entry (higher ver) shadows its old partition's entry.
        """
        return self.read_df_from_files(spark, self.read_files(snapshot),
                                       table_schema, global_key=global_key)

    def read_df_from_files(self, spark: SparkSession, files: list[str],
                           table_schema, global_key: bool = False) -> DataFrame:
        schema = index_schema(table_schema)
        if not files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.dir, f) for f in files]
        df = spark.read.schema(schema).parquet(*paths)
        from pyspark.sql import Window as W
        keys = ["kh"] if global_key else ["kh"] + list(table_schema.partition_keys)
        w = W.partitionBy(*keys).orderBy(F.col("ver").desc())
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter("__rn = 1").drop("__rn"))

    def write_index_dir(self, df: DataFrame) -> str:
        """Persist new index entries as one parquet dir; returns its name.

        Rows are clustered by (partition cols..., kh) within each task so
        the per-partition index prune (write.py assign_dynamic_buckets)
        gets selective row-group min/max stats — a one-partition write
        then skips most row groups of every index file it opens."""
        self.io.mkdirs(self.dir)
        name = f"index-{new_uuid()}"
        sort_cols = [c for c in df.columns if c not in ("kh", "bucket", "ver")]
        out = df.sortWithinPartitions(*sort_cols, "kh") if sort_cols else df
        out.write.mode("overwrite").parquet(os.path.join(self.dir, name))
        return name

    def write_manifest(self, files: list[str]) -> str:
        name = f"index-manifest-{new_uuid()}.json"
        atomic_write_json(self._manifest_path(name), files)
        return name
