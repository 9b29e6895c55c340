"""Deletion vectors: per-file sets of deleted row positions.

Mirrors paimon-core/.../deletionvectors/BitmapDeletionVector.java:33 and
ApplyDeletionVectorReader — re-expressed Spark-first: a deletion vector is a
parquet table of (file_name, pos) rows under <table>/dv/, the snapshot
references a JSON manifest listing live DV dirs plus the set of covered data
files (so the *driver* can split a plan into DV-affected and clean files
without a Spark job), and application is an anti-join on
(_metadata.file_path, _metadata.row_index) — Spark's native parquet row
index, the same row-position contract the reference's reader applies.

Scale: the anti-join touches only DV-covered files; clean files (the vast
majority after compaction, which physically drops deleted rows and retires
the file's DV) take the ordinary vectorized path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import atomic_write_json, new_uuid, read_json

DV_SCHEMA = T.StructType([
    T.StructField("file_name", T.StringType(), False),   # table-relative
    T.StructField("pos", T.LongType(), False),           # row index in file
])


class DvStore:
    def __init__(self, table_path: str):
        from ..fileio import for_path
        self.table_path = table_path
        self.dir = os.path.join(table_path, "dv")
        self.io = for_path(table_path)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def read_manifest(self, snapshot) -> dict:
        if snapshot is None or getattr(snapshot, "dv_manifest", None) is None:
            return {"dirs": [], "files": []}
        return read_json(self._manifest_path(snapshot.dv_manifest))

    def covered_files(self, snapshot) -> set[str]:
        return set(self.read_manifest(snapshot)["files"])

    def read_df(self, spark: SparkSession, snapshot) -> DataFrame:
        dirs = self.read_manifest(snapshot)["dirs"]
        if not dirs:
            return spark.createDataFrame([], DV_SCHEMA)
        paths = [os.path.join(self.dir, d) for d in dirs]
        return spark.read.schema(DV_SCHEMA).parquet(*paths).distinct()

    def write_dv_dir(self, df: DataFrame) -> str:
        self.io.mkdirs(self.dir)
        name = f"dv-{new_uuid()}"
        df.write.mode("overwrite").parquet(os.path.join(self.dir, name))
        return name

    def write_manifest(self, dirs: list[str], files: list[str]) -> str:
        name = f"dv-manifest-{new_uuid()}.json"
        atomic_write_json(self._manifest_path(name),
                          {"dirs": dirs, "files": sorted(set(files))})
        return name

    def append_dir(self, spark: SparkSession, snapshot, hits: DataFrame,
                   hit_files: list[str], threshold: int = 8) -> str:
        """Persist `hits` as a new DV dir and write the successor manifest.
        Every row-level delete adds one dir; past `threshold` the live
        bitmap set is rewritten (distinct union) into ONE dir so read-side
        anti-join input stays flat over table lifetime — superseded dirs
        become orphans once their snapshots expire."""
        m = self.read_manifest(snapshot)
        dirs = m["dirs"] + [self.write_dv_dir(hits)]
        if len(dirs) > threshold:
            paths = [os.path.join(self.dir, d) for d in dirs]
            live = spark.read.schema(DV_SCHEMA).parquet(*paths).distinct()
            dirs = [self.write_dv_dir(live)]
        return self.write_manifest(dirs, m["files"] + hit_files)


def apply_dv_filter(spark: SparkSession, table, df: DataFrame,
                    snapshot) -> DataFrame:
    """Anti-join `df` — read with (__meta_file, __meta_pos) columns — against
    the live deletion vectors. Caller guarantees df only spans DV-covered
    files (clean files should bypass this)."""
    dv = table.dv.read_df(spark, snapshot)
    dv_keys = dv.select(F.col("file_name").alias("__meta_file"),
                        F.col("pos").alias("__meta_pos"))
    # no forced broadcast: AQE broadcasts small DV sets; a billion-row DV
    # set shuffles on (file, pos) like any other join
    return df.join(dv_keys, ["__meta_file", "__meta_pos"], "left_anti")
