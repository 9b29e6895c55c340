"""ANALYZE TABLE: table/column statistics for CBO.

Parity with paimon-spark/.../commands/PaimonAnalyzeTableColumnCommand.scala
and paimon-core/.../stats/Statistics.java: one distributed aggregation job
computes per-column distinctCount (approx, HLL++ like the reference's
sketch), nullCount, min/max, avgLen/maxLen; the result is a JSON stats file
under <table>/statistics referenced by an ANALYZE-kind snapshot.

Consumption: `$statistics` system table, and `register_cbo_stats` pushes the
row count into the Spark session so joins planned over our views can use
CBO cardinalities (the reference feeds PaimonStatistics through DSv2
estimateStatistics — SURVEY §4)."""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .metadata.commit import CommitMessage
from .metadata.util import atomic_write_json, new_uuid, read_json

COMMIT_ANALYZE = "ANALYZE"

_NUMERIC = {"byte", "short", "integer", "long", "float", "double", "decimal"}


def analyze_table(spark: SparkSession, table, cols: list[str] | None = None):
    """Compute + persist statistics; returns the ANALYZE snapshot."""
    schema = table.schema
    names = cols or [f.name for f in schema.fields]
    fields = {f.name: f for f in schema.fields}
    df = table.read(spark)

    aggs = [F.count(F.lit(1)).alias("__cnt")]
    for c in names:
        t = fields[c].type.typeName()
        aggs.append(F.approx_count_distinct(c).alias(f"ndv__{c}"))
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"nulls__{c}"))
        if t in _NUMERIC or t in ("date", "timestamp", "timestamp_ntz"):
            aggs.append(F.min(c).alias(f"min__{c}"))
            aggs.append(F.max(c).alias(f"max__{c}"))
        if t in ("string", "binary"):
            aggs.append(F.avg(F.length(c)).alias(f"avglen__{c}"))
            aggs.append(F.max(F.length(c)).alias(f"maxlen__{c}"))
    row = df.agg(*aggs).collect()[0]

    col_stats = {}
    for c in names:
        st = {"distinctCount": row[f"ndv__{c}"], "nullCount": row[f"nulls__{c}"]}
        for k, key in (("min", f"min__{c}"), ("max", f"max__{c}"),
                       ("avgLen", f"avglen__{c}"), ("maxLen", f"maxlen__{c}")):
            if key in row.asDict():
                v = row[key]
                st[k] = v if not hasattr(v, "isoformat") else v.isoformat()
        col_stats[c] = st

    snapshot = table.snapshots.latest()
    stats = {
        "snapshotId": snapshot.id if snapshot else 0,
        "schemaId": schema.id,
        "mergedRecordCount": row["__cnt"],
        "colStats": col_stats,
        "timeMillis": int(time.time() * 1000),
    }
    sdir = os.path.join(table.path, "statistics")
    name = f"stats-{new_uuid()}.json"
    atomic_write_json(os.path.join(sdir, name), stats)
    return table.commit.commit(CommitMessage(), schema_id=schema.id,
                               kind=COMMIT_ANALYZE, statistics=name)


def read_statistics(table, snapshot=None) -> dict | None:
    s = snapshot or table.snapshots.latest()
    if s is None or s.statistics is None:
        return None
    return read_json(os.path.join(table.path, "statistics", s.statistics))
