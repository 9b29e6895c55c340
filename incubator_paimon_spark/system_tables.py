"""System tables: metadata exposed as DataFrames.

Reference: paimon-core/src/main/java/org/apache/paimon/table/system/
(SnapshotsTable.java:73, FilesTable.java:82, AuditLogTable.java:79-105,
ReadOptimizedTable.java:53, SystemTableLoader). Addressed as
``table.system(spark, "$snapshots")`` — same `$name` suffixes as the
reference's `t$snapshots` SQL surface.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .read import plan_to_df


def system_table(spark: SparkSession, table, name: str,
                 planner: str | None = None) -> DataFrame:
    """`planner` (tables with a dual serving path: $files/$partitions/
    $buckets): None = pick by the manifest-cache bound, "dataframe" =
    force the distributed manifest-parquet path, "driver" = force the
    driver parse. An explicit parameter instead of mutating the module
    threshold (VERDICT r12 #3)."""
    name = name.lstrip("$")
    fn = _TABLES.get(name)
    if fn is None:
        raise ValueError(f"unknown system table ${name}; have {sorted(_TABLES)}")
    if name in ("files", "partitions", "buckets"):
        return fn(spark, table, planner=planner)
    return fn(spark, table)


def _snapshots(spark, table):
    rows = [(s.id, s.schema_id, s.commit_user, s.commit_identifier, s.commit_kind,
             s.time_millis, s.base_manifest_list, s.delta_manifest_list,
             s.changelog_manifest_list, s.total_record_count, s.delta_record_count,
             s.changelog_record_count, s.watermark)
            for s in table.snapshots.list_all()]
    return spark.createDataFrame(rows, """snapshot_id long, schema_id long,
        commit_user string, commit_identifier long, commit_kind string,
        commit_time long, base_manifest_list string, delta_manifest_list string,
        changelog_manifest_list string, total_record_count long,
        delta_record_count long, changelog_record_count long, watermark long""")


def _schemas(spark, table):
    rows = []
    for s in table.schemas.list_all():
        rows.append((s.id,
                     json.dumps([f.to_json() for f in s.fields]),
                     json.dumps(s.partition_keys),
                     json.dumps(s.primary_keys),
                     json.dumps(s.options), s.comment or "", s.time_millis))
    return spark.createDataFrame(rows, """schema_id long, fields string,
        partition_keys string, primary_keys string, options string,
        comment string, update_time long""")


def _options(spark, table):
    rows = [(k, v) for k, v in sorted(table.schema.options.items())]
    return spark.createDataFrame(rows or [("", "")],
                                 "key string, value string").filter("key <> ''")


def _files(spark, table, planner: str | None = None):
    # large tables (manifest set past the cache bound): serve the rows
    # straight from the manifest parquet as a distributed DataFrame
    # instead of materializing 10^6 entries on the driver
    snap = table.snapshots.latest()
    if snap is not None and planner != "driver":
        from .plan_distributed import PLAN_DF_MIN_MANIFESTS, files_df_distributed
        names = (table.manifests.read_manifest_list(snap.base_manifest_list)
                 + table.manifests.read_manifest_list(snap.delta_manifest_list))
        if planner == "dataframe" or len(names) >= PLAN_DF_MIN_MANIFESTS:
            df = files_df_distributed(spark, table, manifests=names)
            if df is not None:
                return df
    # partition/stats serialize via the metadata codec (util.dumps) so the
    # driver path and the distributed path (raw manifest strings) emit the
    # SAME encoding — a table crossing the size threshold must not change
    # the column format (datetime/date values appear as {"__dt__"/"__d__"})
    from .metadata.util import dumps as _mdumps
    rows = []
    for e in table.entries_at():
        f = e.file
        # format from the extension (migrate commits .orc, avro tables
        # .avro) — MUST match files_df_distributed's derivation so the
        # two serving paths stay row-identical across the size threshold
        fmt = ("orc" if f.file_name.endswith(".orc")
               else "avro" if f.file_name.endswith(".avro") else "parquet")
        rows.append((_mdumps(e.partition), e.bucket, f.file_name,
                     fmt, f.schema_id, f.level, f.row_count, f.file_size,
                     f.min_seq, f.max_seq, f.creation_time_millis,
                     _mdumps(f.stats)))
    return spark.createDataFrame(rows, """partition string, bucket int,
        file_path string, file_format string, schema_id long, level int,
        record_count long, file_size_in_bytes long, min_sequence_number long,
        max_sequence_number long, creation_time long, stats string""")


def _manifests(spark, table):
    latest = table.snapshots.latest()
    rows = []
    if latest:
        # list-level counts (ManifestFileMeta parity) serve the row
        # without reading the manifest; only legacy count-less items
        # fall back to a parse
        for m in (table.manifests.read_manifest_list_meta(latest.base_manifest_list)
                  + table.manifests.read_manifest_list_meta(latest.delta_manifest_list)):
            adds, dels = m["numAdded"], m["numDeleted"]
            if adds is None or dels is None:
                entries = table.manifests.read_manifest(m["name"])
                adds = sum(1 for e in entries if e.kind == "ADD")
                dels = len(entries) - adds
            rows.append((m["name"], adds + dels, adds, dels,
                         latest.schema_id))
    return spark.createDataFrame(rows, """file_name string, num_entries long,
        num_added_files long, num_deleted_files long, schema_id long""")


def _grouped_file_stats(spark, table, with_bucket: bool,
                        planner: str | None = None):
    """(partition_dict, bucket|None) → [rows, bytes, files, max_ctime],
    keyed canonically (sorted partition items). Above the manifest-cache
    bound the sums run as ONE Spark job over the manifest parquet
    (files_df_distributed + groupBy — at 10^6 entries the driver parse
    this replaces is tens of seconds); the collected result is
    O(partitions|buckets), and canonicalization happens driver-side on
    that small set, so two raw partition serializations of the same
    value can never split a group. Falls back to the driver pass below
    the bound or when a distributed gate fails."""
    agg: dict = {}

    def _acc(part, bucket, rows, size, files, ctime):
        # repr keeps 5 / 5.0 / "5" distinct (both paths decode partition
        # values through the same metadata codec, so types agree)
        key = (tuple(sorted((k, repr(v)) for k, v in part.items())),
               bucket)
        a = agg.setdefault(key, [0, 0, 0, 0, part])
        a[0] += rows
        a[1] += size
        a[2] += files
        a[3] = max(a[3], ctime)

    snap = table.snapshots.latest()
    if snap is not None and planner != "driver":
        from .plan_distributed import (PLAN_DF_MIN_MANIFESTS,
                                       files_df_distributed)
        names = (table.manifests.read_manifest_list(snap.base_manifest_list)
                 + table.manifests.read_manifest_list(snap.delta_manifest_list))
        if planner == "dataframe" or len(names) >= PLAN_DF_MIN_MANIFESTS:
            df = files_df_distributed(spark, table, manifests=names)
            if df is not None:
                from pyspark.sql import functions as F

                from .metadata.util import loads as _mloads
                keys = ["partition"] + (["bucket"] if with_bucket else [])
                got = (df.groupBy(*keys)
                         .agg(F.sum("record_count"),
                              F.sum("file_size_in_bytes"), F.count("*"),
                              F.max("creation_time"))
                         .collect())
                for r in got:
                    _acc(_mloads(r[0]), r[1] if with_bucket else None,
                         *r[len(keys):])
                return agg

    for e in table.entries_at():
        _acc(e.partition, e.bucket if with_bucket else None,
             e.file.row_count, e.file.file_size, 1,
             e.file.creation_time_millis)
    return agg


def _partitions(spark, table, planner: str | None = None):
    from .maintenance import partition_done
    rows = []
    agg = _grouped_file_stats(spark, table, with_bucket=False,
                              planner=planner)
    for v in agg.values():
        try:  # `done` = success-file marker present (mark_partition_done)
            done = partition_done(table, v[4]) if v[4] else False
        except ValueError:
            done = False
        rows.append((json.dumps(v[4], sort_keys=True, default=str),
                     v[0], v[1], v[2], v[3], done))
    rows.sort()
    return spark.createDataFrame(rows, """partition string, record_count long,
        file_size_in_bytes long, file_count long, last_update_time long,
        done boolean""")


def _buckets(spark, table, planner: str | None = None):
    agg = _grouped_file_stats(spark, table, with_bucket=True,
                              planner=planner)
    rows = sorted(
        (json.dumps(v[4], sort_keys=True, default=str), b, v[0], v[1], v[2])
        for (_k, b), v in agg.items())
    return spark.createDataFrame(rows, """partition string, bucket int,
        record_count long, file_size_in_bytes long, file_count long""")


def _tags(spark, table):
    rows = []
    for name in table.list_tags():
        s = table.tag_snapshot(name)
        rows.append((name, s.id, s.schema_id, s.time_millis, s.total_record_count))
    return spark.createDataFrame(rows, """tag_name string, snapshot_id long,
        schema_id long, commit_time long, record_count long""")


def _branches(spark, table):
    rows = [(b,) for b in table.list_branches()]
    return spark.createDataFrame(rows, "branch_name string") if rows else \
        spark.createDataFrame([], "branch_name string")


def _consumers(spark, table):
    rows = [(cid, nxt) for cid, nxt in table.list_consumers().items()]
    return spark.createDataFrame(rows, "consumer_id string, next_snapshot_id long") \
        if rows else spark.createDataFrame([], "consumer_id string, next_snapshot_id long")


def _aggregation_fields(spark, table):
    """Per-field aggregate configuration ($aggregation_fields)."""
    schema = table.schema
    opts = schema.core_options
    default_fn = opts.raw.get("fields.default-aggregate-function", "last_non_null_value")
    rows = []
    for f in schema.fields:
        fn = opts.field_aggregate_function(f.name)
        if f.name in schema.primary_keys:
            fn = "primary-key"
        elif fn is None and opts.merge_engine == "aggregation":
            fn = default_fn
        rows.append((f.name, f.type.simpleString(), fn,
                     opts.field_ignore_retract(f.name)))
    return spark.createDataFrame(rows, """field_name string, field_type string,
        function string, ignore_retract boolean""")


def _statistics(spark, table):
    """One row per analyzed column ($statistics / Statistics.java)."""
    from .analyze import read_statistics
    st = read_statistics(table)
    rows = []
    if st:
        for c, cs in st["colStats"].items():
            rows.append((st["snapshotId"], st["schemaId"],
                         st["mergedRecordCount"], c,
                         cs.get("distinctCount"), cs.get("nullCount"),
                         str(cs.get("min")) if cs.get("min") is not None else None,
                         str(cs.get("max")) if cs.get("max") is not None else None,
                         float(cs["avgLen"]) if cs.get("avgLen") is not None else None,
                         cs.get("maxLen")))
    return spark.createDataFrame(rows, """snapshot_id long, schema_id long,
        merged_record_count long, column string, distinct_count long,
        null_count long, min string, max string, avg_len double,
        max_len long""")


def _audit_log(spark, table):
    """Raw rows with rowkind, no merge (AuditLogTable.java:79-105)."""
    plan = table.new_scan().plan()
    return plan_to_df(spark, table, plan, audit_log=True)


def _read_optimized(spark, table):
    """Only max-level files — no merge cost (ReadOptimizedTable.java:53)."""
    plan = table.new_scan(read_optimized=True).plan()
    return plan_to_df(spark, table, plan)


def _metrics(spark, table):
    """Operation metrics recorded by THIS process for the table
    ($metrics; MetricRegistry.java's commit/scan/compaction groups via
    metrics.py — last/total convention per counter)."""
    from .metrics import rows
    return spark.createDataFrame(
        [(grp, metric, value) for _p, grp, metric, value
         in rows(table.path)] or [],
        "metric_group string, metric_name string, value double")


_TABLES = {
    "snapshots": _snapshots,
    "schemas": _schemas,
    "options": _options,
    "files": _files,
    "manifests": _manifests,
    "partitions": _partitions,
    "buckets": _buckets,
    "tags": _tags,
    "branches": _branches,
    "consumers": _consumers,
    "audit_log": _audit_log,
    "statistics": _statistics,
    "aggregation_fields": _aggregation_fields,
    "read_optimized": _read_optimized,
    "metrics": _metrics,
}


# ----------------------------------------------------------------------
# catalog-scope (global) system tables, addressed as ``sys.<name>``
# (SystemTableLoader.loadGlobal; AllTableOptionsTable.java:55-88 —
# database_name/table_name/key/value rows for every table's options;
# CatalogOptionsTable.java:51-76 — the catalog's own configuration)
GLOBAL_SYSTEM_TABLES = frozenset({"all_table_options", "catalog_options",
                                  "materialized_views", "metrics",
                                  "table_lineage", "data_lineage"})


def catalog_system_table(spark: SparkSession, catalog, name: str) -> DataFrame:
    n = name.lstrip("$").lower()
    if n == "all_table_options":
        rows = []
        for db in catalog.list_databases():
            for tn in catalog.list_tables(db):
                t = catalog.get_table(f"{db}.{tn}")
                for k, v in sorted(t.schema.options.items()):
                    rows.append((db, tn, k, str(v)))
        return spark.createDataFrame(
            rows, "database_name string, table_name string, "
                  "`key` string, value string")
    if n == "catalog_options":
        opts = {"warehouse": catalog.warehouse,
                **{k: str(v) for k, v in
                   getattr(catalog, "options", {}).items()}}
        return spark.createDataFrame(sorted(opts.items()),
                                     "`key` string, value string")
    if n == "materialized_views":
        # one row per MV (tables created by operators/matview.py):
        # definition + how many source snapshots it lags (0 = current —
        # the freshness signal the staleness guard and REFRESH act on)
        from .operators.sync import index_staleness
        rows = []
        for db in catalog.list_databases():
            for tn in catalog.list_tables(db):
                t = catalog.get_table(f"{db}.{tn}")
                opts = t.schema.options or {}
                src_ident = opts.get("mv.source")
                if not src_ident:
                    continue
                try:
                    lag = index_staleness(catalog.get_table(src_ident),
                                          f"index:{t.name}")
                except Exception:  # noqa: BLE001 — dropped source
                    lag = None
                rows.append((db, tn, src_ident, opts.get("mv.group-by"),
                             opts.get("mv.aggs"), opts.get("mv.where"),
                             lag))
        return spark.createDataFrame(
            rows, "database_name string, view_name string, "
                  "source_table string, group_by string, aggregates "
                  "string, where_clause string, staleness_snapshots long")
    if n == "metrics":
        # every operation THIS process recorded, across all tables —
        # the catalog-wide view of the per-table $metrics
        from .metrics import rows
        return spark.createDataFrame(
            rows() or [],
            "table_path string, metric_group string, metric_name string, "
            "value double")
    if n == "table_lineage":
        # which jobs read/wrote which tables (Source/SinkTableLineageTable
        # with a direction column); persisted per-warehouse, so events from
        # any process writing through this warehouse appear. Served as a
        # Spark scan over the parquet lineage segments + the bounded loose
        # tail — flat driver cost at any history size
        from .lineage import lineage_df
        return lineage_df(spark, catalog.warehouse).select(
            "direction", "database_name", "table_name", "job_name",
            "create_time_ms")
    if n == "data_lineage":
        # snapshot-level lineage (DataLineageTable's barrier→snapshot
        # relation): which source snapshot fed which sink snapshot
        from .lineage import lineage_df
        return (lineage_df(spark, catalog.warehouse)
                .where("snapshot_id IS NOT NULL")
                .select("direction", "database_name", "table_name",
                        "snapshot_id", "job_name", "create_time_ms"))
    raise ValueError(f"unknown global system table sys.{n}; "
                     f"have {sorted(GLOBAL_SYSTEM_TABLES)}")
