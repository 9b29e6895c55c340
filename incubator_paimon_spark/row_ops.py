"""Row-level mutations: DELETE / UPDATE / MERGE INTO / TRUNCATE.

Reference commands:
- DeleteFromPaimonTableCommand.scala:45-151 — PK path appends -D rows;
  non-PK path rewrites only the touched files (copy-on-write)
- UpdatePaimonTableCommand.scala:38-77
- MergeIntoPaimonTable.scala:41-257
- PaimonTruncateTableCommand.scala

Spark-first: the PK paths are plain changelog writes (no file surgery); the
non-PK paths plan the touched files with the same stats pruning the scan
uses, so a predicate DELETE on a 100 TB table rewrites only the files whose
min/max overlap the predicate — everything else is untouched metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .metadata.manifest import ManifestEntry, live_entries
from .predicate import Predicate, split_by_fields
from .read import (METADATA_FILE, METADATA_POS, read_files_df,
                   _stats_keep)
from .types import (COMMIT_APPEND, COMMIT_OVERWRITE, DELETE, ENTRY_DELETE,
                    ROW_KIND, SEQUENCE_NUMBER, UPDATE_AFTER, VALUE_KIND)


def _touched_entries(table, predicate: Predicate | None):
    entries = table.entries_at()
    if predicate is None:
        return entries
    schema = table.schema
    part_pred, _ = split_by_fields(predicate, set(schema.partition_keys))
    if part_pred is not None:
        entries = [e for e in entries if part_pred.test_value(e.partition)]
    from .read import per_schema_predicate
    pp = per_schema_predicate(table, schema, predicate)
    return [e for e in entries
            if (q := pp(e)) is None or _stats_keep(e, q)]


def delete_where(spark: SparkSession, table, predicate: Predicate,
                 commit_identifier: int = -1):
    cond = predicate.to_column()
    if table.is_primary_key_table():
        # PK path: write -D rows for matching keys (merge-on-read cancels them)
        # scan_mode pins latest explicitly: a table-level scan.snapshot-id
        # option time-travels READS, but a mutation must never rewrite
        # from a stale state
        victims = table.read(spark, predicate=predicate,
                             scan_mode="latest-full")
        victims = victims.withColumn(ROW_KIND, F.lit(DELETE))
        return table.new_write().write(spark, victims,
                                       commit_identifier=commit_identifier)
    schema = table.schema
    touched = _touched_entries(table, predicate)
    if not touched:
        return None
    if schema.core_options.deletion_vectors_enabled:
        # DV path (MVW: merge-on-write deletes without rewriting data files,
        # BitmapDeletionVector + ApplyDeletionVectorReader): record the
        # matching (file, pos) pairs; files stay untouched
        return _dv_delete(spark, table, touched, cond, commit_identifier)
    # non-PK: copy-on-write rewrite of touched files only
    df = read_files_df(spark, table, touched, schema)
    kept = df.filter(~F.coalesce(cond, F.lit(False)))
    deletes = [ManifestEntry(ENTRY_DELETE, e.partition, e.bucket, e.file)
               for e in touched]
    return table.new_write().write(
        spark, kept, extra_delete_entries=deletes,
        commit_identifier=commit_identifier, preserve_system_cols=False)


def _dv_positions(spark, table, touched, cond):
    """(file_name, pos) pairs matching cond among live (non-DV-deleted)
    rows of the touched files."""
    from .read import read_append_entries
    schema = table.schema
    snapshot = table.snapshots.latest()
    covered = table.dv.covered_files(snapshot)
    from .metadata.deletion import apply_dv_filter
    df = read_files_df(spark, table, touched, schema, with_metadata=True)
    if covered & {e.file.file_name for e in touched}:
        df = apply_dv_filter(spark, table, df, snapshot)
    return df.filter(F.coalesce(cond, F.lit(False))).select(
        F.col(METADATA_FILE).alias("file_name"),
        F.col(METADATA_POS).alias("pos"))


def _dv_delete(spark, table, touched, cond, commit_identifier):
    from .metadata.commit import CommitMessage
    snapshot = table.snapshots.latest()
    hits = _dv_positions(spark, table, touched, cond).cache()
    hit_files = [r[0] for r in hits.select("file_name").distinct().collect()]
    if not hit_files:
        return None
    name = table.dv.append_dir(spark, snapshot, hits, hit_files)
    return table.commit.commit(
        CommitMessage(), schema_id=table.schema.id, kind=COMMIT_APPEND,
        commit_identifier=commit_identifier, dv_manifest=name)


def update_where(spark: SparkSession, table, predicate: Predicate | None,
                 assignments: dict[str, Column | object],
                 commit_identifier: int = -1):
    """assignments: {col: Column-or-literal} applied where predicate holds."""
    set_exprs = {k: (v if isinstance(v, Column) else F.lit(v))
                 for k, v in assignments.items()}
    cond = predicate.to_column() if predicate is not None else F.lit(True)
    if table.is_primary_key_table():
        for pk in table.schema.primary_keys:
            if pk in set_exprs:
                raise ValueError(f"cannot update primary key column {pk!r}")
        rows = table.read(spark, predicate=predicate,
                          scan_mode="latest-full")  # never time-travel a mutation
        for k, v in set_exprs.items():
            rows = rows.withColumn(k, v.cast(table.schema.field_by_name(k).type))
        rows = rows.withColumn(ROW_KIND, F.lit(UPDATE_AFTER))
        return table.new_write().write(spark, rows,
                                       commit_identifier=commit_identifier)
    schema = table.schema
    touched = _touched_entries(table, predicate)
    if not touched:
        return None
    if schema.core_options.deletion_vectors_enabled:
        # DV update: mark old positions deleted + append updated copies of
        # ONLY the matching rows, atomically in one commit
        snapshot = table.snapshots.latest()
        hits = _dv_positions(spark, table, touched, cond).cache()
        hit_files = [r[0] for r in hits.select("file_name").distinct().collect()]
        if not hit_files:
            return None
        from .read import read_append_entries
        rows = read_append_entries(spark, table, touched, schema, snapshot)             .filter(F.coalesce(cond, F.lit(False)))
        for k, v in set_exprs.items():
            rows = rows.withColumn(k, v.cast(schema.field_by_name(k).type))
        name = table.dv.append_dir(spark, snapshot, hits, hit_files)
        return table.new_write().write(
            spark, rows, commit_identifier=commit_identifier, dv_manifest=name)
    df = read_files_df(spark, table, touched, schema)
    out = df
    for k, v in set_exprs.items():
        out = out.withColumn(
            k, F.when(F.coalesce(cond, F.lit(False)),
                      v.cast(schema.field_by_name(k).type)).otherwise(F.col(k)))
    deletes = [ManifestEntry(ENTRY_DELETE, e.partition, e.bucket, e.file)
               for e in touched]
    return table.new_write().write(
        spark, out, extra_delete_entries=deletes,
        commit_identifier=commit_identifier)


def merge_into(
    spark: SparkSession,
    table,
    source: DataFrame,
    on: list[str] | Column,
    matched_update: dict[str, Column] | str | None = None,   # "*" = update all
    matched_update_condition: Column | None = None,
    matched_delete: bool = False,
    matched_delete_condition: Column | None = None,
    not_matched_insert: dict[str, Column] | str | None = "*",
    not_matched_insert_condition: Column | None = None,
    not_matched_by_source_delete: bool = False,
    commit_identifier: int = -1,
    *,
    matched: list[tuple] | None = None,
    not_matched: list[tuple] | None = None,
    not_matched_by_source: list[tuple] | None = None,
    lineage_source=None,  # Table the USING clause named, when known
):
    """MERGE INTO for PK tables (MergeIntoPaimonTable.scala:41-257).

    Joins source↔target once and emits a changelog (+I/+U/-D) that the normal
    PK write path applies — the reference's row-level-op design re-expressed
    as a DataFrame program. `on` is the PK join (list of key columns, or an
    arbitrary equi-join Column whose keys cover the PK).

    Two surfaces:
    - clause lists `matched` / `not_matched` / `not_matched_by_source`:
      ordered ("action", spec, condition) tuples evaluated FIRST-MATCH-WINS
      per row, the reference's multi-WHEN semantics
      (MergeIntoTableTestBase.scala:265 "multiple clauses"). Actions:
      matched → "update"|"delete"; not_matched → "insert";
      by_source → "update"|"delete". spec is "*" or {col: Column}.
    - the flat keyword args (one clause per kind), kept for API
      compatibility — they desugar onto the clause lists with the old
      precedence (update before delete).

    Scale shape: ONE join; per-category first-match clause index computed
    as a single when-chain column, then one narrow filter+project per
    clause — no per-clause re-join, no window.
    """
    if not table.is_primary_key_table():
        raise ValueError("MERGE INTO requires a primary-key table")
    if matched is None and not_matched is None and not_matched_by_source is None:
        matched = []
        if matched_update is not None:
            matched.append(("update", matched_update, matched_update_condition))
        if matched_delete:
            matched.append(("delete", None, matched_delete_condition))
        not_matched = ([("insert", not_matched_insert,
                         not_matched_insert_condition)]
                       if not_matched_insert is not None else [])
        not_matched_by_source = ([("delete", None, None)]
                                 if not_matched_by_source_delete else [])
    matched = matched or []
    not_matched = not_matched or []
    not_matched_by_source = not_matched_by_source or []
    if not (matched or not_matched or not_matched_by_source):
        raise ValueError("MERGE INTO needs at least one WHEN clause")
    for action, _spec, _c in matched:
        if action not in ("update", "delete"):
            raise ValueError(f"WHEN MATCHED supports update/delete, not {action!r}")
    for action, _spec, _c in not_matched:
        if action != "insert":
            raise ValueError("WHEN NOT MATCHED supports insert only")
    for action, _spec, _c in not_matched_by_source:
        if action not in ("update", "delete"):
            raise ValueError(
                f"WHEN NOT MATCHED BY SOURCE supports update/delete, not {action!r}")

    schema = table.schema
    target = table.read(spark, scan_mode="latest-full")  # never time-travel a mutation

    t = target.withColumn("__t_exists", F.lit(True)).alias("t")
    s = source.withColumn("__s_exists", F.lit(True)).alias("s")
    if isinstance(on, Column):
        join_cond = on
    else:
        join_cond = None
        for k in on:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            join_cond = c if join_cond is None else (join_cond & c)

    how = ("full_outer" if not_matched_by_source
           else "right_outer" if not_matched else "inner")
    joined = t.join(s, join_cond, how)

    t_key = F.col("t.__t_exists")
    s_key = F.col("s.__s_exists")
    category = {
        "matched": t_key.isNotNull() & s_key.isNotNull(),
        "not_matched": t_key.isNull() & s_key.isNotNull(),
        "by_source": t_key.isNotNull() & s_key.isNull(),
    }

    def _proj(action, spec):
        """Output row for one clause, in table-schema order + ROW_KIND."""
        cols = []
        for f in schema.fields:
            if action == "insert":
                if spec == "*":
                    c = F.col(f"s.{f.name}")
                elif f.name in spec:
                    c = spec[f.name]
                else:
                    c = F.lit(None)
            elif action == "update" and spec == "*":
                c = F.col(f"s.{f.name}")
            elif action == "update" and f.name in spec:
                c = spec[f.name]
            else:  # delete, or update column not assigned: keep target
                c = F.col(f"t.{f.name}")
            cols.append(c.cast(f.type).alias(f.name))
        kind = "+I" if action == "insert" else \
            DELETE if action == "delete" else UPDATE_AFTER
        return cols + [F.lit(kind).alias(ROW_KIND)]

    out_parts = []
    for cat, clauses in (("matched", matched), ("not_matched", not_matched),
                         ("by_source", not_matched_by_source)):
        if not clauses:
            continue
        # first-match-wins: one when-chain tags each row with the index of
        # the first clause whose condition holds (null = no clause fires)
        chain = None
        for i, (_a, _s, cond) in enumerate(clauses):
            c = cond if cond is not None else F.lit(True)
            chain = F.when(c, F.lit(i)) if chain is None else chain.when(c, F.lit(i))
        tagged = joined.filter(category[cat]).withColumn("__clause", chain)
        for i, (action, spec, _cond) in enumerate(clauses):
            out_parts.append(tagged.filter(F.col("__clause") == i)
                                   .select(*_proj(action, spec)))

    changelog = out_parts[0]
    for p in out_parts[1:]:
        changelog = changelog.unionByName(p)
    snap = table.new_write().write(spark, changelog,
                                   commit_identifier=commit_identifier)
    import contextlib

    from . import lineage
    with contextlib.suppress(Exception):  # lineage is advisory
        srcs = []
        if lineage_source is not None:
            s_latest = lineage_source.snapshots.latest()
            srcs = [(lineage_source, s_latest.id if s_latest else None)]
        lineage.record("merge_into", sources=srcs,
                       sinks=[(table, snap.id if snap else None)])
    return snap


def truncate(table):
    """TRUNCATE TABLE: one OVERWRITE commit deleting every live file."""
    from .metadata.commit import CommitMessage
    entries = table.entries_at()
    msg = CommitMessage(delete=[ManifestEntry(ENTRY_DELETE, e.partition,
                                              e.bucket, e.file)
                                for e in entries])
    return table.commit.commit(msg, schema_id=table.schema.id,
                               kind=COMMIT_OVERWRITE)
