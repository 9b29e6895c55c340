"""LSM compaction: universal picker arithmetic + rewrite jobs.

Picker mirrors paimon-core/src/main/java/org/apache/paimon/mergetree/compact/
UniversalCompaction.java:70-160 exactly (size-amplification, size-ratio,
run-count triggers, output-level choice of createUnit :179-205). Runs are
ordered NEWEST first: each level-0 file is its own sorted run (newest = max
sequence), then one run per level 1..maxLevel — matching Levels.java:38.

Execution is Spark-first: the chosen runs of each (partition, bucket) are read
as one DataFrame, pushed through the merge engine (hash aggregation), and
rewritten at the output level via the normal write path — the rewrite
parallelism is per-bucket Spark tasks, so compacting 10k buckets of a 100 TB
table is one job, not 10k driver loops. Sort compaction (z-order / order)
follows CompactProcedure.java:99-218 + TableSorter.java:86-90.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge_engines import apply_merge
from .metadata.manifest import ManifestEntry
from .read import read_append_entries, read_files_df
from .types import COMMIT_COMPACT, ENTRY_DELETE
from .predicate import Predicate


@dataclass
class SortedRun:
    level: int
    files: list  # ManifestEntry
    @property
    def total_size(self) -> int:
        return sum(e.file.file_size for e in self.files)


def bucket_sorted_runs(entries: list[ManifestEntry]) -> list[SortedRun]:
    """Runs for one bucket, newest first (level-0 file = one run each,
    ordered by max_seq desc; then levels ascending)."""
    level0 = sorted((e for e in entries if e.file.level == 0),
                    key=lambda e: e.file.max_seq, reverse=True)
    runs = [SortedRun(0, [e]) for e in level0]
    by_level: dict[int, list[ManifestEntry]] = {}
    for e in entries:
        if e.file.level > 0:
            by_level.setdefault(e.file.level, []).append(e)
    for lvl in sorted(by_level):
        runs.append(SortedRun(lvl, by_level[lvl]))
    return runs


def pick_compaction(runs: list[SortedRun], max_level: int,
                    max_size_amp: int, size_ratio: int,
                    num_run_trigger: int) -> tuple[int, list[SortedRun]] | None:
    """UniversalCompaction.pick — returns (output_level, runs_to_merge)."""
    if not runs:
        return None
    # 1. size amplification (pickForSizeAmp)
    if len(runs) >= num_run_trigger:
        candidate_size = sum(r.total_size for r in runs[:-1])
        earliest = runs[-1].total_size
        if candidate_size * 100 > max_size_amp * earliest:
            return max_level, list(runs)
    # 2. size ratio (pickForSizeRatio)
    if len(runs) >= num_run_trigger:
        unit = _pick_for_size_ratio(runs, max_level, size_ratio, 1)
        if unit is not None:
            return unit
    # 3. run count
    if len(runs) > num_run_trigger:
        candidate_count = len(runs) - num_run_trigger + 1
        return _pick_for_size_ratio(runs, max_level, size_ratio, candidate_count,
                                    force=True)
    return None


def _pick_for_size_ratio(runs, max_level, size_ratio, candidate_count, force=False):
    candidate_size = sum(r.total_size for r in runs[:candidate_count])
    for i in range(candidate_count, len(runs)):
        nxt = runs[i]
        if candidate_size * (100.0 + size_ratio) / 100.0 < nxt.total_size:
            break
        candidate_size += nxt.total_size
        candidate_count += 1
    if force or candidate_count > 1:
        return _create_unit(runs, max_level, candidate_count)
    return None


def _create_unit(runs, max_level, run_count):
    """createUnit: output level = next run's level - 1 (never 0); merging
    everything outputs at max level."""
    if run_count == len(runs):
        output_level = max_level
    else:
        output_level = max(0, runs[run_count].level - 1)
    if output_level == 0:
        for i in range(run_count, len(runs)):
            nxt = runs[i]
            run_count += 1
            if nxt.level != 0:
                output_level = nxt.level
                break
    if run_count == len(runs):
        output_level = max_level
    return output_level, runs[:run_count]


# ----------------------------------------------------------------------
def compact_table(spark: SparkSession, table, full: bool = False,
                  predicate: Predicate | None = None,
                  order_by: list[str] | None = None,
                  strategy: str | None = None,
                  buckets: set | None = None,
                  entries: list | None = None):
    """CALL sys.compact parity (CompactProcedure.java:99-218).

    - PK tables: universal (or full) merge per bucket.
    - Append tables: small-file rewrite per partition; with order_by +
      strategy in {order, zorder} a sort compaction rewrites the selected
      partitions clustered by the given columns.
    `buckets` (a set of `(sorted partition items, bucket)` keys) scopes
    the pick to specific buckets, and `entries` reuses an already-read
    manifest — the write-time compaction hook passes both so a commit's
    post-hook compacts ONLY its touched buckets without re-reading the
    live manifest (MergeTreeWriter owns a per-bucket CompactManager).
    Returns the COMPACT snapshot (or None when nothing to do)."""
    import time as _time

    from .metrics import record
    _t0 = _time.time()
    if order_by or strategy:
        snap = _sort_compact(spark, table, order_by or [],
                             strategy or "order", predicate)
    elif table.is_primary_key_table():
        snap = _compact_pk(spark, table, full, predicate, buckets, entries)
    else:
        snap = _compact_append(spark, table, predicate, buckets, entries)
    # CompactionMetrics parity: duration + whether the picker found
    # work; rewritten file counts live in the commit group's
    # files_added/files_deleted for the COMPACT snapshot
    record(table.path, "compaction",
           duration_ms=(_time.time() - _t0) * 1000,
           performed=1 if snap is not None else 0)
    return snap


def _group_by_bucket(entries):
    by_bucket: dict = {}
    for e in entries:
        key = (tuple(sorted(e.partition.items())), e.bucket)
        by_bucket.setdefault(key, []).append(e)
    return by_bucket


def _compact_pk(spark, table, full, predicate, buckets=None, entries=None):
    schema = table.schema
    opts = schema.core_options
    max_level = opts.num_levels - 1
    if entries is None:
        entries = table.entries_at()
    if predicate is not None:
        from .predicate import split_by_fields
        part_pred, _ = split_by_fields(predicate, set(schema.partition_keys))
        if part_pred is not None:
            entries = [e for e in entries if part_pred.test_value(e.partition)]

    to_rewrite: list[tuple[int, list[ManifestEntry]]] = []
    for _key, bucket_entries in _group_by_bucket(entries).items():
        if buckets is not None and _key not in buckets:
            continue
        runs = bucket_sorted_runs(bucket_entries)
        if full:
            if len(runs) == 1 and runs[0].level == max_level:
                continue  # already fully compacted
            unit = (max_level, runs)
        else:
            unit = pick_compaction(runs, max_level,
                                   opts.compaction_max_size_amplification_percent,
                                   opts.compaction_size_ratio,
                                   opts.num_sorted_run_compaction_trigger)
            if unit is None and len(runs) >= opts.num_sorted_run_stop_trigger:
                # past the write-stall bar: merge everything (the
                # reference would have stalled the writer here)
                unit = (max_level, runs)
        if unit is None:
            continue
        out_level, chosen = unit
        files = [e for r in chosen for e in r.files]
        if len(files) == 0:
            continue
        to_rewrite.append((out_level, files))

    if not to_rewrite:
        return None

    # full-compaction changelog producer: materialize the state diff since
    # the last changelog-bearing snapshot INTO the compact commit
    # (FullChangelogMergeTreeCompactRewriter parity) — compaction itself
    # never changes the merged state, so computing it up front is exact
    extra_cl = None
    if full and opts.changelog_producer == "full-compaction":
        extra_cl = _full_compaction_changelog(spark, table, schema)

    # group rewrites by output level so each level is one Spark job; after
    # a bucket rescale (rescale-bucket.md) partitions may carry different
    # layouts, and the rewrite must rehash with the layout its input files
    # used — so the recorded totalBuckets joins the grouping key and is
    # pinned through bucket_num_override (None = pre-rescale legacy files,
    # hashed with the then-immutable current option)
    from .read import file_layout_buckets
    _memo: dict = {}
    by_level: dict[tuple, list[ManifestEntry]] = {}
    for lvl, files in to_rewrite:
        # resolved per group: recorded totalBuckets, else the write-time
        # schema's bucket option (legacy files) — never the current option;
        # <= 0 resolves to the dynamic path in write() (layout preserved)
        layout = file_layout_buckets(table, files[0], _memo)
        by_level.setdefault((lvl, layout), []).extend(files)

    snap = None
    for (out_level, layout), files in sorted(by_level.items(),
                                             key=lambda kv: kv[0]):
        df = read_files_df(spark, table, files, schema, with_level=True)
        merged = apply_merge(df, schema, drop_deletes=(out_level == max_level))
        merged = _record_level_expire(merged, opts)
        deletes = [ManifestEntry(ENTRY_DELETE, e.partition, e.bucket, e.file)
                   for e in files]
        snap = table.new_write().write(
            spark, merged, level=out_level, extra_delete_entries=deletes,
            extra_changelog_entries=extra_cl,
            commit_kind=COMMIT_COMPACT, preserve_system_cols=True,
            bucket_num_override=layout)
        extra_cl = None  # only the first compact commit carries it
    return snap


def _full_compaction_changelog(spark, table, schema):
    """Diff the current merged state against the state at the last
    changelog-bearing snapshot (or empty) and persist it as changelog
    files for the upcoming compact commit."""
    from .write import state_diff_kinds, write_changelog_files

    snaps = table.snapshots.list_all()
    if not snaps:
        return None
    base = 0
    for s in reversed(snaps):
        if s.changelog_manifest_list:
            base = s.id
            break
    if snaps[-1].id == base:
        return None  # nothing committed since the last changelog
    from .read import plan_to_df
    if base > 0:
        old = plan_to_df(spark, table,
                         table.new_scan(snapshot_id=base).plan())
    else:
        old = spark.createDataFrame([], schema.spark_schema())
    # pinned latest: a table-level scan.snapshot-id option must not
    # time-travel the state the changelog diffs against
    new = table.read(spark, scan_mode="latest-full")
    kinds = state_diff_kinds(old, new, schema)
    entries = write_changelog_files(spark, table, schema, kinds)
    return entries or None


def _record_level_expire(df: DataFrame, opts) -> DataFrame:
    """record-level.expire-time: rows expire during compaction
    (io/RecordLevelExpire.java:35)."""
    ttl = opts.record_level_expire_time_ms
    field = opts.record_level_time_field
    if ttl and field:
        cutoff = F.lit(int((time.time() * 1000 - ttl) / 1000)).cast("timestamp")
        df = df.filter(F.col(field).cast("timestamp") >= cutoff)
    return df


def _compact_append(spark, table, predicate, buckets=None, entries=None):
    """Append-table compaction: rewrite partitions whose file count exceeds
    the trigger into target-size files (AppendOnlyCompactManager)."""
    schema = table.schema
    opts = schema.core_options
    if entries is None:
        entries = table.entries_at()
    if predicate is not None:
        from .predicate import split_by_fields
        part_pred, _ = split_by_fields(predicate, set(schema.partition_keys))
        if part_pred is not None:
            entries = [e for e in entries if part_pred.test_value(e.partition)]
    trigger = opts.num_sorted_run_compaction_trigger
    victims = []
    for _key, es in _group_by_bucket(entries).items():
        if buckets is not None and _key not in buckets:
            continue
        small = [e for e in es if e.file.file_size < opts.target_file_size]
        if len(small) > trigger:
            victims.extend(small)
    if not victims:
        return None
    # apply deletion vectors while rewriting: deleted rows are physically
    # dropped and the replacement files are DV-free (stale DV rows are inert
    # because data file names are never reused)
    # bucketed-append rewrites must rehash with the layout the victims
    # were written under (rescale-bucket.md, same rule as the PK path);
    # post-rescale a sweep can straddle layouts → one write per layout
    from .read import file_layout_buckets
    by_layout: dict = {None: victims}
    if opts.bucket > 0 and schema.bucket_keys():
        memo: dict = {}
        by_layout = {}
        for e in victims:
            by_layout.setdefault(
                file_layout_buckets(table, e, memo),
                []).append(e)
    snap = None
    for layout, vs in sorted(by_layout.items(),
                             key=lambda kv: kv[0] or 0):
        df = read_append_entries(spark, table, vs, schema,
                                 table.snapshots.latest())
        # Consolidate toward target-file-size (r15): write tasks mirror
        # read units, and the python-codec formats plan one unit per
        # small file — so a small-file sweep used to emit as many small
        # files as it read (measured: 60 x 5.8 MB in -> 50 x 3.5 MB
        # "compacted" out), defeating the compaction's purpose. Coalesce
        # (narrow, no shuffle) to ceil(bytes / target-file-size); JVM
        # formats already arrive packed so this is usually a no-op.
        n_out = max(1, -(-sum(e.file.file_size for e in vs)
                         // opts.target_file_size))
        try:
            if df.rdd.getNumPartitions() > n_out:
                df = df.coalesce(n_out)
        except Exception:  # noqa: BLE001 — sizing is advisory
            pass
        deletes = [ManifestEntry(ENTRY_DELETE, e.partition, e.bucket, e.file)
                   for e in vs]
        snap = table.new_write().write(
            spark, df, extra_delete_entries=deletes,
            commit_kind=COMMIT_COMPACT, preserve_system_cols=True,
            bucket_num_override=layout)
    return snap


# ----------------------------------------------------------------------
def zorder_value(cols: list[str], bits: int = 16):
    """Z-value as a Column: interleave the top `bits` bits of each column's
    rank-normalized value. Pure Spark expressions (no Python UDF): each
    column is min-max scaled to [0, 2^bits) using window-free aggregates
    computed by the caller; here we interleave via bit arithmetic.

    Matches the intent of SparkZOrderUDF.java / ZIndexer.java:63 — cluster
    correlated columns for data skipping — not its byte layout.
    """
    z = F.lit(0).cast("long")
    n = len(cols)
    for bit in range(bits - 1, -1, -1):
        for ci, c in enumerate(cols):
            src_bit = F.shiftright(F.col(c).cast("long"), bit).bitwiseAND(F.lit(1).cast("long"))
            pos = bit * n + (n - 1 - ci)
            z = z.bitwiseOR(F.shiftleft(src_bit, pos))
    return z


def _hilbert_transpose(X, bits: int):
    """Vectorized Skilling transform: (N, n) uint64 coords in [0, 2^bits) →
    Hilbert index per row (int64). Public-domain algorithm from John
    Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707 (2004);
    same curve the reference's hilbert sorter walks
    (paimon-common/.../sort/hilbert/)."""
    import numpy as np

    X = X.astype(np.uint64).copy()
    n = X.shape[1]
    one = np.uint64(1)
    M = one << np.uint64(bits - 1)
    Q = M
    while Q > one:
        P = Q - one
        for i in range(n):
            upper = (X[:, i] & Q) != 0
            X[upper, 0] ^= P
            lo = ~upper
            t = (X[lo, 0] ^ X[lo, i]) & P
            X[lo, 0] ^= t
            X[lo, i] ^= t
        Q >>= one
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), dtype=np.uint64)
    Q = M
    while Q > one:
        m = (X[:, n - 1] & Q) != 0
        t[m] ^= Q - one
        Q >>= one
    for i in range(n):
        X[:, i] ^= t
    h = np.zeros(len(X), dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << one) | ((X[:, i] >> np.uint64(b)) & one)
    return h.astype(np.int64)


def hilbert_value(cols: list[str], bits: int = 16):
    """Hilbert index as a Column. Unlike the z-value this can't be a pure
    bit-interleave expression, so it rides an Arrow-batched pandas UDF —
    acceptable here because sort compaction is a rewrite job, not the read
    hot path. Caller scales inputs to [0, 2^16)."""
    n = len(cols)
    bits = min(bits, 62 // n)  # index must fit in a signed long
    shift = 16 - bits

    def _h(*series):
        import numpy as np
        import pandas as pd
        X = np.stack([s.to_numpy(dtype=np.uint64) for s in series], axis=1)
        if shift:
            X >>= np.uint64(shift)
        return pd.Series(_hilbert_transpose(X, bits))

    udf = F.pandas_udf(_h, "long")
    return udf(*[F.col(c) for c in cols])


def _sort_compact(spark, table, order_by, strategy, predicate):
    """Sort compaction (order / zorder): full rewrite of the selected
    partitions, clustered by order_by columns, committed as COMPACT.

    Scale path: repartitionByRange on the cluster key gives contiguous,
    balanced output files whose min/max stats make later predicate pruning
    effective — the whole point of z-ordering at 100 TB."""
    schema = table.schema
    if schema.primary_keys:
        # parity: CompactProcedure only sort-compacts append tables — a PK
        # bucket write would re-sort by key and undo the clustering
        raise ValueError("sort compaction (order/zorder) requires an "
                         "append table (CompactProcedure.java:99-218)")
    opts = schema.core_options
    max_level = opts.num_levels - 1
    entries = table.entries_at()
    if predicate is not None:
        from .predicate import split_by_fields
        part_pred, _ = split_by_fields(predicate, set(schema.partition_keys))
        if part_pred is not None:
            entries = [e for e in entries if part_pred.test_value(e.partition)]
    if not entries:
        return None
    df = read_append_entries(spark, table, entries, schema,
                             table.snapshots.latest())

    if strategy in ("zorder", "hilbert"):
        # min-max scale each column to [0, 2^16) then space-fill-encode.
        # One tiny agg job for the bounds; no global window (scale-safe).
        bounds = df.agg(*[F.min(F.col(c).cast("double")).alias(f"mn_{c}")
                          for c in order_by],
                        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}")
                          for c in order_by]).collect()[0]
        norm_cols = []
        for c in order_by:
            mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
            span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
            nc = f"__z_{c}"
            scaled = ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
                      * ((1 << 16) - 1))
            df = df.withColumn(nc, F.coalesce(scaled, F.lit(0.0)).cast("long"))
            norm_cols.append(nc)
        fill = zorder_value if strategy == "zorder" else hilbert_value
        df = df.withColumn("__z", fill(norm_cols))
        df = df.repartitionByRange(F.col("__z")).sortWithinPartitions("__z")
        df = df.drop("__z", *norm_cols)
    elif strategy == "order":
        df = df.repartitionByRange(*[F.col(c) for c in order_by]) \
               .sortWithinPartitions(*order_by)
    else:
        raise ValueError(f"unknown sort strategy {strategy!r}")

    deletes = [ManifestEntry(ENTRY_DELETE, e.partition, e.bucket, e.file)
               for e in entries]
    return table.new_write().write(
        spark, df, level=0, extra_delete_entries=deletes,
        commit_kind=COMMIT_COMPACT, preserve_system_cols=False)
