"""Changelog-driven maintenance of derived tables.

One pattern, many consumers (minhash signature index, BM25 postings
index, IVF index, segment doc-frequencies, DSIR count tables): a
derived table tracks a source table by replaying the source's
changelog (`Table.incremental(changelog=True)` — the same machinery
the streaming source uses) and recording progress with a consumer on
the source (`ConsumerManager` protocol,
`paimon-core/.../consumer/ConsumerManager.java:40`), so repeated syncs
resume where the last stopped and snapshot expiration respects the
derived table's read position.

`replay_changelog` hands the range's NET row images to the caller:
`adds` = the final versions of inserted/changed keys, `removes` = the
range-initial versions of changed/deleted keys. A derived table whose
rows per document vary with content (BM25 postings, DSIR feature
counts) needs both sides — upserting the new rows alone strands the
old ones; one whose row set per document is fixed (the minhash index:
always `bands` rows keyed (id, band)) only needs true deletes, since
upserts overwrite in place.

Batching (r9): contiguous unsynced snapshots are replayed as ONE
incremental read and ONE derived-table commit per chunk of
``max_batch_snapshots`` — a source committing every 30 s no longer
costs the nightly sync thousands of sequential driver jobs and index
commits; cost is O(changed rows) + O(chunks), not O(snapshots).
Per-key netting (first remove image / last add image across the
chunk, intermediate versions cancelling) makes the batched apply
EQUAL to the per-snapshot fold for every consumer: count-delta
appliers see final−initial, upsert appliers see exactly one winning
version per key, and stale-row retraction compares initial vs final
content.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..types import (ADD_KINDS, DELETE, ROW_KIND, SEQUENCE_NUMBER,
                     UPDATE_BEFORE, VALUE_KIND)


def replay_changelog(spark, source_table, consumer_id: str, apply, *,
                     max_batch_snapshots: int = 64) -> int:
    """Replay the source table's unsynced snapshots through
    `apply(adds_df, removes_df, end_snapshot_id)` — one call (and one
    consumer advance) per CHUNK of up to ``max_batch_snapshots``
    contiguous snapshots, oldest first. Returns the number of source
    snapshots covered. The driver loop is O(chunks) control plane; all
    row work stays inside `apply`'s Spark jobs.

    The consumer MUST exist before the first sync: a derived table
    bootstrapped from a snapshot of the source (build_* over
    src.read()) must pin `write_consumer(cid, bootstrap_snapshot)`, or
    replay would re-apply the bootstrapped data — idempotent for
    PK-upsert rows but a silent DOUBLE-COUNT for sum-aggregator stats
    and count deltas (r8 review). An index built from an EMPTY source
    pins consumer 0 explicitly to request replay-from-the-beginning.

    Crash safety: `apply` should stamp its derived-table writes with
    ``commit_identifier=end_snapshot_id``. The chunk end is PINNED in
    a sibling consumer (``<cid>#next``) BEFORE apply runs, so a crash
    anywhere inside apply — even between two derived-table commits of
    a multi-table apply — re-runs the IDENTICAL chunk with the
    identical identifier: already-landed commits filter as no-ops
    (TableCommitImpl.filterAndCommit semantics), missing ones apply.
    Without the pin, a source that grew between crash and retry would
    re-apply the crashed chunk's deltas under a different identifier
    and double-count."""
    latest = source_table.snapshots.latest()
    if latest is None:
        return 0
    start = source_table.read_consumer(consumer_id)
    if start is None:
        raise ValueError(
            f"no consumer {consumer_id!r} on {source_table.name}: pin the "
            f"sync start first — write_consumer({consumer_id!r}, "
            f"<bootstrap snapshot id>) right after building the derived "
            f"table (0 for an index built from an empty source)")
    next_cid = f"{consumer_id}#next"
    pending = source_table.read_consumer(next_cid)
    covered = 0
    while start < latest.id:
        if pending is not None and start < pending <= latest.id:
            end = pending  # crashed chunk: replay with the SAME end
        else:
            end = min(start + max_batch_snapshots, latest.id)
            source_table.write_consumer(next_cid, end)
        pending = None
        adds, removes, any_changes = _net_range(spark, source_table,
                                                start, end)
        if any_changes:
            apply(adds, removes, end)
        source_table.write_consumer(consumer_id, end)
        covered += end - start
        start = end
    return covered


def _net_range(spark, table, s1: int, s2: int):
    """NET (adds, removes, any_changes) over snapshot range (s1, s2].

    Three shapes, mirroring `changelog_between`'s classification
    (streaming/source.py): (a) every changed snapshot carries
    changelog files → one read over all of them, tagged per snapshot,
    netted per primary key; (b) some snapshot lacks them (PK table,
    producer none / input-without-rowkind) → ONE state diff of the
    merged endpoint states — already net by construction, and one diff
    regardless of how many snapshots the chunk spans (the per-snapshot
    loop paid a full diff PER snapshot); (c) nothing changed → skip.
    """
    from ..read import read_files_df

    schema = table.schema
    keys = schema.primary_keys
    cols = [f.name for f in schema.fields]

    per_sid, have_all, changed = [], True, False
    for sid in range(s1 + 1, s2 + 1):
        snap = table.snapshots.read(sid)
        es = table.changelog_entries(snap)
        if es:
            per_sid.append((sid, es))
            changed = True
        elif snap.commit_kind != "COMPACT" and snap.delta_record_count != 0:
            have_all = False
            changed = True
    if not changed:
        return None, None, False

    if not have_all or not per_sid:
        # state diff (or append-only delta) over the whole range is net
        from ..streaming.source import changelog_between
        delta = changelog_between(spark, table, s1, s2)
        kinds = F.col(ROW_KIND)
        adds = delta.filter(kinds.isin(*ADD_KINDS)).select(*cols)
        removes = delta.filter(kinds.isin(UPDATE_BEFORE, DELETE)) \
                       .select(*cols)
        return adds, removes, True

    pieces = []
    for sid, es in per_sid:
        d = read_files_df(spark, table, es, schema)
        pieces.append(d.select(*cols,
                               F.col(VALUE_KIND).alias(ROW_KIND),
                               F.lit(sid).alias("__sid"),
                               F.coalesce(F.col(SEQUENCE_NUMBER),
                                          F.lit(0)).alias("__seq")))
    delta = pieces[0]
    for p in pieces[1:]:
        delta = delta.unionByName(p)

    is_add = F.col(ROW_KIND).isin(*ADD_KINDS)
    if not keys:
        adds = delta.filter(is_add).select(*cols)
        removes = delta.filter(~is_add).select(*cols)
        return adds, removes, True

    # per-key net: order events by (snapshot, remove-before-add, the
    # PERSISTED _SEQUENCE_NUMBER the writer stamped into the changelog
    # file — the same commit LSN the merge engine resolves same-key
    # conflicts by, so the "last add" here is exactly the version a
    # merged read returns; r9 verdict #3 replaced the plan-shape
    # monotonically_increasing_id token with this data contract). The
    # first event being a remove means the key existed before the
    # range (its initial image); the last being an add means it exists
    # after (its final image); intermediate versions cancel exactly.
    ev = (delta.withColumn("__k", F.when(is_add, 1).otherwise(0))
               .withColumn("__o", F.struct(
                   F.col("__sid"), F.col("__k"), F.col("__seq"))))
    payload = F.struct(*[F.col(c) for c in cols], F.col("__k"))
    agg = ev.groupBy(*[F.col(k) for k in keys]).agg(
        F.min_by(payload, F.col("__o")).alias("__first"),
        F.max_by(payload, F.col("__o")).alias("__last"))
    removes = (agg.filter(F.col("__first.__k") == 0)
                  .select(*[F.col(f"__first.{c}").alias(c) for c in cols]))
    adds = (agg.filter(F.col("__last.__k") == 1)
               .select(*[F.col(f"__last.{c}").alias(c) for c in cols]))
    return adds, removes, True


def auto_sync(spark, source_table, key: str, sync_fn) -> None:
    """Keep a derived table current AUTOMATICALLY: register `sync_fn`
    on the engine's post-commit listener for `source_table`
    (`metadata.commit.on_commit` — the same hook that re-binds attached
    views), so every in-process commit — batch write, row-level op, or
    a streaming sink's per-batch commit — is followed by an incremental
    index sync. `sync_fn(spark)` should call the appropriate
    sync_* function; the consumer protocol makes re-entry cheap (a
    no-op when already current) and a missed hook (foreign-process
    writer, crash) is healed by the next explicit sync. Hook failures
    are swallowed by the commit path (maintenance must not fail the
    write) — rely on the consumer lag, not the hook, for correctness.
    Same (source, key) re-registration replaces."""
    import weakref

    from ..metadata.commit import on_commit
    ref = weakref.ref(spark)

    def hook(_snapshot):
        s = ref()
        if s is not None:
            sync_fn(s)

    on_commit(source_table.path, f"index-sync:{key}", hook)


def index_staleness(source_table, consumer_id: str) -> int:
    """Snapshots the index is BEHIND the source: latest source snapshot
    minus the sync consumer's position (0 = current). A derived table
    maintained by a foreign-process writer's source shows up here even
    though no in-process hook ever fired."""
    latest = source_table.snapshots.latest_id() or 0
    pos = source_table.read_consumer(consumer_id)
    if pos is None:
        return latest
    return max(latest - pos, 0)


def check_index_current(source_table, consumer_id: str,
                        mode: str = "warn") -> int:
    """Staleness guard for `*_indexed` query paths (VERDICT r8 #7):
    compare the source's latest snapshot against the index's consumer
    position and, when the index lags, `warn` (default), `fail`
    (raise), or stay `silent` — the caller picks via the index table's
    ``index.staleness-check`` option or the `mode` argument. Returns
    the lag so callers can auto-heal (sync-first) when they own the
    sync function."""
    lag = index_staleness(source_table, consumer_id)
    if lag > 0:
        msg = (f"index consumer {consumer_id!r} on {source_table.name} "
               f"is {lag} snapshot(s) behind — results may be stale; "
               f"run the index's sync_* function (or attach auto_sync)")
        if mode == "fail":
            raise StaleIndexError(msg)
        if mode != "silent":
            import warnings
            warnings.warn(msg, StaleIndexWarning, stacklevel=3)
    return lag


def guard_index(index_table, source_table,
                consumer_id: str | None = None) -> int:
    """Arm `check_index_current` from an indexed QUERY path: no-op when
    the caller did not opt in (`source_table is None`); otherwise the
    consumer defaults to ``index:<index table name>`` and the mode to
    the index table's ``index.staleness-check`` option (warn / fail /
    silent). One helper so every `*_indexed` read path guards the same
    way (r9 verdict #1: half the surface had no hook at all) — the
    policy body itself lives ONLY in check_index_current."""
    if source_table is None:
        return 0
    return check_index_current(
        source_table, consumer_id or f"index:{index_table.name}",
        (index_table.schema.options or {})
        .get("index.staleness-check", "warn"))


class StaleIndexWarning(UserWarning):
    """An index-backed query ran against a lagging index."""


class StaleIndexError(RuntimeError):
    """An index-backed query refused to run against a lagging index."""
