"""Changelog-driven maintenance of derived tables.

One pattern, three consumers (minhash signature index, BM25 postings
index, DSIR count tables): a derived table tracks a source table by
replaying the source's changelog snapshot by snapshot
(`Table.incremental(changelog=True)` — the same machinery the
streaming source uses) and recording progress with a consumer on the
source (`ConsumerManager` protocol,
`paimon-core/.../consumer/ConsumerManager.java:40`), so repeated syncs
resume where the last stopped and snapshot expiration respects the
derived table's read position.

`replay_changelog` hands each snapshot's NET row images to the caller:
`adds` = the +I/+U rows (current text of inserted/updated docs),
`removes` = the -U/-D rows (the PREVIOUS row images of updated/deleted
docs). A derived table whose rows per document vary with content (BM25
postings, DSIR feature counts) needs both sides — upserting the new
rows alone strands the old ones; one whose row set per document is
fixed (the minhash index: always `bands` rows keyed (id, band)) only
needs true deletes, since upserts overwrite in place.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..types import ADD_KINDS, DELETE, ROW_KIND, UPDATE_BEFORE


def replay_changelog(spark, source_table, consumer_id: str, apply) -> int:
    """Replay the source table's unsynced snapshots through
    `apply(adds_df, removes_df, snapshot_id)` — one call (and one
    consumer advance) per snapshot, oldest first. Returns the number
    of snapshots applied. The driver loop is O(snapshots) control
    plane; all row work stays inside `apply`'s Spark jobs.

    The consumer MUST exist before the first sync: a derived table
    bootstrapped from a snapshot of the source (build_* over
    src.read()) must pin `write_consumer(cid, bootstrap_snapshot)`, or
    replay would re-apply the bootstrapped data — idempotent for
    PK-upsert rows but a silent DOUBLE-COUNT for sum-aggregator stats
    and count deltas (r8 review). An index built from an EMPTY source
    pins consumer 0 explicitly to request replay-from-the-beginning.

    Crash safety: `apply` should stamp its derived-table writes with
    ``commit_identifier=snapshot_id``; a crash between apply() and the
    consumer advance then re-runs the snapshot as a filtered NO-OP
    commit (TableCommitImpl.filterAndCommit semantics) instead of
    double-applying its deltas."""
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
    applied = 0
    for sid in range(start + 1, latest.id + 1):
        delta = source_table.incremental(spark, sid - 1, sid,
                                         changelog=True)
        adds = (delta.filter(F.col(ROW_KIND).isin(*ADD_KINDS))
                     .drop(ROW_KIND))
        removes = (delta.filter(F.col(ROW_KIND).isin(UPDATE_BEFORE,
                                                     DELETE))
                        .drop(ROW_KIND))
        apply(adds, removes, sid)
        source_table.write_consumer(consumer_id, sid)
        applied += 1
    return applied


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
