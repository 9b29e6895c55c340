"""ACID snapshot commit with conflict detection.

Mirrors paimon-core/src/main/java/org/apache/paimon/operation/
FileStoreCommitImpl.java:101 (two-phase: write manifests, then CAS-create
snapshot-N+1 with retry) and its conflict check (:261-305, noConflictsOrFail):
a commit that DELETEs files must fail if a concurrent commit already removed
them; APPEND-only commits never conflict and simply retry the CAS.

Exactly-once for streaming: commits carry a ``commit_identifier`` (batch id);
a retried identifier by the same user is a no-op, mirroring
TableCommitImpl.filterAndCommit.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field

from ..types import (COMMIT_APPEND, COMMIT_COMPACT, COMMIT_OVERWRITE,
                     ENTRY_ADD, ENTRY_DELETE)
from .manifest import ManifestEntry, ManifestStore, live_entries, merge_entries
from .snapshot import Snapshot, SnapshotManager


class ConflictError(RuntimeError):
    pass


# ---------------------------------------------------------------------
# post-commit notification (in-process): Catalog.attach() subscribes SQL
# view refreshers here so a registered view re-binds to the new snapshot
# after ANY commit path (write / compact / row-ops / streaming sink).
# Keyed by normalized table path; inner key lets a re-attach replace its
# old listener instead of stacking duplicates.
_COMMIT_LISTENERS: dict[str, dict[str, object]] = {}


def on_commit(table_path: str, key: str, fn) -> None:
    """Register fn(snapshot) to run after every successful commit to
    `table_path` made through this process. Same (path, key) replaces."""
    import os
    _COMMIT_LISTENERS.setdefault(os.path.normpath(table_path), {})[key] = fn


def unregister_commit_listener(table_path: str, key: str) -> None:
    """Drop a listener registered with on_commit; unknown keys no-op."""
    import os
    _COMMIT_LISTENERS.get(os.path.normpath(table_path), {}).pop(key, None)


def _notify_commit(table_path: str, snapshot) -> None:
    import os
    for fn in list(_COMMIT_LISTENERS.get(os.path.normpath(table_path), {})
                   .values()):
        try:
            fn(snapshot)
        except Exception:  # noqa: BLE001 — a dead session must not fail commits
            pass


@dataclass
class CommitMessage:
    """Per-task result shipped back to the driver (CommitMessageImpl):
    new data files + compaction's (before, after) file sets + changelog."""

    add: list[ManifestEntry] = dc_field(default_factory=list)
    delete: list[ManifestEntry] = dc_field(default_factory=list)
    changelog: list[ManifestEntry] = dc_field(default_factory=list)


# how many manifest files a snapshot may accumulate before we rewrite them
# into one "full" manifest (reference: manifest.full-compaction-threshold-size)
_MANIFEST_FULL_COMPACTION_COUNT = 20


class FileStoreCommit:
    def __init__(self, table_path: str, commit_user: str = "user"):
        self.table_path = table_path
        self.snapshots = SnapshotManager(table_path)
        self.manifests = ManifestStore(table_path)
        self.commit_user = commit_user

    # ------------------------------------------------------------------
    def commit(
        self,
        message: CommitMessage,
        schema_id: int,
        kind: str = COMMIT_APPEND,
        commit_identifier: int = -1,
        watermark: int | None = None,
        next_sequence_number: int | None = None,
        index_manifest: str | None = None,
        dv_manifest: str | None | type(...) = ...,
        statistics: str | None | type(...) = ...,
        max_retries: int = 100,
    ) -> Snapshot | None:
        """Returns the committed Snapshot, or None when this identifier was
        already committed (exactly-once replay)."""
        _t0 = time.time()
        for attempt in range(max_retries):
            latest = self.snapshots.latest()

            if commit_identifier >= 0 and latest is not None:
                if self._already_committed(commit_identifier):
                    return None

            if message.delete:
                self._check_conflicts(message, latest)

            new_id = (latest.id if latest else 0) + 1

            # base manifest list = all manifests visible in previous snapshot
            prev_manifests = []
            if latest is not None:
                prev_manifests.extend(self.manifests.read_manifest_list_meta(
                    latest.base_manifest_list))
                prev_manifests.extend(self.manifests.read_manifest_list_meta(
                    latest.delta_manifest_list))

            # periodic manifest compaction keeps planning O(live files).
            # Incremental (ManifestFile rolling + merge of small manifests):
            # manifests that are already near-full AND untouched by any
            # DELETE entry are kept as-is; only small or dirtied manifests
            # are merged and rewritten — steady-state commit cost is
            # O(delta + dirty), not O(all live files). With the list-level
            # add/delete counts (ManifestFileMeta parity) a delete-free
            # chain decides cleanliness WITHOUT reading any full manifest.
            if len(prev_manifests) >= _MANIFEST_FULL_COMPACTION_COUNT:
                prev_manifests = self._compact_manifests(prev_manifests)

            base_list = self.manifests.write_manifest_list(prev_manifests)
            # membership in message.delete IS the deletion intent:
            # normalize the kind so a caller handing back entries it read
            # (kind ADD) cannot silently re-add the files it meant to drop
            delta = message.add + [
                e if e.kind == ENTRY_DELETE
                else ManifestEntry(ENTRY_DELETE, e.partition, e.bucket, e.file)
                for e in message.delete]
            delta_list = self.manifests.write_manifest_list(
                self.manifests.write_manifests_meta(delta) if delta else [])
            changelog_list = None
            if message.changelog:
                changelog_list = self.manifests.write_manifest_list(
                    self.manifests.write_manifests_meta(message.changelog))

            add_rows = sum(e.file.row_count for e in message.add)
            del_rows = sum(e.file.row_count for e in message.delete)
            prev_total = latest.total_record_count if latest else 0
            prev_seq = latest.next_sequence_number if latest else 0

            snapshot = Snapshot(
                id=new_id,
                schema_id=schema_id,
                base_manifest_list=base_list,
                delta_manifest_list=delta_list,
                changelog_manifest_list=changelog_list,
                commit_user=self.commit_user,
                commit_identifier=commit_identifier,
                commit_kind=kind,
                total_record_count=prev_total + add_rows - del_rows,
                delta_record_count=add_rows - del_rows,
                changelog_record_count=sum(e.file.row_count for e in message.changelog),
                watermark=watermark if watermark is not None else (latest.watermark if latest else None),
                next_sequence_number=(next_sequence_number
                                      if next_sequence_number is not None else prev_seq),
                index_manifest=(index_manifest if index_manifest is not None
                                else (latest.index_manifest if latest else None)),
                dv_manifest=(dv_manifest if dv_manifest is not ...
                             else (latest.dv_manifest if latest else None)),
                statistics=(statistics if statistics is not ...
                            else (latest.statistics if latest else None)),
            )
            if self.snapshots.try_commit(snapshot):
                # CommitMetrics parity: duration, CAS attempts, file and
                # row deltas — retries climbing is the first signal of
                # writer contention on a hot table (sys.metrics)
                from ..metrics import record
                record(self.table_path, "commit",
                       duration_ms=(time.time() - _t0) * 1000,
                       attempts=attempt + 1, retries=attempt,
                       files_added=len(message.add),
                       files_deleted=len(message.delete),
                       changelog_files=len(message.changelog),
                       rows_added=add_rows, rows_deleted=del_rows)
                _notify_commit(self.table_path, snapshot)
                return snapshot
            # lost CAS; replan from fresh latest. Exponential backoff WITH
            # JITTER: a fixed sleep lets N contenders stay phase-locked and
            # starve one writer indefinitely (livelock found by the
            # thread-race test) — randomized growing waits break the tie.
            import random
            time.sleep(random.random() * min(0.01 * (2 ** min(attempt, 6)),
                                             0.5))
        raise ConflictError(f"commit failed after {max_retries} retries")

    # ------------------------------------------------------------------
    def rewrite_metadata(self, patch, kind=COMMIT_COMPACT, max_retries=100):
        """Metadata-only commit: pass the LIVE entry set through `patch`
        (list -> new list over the SAME data files — e.g. attaching an
        embedded file index, RewriteFileIndexProcedure parity) and commit
        it as the new base with an EMPTY delta, so incremental/changelog
        readers see no data change (kind COMPACT, like other state-neutral
        commits). Record counts and sequence numbers carry over. CAS-
        retried; a lost race re-reads the fresh live set and re-patches."""
        _t0 = time.time()
        for attempt in range(max_retries):
            latest = self.snapshots.latest()
            if latest is None:
                return None
            live = live_entries(self._base_entries(latest))
            patched = patch(live)
            if patched is None:
                return None  # patch found nothing to change
            base_list = self.manifests.write_manifest_list(
                self.manifests.write_manifests_meta(patched)
                if patched else [])
            snapshot = Snapshot(
                id=latest.id + 1,
                schema_id=latest.schema_id,
                base_manifest_list=base_list,
                delta_manifest_list=self.manifests.write_manifest_list([]),
                commit_user=self.commit_user,
                commit_kind=kind,
                total_record_count=latest.total_record_count,
                delta_record_count=0,
                watermark=latest.watermark,
                next_sequence_number=latest.next_sequence_number,
                index_manifest=latest.index_manifest,
                dv_manifest=latest.dv_manifest,
                statistics=latest.statistics,
            )
            if self.snapshots.try_commit(snapshot):
                from ..metrics import record
                record(self.table_path, "commit",
                       duration_ms=(time.time() - _t0) * 1000,
                       attempts=attempt + 1, retries=attempt,
                       files_added=0, files_deleted=0, changelog_files=0,
                       rows_added=0, rows_deleted=0)
                _notify_commit(self.table_path, snapshot)
                return snapshot
            import random
            time.sleep(random.random() * min(0.01 * (2 ** min(attempt, 6)),
                                             0.5))
        raise ConflictError(
            f"rewrite_metadata failed after {max_retries} retries")

    # ------------------------------------------------------------------
    def _compact_manifests(self, metas: list[dict]) -> list[dict]:
        """Merge small/dirty manifests, keep near-full clean ones verbatim.
        A manifest is dirty when it holds DELETE entries or any of its ADDs
        is cancelled by a DELETE elsewhere in the chain. Order is preserved
        (kept manifests are strictly older than the rewritten tail, and
        DELETE cancellation only ever reaches backwards).

        Fast path: when the list-level counts prove the chain holds ZERO
        DELETE entries, cancellation cannot touch anyone — near-full
        manifests are kept from their counts alone and only the small
        tail is read and merged. A 100-file append commit on a 10^6-entry
        table costs O(tail), not a 10^6-entry re-parse (§6 probe:
        31 s → ms). Legacy count-less lists take the read-everything
        path once; the rewritten list carries counts thereafter."""
        from .manifest import MANIFEST_ROLL_COUNT
        full = MANIFEST_ROLL_COUNT * 8 // 10
        metas = [m if isinstance(m, dict)
                 else {"name": m, "numAdded": None, "numDeleted": None}
                 for m in metas]

        if all(m["numDeleted"] == 0 for m in metas):
            keep = [m for m in metas if m["numAdded"] >= full]
            small = [m for m in metas if m["numAdded"] < full]
            if not small:
                return keep
            entries = [e for m in small
                       for e in self.manifests.read_manifest(m["name"])]
            live = live_entries(entries)
            return keep + (self.manifests.write_manifests_meta(live)
                           if live else [])

        # dirty chain: decide cleanliness from COLUMNAR identifier triples
        # (no entry objects) and fully read only the manifests being
        # rewritten. Sound only while raw-string identity holds chain-wide
        # (dels ⊆ adds — every DELETE matches its ADD byte-for-byte, which
        # our writers guarantee by round-tripping read entries); otherwise
        # keeping a manifest whose cancelled ADD we failed to match would
        # RESURRECT the file, so fall back to the full object pass.
        names = [m["name"] for m in metas]
        per_ids = self.manifests.read_ident_sets(names)
        adds_all = set().union(*(a for a, _ in per_ids.values()))
        dels_all = set().union(*(d for _, d in per_ids.values()))
        if dels_all <= adds_all:
            keep, rewrite_names = [], []
            for m in metas:
                a, d = per_ids[m["name"]]
                if not d and len(a) >= full and not (a & dels_all):
                    keep.append({"name": m["name"], "numAdded": len(a),
                                 "numDeleted": 0})
                else:
                    rewrite_names.append(m["name"])
            rewrite = [e for n in rewrite_names
                       for e in self.manifests.read_manifest(n)]
            live = [ManifestEntry(ENTRY_ADD, e.partition, e.bucket, e.file)
                    for e in live_entries(rewrite)]
            return keep + (self.manifests.write_manifests_meta(live)
                           if live else [])

        per = [(m, self.manifests.read_manifest(m["name"])) for m in metas]
        deleted = {e.identifier() for _m, es in per
                   for e in es if e.kind == ENTRY_DELETE}
        keep, rewrite = [], []
        for m, es in per:
            clean = (len(es) >= full
                     and all(e.kind == ENTRY_ADD
                             and e.identifier() not in deleted for e in es))
            if clean:
                # counts are now known even if the source list was legacy
                keep.append({"name": m["name"], "numAdded": len(es),
                             "numDeleted": 0})
            else:
                rewrite.extend(es)
        live = [ManifestEntry(ENTRY_ADD, e.partition, e.bucket, e.file)
                for e in live_entries(rewrite)]
        return keep + (self.manifests.write_manifests_meta(live)
                       if live else [])

    def _base_entries(self, latest: Snapshot | None) -> list[ManifestEntry]:
        if latest is None:
            return []
        entries = self.manifests.read_all_entries(latest.base_manifest_list)
        entries.extend(self.manifests.read_all_entries(latest.delta_manifest_list))
        return entries

    def _check_conflicts(self, message: CommitMessage, latest: Snapshot | None):
        """Deleted files must still be live (FileStoreCommitImpl.java:261-305).

        Fast path: identifiers compare as (raw partition JSON, bucket,
        fileName) triples read COLUMNAR from the manifests — no entry
        objects, so a delete-bearing commit on a 10^6-entry table costs
        ~1-2 s, not a full re-parse. A miss falls back to the canonical
        sorted-tuple identifiers (a writer whose partition dict serialized
        in a different key order must not be declared a conflict) before
        raising."""
        from .util import dumps
        names = []
        if latest is not None:
            names = (self.manifests.read_manifest_list(latest.base_manifest_list)
                     + self.manifests.read_manifest_list(latest.delta_manifest_list))
        adds, dels = self.manifests.read_ident_strings(names)
        if dels and not dels <= adds:
            # raw-string identity broke (a DELETE that matches no ADD
            # byte-for-byte): distrust the fast set algebra entirely —
            # canonical identifiers for the whole check
            canon = {e.identifier()[0:3]
                     for e in live_entries(self._base_entries(latest))}
            for e in message.delete:
                if e.identifier()[0:3] not in canon:
                    raise ConflictError(
                        f"conflict: file {e.file.file_name} was removed "
                        f"by a concurrent commit")
            return
        live = adds - dels
        misses = [e for e in message.delete
                  if (dumps(e.partition), e.bucket, e.file.file_name)
                  not in live]
        if not misses:
            return
        canon = {e.identifier()[0:3]
                 for e in live_entries(self._base_entries(latest))}
        for e in misses:
            if e.identifier()[0:3] not in canon:
                raise ConflictError(
                    f"conflict: file {e.file.file_name} was removed by a "
                    f"concurrent commit")

    def _already_committed(self, identifier: int) -> bool:
        for s in reversed(self.snapshots.list_all()):
            if s.commit_identifier == identifier and s.commit_user == self.commit_user:
                return True
            if 0 <= s.commit_identifier < identifier:
                return False
        return False
