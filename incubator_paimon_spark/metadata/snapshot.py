"""Snapshot files + resolution (time travel, tags).

Mirrors paimon-core/src/main/java/org/apache/paimon/Snapshot.java:68-240 and
SnapshotManager.java:55. Snapshots are immutable JSON files ``snapshot-N``
under <table>/snapshot, with LATEST/EARLIEST hint files (best-effort caches;
the directory listing is the source of truth, as in the reference).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field as dc_field

from .util import atomic_write_json, read_json, write_text


@dataclass
class Snapshot:
    id: int
    schema_id: int
    base_manifest_list: str | None
    delta_manifest_list: str | None
    changelog_manifest_list: str | None = None
    commit_user: str = "user"
    commit_identifier: int = -1
    commit_kind: str = "APPEND"
    time_millis: int = dc_field(default_factory=lambda: int(time.time() * 1000))
    total_record_count: int = 0
    delta_record_count: int = 0
    changelog_record_count: int = 0
    watermark: int | None = None
    next_sequence_number: int = 0
    index_manifest: str | None = None
    dv_manifest: str | None = None
    statistics: str | None = None

    def to_json(self):
        return {
            "version": 3,
            "id": self.id,
            "schemaId": self.schema_id,
            "baseManifestList": self.base_manifest_list,
            "deltaManifestList": self.delta_manifest_list,
            "changelogManifestList": self.changelog_manifest_list,
            "commitUser": self.commit_user,
            "commitIdentifier": self.commit_identifier,
            "commitKind": self.commit_kind,
            "timeMillis": self.time_millis,
            "totalRecordCount": self.total_record_count,
            "deltaRecordCount": self.delta_record_count,
            "changelogRecordCount": self.changelog_record_count,
            "watermark": self.watermark,
            "nextSequenceNumber": self.next_sequence_number,
            "indexManifest": self.index_manifest,
            "deletionVectorsManifest": self.dv_manifest,
            "statistics": self.statistics,
        }

    @staticmethod
    def from_json(j):
        return Snapshot(
            id=j["id"],
            schema_id=j["schemaId"],
            base_manifest_list=j.get("baseManifestList"),
            delta_manifest_list=j.get("deltaManifestList"),
            changelog_manifest_list=j.get("changelogManifestList"),
            commit_user=j.get("commitUser", "user"),
            commit_identifier=j.get("commitIdentifier", -1),
            commit_kind=j.get("commitKind", "APPEND"),
            time_millis=j.get("timeMillis", 0),
            total_record_count=j.get("totalRecordCount", 0),
            delta_record_count=j.get("deltaRecordCount", 0),
            changelog_record_count=j.get("changelogRecordCount", 0),
            watermark=j.get("watermark"),
            next_sequence_number=j.get("nextSequenceNumber", 0),
            index_manifest=j.get("indexManifest"),
            dv_manifest=j.get("deletionVectorsManifest"),
            statistics=j.get("statistics"),
        )


class SnapshotManager:
    def __init__(self, table_path: str):
        from ..fileio import for_path
        self.table_path = table_path
        self.dir = os.path.join(table_path, "snapshot")
        self.io = for_path(table_path)

    def _path(self, sid: int) -> str:
        return os.path.join(self.dir, f"snapshot-{sid}")

    def _ids(self) -> list[int]:
        return sorted(
            int(n.split("-")[1]) for n in self.io.list_names(self.dir)
            if n.startswith("snapshot-") and not n.endswith(".tmp")
            and "-" in n and n.split("-")[1].isdigit()
        )

    def latest_id(self) -> int | None:
        # hint file is a fast path; trust but verify against listing
        hint = os.path.join(self.dir, "LATEST")
        ids = self._ids()
        if not ids:
            return None
        if self.io.exists(hint):
            try:
                h = int(self.io.read_text(hint).strip())
                if h in ids and h == ids[-1]:
                    return h
            except ValueError:
                pass
        return ids[-1]

    def earliest_id(self) -> int | None:
        ids = self._ids()
        return ids[0] if ids else None

    def read(self, sid: int) -> Snapshot:
        return Snapshot.from_json(read_json(self._path(sid)))

    def latest(self) -> Snapshot | None:
        sid = self.latest_id()
        return None if sid is None else self.read(sid)

    def list_all(self) -> list[Snapshot]:
        return [self.read(i) for i in self._ids()]

    def exists(self, sid: int) -> bool:
        return self.io.exists(self._path(sid))

    def try_commit(self, snapshot: Snapshot) -> bool:
        """CAS-create snapshot-N; False = lost race (caller replans+retries),
        mirroring FileStoreCommitImpl's rename-with-retry."""
        ok = atomic_write_json(self._path(snapshot.id), snapshot.to_json())
        if ok:
            write_text(os.path.join(self.dir, "LATEST"), str(snapshot.id))
        return ok

    def delete(self, sid: int):
        self.io.delete(self._path(sid))

    # --- resolution for time travel (DataTableBatchScan startup scanners) ---

    def snapshot_for_timestamp(self, ts_millis: int) -> Snapshot | None:
        """Latest snapshot with time_millis <= ts (StaticFromTimestampStartingScanner)."""
        result = None
        for s in self.list_all():
            if s.time_millis <= ts_millis:
                result = s
            else:
                break
        return result

    def earliest_snapshot_after(self, ts_millis: int) -> Snapshot | None:
        for s in self.list_all():
            if s.time_millis >= ts_millis:
                return s
        return None
