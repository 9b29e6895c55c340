"""Manifest files, manifest lists and entry merging.

Mirrors paimon-core/src/main/java/org/apache/paimon/manifest/
{ManifestList.java:40, ManifestFile.java:48, ManifestEntry.java:41-48} and
DataFileMeta (paimon-core/.../io/DataFileMeta.java:54-109).

Storage choice: manifests are PARQUET rows (rolled at MANIFEST_ROLL_COUNT
entries; nested stats JSON-encoded per cell) because the driver-side planner
consumes them whole, exactly like the reference plans on the driver from avro
manifests. At 100 TB a table has O(10^5-10^6) data files; columnar decode
keeps the per-plan metadata read sub-second, and the planner also exposes the
entries as a Spark DataFrame (see system_tables.$files) so pruning can be
pushed to executors when a metadata scan ever outgrows the driver.

``merge_entries`` implements ADD/DELETE cancellation — the §2.7 set-op analog
(paimon-core/.../manifest/FileEntry.java mergeEntries).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field

from ..types import ENTRY_ADD, ENTRY_DELETE
from .util import atomic_write_json, dumps, loads, new_uuid, read_json


@dataclass
class DataFileMeta:
    """Per-file metadata (DataFileMeta.java:54-109). Paths are relative to the
    table root so tables stay relocatable."""

    file_name: str  # relative path: [<part>/...]bucket-<n>/<file>.parquet
    file_size: int
    row_count: int
    min_seq: int = 0
    max_seq: int = 0
    schema_id: int = 0
    level: int = 0
    # value stats: {col: {"min":.., "max":.., "null_count":..}}
    stats: dict = dc_field(default_factory=dict)
    creation_time_millis: int = 0
    # None = unknown (reference's Optional<Long> deleteRowCount); only an
    # explicit 0 proves the file holds no -D/-U rows (rawConvertible gate)
    delete_row_count: int | None = None
    # row kind breakdown for changelog files: {"+I": n, ...}
    row_kind_counts: dict = dc_field(default_factory=dict)
    # bloom-filter file index: {col: sorted bit positions} or {col: None}
    # when saturated (BloomFilterFileIndex.java:48, embedded in the manifest
    # like the reference's embedded_index)
    file_index: dict = dc_field(default_factory=dict)
    # fixed-bucket layout this file was hashed with (ManifestEntry.java
    # totalBuckets — the rescale-bucket arbiter, rescale-bucket.md): after
    # `ALTER TABLE SET ('bucket'=N)` different partitions may legally carry
    # different counts, so bucket pruning and the INSERT INTO layout guard
    # consult the file's recorded count, never the current option. None =
    # pre-rescale legacy file or a bucket-unaware/dynamic layout.
    total_buckets: int | None = None
    # False = a hive-style migrated file whose bytes LACK the partition
    # columns (they lived in the directory path); the reader injects them
    # from entry.partition (the reference's migrate keeps hive files
    # zero-copy the same way — partition fields come from PartitionInfo,
    # not the file). Files our writers produce always embed them (True).
    partition_in_data: bool = True

    def to_json(self):
        return {
            "_v": 2,  # format marker: deleteRowCount is tri-state and trusted
            "fileName": self.file_name,
            "fileSize": self.file_size,
            "rowCount": self.row_count,
            "minSequenceNumber": self.min_seq,
            "maxSequenceNumber": self.max_seq,
            "schemaId": self.schema_id,
            "level": self.level,
            "stats": self.stats,
            "creationTimeMillis": self.creation_time_millis,
            "deleteRowCount": self.delete_row_count,
            "rowKindCounts": self.row_kind_counts,
            "fileIndex": self.file_index,
            "totalBuckets": self.total_buckets,
            "partitionInData": self.partition_in_data,
        }

    @staticmethod
    def from_json(j):
        return DataFileMeta(
            file_name=j["fileName"],
            file_size=j["fileSize"],
            row_count=j["rowCount"],
            min_seq=j.get("minSequenceNumber", 0),
            max_seq=j.get("maxSequenceNumber", 0),
            schema_id=j.get("schemaId", 0),
            level=j.get("level", 0),
            stats=j.get("stats", {}),
            creation_time_millis=j.get("creationTimeMillis", 0),
            # Legacy .json manifests (no "_v" marker) always wrote
            # deleteRowCount=0 without computing it; an explicit 0 is proof of
            # no -D/-U rows for the rawConvertible gate, so a legacy 0 must
            # devolve to unknown (None) or deleted rows would resurrect on the
            # raw read path. Only marker-bearing JSON carries a trusted value.
            delete_row_count=j.get("deleteRowCount") if j.get("_v", 0) >= 2 else None,
            row_kind_counts=j.get("rowKindCounts", {}),
            file_index=j.get("fileIndex", {}),
            total_buckets=j.get("totalBuckets"),
            partition_in_data=j.get("partitionInData", True) is not False,
        )


@dataclass
class ManifestEntry:
    """(kind, partition, bucket, file) — ManifestEntry.java:41-48."""

    kind: str  # ADD | DELETE
    partition: dict  # {col: value} ({} for unpartitioned)
    bucket: int
    file: DataFileMeta

    def identifier(self):
        return (tuple(sorted(self.partition.items())), self.bucket, self.file.file_name)

    def to_json(self):
        return {"kind": self.kind, "partition": self.partition, "bucket": self.bucket,
                "file": self.file.to_json()}

    @staticmethod
    def from_json(j):
        return ManifestEntry(j["kind"], j.get("partition", {}), j.get("bucket", 0),
                             DataFileMeta.from_json(j["file"]))


def merge_entries(entries: list[ManifestEntry]) -> list[ManifestEntry]:
    """Collapse ADD/DELETE pairs (FileEntry.mergeEntries). A DELETE with no
    preceding ADD is kept (it deletes a file from an older manifest)."""
    out: dict = {}
    for e in entries:
        ident = e.identifier()
        if e.kind == ENTRY_ADD:
            if ident in out and out[ident].kind == ENTRY_DELETE:
                # DELETE then ADD of same file should not happen in one chain
                raise ValueError(f"ADD after DELETE for {ident}")
            out[ident] = e
        else:
            prev = out.pop(ident, None)
            if prev is None:
                out[ident] = e  # unmatched DELETE: cancels an older manifest's ADD
            elif prev.kind == ENTRY_DELETE:
                out[ident] = prev
    return list(out.values())


def live_entries(entries: list[ManifestEntry]) -> list[ManifestEntry]:
    """merge + keep only surviving ADDs (the live file set of a snapshot)."""
    return [e for e in merge_entries(entries) if e.kind == ENTRY_ADD]


# entries per manifest file before rolling to a new one (reference rolls by
# manifest.target-file-size, ~8 MB avro ≈ O(10^4) entries)
MANIFEST_ROLL_COUNT = 10_000

_MANIFEST_COLS = [
    ("kind", "string"), ("partition", "json"), ("bucket", "int"),
    ("fileName", "string"), ("fileSize", "int"), ("rowCount", "int"),
    ("minSequenceNumber", "int"), ("maxSequenceNumber", "int"),
    ("schemaId", "int"), ("level", "int"), ("stats", "json"),
    ("creationTimeMillis", "int"), ("deleteRowCount", "int"),
    ("rowKindCounts", "json"), ("fileIndex", "json"),
    ("totalBuckets", "int"), ("partitionInData", "int"),
]


def _row_entry(d: dict, tb: list, i: int, part_cache: dict) -> ManifestEntry:
    """One parquet-manifest row -> ManifestEntry (the SINGLE decode used by
    the full and the filtered readers — format rules live here once).
    Decode fast paths (driver planning is a hot loop at 10^5-10^6 entries):
    "{}" cells skip json entirely (rowKindCounts/fileIndex on data files,
    partition on unpartitioned tables), and partition strings memoize via
    `part_cache` — a table has few distinct partitions, so that parse
    collapses to O(partitions). The shared dicts are treated as immutable
    by every reader (planning only tests them)."""
    st = d["stats"][i]
    rkc = d["rowKindCounts"][i]
    fi = d["fileIndex"][i]
    ps = d["partition"][i]
    pid = d.get("partitionInData")  # pre-r12 manifests lack the column
    partition = part_cache.get(ps)
    if partition is None:
        partition = part_cache[ps] = loads(ps)
    meta = DataFileMeta(
        file_name=d["fileName"][i],
        file_size=d["fileSize"][i],
        row_count=d["rowCount"][i],
        min_seq=d["minSequenceNumber"][i],
        max_seq=d["maxSequenceNumber"][i],
        schema_id=d["schemaId"][i],
        level=d["level"][i],
        stats={} if st == "{}" else loads(st),
        creation_time_millis=d["creationTimeMillis"][i],
        delete_row_count=d["deleteRowCount"][i],
        row_kind_counts={} if rkc == "{}" else loads(rkc),
        file_index={} if fi == "{}" else loads(fi),
        total_buckets=tb[i],
        partition_in_data=pid is None or pid[i] is None or pid[i] != 0,
    )
    return ManifestEntry(d["kind"][i], partition, d["bucket"][i], meta)


class ManifestStore:
    """Reads/writes manifest files + manifest lists under <table>/manifest.

    Manifest files are PARQUET (one row per entry; nested stats/partition/
    file-index values JSON-encoded in string columns) — columnar decode keeps
    driver planning fast at O(10^6) files, mirroring the reference's move
    from per-record avro parse cost to block reads (ManifestFile.java:48).
    Legacy .json manifests remain readable. Writes roll at
    MANIFEST_ROLL_COUNT entries so no single manifest grows unbounded and
    full compaction can rewrite in parallel-friendly chunks."""

    # in-process cache of parsed manifests (they are immutable once written;
    # readers never mutate entries). Keyed by absolute path, bounded by total
    # cached entries so repeated planning is O(new manifests), which is what
    # makes per-query re-planning cheap on a long-lived driver.
    _CACHE: dict[str, list] = {}
    _CACHE_MAX_ENTRIES = 500_000
    # guards size-check + clear/insert on the caches: an eviction scan
    # (sum over .values()) racing another thread's clear() would raise
    # "dictionary changed size during iteration" out of a commit
    _CACHE_GUARD = __import__("threading").Lock()
    # identifier triples per manifest (commit conflict checks + manifest
    # compaction cleanliness) — far lighter than entry objects, so the
    # bound is 4x the entry cache's; immutable files, epoch eviction
    _IDENT_CACHE: dict[str, tuple[set, set]] = {}

    def __init__(self, table_path: str):
        from ..fileio import for_path
        self.table_path = table_path
        self.dir = os.path.join(table_path, "manifest")
        self.io = for_path(table_path)

    # --- manifest files ---

    def write_manifests(self, entries: list[ManifestEntry]) -> list[str]:
        """Write entries as one or more rolled parquet manifests."""
        return [self._write_one(entries[i:i + MANIFEST_ROLL_COUNT])
                for i in range(0, len(entries), MANIFEST_ROLL_COUNT)]

    def write_manifest(self, entries: list[ManifestEntry]) -> str:
        names = self.write_manifests(entries)
        assert len(names) == 1, "entry list exceeds one manifest; use write_manifests"
        return names[0]

    def _write_one(self, entries: list[ManifestEntry]) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        name = f"manifest-{new_uuid()}.parquet"
        cols: dict[str, list] = {c: [] for c, _t in _MANIFEST_COLS}
        for e in entries:
            j = e.file.to_json()
            cols["kind"].append(e.kind)
            cols["partition"].append(dumps(e.partition))
            cols["bucket"].append(e.bucket)
            for k in ("fileName", "fileSize", "rowCount", "minSequenceNumber",
                      "maxSequenceNumber", "schemaId", "level",
                      "creationTimeMillis", "deleteRowCount", "totalBuckets"):
                cols[k].append(j[k])
            cols["partitionInData"].append(1 if j["partitionInData"] else 0)
            cols["stats"].append(dumps(j["stats"]))
            cols["rowKindCounts"].append(dumps(j["rowKindCounts"]))
            cols["fileIndex"].append(dumps(j["fileIndex"]))
        schema = pa.schema([
            pa.field(c, pa.string() if t != "int" else pa.int64())
            for c, t in _MANIFEST_COLS])
        tbl = pa.table({c: pa.array(v, type=pa.string() if t != "int"
                                    else pa.int64())
                        for (c, t), v in zip(_MANIFEST_COLS, cols.values())},
                       schema=schema)
        path = os.path.join(self.dir, name)
        # manifests are content-addressed (uuid names): no CAS needed, only
        # no-partial-visibility — write_overwrite gives that on every
        # backend (tmp+replace locally, atomic PUT on object stores)
        buf = pa.BufferOutputStream()
        pq.write_table(tbl, buf, compression="zstd")
        self.io.write_overwrite(path, buf.getvalue().to_pybytes())
        return name

    def read_manifest(self, name: str) -> list[ManifestEntry]:
        path = os.path.join(self.dir, name)
        cached = ManifestStore._CACHE.get(path)
        if cached is not None:
            return cached
        out = self._read_uncached(name, path)
        cache = ManifestStore._CACHE
        with ManifestStore._CACHE_GUARD:
            if (sum(map(len, cache.values())) + len(out)
                    > self._CACHE_MAX_ENTRIES):
                cache.clear()  # simple epoch eviction; refill is one plan away
            cache[path] = out
        return out

    def _read_uncached(self, name: str, path: str) -> list[ManifestEntry]:
        if name.endswith(".json"):  # legacy manifests stay readable
            return [ManifestEntry.from_json(j) for j in read_json(path)]
        import pyarrow.parquet as pq

        with self.io.open_input(path) as f:
            tbl = pq.read_table(f)
        d = tbl.to_pydict()
        # manifests written before the rescale-bucket column lack it
        tb = d.get("totalBuckets", [None] * tbl.num_rows)
        part_cache: dict = {}
        return [_row_entry(d, tb, i, part_cache)
                for i in range(tbl.num_rows)]

    def read_ident_sets(self, names: list[str]) -> dict[str, tuple[set, set]]:
        """Per-manifest (ADD idents, DELETE idents) as (partition_json,
        bucket, fileName) triples, read COLUMNAR — no entry objects, no
        JSON parsing. The raw partition string is identity here because
        every DELETE producer builds its entries from READ entries (the
        dict — and therefore its serialization order — round-trips);
        consumers verify dels ⊆ adds before trusting the string algebra
        and fall back to canonical identifiers otherwise."""
        import pyarrow.parquet as pq
        out: dict[str, tuple[set, set]] = {}
        for name in names:
            path = os.path.join(self.dir, name)
            hit = ManifestStore._IDENT_CACHE.get(path)
            if hit is not None:
                out[name] = hit
                continue
            adds: set = set()
            dels: set = set()
            if name.endswith(".json"):  # legacy: parse fully
                for e in (ManifestEntry.from_json(j) for j in read_json(path)):
                    tgt = adds if e.kind == ENTRY_ADD else dels
                    tgt.add((dumps(e.partition), e.bucket, e.file.file_name))
            elif (cached := ManifestStore._CACHE.get(path)) is not None:
                for e in cached:
                    tgt = adds if e.kind == ENTRY_ADD else dels
                    tgt.add((dumps(e.partition), e.bucket, e.file.file_name))
            else:
                with self.io.open_input(path) as f:
                    t = pq.read_table(f, columns=["kind", "partition",
                                                  "bucket", "fileName"])
                d = t.to_pydict()
                for k, p, b, fn in zip(d["kind"], d["partition"],
                                       d["bucket"], d["fileName"]):
                    (adds if k == ENTRY_ADD else dels).add((p, b, fn))
            out[name] = (adds, dels)
            cache = ManifestStore._IDENT_CACHE
            with ManifestStore._CACHE_GUARD:
                if (sum(len(a) + len(d) for a, d in cache.values())
                        + len(adds) + len(dels)
                        > self._CACHE_MAX_ENTRIES * 4):
                    cache.clear()  # epoch eviction, same policy as _CACHE
                cache[path] = (adds, dels)
        return out

    def read_entries_filtered(self, names: list[str], wanted: set,
                              delete_free: bool = False
                              ) -> list[ManifestEntry]:
        """Entries whose (raw partition JSON, bucket) is in `wanted`,
        object-parsing ONLY matching rows — the write-time compaction
        hook's per-commit cost at 10^6 entries becomes O(touched files),
        not a full manifest parse. Raw-string partition identity is
        verified before being trusted (same dels ⊆ adds check the commit
        conflict path uses, served from _IDENT_CACHE): a foreign writer
        re-serializing partition JSON could otherwise split an ADD/DELETE
        pair across the filter, and a dead file surviving the caller's
        live_entries() merge would be PICKED for compaction, whose
        rewrite-delete then raises ConflictError on a valid write. On
        mismatch, fall back to a full parse + canonical-identifier
        filter (correct for any serialization). Pass ``delete_free=True``
        when the manifest-list counts prove the chain holds no DELETE
        rows at all (dels ⊆ adds trivially) — skips the ident read."""
        if not delete_free:
            adds, dels = self.read_ident_strings(names)
            if not dels <= adds:
                want_c = {(tuple(sorted(loads(p).items())), b)
                          for p, b in wanted}
                return [e for name in names
                        for e in self.read_manifest(name)
                        if (tuple(sorted(e.partition.items())), e.bucket)
                        in want_c]
        out: list[ManifestEntry] = []
        for name in names:
            path = os.path.join(self.dir, name)
            cached = ManifestStore._CACHE.get(path)
            if cached is not None:
                memo: dict = {}
                for e in cached:
                    ps = memo.get(id(e.partition))
                    if ps is None:
                        ps = memo[id(e.partition)] = dumps(e.partition)
                    if (ps, e.bucket) in wanted:
                        out.append(e)
                continue
            if name.endswith(".json"):
                # legacy manifests parse once and filter directly (a
                # _pair_set pre-pass would be the same full JSON parse)
                for e in (ManifestEntry.from_json(j) for j in read_json(path)):
                    if (dumps(e.partition), e.bucket) in wanted:
                        out.append(e)
                continue
            if not (wanted & self._pair_set(name, path)):
                continue  # proven disjoint from a 2-column read (cached)
            import pyarrow.parquet as pq
            with self.io.open_input(path) as f:
                tbl = pq.read_table(f)
            d = tbl.to_pydict()
            tb = d.get("totalBuckets", [None] * tbl.num_rows)
            part_cache: dict = {}
            for i in range(tbl.num_rows):
                if (d["partition"][i], d["bucket"][i]) in wanted:
                    out.append(_row_entry(d, tb, i, part_cache))
        return out

    # distinct (partition_json, bucket) pairs per manifest — the filtered
    # reader's skip index (a manifest holds few distinct buckets relative
    # to its entries, but partition-heavy tables can approach one pair per
    # entry, so the same guarded epoch eviction as _IDENT_CACHE applies —
    # manifests superseded by compaction would otherwise pin memory on a
    # long-lived driver forever)
    _PB_CACHE: dict[str, set] = {}

    def _pair_set(self, name: str, path: str) -> set:
        hit = ManifestStore._PB_CACHE.get(path)
        if hit is not None:
            return hit
        if name.endswith(".json"):
            pairs = {(dumps(e.partition), e.bucket)
                     for e in (ManifestEntry.from_json(j)
                               for j in read_json(path))}
        else:
            import pyarrow.parquet as pq
            with self.io.open_input(path) as f:
                t = pq.read_table(f, columns=["partition", "bucket"])
            d = t.to_pydict()
            pairs = set(zip(d["partition"], d["bucket"]))
        with ManifestStore._CACHE_GUARD:
            cache = ManifestStore._PB_CACHE
            if (sum(map(len, cache.values())) + len(pairs)
                    > self._CACHE_MAX_ENTRIES * 4):
                cache.clear()  # epoch eviction, same policy as _IDENT_CACHE
            cache[path] = pairs
        return pairs

    # columnar (ADD rows, ADD bytes) per manifest — the bytes/row roll
    # estimate's input. Values are 2 ints, so the bound is on KEY count
    # (one per manifest ever read — compaction superseding manifests
    # would otherwise grow this without limit on a long-lived driver)
    _TOTALS_CACHE: dict[str, tuple[int, int]] = {}
    _TOTALS_CACHE_MAX_KEYS = 100_000

    def read_add_totals(self, names: list[str]) -> tuple[int, int]:
        """(sum rowCount, sum fileSize) over ADD entries — columnar."""
        import pyarrow.parquet as pq
        rows = size = 0
        def _put(path, val):
            with ManifestStore._CACHE_GUARD:
                cache = ManifestStore._TOTALS_CACHE
                if len(cache) >= self._TOTALS_CACHE_MAX_KEYS:
                    cache.clear()  # epoch eviction (values are 2 ints/key)
                cache[path] = val
            return val

        for name in names:
            path = os.path.join(self.dir, name)
            hit = ManifestStore._TOTALS_CACHE.get(path)
            if hit is None and (es := ManifestStore._CACHE.get(path)) is not None:
                hit = _put(path, (
                    sum(e.file.row_count for e in es if e.kind == ENTRY_ADD),
                    sum(e.file.file_size for e in es if e.kind == ENTRY_ADD)))
            if hit is None:
                if name.endswith(".json"):
                    es = [ManifestEntry.from_json(j) for j in read_json(path)]
                    r = sum(e.file.row_count for e in es
                            if e.kind == ENTRY_ADD)
                    s = sum(e.file.file_size for e in es
                            if e.kind == ENTRY_ADD)
                else:
                    with self.io.open_input(path) as f:
                        t = pq.read_table(f, columns=["kind", "rowCount",
                                                      "fileSize"])
                    d = t.to_pydict()
                    r = sum(rc for k, rc in zip(d["kind"], d["rowCount"])
                            if k == ENTRY_ADD)
                    s = sum(fs for k, fs in zip(d["kind"], d["fileSize"])
                            if k == ENTRY_ADD)
                hit = _put(path, (r, s))
            rows += hit[0]
            size += hit[1]
        return rows, size

    def read_file_names(self, name: str) -> list[str]:
        """Just the fileName column — snapshot expiry and orphan sweeps
        collect referenced names over every retained snapshot's
        manifests, where a full object parse at 10^6 entries is ~20x
        the one-column read. Entry/ident caches are consulted first."""
        path = os.path.join(self.dir, name)
        cached = ManifestStore._CACHE.get(path)
        if cached is not None:
            return [e.file.file_name for e in cached]
        ids = ManifestStore._IDENT_CACHE.get(path)
        if ids is not None:
            return [fn for _p, _b, fn in ids[0] | ids[1]]
        if name.endswith(".json"):
            return [j["file"]["fileName"] for j in read_json(path)]
        import pyarrow.parquet as pq
        with self.io.open_input(path) as f:
            t = pq.read_table(f, columns=["fileName"])
        return t.column("fileName").to_pylist()

    def read_ident_strings(self, names: list[str]) -> tuple[set, set]:
        """Chain-wide (ADD idents, DELETE idents) — union of
        read_ident_sets."""
        adds: set = set()
        dels: set = set()
        for a, d in self.read_ident_sets(names).values():
            adds |= a
            dels |= d
        return adds, dels

    # --- manifest lists ---
    # List items are either plain names (legacy) or
    # {"name", "numAdded", "numDeleted"} dicts — the reference's
    # ManifestFileMeta records the same counts (ManifestFileMeta.java
    # numAddedFiles/numDeletedFiles) precisely so manifest compaction can
    # keep clean full manifests WITHOUT reading them.

    def write_manifest_list(self, manifests: list) -> str:
        items = []
        for m in manifests:
            if isinstance(m, (str, dict)):
                items.append(m)
            else:  # (name, num_added, num_deleted)
                items.append({"name": m[0], "numAdded": m[1],
                              "numDeleted": m[2]})
        name = f"manifest-list-{new_uuid()}.json"
        ok = atomic_write_json(os.path.join(self.dir, name), items)
        assert ok, "uuid collision writing manifest list"
        return name

    def read_manifest_list(self, name: str | None) -> list[str]:
        return [m["name"] for m in self.read_manifest_list_meta(name)]

    def read_manifest_list_meta(self, name: str | None) -> list[dict]:
        """Items as dicts; legacy name-only entries carry None counts."""
        if not name:
            return []
        out = []
        for m in read_json(os.path.join(self.dir, name)):
            if isinstance(m, str):
                out.append({"name": m, "numAdded": None, "numDeleted": None})
            else:
                out.append(m)
        return out

    def write_manifests_meta(self, entries: list[ManifestEntry]) -> list[dict]:
        """Rolled write returning list items WITH per-manifest counts."""
        out = []
        for i in range(0, len(entries), MANIFEST_ROLL_COUNT):
            chunk = entries[i:i + MANIFEST_ROLL_COUNT]
            dels = sum(1 for e in chunk if e.kind == ENTRY_DELETE)
            out.append({"name": self._write_one(chunk),
                        "numAdded": len(chunk) - dels, "numDeleted": dels})
        return out

    def read_all_entries(self, manifest_list: str | None) -> list[ManifestEntry]:
        out = []
        for m in self.read_manifest_list(manifest_list):
            out.extend(self.read_manifest(m))
        return out
