"""Maintenance jobs: snapshot/partition expiration, orphan files.

Reference: table/ExpireSnapshotsImpl.java (+ retention options
CoreOptions.java:229-244), operation/PartitionExpire.java:45,
operation/OrphanFilesClean.java. All driver-side metadata arithmetic +
O(#deleted files) unlinks — no data reads.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

from .metadata.manifest import ManifestEntry
from .metadata.commit import CommitMessage
from .types import COMMIT_OVERWRITE, ENTRY_DELETE


def _referenced_by(table, snapshots) -> tuple[set, set]:
    """(manifest names, data file names) referenced by the given snapshots.
    File names come from a one-column read (read_file_names) — snapshot
    chains share most manifests, and only the NAMES matter here, so the
    per-manifest work is de-duplicated and columnar."""
    manifests, files = set(), set()
    for s in snapshots:
        for ml in (s.base_manifest_list, s.delta_manifest_list,
                   s.changelog_manifest_list):
            if not ml:
                continue
            manifests.add(ml)
            for m in table.manifests.read_manifest_list(ml):
                if m in manifests:
                    continue  # shared across snapshots: names already taken
                manifests.add(m)
                files.update(table.manifests.read_file_names(m))
    return manifests, files


def expire_snapshots(table, retain_max=None, retain_min=None,
                     older_than_ms=None, limit=None):
    """Delete expired snapshots + files referenced only by them. Respects
    consumer progress (ConsumerManager) and never touches tagged snapshots'
    files (tags hold full snapshot copies). `limit` caps deletions per
    run (snapshot.expire.limit — the commit-time sweep's latency bound;
    the next commit continues where this one stopped)."""
    opts = table.options
    retain_max = retain_max if retain_max is not None else opts.snapshot_num_retained_max
    retain_min = retain_min if retain_min is not None else opts.snapshot_num_retained_min
    cutoff = (older_than_ms if older_than_ms is not None
              else int(time.time() * 1000) - opts.snapshot_time_retained_ms)

    # cheap gate first: this runs on EVERY commit (TableCommitImpl
    # parity), so the common nothing-to-do case must cost one dir
    # listing plus ONE snapshot read, not a full history parse
    ids = table.snapshots._ids()
    n = len(ids)
    if n <= retain_min:
        return 0
    expire_stale_consumers(table)
    min_consumer = min(table.list_consumers().values(), default=None)

    keep_from = n - retain_min  # index of first definitely-kept
    expire = []
    for i, sid in enumerate(ids):
        if i >= keep_from:
            break
        if n - len(expire) <= retain_min:
            break
        s = table.snapshots.read(sid)
        # too young AND within retain_max → keep
        if s.time_millis >= cutoff and n - i <= retain_max:
            break
        if min_consumer is not None and s.id >= min_consumer:
            break
        expire.append(s)
        if limit is not None and len(expire) >= limit:
            break
    if not expire:
        return 0

    keep = [table.snapshots.read(sid) for sid in ids
            if sid > expire[-1].id]
    tag_snaps = [table.tag_snapshot(t) for t in table.list_tags()]
    keep_manifests, keep_files = _referenced_by(table, keep + tag_snaps)
    exp_manifests, exp_files = _referenced_by(table, expire)

    for f in exp_files - keep_files:
        table.io.delete(os.path.join(table.path, f))
    for m in exp_manifests - keep_manifests:
        table.io.delete(os.path.join(table.path, "manifest", m))
    for s in expire:
        table.snapshots.delete(s.id)
    return len(expire)


def expire_stale_consumers(table) -> int:
    """Delete consumer progress files whose last write is older than
    `consumer.expiration-time` (ConsumerManager.expire :83 — judged by
    file modification time): a crashed reader must not pin snapshot
    history forever. No option set = consumers never expire (reference
    default). Returns how many were dropped."""
    ttl = table.options.consumer_expiration_time_ms
    if not ttl:
        return 0
    d = os.path.join(table.path, "consumer")
    cutoff = time.time() - ttl / 1000.0
    dropped = 0
    for n in table.io.list_names(d):
        if not n.startswith("consumer-"):
            continue
        p = os.path.join(d, n)
        try:
            if table.io.mtime(p) < cutoff:
                table.io.delete(p)
                dropped += 1
        except OSError:  # concurrently refreshed/removed
            continue
    return dropped


def partition_time(partition: dict, pattern: str | None = None,
                   formatter: str | None = None) -> datetime | None:
    """Extract the time a partition encodes (PartitionTimeExtractor
    parity): with a pattern like ``$year-$month-$day`` each ``$key``
    substitutes that partition column's value; without one, the FIRST
    partition value is the timestamp text (the reference's default —
    values that are already date/datetime objects short-circuit). A
    `formatter` is a strptime pattern; the default accepts
    ``y-M-d[ H:m:s]`` like the reference's lenient formatter. None =
    unparseable (caller skips the partition, as the reference logs)."""
    try:
        if pattern is None:
            v = next(iter(partition.values()))
            if isinstance(v, datetime):
                return v
            if hasattr(v, "isoformat"):  # date
                return datetime(v.year, v.month, v.day)
            text = str(v)
        else:
            text = pattern
            for k, v in partition.items():
                sv = v.isoformat(sep=" ") if isinstance(v, datetime) else \
                    str(v)
                text = text.replace(f"${k}", sv)
        if formatter is not None:
            return datetime.strptime(text, formatter)
        for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
            try:
                return datetime.strptime(text, fmt)
            except ValueError:
                continue
        return datetime.fromisoformat(text)
    except (ValueError, StopIteration):
        return None


def expire_partitions(table, expiration_time_ms=None, timestamp_formatter=None,
                      timestamp_pattern=None):
    """Drop partitions whose extracted time is older than the TTL
    (PartitionExpire.java:45, option CoreOptions.java:684; time comes
    from PartitionTimeExtractor — first value, or a $key pattern over
    several columns). Commits an OVERWRITE snapshot deleting their
    files."""
    opts = table.options
    ttl = expiration_time_ms or opts.partition_expiration_time_ms
    if not ttl:
        return None
    fmt = timestamp_formatter or opts.partition_timestamp_formatter
    pattern = timestamp_pattern or opts.partition_timestamp_pattern
    if not table.schema.partition_keys:
        return None
    cutoff = datetime.now().timestamp() * 1000 - ttl

    victims = []
    times: dict = {}  # memo per distinct partition
    for e in table.entries_at():
        key = tuple(sorted((k, str(v)) for k, v in e.partition.items()))
        if key not in times:
            dt = partition_time(e.partition, pattern, fmt)
            times[key] = dt.timestamp() * 1000 if dt is not None else None
        ts = times[key]
        if ts is not None and ts < cutoff:
            victims.append(e)
    if not victims:
        return None
    msg = CommitMessage(delete=[ManifestEntry(ENTRY_DELETE, e.partition,
                                              e.bucket, e.file) for e in victims])
    snap = table.commit.commit(msg, schema_id=table.schema.id,
                               kind=COMMIT_OVERWRITE)
    dropped = {tuple(sorted(e.partition.items())) for e in victims}
    clear_partition_done(table, *[dict(t) for t in dropped])
    return snap


# ---------------------------------------------------------------- partition
# done markers (success-file mode): downstream schedulers poll these
# (paimon-core/.../partition/actions/SuccessFileMarkDoneAction.java,
# MarkPartitionDoneProcedure.java:46)
SUCCESS_FILE = "_SUCCESS"


def _partition_dir(table, spec: dict) -> str:
    """Relative directory of one FULLY-bound partition spec."""
    from .write import _dir_value
    keys = table.schema.partition_keys
    if not keys:
        raise ValueError("table is not partitioned")
    missing = [k for k in keys if k not in spec]
    extra = sorted(set(spec) - set(keys))
    if missing or extra:
        raise ValueError(f"partition spec must bind exactly {keys}; "
                         f"missing={missing} unknown={extra}")
    return "/".join(f"{k}={_dir_value(spec[k])}" for k in keys)


def mark_partition_done(table, *specs: dict) -> list[str]:
    """Write a `_SUCCESS` marker under each partition's directory
    (SuccessFile shape: creation + modification time). Idempotent:
    re-marking keeps creationTime and refreshes modificationTime, like
    the reference's SuccessFile.safelyFromPath+refresh cycle. Returns
    the marker paths relative to the table root."""
    from .metadata.util import dumps, loads
    out = []
    now = int(time.time() * 1000)
    for spec in specs:
        rel = f"{_partition_dir(table, spec)}/{SUCCESS_FILE}"
        path = os.path.join(table.path, rel)
        created = now
        # creationTime resets ONLY on a genuinely missing marker; a read
        # error on an existing one propagates (transient IO must not
        # silently restart the partition's done-age), while a corrupt
        # JSON body (foreign non-atomic writer) recovers by rewrite
        if table.io.exists(path):
            with table.io.open_input(path) as f:
                raw = f.read().decode()
            try:
                created = loads(raw).get("creationTime", now)
            except ValueError:
                pass
        # write_overwrite is atomic on every backend (tmp+replace locally,
        # single PUT on object stores) — no partial marker is ever visible
        table.io.write_overwrite(path, dumps(
            {"creationTime": created, "modificationTime": now}).encode())
        out.append(rel)
    return out


def partition_done(table, spec: dict) -> bool:
    path = os.path.join(table.path, _partition_dir(table, spec), SUCCESS_FILE)
    try:
        with table.io.open_input(path):
            return True
    except Exception:  # noqa: BLE001 — missing marker
        return False


def clear_partition_done(table, *partitions: dict) -> None:
    """Remove markers (used by drop/expire so a re-created partition never
    looks done from a stale marker)."""
    for p in partitions:
        try:
            rel = _partition_dir(table, p)
        except ValueError:
            continue
        table.io.delete(os.path.join(table.path, rel, SUCCESS_FILE))


def remove_orphan_files(table, older_than_ms=None, dry_run=False):
    """Delete data/manifest files referenced by no snapshot/tag/branch
    (RemoveOrphanFilesProcedure; default 1-day safety margin like the
    reference, so in-flight commits are never clobbered)."""
    margin = older_than_ms if older_than_ms is not None else 24 * 3600 * 1000
    cutoff = time.time() - margin / 1000

    snaps = table.snapshots.list_all()
    tag_snaps = [table.tag_snapshot(t) for t in table.list_tags()]
    manifests, files = _referenced_by(table, snaps + tag_snaps)

    # index / deletion-vector artifacts are referenced through their own
    # per-snapshot JSON manifests, NOT through data manifests — without
    # walking these, live index/dv parquet under index/ and dv/ would
    # look unreferenced and be deleted (data corruption for dynamic-bucket
    # and DV tables). Index compaction (write.py) also makes superseded
    # index dirs legitimately orphaned once no snapshot references them.
    from .metadata.util import read_json
    idx_manifests, idx_dirs = set(), set()
    dv_manifests, dv_dirs = set(), set()
    for s in snaps + tag_snaps:
        if s.index_manifest:
            idx_manifests.add(s.index_manifest)
            try:
                idx_dirs.update(read_json(
                    os.path.join(table.path, "index", s.index_manifest)))
            except FileNotFoundError:
                pass
        if s.dv_manifest:
            dv_manifests.add(s.dv_manifest)
            try:
                dv_dirs.update(read_json(
                    os.path.join(table.path, "dv", s.dv_manifest))["dirs"])
            except FileNotFoundError:
                pass

    orphans = []
    io = table.io
    for full, _sz in io.walk_files(table.path):
        rel = full[len(table.path):].lstrip("/")
        parts = rel.split("/")
        top = parts[0]
        if top in ("schema", "snapshot", "tag", "branch",
                   "consumer", ".staging"):
            continue
        n = rel.rsplit("/", 1)[-1]
        if top == "manifest":
            if n not in manifests and io.mtime(full) < cutoff:
                orphans.append(full)
        elif top in ("index", "dv"):
            live_manifests = idx_manifests if top == "index" else dv_manifests
            live_dirs = idx_dirs if top == "index" else dv_dirs
            if len(parts) == 2 and n.endswith(".json"):
                referenced = n in live_manifests
            else:
                referenced = len(parts) >= 3 and parts[1] in live_dirs
            if not referenced and io.mtime(full) < cutoff:
                orphans.append(full)
        elif n.endswith((".parquet", ".orc", ".avro")):
            if rel not in files and io.mtime(full) < cutoff:
                orphans.append(full)
    if not dry_run:
        for p in orphans:
            io.delete(p)
    return orphans


# ----------------------------------------------------------------------
def auto_create_tags(table, snapshot):
    """tag.automatic-creation (TagAutoCreation.java:48): create a period tag
    per commit from the watermark or processing time; retain at most
    tag.num-retained-max automatic tags."""
    opts = table.options.raw
    mode = opts.get("tag.automatic-creation", "none")
    # time-based retention is independent of auto-creation: it must run on
    # every commit in EVERY mode — including watermark-mode commits that
    # carry no watermark — or TTL tags never age out on such tables
    expire_tags_by_time(table)
    if mode == "none":
        return None
    if mode == "watermark":
        base_ms = snapshot.watermark
        if base_ms is None:
            return None
    else:  # process-time
        base_ms = snapshot.time_millis
    delay_ms = 0
    period = opts.get("tag.creation-period", "daily")
    dt = datetime.fromtimestamp((base_ms - delay_ms) / 1000)
    if period == "hourly":
        name = dt.strftime("%Y-%m-%d %H")
    elif period == "daily":
        name = dt.strftime("%Y-%m-%d")
    else:  # two-hours etc. → treat as hourly buckets of 2
        name = dt.strftime("%Y-%m-%d %H")
    if name in table.list_tags():
        return None
    table.create_tag(name, snapshot_id=snapshot.id)
    retained = int(opts.get("tag.num-retained-max", "0") or 0)
    if retained > 0:
        tags = table.list_tags()
        for old in tags[:-retained]:
            table.delete_tag(old)
    expire_tags_by_time(table)
    return name


def expire_tags_by_time(table, now_ms: int | None = None) -> list[str]:
    """Time-based tag expiry (manage-tags.md; TagTimeExpire): a tag ages
    out when its CREATION time (recorded in the tag file; legacy tags fall
    back to the tagged snapshot's commit time) passes the tag's own
    time_retained, else the table's tag.default-time-retained. Runs from
    the post-commit tag hook regardless of auto-creation mode; `now_ms`
    is injectable for tests. Returns the deleted tag names.

    Control-plane cost: with no table default, only tags carrying a
    per-tag TTL marker (`tag/ttl-<name>`, written by create_tag) have
    their snapshot-sized tag file read — a table with thousands of plain
    tags pays one directory listing per commit, not O(tags) file reads."""
    from .metadata.util import read_json
    from .options import parse_duration_ms
    default = table.options.raw.get("tag.default-time-retained")
    default_ms = parse_duration_ms(default) if default else None
    names = table.list_tags()
    if default_ms is None:
        ttl_marked = {n[len("ttl-"):]
                      for n in table.io.list_names(
                          os.path.join(table.path, "tag"))
                      if n.startswith("ttl-")}
        names = [n for n in names if n in ttl_marked]
    if not names:
        return []
    now = now_ms if now_ms is not None else int(time.time() * 1000)
    out = []
    for name in names:
        j = read_json(os.path.join(table.path, "tag", f"tag-{name}"))
        ttl = j.get("tagTimeRetained", default_ms)
        if ttl is None:
            continue
        born = j.get("tagCreateTime", j.get("timeMillis", 0))
        if born + ttl < now:
            table.delete_tag(name)
            out.append(name)
    return out


def expire_changelogs(table, older_than_ms=None, retain_max=None):
    """Delete changelog files of snapshots beyond the changelog retention
    (ExpireChangelogImpl): snapshot JSONs stay (time travel intact), but
    their changelog manifests + files are unlinked, so changelog reads
    beyond the retention fail — matching the reference's contract."""
    snaps = table.snapshots.list_all()
    cutoff = older_than_ms if older_than_ms is not None else int(time.time() * 1000)
    victims = [s for s in snaps
               if s.changelog_manifest_list and s.time_millis < cutoff]
    if retain_max is not None and len(victims) > retain_max:
        victims = victims[:len(victims) - retain_max]
    removed = 0
    # never delete a changelog data file that doubles as a live data file
    # (changelog-producer=input registers the SAME files in both manifests)
    live = {e.file.file_name for e in table.entries_at()}
    for s in victims:
        for m in table.manifests.read_manifest_list(s.changelog_manifest_list):
            for e in table.manifests.read_manifest(m):
                if e.file.file_name in live:
                    continue
                table.io.delete(os.path.join(table.path, e.file.file_name))
            table.io.delete(os.path.join(table.path, "manifest", m))
        removed += 1
    return removed


def drop_partition(table, *specs: dict):
    """ALTER TABLE ... DROP PARTITION equivalent
    (PaimonPartitionManagement.scala:37-78 dropPartitions): commit one
    OVERWRITE snapshot deleting every file whose partition matches any given
    spec (a spec may bind a prefix of the partition keys). Returns the
    snapshot, or None when nothing matched."""
    if not specs:
        return None
    pt_keys = set(table.schema.partition_keys)
    for spec in specs:
        bad = set(spec) - pt_keys
        if bad:
            raise ValueError(f"not partition keys: {sorted(bad)}")

    def matches(partition):
        return any(all(str(partition.get(k)) == str(v) for k, v in spec.items())
                   for spec in specs)

    victims = [e for e in table.entries_at() if matches(e.partition)]
    if not victims:
        # no files, but a done-marker on an already-empty partition must
        # not survive the drop and flag a later re-created partition as
        # done (fully-bound specs only; clear_partition_done skips prefix
        # specs it cannot resolve to a dir)
        clear_partition_done(table, *specs)
        return None
    msg = CommitMessage(delete=[ManifestEntry(ENTRY_DELETE, e.partition,
                                              e.bucket, e.file) for e in victims])
    # commit FIRST: a failed/conflicted drop must leave the partition's
    # marker intact (the data survived, so "done" still holds)
    snap = table.commit.commit(msg, schema_id=table.schema.id,
                               kind=COMMIT_OVERWRITE)
    dropped = {tuple(sorted(e.partition.items())) for e in victims}
    clear_partition_done(table, *specs, *[dict(t) for t in dropped])
    return snap


def clone_table(spark, src_table, dst_catalog, dst_ident: str,
                parallelism: int | None = None) -> dict:
    """Clone a table for data migration (clone-tables.md; the reference's
    Flink clone action, paimon-flink/.../clone/CloneAction): only files
    referenced by the LATEST snapshot travel — live data files, the index
    and deletion-vector manifests + their files, the statistics file, and
    the full schema history (old data files cite their schemaId). The
    target starts at snapshot-1 APPEND listing the same entries; tags,
    branches, consumers and older snapshots are not cloned. The file copy
    is one distributed Spark job over the file list (the reference
    parallelizes the same way); immutable data files hard-link when source
    and target share a filesystem."""
    from .metadata.commit import CommitMessage
    from .types import COMMIT_APPEND

    snap = src_table.snapshots.latest()
    entries = src_table.entries_at(snap) if snap is not None else []

    dst = dst_catalog.create_table(
        dst_ident, src_table.schema.spark_schema(),
        partition_keys=src_table.schema.partition_keys or None,
        primary_keys=src_table.schema.primary_keys or None,
        options=dict(src_table.schema.options))
    # replace the fresh schema-0 with the source's FULL history: live data
    # files written under older schemas resolve their schemaId at read
    src_io, dst_io = src_table.io, dst.io
    for name in src_io.list_names(os.path.join(src_table.path, "schema")):
        src_io.copy(os.path.join(src_table.path, "schema", name),
                    os.path.join(dst.path, "schema", name))
    if snap is None:
        return {"table": dst, "files": 0, "bytes": 0}

    # table-relative paths of every latest-snapshot-referenced file — the
    # job ships ONLY these strings (roots travel once in the closure), so
    # the driver-side list stays one short string per file at 10^6 files
    rels = [e.file.file_name for e in entries]

    def _add_tree(rel_dir_names, subdir):
        for name in rel_dir_names:
            p = os.path.join(src_table.path, subdir, name)
            if src_io.is_dir(p):
                for f, _sz in src_io.walk_files(p):
                    rels.append(f[len(src_table.path):].lstrip("/"))
            else:
                rels.append(f"{subdir}/{name}")

    if snap.index_manifest:
        _add_tree([snap.index_manifest], "index")
        _add_tree(src_table.index.read_files(snap), "index")
    if snap.dv_manifest:
        _add_tree([snap.dv_manifest], "dv")
        _add_tree(src_table.dv.read_manifest(snap)["dirs"], "dv")
    if snap.statistics:
        _add_tree([snap.statistics], "statistics")

    n_bytes = sum(e.file.file_size for e in entries)
    par = max(1, min(len(rels), parallelism
                     or spark.sparkContext.defaultParallelism))
    src_root, dst_root = src_table.path, dst.path

    def _copy_part(it):
        import os as _os
        from incubator_paimon_spark.fileio import for_path
        io = for_path(dst_root)
        n = 0
        for rel in it:
            io.link_or_copy(_os.path.join(src_root, rel),
                            _os.path.join(dst_root, rel))
            n += 1
        yield n

    copied = sum(spark.sparkContext.parallelize(rels, par)
                 .mapPartitions(_copy_part).collect())
    assert copied == len(rels), f"clone copied {copied}/{len(rels)} files"

    # re-open from the path: drops the cached schema from the fresh create
    # and sidesteps catalog wrappers (PrivilegedCatalog returns a proxy
    # whose constructor is not path-only)
    from .table import Table
    dst = Table(dst.path)
    dst.commit.commit(
        CommitMessage(add=list(entries)),
        schema_id=snap.schema_id,
        kind=COMMIT_APPEND,
        next_sequence_number=snap.next_sequence_number,
        index_manifest=snap.index_manifest,
        dv_manifest=snap.dv_manifest,
        statistics=snap.statistics,
    )
    import contextlib

    from . import lineage
    with contextlib.suppress(Exception):  # lineage is advisory
        lineage.record("clone", sources=[(src_table, snap.id)],
                       sinks=[(dst, 1)])
    return {"table": dst, "files": len(rels), "bytes": n_bytes}
