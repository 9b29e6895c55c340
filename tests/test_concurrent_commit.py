"""Real-race commit tests: N threads CAS-committing to one table. The
protocol (FileStoreCommitImpl parity: write manifests → CAS snapshot-N+1 →
on loss, re-read latest and retry) must linearize every append with no lost
snapshots, no duplicate ids, and every file surviving into the final state.
Pure metadata layer — no SparkSession needed."""

import tempfile
from concurrent.futures import ThreadPoolExecutor

from incubator_paimon_spark.metadata.commit import (CommitMessage,
                                                    ConflictError,
                                                    FileStoreCommit)
from incubator_paimon_spark.metadata.manifest import (DataFileMeta,
                                                      ManifestEntry,
                                                      live_entries)
from incubator_paimon_spark.types import ENTRY_ADD, ENTRY_DELETE


def _add(name):
    return ManifestEntry(ENTRY_ADD, {}, 0, DataFileMeta(
        file_name=f"bucket-0/{name}.parquet", file_size=10, row_count=1,
        schema_id=0, stats={}, creation_time_millis=0))


def test_concurrent_appends_all_land():
    d = tempfile.mkdtemp(prefix="pmn_race_")
    N, PER = 8, 5

    def writer(w):
        c = FileStoreCommit(d, commit_user=f"w{w}")
        out = []
        for i in range(PER):
            snap = c.commit(CommitMessage(add=[_add(f"w{w}-{i}")]), schema_id=0)
            out.append(snap.id)
        return out

    with ThreadPoolExecutor(N) as ex:
        ids = [i for f in [ex.submit(writer, w) for w in range(N)]
               for i in f.result()]

    # every commit landed under a unique, gap-free snapshot id
    assert sorted(ids) == list(range(1, N * PER + 1))
    c = FileStoreCommit(d)
    final = c.snapshots.latest()
    assert final.id == N * PER
    names = {e.file.file_name
             for e in live_entries(
                 c.manifests.read_all_entries(final.base_manifest_list)
                 + c.manifests.read_all_entries(final.delta_manifest_list))}
    assert len(names) == N * PER  # no append lost to a CAS race


def test_concurrent_delete_of_same_file_conflicts():
    """Two racing commits retracting the SAME file: exactly one must win,
    the other must raise (noConflictsOrFail) — never both 'succeed'."""
    d = tempfile.mkdtemp(prefix="pmn_race2_")
    c0 = FileStoreCommit(d)
    c0.commit(CommitMessage(add=[_add("shared")]), schema_id=0)
    victim = c0.manifests.read_all_entries(
        c0.snapshots.latest().delta_manifest_list)[0]
    retract = ManifestEntry(ENTRY_DELETE, {}, 0, victim.file)

    results = []

    def deleter(w):
        c = FileStoreCommit(d, commit_user=f"d{w}")
        try:
            c.commit(CommitMessage(add=[_add(f"new{w}")], delete=[retract]),
                     schema_id=0, kind="COMPACT")
            return "ok"
        except ConflictError:
            return "conflict"

    with ThreadPoolExecutor(2) as ex:
        results = [f.result() for f in
                   [ex.submit(deleter, w) for w in range(2)]]
    assert sorted(results) == ["conflict", "ok"]
