"""Materialized changelog producers (lookup / full-compaction) and the
follow-up scanner choice: lookup changelog rides every APPEND commit,
full-compaction changelog rides the COMPACT commit, and delta-mode streams
never re-emit a compaction's rewritten files
(LookupChangelogProducer / FullChangelogMergeTreeCompactRewriter /
DeltaFollowUpScanner vs ChangelogFollowUpScanner)."""

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark.streaming.source import (changelog_between,
                                                     incremental_between)


def _kinds(df):
    return {r["_row_kind"]: r["count"]
            for r in df.groupBy("_row_kind").count().collect()}


def test_lookup_producer_materializes_per_commit(spark, catalog, customer):
    t = catalog.create_table("db.clk", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2",
                                      "changelog-producer": "lookup"})
    t.write(spark, customer)
    t.write(spark, customer.limit(10).withColumn("c_acctbal", F.lit(7.0)))
    t.write(spark, customer.limit(3).withColumn("_row_kind", F.lit("-D")))
    s = t.snapshots.list_all()
    assert [x.changelog_record_count for x in s] == [customer.count(), 20, 3]
    assert all(x.changelog_manifest_list for x in s)
    # files are read directly (no state-diff recompute) and carry the kinds
    assert _kinds(changelog_between(spark, t, 1, 2)) == {"-U": 10, "+U": 10}
    assert _kinds(changelog_between(spark, t, 2, 3)) == {"-D": 3}
    # update values in the changelog are the POST-merge values
    ua = (changelog_between(spark, t, 1, 2)
          .filter("_row_kind = '+U'").select("c_acctbal").distinct().collect())
    assert [r[0] for r in ua] == [7.0]


def test_full_compaction_producer_and_stream_skip(spark, catalog, customer):
    t = catalog.create_table("db.cfc", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2",
                                      "changelog-producer": "full-compaction"})
    t.write(spark, customer.withColumn("c_acctbal", F.lit(-1.0)))
    t.write(spark, customer.limit(10))
    t.compact(spark, full=True)
    snaps = t.snapshots.list_all()
    assert snaps[-1].commit_kind == "COMPACT"
    # the compact commit carries the consolidated +I changelog
    assert snaps[-1].changelog_record_count == customer.count()
    assert _kinds(changelog_between(spark, t, 2, 3)) == {"+I": customer.count()}
    # second cycle: only the changed keys appear
    t.write(spark, customer.limit(5).withColumn("c_acctbal", F.lit(9.0)))
    t.compact(spark, full=True)
    assert _kinds(changelog_between(spark, t, 3, 5)) == {"-U": 5, "+U": 5}

    # delta-mode incremental read must NOT re-emit compacted files
    assert incremental_between(spark, t, 2, 3).count() == 0
    assert incremental_between(spark, t, 3, 4).count() == 5


def test_stream_delta_mode_skips_compact_and_changelog_files(
        spark, catalog, customer):
    """A plain (non-changelog) stream over a lookup-producer table reads
    data deltas only — never the -U/+U changelog files — and a mid-stream
    compaction contributes nothing."""
    from incubator_paimon_spark.datasource import PaimonStreamReader

    t = catalog.create_table("db.clks", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2",
                                      "changelog-producer": "lookup"})
    t.write(spark, customer)
    t.write(spark, customer.limit(10).withColumn("c_acctbal", F.lit(7.0)))
    t.compact(spark, full=True)

    r = PaimonStreamReader({"path": t.path, "scan.mode": "earliest"}, False)
    it, end = r.read(r.initialOffset())
    rows = list(it)
    assert end["snapshot_id"] == 3
    # 150 + 10 delta rows; nothing from changelog files or the compaction
    assert len(rows) == customer.count() + 10

    rc = PaimonStreamReader({"path": t.path, "scan.mode": "earliest"}, True)
    rc.changelog = True
    it, _ = rc.read(rc.initialOffset())
    kinds = [row[-1] for row in it]
    assert kinds.count("-U") == 10 and kinds.count("+U") == 10
    assert kinds.count("+I") == customer.count()
