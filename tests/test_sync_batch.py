"""Batched changelog replay (operators/sync.py, r9).

A source committing every 30 s produces thousands of snapshots per day;
`replay_changelog` must sync them in O(chunks) derived-table commits and
Spark jobs, not O(snapshots) — while staying hash-identical to a
from-scratch recompute and exactly-once across crashes (the `<cid>#next`
pin re-runs an interrupted chunk with the identical commit identifier).
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR as SF


def _docs(spark, n=60):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(n))


def _mk_src(catalog, name, schema):
    return catalog.create_table(name, schema, primary_keys=["doc_id"],
                                options={"bucket": "2",
                                         "changelog-producer": "lookup",
                                         "write-only": "true"})


def test_50_commit_source_syncs_in_2_derived_commits(spark, catalog):
    """VERDICT r8 #3 done-criterion: a 50-commit source syncs with ≤2
    derived commits (chunk = 64 covers it in ONE; the assertion allows
    2 for the stats sibling), and the synced DSIR counts hash-match a
    from-scratch recompute — including through in-range updates, whose
    intermediate versions must cancel exactly in the per-key net."""
    from incubator_paimon_spark.operators import sampling as SA
    d = _docs(spark)
    src = _mk_src(catalog, "db.b50", d.schema)
    qt = SA.create_dsir_counts_table(catalog, "db.b50q", buckets=512)
    src.write_consumer("index:b50q", 0)

    rows = d.collect()
    for i in range(50):
        batch = [rows[i % len(rows)], rows[(i * 7 + 1) % len(rows)]]
        if i % 5 == 4:  # every 5th commit rewrites a doc's text
            batch = [(batch[0][0], batch[0][1] + f" rev{i}"), batch[1]]
        src.write(spark, spark.createDataFrame(batch, d.schema))
    assert src.snapshots.latest().id == 50

    before = len(qt.snapshots.list_all())
    covered = SA.sync_dsir_counts(spark, src, qt, "text", "doc_id",
                                  consumer_id="index:b50q")
    assert covered == 50
    derived_commits = len(qt.snapshots.list_all()) - before
    assert derived_commits <= 2, \
        f"batched sync made {derived_commits} derived commits for 50 snapshots"

    synced = {(r["bucket"], r["n"]) for r in qt.read(spark).collect()
              if r["n"] != 0}
    scratch = {(r["bucket"], r["n"]) for r in
               SA._hashed_features(src.read(spark), "text", "doc_id", 512)
                 .groupBy("bucket").agg(F.count(F.lit(1)).cast("long")
                                        .alias("n")).collect()}
    assert synced == scratch
    # and the sync is idempotent / resumable
    assert SA.sync_dsir_counts(spark, src, qt, "text", "doc_id",
                               consumer_id="index:b50q") == 0


def test_batched_net_equals_per_snapshot_for_minhash_index(spark, catalog):
    """The per-key net (first remove image / last add image) must hand
    the minhash upsert apply exactly ONE winning version per doc: after
    a doc is updated twice and another deleted across a batched range,
    the index equals a fresh signature pass over the final state."""
    from incubator_paimon_spark.operators import dedup_index as DI
    d = _docs(spark, 40)
    src = _mk_src(catalog, "db.bmh", d.schema)
    src.write(spark, d)
    idx = DI.build_minhash_index(spark, catalog, "db.bmh_idx",
                                 src.read(spark), "text", "doc_id")
    cid = "index:bmh"
    src.write_consumer(cid, src.snapshots.latest().id)

    upd = d.limit(6).withColumn("text", F.concat(F.col("text"),
                                                 F.lit(" v2")))
    src.write(spark, upd)
    upd2 = d.limit(3).withColumn("text", F.concat(F.col("text"),
                                                  F.lit(" v3")))
    src.write(spark, upd2)
    dels = (d.orderBy(F.col("doc_id").desc()).limit(4)
             .withColumn("_row_kind", F.lit("-D")))
    src.write(spark, dels)

    before = len(idx.snapshots.list_all())
    assert DI.sync_minhash_index(spark, src, idx, consumer_id=cid) == 3
    assert len(idx.snapshots.list_all()) - before == 1  # one batched commit

    fresh = DI.minhash_index_rows(src.read(spark), "text", "doc_id")
    cols = ["id", "band", "bh", "sig"]
    assert ({tuple(map(str, r)) for r in
             DI.read_minhash_index(spark, idx).select(cols).collect()}
            == {tuple(map(str, r)) for r in fresh.select(cols).collect()})


def test_crashed_chunk_replays_with_same_identifier_no_double_count(
        spark, catalog):
    """Crash between apply() and the consumer advance, then MORE source
    commits before the retry: the `<cid>#next` pin makes the retry
    replay the IDENTICAL chunk, whose commit filters as a no-op — the
    sum-aggregator counts must not double-apply (without the pin the
    retry would stamp a larger identifier and double-count)."""
    from incubator_paimon_spark.operators import sampling as SA
    d = _docs(spark, 30)
    src = _mk_src(catalog, "db.bcr", d.schema)
    qt = SA.create_dsir_counts_table(catalog, "db.bcrq", buckets=256)
    cid = "index:bcrq"
    src.write_consumer(cid, 0)
    for i in range(3):
        src.write(spark, spark.createDataFrame(
            d.collect()[i * 10:(i + 1) * 10], d.schema))

    real = src.write_consumer

    def crashing(consumer_id, next_snapshot):
        if consumer_id == cid:
            raise RuntimeError("injected crash before consumer advance")
        return real(consumer_id, next_snapshot)

    src.write_consumer = crashing
    with pytest.raises(RuntimeError, match="injected crash"):
        SA.sync_dsir_counts(spark, src, qt, "text", "doc_id",
                            consumer_id=cid)
    src.write_consumer = real
    assert src.read_consumer(cid) == 0          # progress did not advance
    assert src.read_consumer(f"{cid}#next") == 3  # chunk end pinned

    # the source grows before the retry — the pinned chunk must still
    # replay as (0, 3], not stretch to the new latest
    src.write(spark, d.limit(5))
    assert SA.sync_dsir_counts(spark, src, qt, "text", "doc_id",
                               consumer_id=cid) == 4

    synced = {(r["bucket"], r["n"]) for r in qt.read(spark).collect()
              if r["n"] != 0}
    scratch = {(r["bucket"], r["n"]) for r in
               SA._hashed_features(src.read(spark), "text", "doc_id", 256)
                 .groupBy("bucket").agg(F.count(F.lit(1)).cast("long")
                                        .alias("n")).collect()}
    assert synced == scratch


def test_index_staleness_guard(spark, catalog):
    """check_index_current (r8 verdict #7): a foreign writer's commits
    leave the index lagging — the guard warns by default, raises in
    `fail` mode, and reports 0 once the sync catches up."""
    from incubator_paimon_spark.operators import dedup_index as DI
    from incubator_paimon_spark.operators.sync import (StaleIndexError,
                                                       StaleIndexWarning,
                                                       check_index_current)
    d = _docs(spark, 20)
    src = _mk_src(catalog, "db.stale", d.schema)
    src.write(spark, d)
    idx = DI.build_minhash_index(spark, catalog, "db.stale_idx",
                                 src.read(spark), "text", "doc_id")
    cid = "index:stale"
    src.write_consumer(cid, src.snapshots.latest().id)
    assert check_index_current(src, cid) == 0

    src.write(spark, d.limit(3))  # "foreign" commit: no hook attached
    with pytest.warns(StaleIndexWarning):
        assert check_index_current(src, cid) == 1
    with pytest.raises(StaleIndexError):
        check_index_current(src, cid, mode="fail")
    assert check_index_current(src, cid, mode="silent") == 1

    DI.sync_minhash_index(spark, src, idx, consumer_id=cid)
    assert check_index_current(src, cid) == 0

    # the guard is armed from the indexed query paths themselves via
    # source_table=: a lagging index warns (default) / fails (option)
    src.write(spark, d.limit(2))
    with pytest.warns(StaleIndexWarning):
        DI.read_minhash_index(spark, idx, source_table=src,
                              consumer_id=cid)
    idx.schemas.update_options({"index.staleness-check": "fail"})
    with pytest.raises(StaleIndexError):
        DI.read_minhash_index(spark, idx, source_table=src,
                              consumer_id=cid)


def test_staleness_guard_covers_all_indexed_paths(spark, catalog):
    """r9 verdict #1: EVERY *_indexed read path accepts source_table=
    and arms the shared guard — after a foreign-process commit each
    warns (default), fails, or stays silent per the index table's
    index.staleness-check option; a current index never warns."""
    import warnings

    from incubator_paimon_spark.operators import dedup as D
    from incubator_paimon_spark.operators import retrieval as R
    from incubator_paimon_spark.operators import similarity as S
    from incubator_paimon_spark.operators.sync import (StaleIndexError,
                                                       StaleIndexWarning)
    d = _docs(spark, 20)
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "embedding").orderBy("vec_id").limit(40))

    dsrc = _mk_src(catalog, "db.gsrc", d.schema)
    dsrc.write(spark, d)
    esrc = catalog.create_table("db.gesrc", emb.schema,
                                primary_keys=["vec_id"],
                                options={"bucket": "2"})
    esrc.write(spark, emb)

    tp, ts = R.build_bm25_index(spark, catalog, "db.g_bm",
                                dsrc.read(spark), "text", "doc_id")
    seg = D.create_segment_df_table(catalog, "db.g_seg", segment_words=5)
    D.update_segment_df_counts(spark, seg, dsrc.read(spark), "text",
                               "doc_id")
    t_idx, t_c = S.build_ivf_table(spark, catalog, "db.g_ivf",
                                   esrc.read(spark), "embedding",
                                   num_centroids=2, dim=64,
                                   updatable=True)
    tq_idx, tq_c = S.build_ivf_quantized_table(
        spark, catalog, "db.g_qivf", esrc.read(spark), "embedding",
        num_centroids=2, dim=64)
    for t in (tp, seg):
        dsrc.write_consumer(f"index:{t.name}", dsrc.snapshots.latest().id)
    for t in (t_idx, tq_idx):
        esrc.write_consumer(f"index:{t.name}", esrc.snapshots.latest().id)

    qv = [((i * 13) % 7 - 3) / 3.0 for i in range(64)]
    paths = [
        lambda: S.ivf_search_table(spark, t_idx, t_c, "embedding", qv, 3,
                                   source_table=esrc),
        lambda: S.ivf_search_quantized_table(spark, tq_idx, tq_c, qv, 3,
                                             source_table=esrc),
        lambda: S.semdedup_from_index(spark, t_idx, "embedding",
                                      source_table=esrc,
                                      materialize=False),
        lambda: D.remove_frequent_segments_from_table(
            spark, d, seg, "text", "doc_id", source_table=dsrc),
        lambda: R.hybrid_search_indexed(spark, tp, ts, t_idx, t_c,
                                        ["merge"], qv, k=3,
                                        source_table=dsrc,
                                        vec_source_table=esrc),
    ]

    with warnings.catch_warnings():  # current indexes: silent everywhere
        warnings.simplefilter("error", StaleIndexWarning)
        for p in paths:
            p()

    dsrc.write(spark, d.limit(2))   # foreign commits, no hook attached
    esrc.write(spark, emb.limit(2))
    for p in paths:
        with pytest.warns(StaleIndexWarning):
            p()

    for t in (tp, seg, t_idx, tq_idx):
        t.schemas.update_options({"index.staleness-check": "fail"})
    for p in paths:
        with pytest.raises(StaleIndexError):
            p()

    for t in (tp, seg, t_idx, tq_idx):
        t.schemas.update_options({"index.staleness-check": "silent"})
    with warnings.catch_warnings():
        warnings.simplefilter("error", StaleIndexWarning)
        for p in paths:
            p()


def test_multi_version_single_commit_nets_to_merge_winner(spark, catalog):
    """r9 verdict #3 done-bar: several versions of ONE key written
    inside single commits (duplicate keys in one batch, across rolled
    files) must net to exactly the version a merged read returns — the
    order token is the persisted _SEQUENCE_NUMBER, the same LSN the
    merge engine resolves same-key conflicts by, not plan shape."""
    from incubator_paimon_spark.operators import dedup_index as DI
    d = _docs(spark, 24)
    src = _mk_src(catalog, "db.mvk", d.schema)
    src.write(spark, d)
    idx = DI.build_minhash_index(spark, catalog, "db.mvk_idx",
                                 src.read(spark), "text", "doc_id")
    cid = "index:mvk"
    src.write_consumer(cid, src.snapshots.latest().id)

    rows = d.collect()
    for i in range(4):
        # each commit carries THREE versions of the same key (plus a
        # second key) — the engine's dedup winner is the highest
        # sequence number, and the sync's "last add" must agree
        k = rows[i % len(rows)]
        batch = [(k[0], k[1] + f" v{i}.1"), (k[0], k[1] + f" v{i}.2"),
                 (k[0], k[1] + f" v{i}.3"),
                 (rows[(i + 9) % len(rows)][0], f"other {i}")]
        src.write(spark, spark.createDataFrame(batch, d.schema))

    assert DI.sync_minhash_index(spark, src, idx, consumer_id=cid) == 4
    fresh = DI.minhash_index_rows(src.read(spark), "text", "doc_id")
    cols = ["id", "band", "bh", "sig"]
    assert ({tuple(map(str, r)) for r in
             DI.read_minhash_index(spark, idx).select(cols).collect()}
            == {tuple(map(str, r)) for r in fresh.select(cols).collect()})
