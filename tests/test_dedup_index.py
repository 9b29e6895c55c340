"""Maintained MinHash signature index (operators/dedup_index.py):
index-backed candidate pairs must be bit-identical to the from-scratch
signature pass, and sync must track the source table's changelog
(adds, updates, deletes) through the consumer protocol."""

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark.operators import dedup as D
from incubator_paimon_spark.operators import dedup_index as DI

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_index_backed_pairs_match_from_scratch(spark, catalog, docs):
    new = docs.filter(F.col("doc_id") % 10 == 0)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    scratch = D.minhash_lsh_pairs_between(new, base, "text", "doc_id",
                                          num_hashes=16, bands=4,
                                          min_est_jaccard=0.5)
    t = DI.build_minhash_index(spark, catalog, "db.idx", base,
                               "text", "doc_id")
    bi = DI.read_minhash_index(spark, t, 16, 4, 3)
    indexed = D.minhash_lsh_pairs_between(new, None, "text", "doc_id",
                                          num_hashes=16, bands=4,
                                          min_est_jaccard=0.5,
                                          base_index=bi)
    assert _pairs(indexed) == _pairs(scratch)


def test_param_mismatch_is_loud(spark, catalog, docs):
    t = DI.build_minhash_index(spark, catalog, "db.idx8", docs,
                               "text", "doc_id", num_hashes=8, bands=4)
    with pytest.raises(ValueError, match="num_hashes=8"):
        DI.read_minhash_index(spark, t, num_hashes=16)
    # a non-index table is rejected outright
    plain = catalog.create_table("db.plain", docs.schema)
    with pytest.raises(ValueError, match="not a minhash index"):
        DI.index_params(plain)


def test_sync_tracks_adds_updates_deletes(spark, catalog, docs):
    """Three source commits after the initial build — pure adds, then a
    mixed update+delete commit — replayed through sync must leave the
    index identical to re-signing the final corpus state."""
    src = catalog.create_table(
        "db.docs_src", docs.select("doc_id", "text").schema,
        primary_keys=["doc_id"], options={"bucket": "2"})
    d2 = docs.select("doc_id", "text")
    src.write(spark, d2.filter(F.col("doc_id") % 2 == 0))
    idx = DI.build_minhash_index(spark, catalog, "db.docs_idx",
                                 src.read(spark), "text", "doc_id")
    cid = "index:docs_idx"
    src.write_consumer(cid, src.snapshots.latest().id)

    src.write(spark, d2.filter(F.col("doc_id") % 2 == 1))  # adds
    upd = (d2.filter(F.col("doc_id") % 7 == 0)
             .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
             .withColumn("_row_kind", F.lit("+I")))
    dels = (d2.filter(F.col("doc_id") % 11 == 0)
              .join(upd.select("doc_id"), "doc_id", "left_anti")
              .withColumn("_row_kind", F.lit("-D")))
    src.write(spark, upd.unionByName(dels))  # update + delete

    applied = DI.sync_minhash_index(spark, src, idx, consumer_id=cid)
    assert applied == 2
    # consumer advanced: a second sync is a no-op
    assert DI.sync_minhash_index(spark, src, idx, consumer_id=cid) == 0
    assert src.read_consumer(cid) == src.snapshots.latest().id

    fresh = DI.minhash_index_rows(src.read(spark), "text", "doc_id")
    synced = DI.read_minhash_index(spark, idx)
    cols = ["id", "band", "bh", "sig"]
    assert ({tuple(map(str, r)) for r in synced.select(cols).collect()}
            == {tuple(map(str, r)) for r in fresh.select(cols).collect()})


def test_lazy_nightly_cost_is_index_scan_not_signature_pass(spark, catalog,
                                                           docs):
    """The point of the index: the base side of an index-backed query
    plan contains NO md5/shingle expressions — only the index scan.
    (The r7 probe put ~all of the 386 s cross-corpus cost in the base
    signature pass; this pins its absence.)"""
    base = docs.filter(F.col("doc_id") % 10 != 0)
    t = DI.build_minhash_index(spark, catalog, "db.idx_plan", base,
                               "text", "doc_id")
    bi = DI.read_minhash_index(spark, t, 16, 4, 3)
    new = docs.filter(F.col("doc_id") % 10 == 0).limit(10)
    q = D.minhash_lsh_pairs_between(new, None, "text", "doc_id",
                                    base_index=bi)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    unindexed = D.minhash_lsh_pairs_between(new, base, "text", "doc_id")
    uplan = unindexed._jdf.queryExecution().optimizedPlan().toString()
    # the signature pipeline shows up as md5(...) expression trees; the
    # indexed plan keeps exactly the NEW side's (one pipeline), while
    # the unindexed plan carries both sides' — strictly more md5 nodes
    assert 0 < plan.count("md5") < uplan.count("md5")
