"""Seeded-random model tests (SURVEY §5.2: TestFileStore-style randomized
sequences with an in-memory oracle). A PK table receives a random sequence
of upsert/delete/compact/rollback-free operations; after every step the
merged table state must equal a plain Python dict fold of the same events.
"""

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
    T.StructField("s", T.StringType()),
])


def _df(spark, rows):
    return spark.createDataFrame([(k, v, f"s{v}") for k, v in rows], SCHEMA)


def _state(table, spark):
    return {r["k"]: (r["v"], r["s"])
            for r in table.read(spark).collect()}


def test_random_upsert_delete_compact(spark, catalog):
    rng = random.Random(42)
    t = catalog.create_table("db.rnd", SCHEMA, primary_keys=["k"],
                             options={"bucket": "4",
                                      "num-sorted-run.compaction-trigger": "3"})
    model: dict[int, int] = {}
    for step in range(12):
        op = rng.choice(["upsert", "upsert", "upsert", "delete", "compact"])
        if op == "upsert":
            rows = [(rng.randrange(50), rng.randrange(1000))
                    for _ in range(rng.randrange(1, 30))]
            # later rows in a batch win (sequence order) — fold in order
            t.write(spark, _df(spark, rows))
            for k, v in rows:
                model[k] = v
        elif op == "delete" and model:
            doomed = rng.sample(sorted(model), min(len(model), 5))
            rows = [(k, model[k]) for k in doomed]
            t.write(spark, _df(spark, rows).withColumn("_row_kind", F.lit("-D")))
            for k in doomed:
                del model[k]
        elif op == "compact":
            t.compact(spark, full=rng.random() < 0.5)
        got = _state(t, spark)
        expect = {k: (v, f"s{v}") for k, v in model.items()}
        assert got == expect, f"step {step} ({op}): {got} != {expect}"


def test_random_partial_update_model(spark, catalog):
    rng = random.Random(7)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
    ])
    t = catalog.create_table("db.rpu", schema, primary_keys=["k"],
                             options={"bucket": "2",
                                      "merge-engine": "partial-update"})
    model: dict[int, list] = {}
    for _ in range(8):
        rows = []
        for _ in range(rng.randrange(1, 20)):
            k = rng.randrange(20)
            a = rng.randrange(100) if rng.random() < 0.5 else None
            b = rng.randrange(100) if rng.random() < 0.5 else None
            rows.append((k, a, b))
        t.write(spark, spark.createDataFrame(rows, schema))
        for k, a, b in rows:
            cur = model.setdefault(k, [None, None])
            if a is not None:
                cur[0] = a
            if b is not None:
                cur[1] = b
    got = {r["k"]: [r["a"], r["b"]] for r in t.read(spark).collect()}
    assert got == model


def test_random_commits_converge_synced_derived_tables(spark, catalog):
    """Randomized sequences of insert/update/delete commits on a source
    documents table; after changelog sync, every derived structure
    (minhash signature index, BM25 postings index + stats, DSIR counts)
    must equal a from-scratch rebuild over the final state — the
    TestFileStore-style model check applied to operators/sync.py."""
    from incubator_paimon_spark.operators import dedup_index as DI
    from incubator_paimon_spark.operators import retrieval as R
    from incubator_paimon_spark.operators import sampling as SA

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "merge", "stream",
             "vector", "table", "index", "sync"]

    def text():
        return " ".join(rng.choice(words)
                        for _ in range(rng.randrange(5, 15)))

    doc_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("text", T.StringType())])
    src = catalog.create_table("db.rnd_docs", doc_schema,
                               primary_keys=["doc_id"],
                               options={"bucket": "2"})
    model: dict[int, str] = {i: text() for i in range(40)}
    src.write(spark, spark.createDataFrame(sorted(model.items()),
                                           doc_schema))

    mh = DI.build_minhash_index(spark, catalog, "db.rnd_mh",
                                src.read(spark), "text", "doc_id",
                                num_hashes=8, bands=4)
    tp, ts = R.build_bm25_index(spark, catalog, "db.rnd_bm",
                                src.read(spark), "text", "doc_id",
                                term_buckets=16)
    qt = SA.create_dsir_counts_table(catalog, "db.rnd_q", buckets=128)
    SA.update_dsir_counts(spark, qt, src.read(spark), "text", "doc_id")
    snap = src.snapshots.latest().id
    for cid in ("s:mh", "s:bm", "s:q"):
        src.write_consumer(cid, snap)

    for _ in range(5):
        op = rng.choice(["insert", "update", "delete", "mixed"])
        batch = []
        if op in ("insert", "mixed"):
            for _ in range(rng.randrange(1, 8)):
                k = max(model, default=0) + rng.randrange(1, 5)
                model[k] = text()
                batch.append((k, model[k], "+I"))
        if op in ("update", "mixed") and model:
            for k in rng.sample(sorted(model), min(len(model), 4)):
                model[k] = text()
                batch.append((k, model[k], "+I"))
        if op in ("delete", "mixed") and model:
            live = [k for k in sorted(model)
                    if k not in {b[0] for b in batch}]
            for k in rng.sample(live, min(len(live), 3)):
                batch.append((k, model.pop(k), "-D"))
        if not batch:
            continue
        df = spark.createDataFrame(
            batch, T.StructType(doc_schema.fields
                                + [T.StructField("_row_kind",
                                                 T.StringType())]))
        src.write(spark, df)

    DI.sync_minhash_index(spark, src, mh, consumer_id="s:mh")
    R.sync_bm25_index(spark, src, tp, ts, "text", "doc_id",
                      consumer_id="s:bm")
    SA.sync_dsir_counts(spark, src, qt, "text", "doc_id",
                        consumer_id="s:q")

    final = src.read(spark)
    assert ({r["doc_id"]: r["text"] for r in final.collect()} == model)

    # minhash: synced rows == fresh banded projection of final state
    fresh_mh = DI.minhash_index_rows(final, "text", "doc_id", 8, 4)
    assert ({tuple(map(str, r)) for r in
             DI.read_minhash_index(spark, mh).collect()}
            == {tuple(map(str, r)) for r in
                fresh_mh.select("id", "sig", "band", "bh").collect()})
    # bm25: postings AND search equal a fresh rebuild / full scan
    fresh_p = R.bm25_index_rows(final, "text", "doc_id", 16)
    assert ({tuple(r) for r in tp.read(spark).collect()}
            == {tuple(r) for r in fresh_p.collect()})
    terms = ["merge", "vector", "sync"]
    assert ([tuple(r) for r in
             R.bm25_search_indexed(spark, tp, ts, terms, k=30).collect()]
            == [tuple(r) for r in
                R.bm25_search(final, "text", "doc_id", terms, k=30)
                 .collect()])
    # dsir: synced counts == fresh counts of the final state
    fresh_q = (SA._hashed_features(final, "text", "doc_id", 128)
               .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
    assert ({tuple(r) for r in qt.read(spark)
             .filter(F.col("n") != 0).collect()}
            == {tuple(r) for r in fresh_q.collect()})
