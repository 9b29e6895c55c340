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
