"""Stateful streaming operators: gap sessionization + first-row dedup.

The point under test is the STATE: sessions and seen-keys must survive
micro-batch boundaries, so every test forces multiple micro-batches with
maxFilesPerTrigger=1 over chunk files written in event-time order.
"""

import datetime as dt
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _write_chunks(spark, chunks, schema):
    """Write each chunk as one parquet file; the file source orders new
    files by modification time, so space the writes out a little."""
    import time
    d = tempfile.mkdtemp(prefix="pmn_stateful_src_")
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(d)
        time.sleep(0.1)
    return d


def _drain(stream_df, name):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300), "stream did not finish"
    return name


TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(uid, minutes, val=1.0, flush=False):
    return (uid, TS + dt.timedelta(minutes=minutes), float(val), flush)


EV_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("flush", T.BooleanType()),
])


def test_sessionize_merges_across_batches(spark):
    from incubator_paimon_spark.streaming.stateful import sessionize

    # user 1: one session spanning the chunk boundary (gap 10 < 30 min),
    #         then a second session 100 min later
    # user 2: two sessions entirely inside chunk 1
    chunks = [
        [_ev(1, 0), _ev(1, 10), _ev(2, 0), _ev(2, 5), _ev(2, 60)],
        [_ev(1, 20, val=2.5), _ev(1, 120)],
        [_ev(1, 0, flush=True), _ev(2, 0, flush=True)],
    ]
    src = _write_chunks(spark, chunks, EV_SCHEMA)
    try:
        stream = (spark.readStream.schema(EV_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = sessionize(stream, "user_id", "ts", value_col="value",
                         gap_minutes=30, flush_col="flush")
        tbl = _drain(out, "sess_out")
        rows = {(r.user_id, r.n_events): r
                for r in spark.table(tbl).collect()}
        # user 1 session A: events at 0, 10, 20 min -> one 3-event session
        a = rows[(1, 3)]
        assert a.sess_start == TS and a.sess_end == TS + dt.timedelta(minutes=20)
        assert a.sess_value == pytest.approx(4.5)
        # user 1 session B: the single event at 120 min (flushed)
        assert (1, 1) in rows
        # user 2: sessions of 2 events (0,5) and 1 event (60)
        assert (2, 2) in rows and (2, 1) in rows
        assert len(spark.table(tbl).collect()) == 4
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_sessionize_closes_on_late_next_event(spark):
    from incubator_paimon_spark.streaming.stateful import sessionize

    # no flush sentinel: session 1 closes because chunk 2's event arrives
    # past the gap; the final open session stays in state (not emitted)
    chunks = [
        [_ev(7, 0), _ev(7, 5)],
        [_ev(7, 90)],
    ]
    src = _write_chunks(spark, chunks, EV_SCHEMA)
    try:
        stream = (spark.readStream.schema(EV_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = sessionize(stream, "user_id", "ts", value_col="value",
                         gap_minutes=30)
        tbl = _drain(out, "sess_out2")
        got = spark.table(tbl).collect()
        assert len(got) == 1
        assert got[0].n_events == 2
        assert got[0].sess_end == TS + dt.timedelta(minutes=5)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_dedup_first_wins_across_batches(spark):
    from incubator_paimon_spark.streaming.stateful import streaming_dedup

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("payload", T.StringType()),
    ])
    chunks = [
        [(1, 10, "a1"), (1, 5, "a0"), (2, 1, "b0")],   # batch ties -> min seq
        [(1, 1, "a-late"), (3, 7, "c0")],              # k=1 re-delivered
    ]
    src = _write_chunks(spark, chunks, schema)
    try:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = streaming_dedup(stream, ["k"], order_col="seq")
        tbl = _drain(out, "dedup_out")
        got = {r.k: r for r in spark.table(tbl).collect()}
        assert set(got) == {1, 2, 3}
        # k=1 kept its FIRST-batch min-seq row, not the later re-delivery
        assert got[1].payload == "a0" and got[1].seq == 5
        assert got[3].payload == "c0"
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_sessionize_matches_batch_oracle(spark):
    """Streamed sessions over real events == batch lag/cumsum sessionization."""
    from incubator_paimon_spark.streaming.stateful import sessionize

    e = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
         .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
         .select("user_id", "ts", "value"))
    med = e.agg(F.expr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5)")).first()[0]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    c1 = e.filter(us <= med).withColumn("flush", F.lit(False))
    c2 = e.filter(us > med).withColumn("flush", F.lit(False))
    flushes = (e.select("user_id").distinct()
               .withColumn("ts", F.lit(dt.datetime(2100, 1, 1))
                           .cast("timestamp_ntz"))
               .withColumn("value", F.lit(0.0))
               .withColumn("flush", F.lit(True)))
    src = tempfile.mkdtemp(prefix="pmn_stateful_ora_")
    try:
        for c in (c1, c2, flushes):
            c.coalesce(1).write.mode("append").parquet(src)
        stream = (spark.readStream.schema(c1.schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = sessionize(stream, "user_id", "ts", value_col="value",
                         gap_minutes=30, flush_col="flush")
        tbl = _drain(out, "sess_oracle")
        got = (spark.table(tbl).groupBy("user_id")
               .agg(F.count("*").alias("n_sessions"),
                    F.sum("n_events").alias("n_events"))
               .collect())

        from pyspark.sql import Window as W
        w = W.partitionBy("user_id").orderBy("ts")
        us = lambda c: F.unix_micros(c.cast("timestamp"))
        gap = (us(F.col("ts")) - us(F.lag("ts").over(w))) > 1800 * 1_000_000
        exp = (e.withColumn("new", F.when(gap | F.lag("ts").over(w).isNull(),
                                          1).otherwise(0))
                .groupBy("user_id")
                .agg(F.sum("new").alias("n_sessions"),
                     F.count("*").alias("n_events"))
                .collect())
        assert {(r.user_id, r.n_sessions, r.n_events) for r in got} == \
               {(r.user_id, r.n_sessions, r.n_events) for r in exp}
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_neardup_dedup(spark):
    """Near-dup suppression on ingest: band-hash state survives batch
    boundaries, same-batch collisions keep exactly the first doc, and a
    later batch's near-copy of an already-seen doc is suppressed."""
    from incubator_paimon_spark.streaming.stateful import (
        neardup_keep, streaming_neardup_claims)

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    uniq1 = ("completely different words describing an entirely other "
             "topic with no overlap in shingles whatsoever here")
    uniq2 = ("yet another fully distinct document talking about spark "
             "streaming state stores and arrow record batches")
    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    chunks = [
        [(1, base), (2, base), (3, uniq1)],   # 2 is a same-batch copy of 1
        [(4, base), (5, uniq2)],              # 4 repeats batch-1 content
    ]
    src = _write_chunks(spark, chunks, doc_schema)
    out = tempfile.mkdtemp(prefix="pmn_nd_out_")
    ck = tempfile.mkdtemp(prefix="pmn_nd_ck_")
    try:
        st = (spark.readStream.schema(doc_schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
        claims = streaming_neardup_claims(st, "text", "doc_id")

        def sink(batch_df, batch_id):
            kept = neardup_keep(batch_df, "doc_id")
            kept.write.mode("append").parquet(out)

        q = (claims.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300), "stream did not finish"
        got = spark.read.parquet(out)
        kept_ids = sorted(r["doc_id"] for r in got.collect())
        # doc 1 wins its clique; 3 and 5 are unique; 2 (same batch) and
        # 4 (later batch) are suppressed by band-hash state
        assert kept_ids == [1, 3, 5], kept_ids
        texts = {r["doc_id"]: r["text"] for r in got.collect()}
        assert texts[1] == base and texts[3] == uniq1 and texts[5] == uniq2
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
