"""Incremental materialized aggregation views (operators/matview.py, r9).

The invariant under test everywhere: after any sequence of source
commits (inserts, updates, deletes) + sync, `read_materialized` equals
a from-scratch GROUP BY over the source's CURRENT state.
"""

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark.operators import matview as MV
from tests.conftest import SF_DIR as SF


def _docs(spark, n=80):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "n_chars")
            .orderBy("doc_id").limit(n))


def _mk_src(catalog, name, schema):
    return catalog.create_table(name, schema, primary_keys=["doc_id"],
                                options={"bucket": "2",
                                         "changelog-producer": "lookup",
                                         "write-only": "true"})


def _scratch(src_df):
    return {(r["source"], r["n_docs"], r["chars_sum"],
             round(r["avg_chars"], 9))
            for r in (src_df.groupBy("source")
                      .agg(F.count(F.lit(1)).alias("n_docs"),
                           F.sum("n_chars").alias("chars_sum"),
                           F.avg("n_chars").alias("avg_chars"))
                      .collect())}


def _view(spark, mv):
    return {(r["source"], r["n_docs"], r["chars_sum"],
             round(r["avg_chars"], 9))
            for r in MV.read_materialized(spark, mv).collect()}


def test_matview_tracks_inserts_updates_deletes(spark, catalog):
    d = _docs(spark)
    src = _mk_src(catalog, "db.mv_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_by_source", src, ["source"],
        {"n_docs": ("count", "doc_id"),
         "chars_sum": ("sum", "n_chars"),
         "avg_chars": ("avg", "n_chars")})

    rows = d.collect()
    # commit 1: first half
    src.write(spark, spark.createDataFrame(rows[:40], d.schema))
    assert MV.sync_materialized_agg(spark, src, mv) == 1
    assert _view(spark, mv) == _scratch(src.read(spark))

    # commit 2: second half + UPDATE (n_chars changes on 10 ids)
    upd = [(r["doc_id"], r["source"], r["n_chars"] + 7) for r in rows[:10]]
    src.write(spark, spark.createDataFrame(rows[40:] + upd, d.schema))
    # commit 3: DELETE 5 ids (changelog carries the old images)
    dels = (spark.createDataFrame(rows[20:25], d.schema)
            .withColumn("_row_kind", F.lit("-D")))
    src.write(spark, dels)
    assert MV.sync_materialized_agg(spark, src, mv) == 2
    assert _view(spark, mv) == _scratch(src.read(spark))

    # idempotent
    assert MV.sync_materialized_agg(spark, src, mv) == 0


def test_matview_group_disappears_when_fully_retracted(spark, catalog):
    d = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_gone_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_gone", src, ["source"],
        {"n_docs": ("count", "doc_id"),
         "chars_sum": ("sum", "n_chars")})
    src.write(spark, d)
    src.write(spark, d.filter("source = 'a'")
                     .withColumn("_row_kind", F.lit("-D")))
    MV.sync_materialized_agg(spark, src, mv)
    got = {r["source"]: (r["n_docs"], r["chars_sum"])
           for r in MV.read_materialized(spark, mv).collect()}
    assert got == {"b": (1, 30)}


def test_matview_retracts_engine_before_image_not_writer_payload(spark,
                                                                 catalog):
    """A -D write may carry STALE column values (the writer only needs
    the key); the lookup changelog must emit the table's true previous
    image, and the view must retract THAT — not the writer's payload."""
    d = spark.createDataFrame([(1, "a", 10), (2, "a", 20), (3, "b", 30)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_img_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_img", src, ["source"],
        {"n_docs": ("count", "doc_id"),
         "chars_sum": ("sum", "n_chars")})
    src.write(spark, d)
    src.write(spark, spark.createDataFrame([(1, "a", 110)], d.schema))
    src.write(spark, spark.createDataFrame([(1, "a", 10)], d.schema)
                     .withColumn("_row_kind", F.lit("-D")))
    MV.sync_materialized_agg(spark, src, mv)
    got = {r["source"]: (r["n_docs"], r["chars_sum"])
           for r in MV.read_materialized(spark, mv).collect()}
    assert got == {"a": (1, 20), "b": (1, 30)}


def test_matview_minmax_through_updates_and_deletes(spark, catalog):
    """min/max use the hybrid protocol: inserts combine monotonically;
    a chunk that removes rows recomputes ONLY the dirty groups from the
    source — so the minimum can RISE when the current minimum is
    updated away (the case a pure fold gets wrong), and a fully-deleted
    group disappears and revives fresh."""
    d = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_mm_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_mm", src, ["source"],
        {"lo": ("min", "n_chars"), "hi": ("max", "n_chars")})

    def view():
        return {r["source"]: (r["lo"], r["hi"])
                for r in MV.read_materialized(spark, mv).collect()}

    src.write(spark, d)
    src.write(spark, spark.createDataFrame(
        [(4, "a", 5), (5, "b", 99)], d.schema))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (5, 20), "b": (30, 99)}

    # UPDATE the group-a minimum upward: min must RISE to 10
    src.write(spark, spark.createDataFrame([(4, "a", 500)], d.schema))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (10, 500), "b": (30, 99)}

    # DELETE the group-b maximum: max must fall back to 30
    src.write(spark, spark.createDataFrame([(5, "b", 99)], d.schema)
                     .withColumn("_row_kind", F.lit("-D")))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (10, 500), "b": (30, 30)}

    # delete ALL of group b, then revive with a fresh row: the revived
    # extremes must not inherit the dead group's history
    src.write(spark, spark.createDataFrame([(3, "b", 30)], d.schema)
                     .withColumn("_row_kind", F.lit("-D")))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (10, 500)}
    src.write(spark, spark.createDataFrame([(6, "b", 77)], d.schema))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (10, 500), "b": (77, 77)}

    # mixed view: extremes + retractable outputs stay consistent in the
    # SAME sync (one commit carries delta sums and resolved extremes)
    mv2 = MV.create_materialized_agg(
        catalog, "db.mv_mm2", src, ["source"],
        {"n_docs": ("count", "doc_id"), "lo": ("min", "n_chars")})
    MV.sync_materialized_agg(spark, src, mv2)
    got = {r["source"]: (r["n_docs"], r["lo"]) for r in
           MV.read_materialized(spark, mv2).collect()}
    assert got == {"a": (3, 10), "b": (1, 77)}


def test_matview_rides_auto_sync_hook(spark, catalog):
    """Registered on the post-commit listener, the view follows plain
    writes with no explicit sync call (same seam the maintained indexes
    use)."""
    from incubator_paimon_spark.operators import matview as MVmod
    from incubator_paimon_spark.operators.sync import auto_sync
    d = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_auto_src", d.schema)
    mv = MVmod.create_materialized_agg(
        catalog, "db.mv_auto", src, ["source"],
        {"n_docs": ("count", "doc_id"),
         "chars_sum": ("sum", "n_chars")})
    auto_sync(spark, src, mv.name,
              lambda s: MVmod.sync_materialized_agg(s, src, mv))
    src.write(spark, d)
    src.write(spark, spark.createDataFrame([(3, "a", 5)], d.schema))
    got = {r["source"]: (r["n_docs"], r["chars_sum"])
           for r in MVmod.read_materialized(spark, mv).collect()}
    assert got == {"a": (2, 15), "b": (1, 20)}


def test_matview_sql_surface(spark, catalog):
    """CREATE MATERIALIZED VIEW ... AS SELECT ... GROUP BY creates the
    aggregation table, hooks auto-sync, and syncs to current state;
    plain SELECT reads merged totals; REFRESH heals a missed hook."""
    d = spark.createDataFrame([(1, "a", 10), (2, "a", 20), (3, "b", 30)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_sql_src", d.schema)
    src.write(spark, d)
    catalog.sql(spark, """
        CREATE MATERIALIZED VIEW db.mv_sql AS
        SELECT source, count(*) AS n_docs, sum(n_chars) AS chars_sum
        FROM db.mv_sql_src GROUP BY source
    """)
    got = {r["source"]: (r["n_docs"], r["chars_sum"]) for r in
           catalog.sql(spark, "SELECT source, n_docs, chars_sum "
                              "FROM db.mv_sql").collect()}
    assert got == {"a": (2, 30), "b": (1, 30)}

    # the hook keeps it current through a plain INSERT...
    catalog.sql(spark, "INSERT INTO db.mv_sql_src VALUES (4, 'b', 5)")
    got = {r["source"]: r["chars_sum"] for r in
           catalog.sql(spark,
                       "SELECT source, chars_sum FROM db.mv_sql").collect()}
    assert got == {"a": 30, "b": 35}

    # ...and REFRESH covers writes the hook never saw (simulated by a
    # direct table write after dropping the in-process listener)
    from incubator_paimon_spark.metadata.commit import on_commit
    on_commit(src.path, "index-sync:mv_sql", lambda _s: None)
    src.write(spark, spark.createDataFrame([(5, "a", 100)], d.schema))
    covered = catalog.sql(spark, "REFRESH MATERIALIZED VIEW db.mv_sql")
    assert covered >= 1
    got = {r["source"]: r["chars_sum"] for r in
           catalog.sql(spark,
                       "SELECT source, chars_sum FROM db.mv_sql").collect()}
    assert got == {"a": 130, "b": 35}

    # malformed declarations fail fast
    with pytest.raises(ValueError, match="GROUP BY column"):
        catalog.sql(spark, """
            CREATE MATERIALIZED VIEW db.mv_sql_bad AS
            SELECT n_chars, count(*) AS n FROM db.mv_sql_src
            GROUP BY source
        """)


def test_matview_listed_in_sys_materialized_views(spark, catalog):
    """sys.materialized_views enumerates every MV with its definition
    and snapshot lag — 0 when current, >0 after an unsynced commit."""
    d = spark.createDataFrame([(1, "a", 10)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_ls_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_ls", src, ["source"],
        {"n_docs": ("count", "doc_id")})
    src.write(spark, d)
    rows = {r["view_name"]: r for r in
            catalog.sql(spark, "SELECT * FROM sys.materialized_views")
                   .collect()}
    assert rows["mv_ls"]["source_table"] == "db.mv_ls_src"
    assert rows["mv_ls"]["group_by"] == "source"
    assert rows["mv_ls"]["staleness_snapshots"] == 1  # unsynced commit
    MV.sync_materialized_agg(spark, src, mv)
    rows = {r["view_name"]: r for r in
            catalog.sql(spark, "SELECT * FROM sys.materialized_views")
                   .collect()}
    assert rows["mv_ls"]["staleness_snapshots"] == 0


def test_matview_where_predicate_boundary_crossing(spark, catalog):
    """A filtered view (WHERE n_chars < 100) must follow rows ACROSS
    the predicate boundary: updating a row from 50→150 retracts it
    (old image passes the filter, new image fails), 150→50 admits it —
    both row images filter independently in sync."""
    d = spark.createDataFrame(
        [(1, "a", 50), (2, "a", 150), (3, "b", 30)],
        "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_w_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_w", src, ["source"],
        {"n_docs": ("count", "doc_id"), "chars_sum": ("sum", "n_chars"),
         "lo": ("min", "n_chars")},
        where="n_chars < 100")
    src.write(spark, d)
    MV.sync_materialized_agg(spark, src, mv)

    def view():
        return {r["source"]: (r["n_docs"], r["chars_sum"], r["lo"])
                for r in MV.read_materialized(spark, mv).collect()}

    assert view() == {"a": (1, 50, 50), "b": (1, 30, 30)}
    # leave the view: 50 -> 150
    src.write(spark, spark.createDataFrame([(1, "a", 150)], d.schema))
    # enter the view: 150 -> 60 (id 2)
    src.write(spark, spark.createDataFrame([(2, "a", 60)], d.schema))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (1, 60, 60), "b": (1, 30, 30)}
    # and the auditor agrees
    got = MV.check_materialized(spark, catalog, mv)
    assert got["consistent"], got


def test_matview_drop_statement_unhooks_auto_sync(spark, catalog):
    d = spark.createDataFrame([(1, "a", 10)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_dr_src", d.schema)
    src.write(spark, d)
    catalog.sql(spark, """
        CREATE MATERIALIZED VIEW db.mv_dr AS
        SELECT source, count(*) AS n FROM db.mv_dr_src GROUP BY source
    """)
    catalog.sql(spark, "DROP MATERIALIZED VIEW db.mv_dr")
    with pytest.raises(Exception):
        catalog.get_table("db.mv_dr")
    # the source keeps accepting writes with no orphan hook firing
    src.write(spark, spark.createDataFrame([(2, "b", 5)], d.schema))
    from incubator_paimon_spark.metadata.commit import _COMMIT_LISTENERS
    import os
    keys = _COMMIT_LISTENERS.get(os.path.normpath(src.path), {})
    assert "index-sync:mv_dr" not in keys


def test_matview_check_mv_procedure_flags_divergence(spark, catalog):
    from incubator_paimon_spark.procedures import call
    d = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_ck_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_ck", src, ["source"],
        {"n_docs": ("count", "doc_id"), "avg_chars": ("avg", "n_chars")})
    src.write(spark, d)
    MV.sync_materialized_agg(spark, src, mv)
    msg = call(spark, catalog, "sys.check_mv", view="db.mv_ck")
    assert "is consistent" in msg
    # a stale view (unsynced source commit) must be flagged
    src.write(spark, spark.createDataFrame([(3, "a", 99)], d.schema))
    msg = call(spark, catalog, "sys.check_mv", view="db.mv_ck")
    assert "INCONSISTENT" in msg


def test_matview_stream_daemon_heals_foreign_commits(spark, catalog):
    """materialize_stream: the engine's streaming source is the wake
    signal, the consumer-tracked sync is the work — commits the
    in-process hook never saw (here: written between daemon runs, the
    foreign-writer shape) are applied on the next run from the stream's
    stored offsets, and the stream itself never re-scans old data."""
    import tempfile

    from incubator_paimon_spark.operators import matview as MVmod
    d = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_st_src", d.schema)
    mv = MVmod.create_materialized_agg(
        catalog, "db.mv_st", src, ["source"],
        {"n_docs": ("count", "doc_id"), "chars_sum": ("sum", "n_chars")})
    src.write(spark, d)
    ckpt = tempfile.mkdtemp(prefix="mv_stream_ckpt_")

    q = MVmod.materialize_stream(spark, src, mv, ckpt)
    q.awaitTermination(120)
    got = {r["source"]: r["chars_sum"] for r in
           MVmod.read_materialized(spark, mv).collect()}
    assert got == {"a": 10, "b": 20}

    # a LIVE daemon: commit while it runs; the stream — not the inline
    # backlog sync, which already finished — must wake the sync
    import time
    q2 = MVmod.materialize_stream(
        spark, src, mv, ckpt, trigger={"processingTime": "1 seconds"})
    try:
        src.write(spark, spark.createDataFrame([(3, "a", 5)], d.schema))
        deadline = time.time() + 90
        got = {}
        while time.time() < deadline:
            got = {r["source"]: r["chars_sum"] for r in
                   MVmod.read_materialized(spark, mv).collect()}
            if got.get("a") == 15:
                break
            time.sleep(1)
        assert got == {"a": 15, "b": 20}
    finally:
        q2.stop()


def test_matview_approx_distinct_sketch(spark, catalog):
    """approx_distinct = KMV sketch maintained like an extreme: exact
    below k, estimator above k (same formula as
    text.kmv_distinct_estimate), union-combine on insert, dirty-group
    recompute on delete so removing a value REDUCES the count."""
    from incubator_paimon_spark.operators.text import kmv_distinct_estimate
    rows = [(i, "a", i % 7) for i in range(30)] + \
           [(100 + i, "b", i) for i in range(40)]
    d = spark.createDataFrame(rows,
                              "doc_id long, source string, val long")
    src = _mk_src(catalog, "db.mv_ad_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_ad", src, ["source"],
        {"n_vals": ("approx_distinct", "val")}, kmv_k=16)
    src.write(spark, d)
    MV.sync_materialized_agg(spark, src, mv)

    def view():
        return {r["source"]: r["n_vals"] for r in
                MV.read_materialized(spark, mv).collect()}

    got = view()
    # group a: 7 distinct values < k=16 -> exact
    assert got["a"] == 7.0
    # group b: 40 distinct > k -> the estimator, equal to the one-shot
    # KMV operator over the same values at the same k
    ref = kmv_distinct_estimate(
        d.filter("source = 'b'"), "val", k=16).first()["distinct_est"]
    assert got["b"] == ref
    # new values union in
    src.write(spark, spark.createDataFrame(
        [(200, "a", 100), (201, "a", 101)], d.schema))
    MV.sync_materialized_agg(spark, src, mv)
    assert view()["a"] == 9.0
    # deleting rows that carried distinct values shrinks the count
    # (impossible for a pure union fold — the dirty recompute path)
    src.write(spark, spark.createDataFrame(
        [(200, "a", 100), (201, "a", 101)], d.schema)
        .withColumn("_row_kind", F.lit("-D")))
    MV.sync_materialized_agg(spark, src, mv)
    assert view()["a"] == 7.0
    # the auditor compares sketch estimates too
    assert MV.check_materialized(spark, catalog, mv)["consistent"]


def test_matview_read_staleness_guard(spark, catalog):
    """read_materialized(catalog=...) arms the shared staleness guard:
    a source commit the consumer has not applied warns (default) or
    fails per the view's index.staleness-check option."""
    from incubator_paimon_spark.operators.sync import (StaleIndexError,
                                                       StaleIndexWarning)
    d = spark.createDataFrame([(1, "a", 10)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_sg_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_sg", src, ["source"],
        {"n_docs": ("count", "doc_id")})
    src.write(spark, d)
    MV.sync_materialized_agg(spark, src, mv)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # current view: no warning
        MV.read_materialized(spark, mv, catalog=catalog).collect()
    src.write(spark, spark.createDataFrame([(2, "b", 5)], d.schema))
    with pytest.warns(StaleIndexWarning):
        MV.read_materialized(spark, mv, catalog=catalog).collect()
    mv.schemas.update_options({"index.staleness-check": "fail"})
    with pytest.raises(StaleIndexError):
        MV.read_materialized(spark, mv, catalog=catalog)
    MV.sync_materialized_agg(spark, src, mv)
    assert MV.read_materialized(spark, mv, catalog=catalog).count() == 2


def test_matview_rejects_unknown_aggregate(spark, catalog):
    d = spark.createDataFrame([(1, "a", 1)],
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_bad_src", d.schema)
    with pytest.raises(ValueError, match="unsupported"):
        MV.create_materialized_agg(catalog, "db.mv_bad", src, ["source"],
                                   {"x": ("median", "n_chars")})
    with pytest.raises(ValueError, match="non-numeric"):
        MV.create_materialized_agg(catalog, "db.mv_bad2", src, ["source"],
                                   {"x": ("sum", "source")})
    with pytest.raises(ValueError, match="reserved"):
        MV.create_materialized_agg(catalog, "db.mv_bad3", src, ["source"],
                                   {"mv__x": ("count", "doc_id")})
    with pytest.raises(ValueError, match="collision"):
        MV.create_materialized_agg(
            catalog, "db.mv_bad4", src, ["source"],
            {"x": ("avg", "n_chars"), "x__cnt": ("count", "doc_id")})


def test_matview_null_semantics(spark, catalog):
    """COUNT(col) and AVG skip NULLs (r9 advice): groups with NULL
    values count only the non-NULL ones, an all-NULL group shows
    count 0 / sum NULL / avg NULL but still EXISTS (liveness is the
    hidden row count, not any value count), and count("*") counts
    every row. check_materialized must agree — it compares against
    Spark's own NULL-skipping aggregates."""
    d = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "b", None), (4, "b", None)],
        "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_null_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_null", src, ["source"],
        {"n_rows": ("count", "*"), "n_vals": ("count", "n_chars"),
         "chars_sum": ("sum", "n_chars"), "avg_chars": ("avg", "n_chars")})

    def view():
        return {r["source"]: (r["n_rows"], r["n_vals"], r["chars_sum"],
                              r["avg_chars"])
                for r in MV.read_materialized(spark, mv).collect()}

    src.write(spark, d)
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (2, 1, 10, 10.0), "b": (2, 0, None, None)}
    assert MV.check_materialized(spark, catalog, mv)["consistent"]

    # both NULL-transitions: a value nulled out, a NULL given a value
    src.write(spark, spark.createDataFrame(
        [(2, "a", 8), (1, "a", None)], d.schema))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (2, 1, 8, 8.0), "b": (2, 0, None, None)}
    assert MV.check_materialized(spark, catalog, mv)["consistent"]


def test_matview_minmax_buffer_absorbs_deletes_then_drains(spark, catalog):
    """r9 verdict #2: deletes resolve from the bounded runner-up buffer
    with ZERO source IO; only when a group loses its whole buffer does
    the sync re-read the source (leftsemi-pruned to drained groups).
    minmax_buffer=2 makes the drain reachable: buffer [10,20] cut 30 —
    deleting 10 is buffer-local, deleting 20 drains and recomputes."""
    rows = [(i, "a", i * 10) for i in range(1, 9)]  # n_chars 10..80
    d = spark.createDataFrame(rows,
                              "doc_id long, source string, n_chars long")
    src = _mk_src(catalog, "db.mv_buf_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_buf", src, ["source"],
        {"lo": ("min", "n_chars"), "hi": ("max", "n_chars")},
        minmax_buffer=2)

    real_read = src.read
    snapshot_reads = []

    def counting_read(spark_, **kw):
        if kw.get("snapshot_id") is not None:
            snapshot_reads.append(kw["snapshot_id"])
        return real_read(spark_, **kw)

    src.read = counting_read

    def view():
        return {r["source"]: (r["lo"], r["hi"])
                for r in MV.read_materialized(spark, mv).collect()}

    def delete(doc_id):
        src.write(spark, spark.createDataFrame(
            [r for r in rows if r[0] == doc_id], d.schema)
            .withColumn("_row_kind", F.lit("-D")))

    src.write(spark, d)
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (10, 80)}
    assert snapshot_reads == []          # insert-only: no source read

    delete(1)                            # min 10 gone: runner-up 20
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (20, 80)}
    assert snapshot_reads == []          # absorbed by the buffer

    delete(2)                            # buffer drained: recompute
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (30, 80)}
    assert len(snapshot_reads) == 1      # exactly the drained chunk

    delete(4)                            # 40 is IN the refilled buffer
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (30, 80)}
    assert len(snapshot_reads) == 1      # buffer-local again

    # insert below the cut merges straight into the buffer
    src.write(spark, spark.createDataFrame(
        [(9, "a", 5)], d.schema))
    MV.sync_materialized_agg(spark, src, mv)
    assert view() == {"a": (5, 80)}
    assert len(snapshot_reads) == 1

    src.read = real_read
    assert MV.check_materialized(spark, catalog, mv)["consistent"]


def test_matview_over_append_only_source(spark, catalog):
    """A view over a no-PK append table exercises the _net_range
    no-keys branch (r9 verdict #8): every appended batch contributes
    pure adds — duplicate-valued rows included — and min/max buffers
    only ever grow."""
    d = _docs(spark, 40)
    src = catalog.create_table("db.mv_app_src", d.schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_app", src, ["source"],
        {"n_rows": ("count", "*"), "chars_sum": ("sum", "n_chars"),
         "lo": ("min", "n_chars")})
    rows = d.collect()
    src.write(spark, spark.createDataFrame(rows[:25], d.schema))
    # duplicates of already-present rows: appends, not upserts
    src.write(spark, spark.createDataFrame(rows[15:], d.schema))
    MV.sync_materialized_agg(spark, src, mv)

    expect = {(r["source"], r["n_rows"], r["chars_sum"], r["lo"])
              for r in (src.read(spark).groupBy("source")
                        .agg(F.count(F.lit(1)).alias("n_rows"),
                             F.sum("n_chars").alias("chars_sum"),
                             F.min("n_chars").alias("lo")).collect())}
    got = {(r["source"], r["n_rows"], r["chars_sum"], r["lo"])
           for r in MV.read_materialized(spark, mv).collect()}
    assert got == expect
    assert src.read(spark).count() == 50  # both batches appended
    assert MV.check_materialized(spark, catalog, mv)["consistent"]


def test_matview_minmax_randomized_convergence(spark, catalog):
    """Randomized upsert/delete sequences over a TINY value domain
    (heavy ties) with a 2-value buffer: every sync point must equal a
    from-scratch GROUP BY over the engine's current state — covering
    buffer-local deletes, count decrements on tied values, drains with
    refill, and full-group retraction/revival in one walk."""
    import random
    rnd = random.Random(7)
    schema = "doc_id long, source string, n_chars long, _row_kind string"
    src = _mk_src(catalog, "db.mv_rnd_src",
                  spark.createDataFrame([], schema).drop("_row_kind").schema)
    mv = MV.create_materialized_agg(
        catalog, "db.mv_rnd", src, ["source"],
        {"lo": ("min", "n_chars"), "hi": ("max", "n_chars"),
         "n": ("count", "*")},
        minmax_buffer=2)
    live = set()
    for step in range(10):
        batch = []
        for _ in range(rnd.randint(2, 6)):
            doc = rnd.randint(1, 12)
            if live and rnd.random() < 0.35:
                doc = rnd.choice(sorted(live))
                batch.append((doc, "src%d" % (doc % 2),
                              rnd.randint(1, 4), "-D"))
                live.discard(doc)
            else:
                batch.append((doc, "src%d" % (doc % 2),
                              rnd.randint(1, 4), "+I"))
                live.add(doc)
        src.write(spark, spark.createDataFrame(batch, schema))
        if step % 2 == 1:
            MV.sync_materialized_agg(spark, src, mv)
            got = {(r["source"], r["lo"], r["hi"], r["n"]) for r in
                   MV.read_materialized(spark, mv).collect()}
            want = {(r["source"], r["lo"], r["hi"], r["n"]) for r in
                    (src.read(spark).groupBy("source")
                     .agg(F.min("n_chars").alias("lo"),
                          F.max("n_chars").alias("hi"),
                          F.count(F.lit(1)).alias("n")).collect())}
            assert got == want, f"diverged at step {step}"
