"""Merge-engine semantics vs explicit oracles — mirrors the reference's
PartialUpdateMergeFunctionTest / FieldAggregatorTest expectations (F4/F5
fixtures in FIXTURES.md)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_paimon_spark.types import ROW_KIND


def _schema(ddl):
    return T.StructType.fromDDL(ddl)


def test_dedup_latest_wins_and_delete_drops(spark, catalog):
    t = catalog.create_table(
        "db.d", _schema("k bigint, v string"), primary_keys=["k"],
        options={"bucket": "2"})
    t.write(spark, spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.write(spark, spark.createDataFrame([(1, "a2")], "k long, v string"))
    t.write(spark, spark.createDataFrame([(2, "b", "-D")],
                                         "k long, v string, _row_kind string"))
    out = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert out == {1: "a2"}


def test_sequence_field_overrides_commit_order(spark, catalog):
    t = catalog.create_table(
        "db.sf", _schema("k bigint, v string, seq bigint"), primary_keys=["k"],
        options={"bucket": "1", "sequence.field": "seq"})
    t.write(spark, spark.createDataFrame([(1, "newer", 10)], "k long, v string, seq long"))
    t.write(spark, spark.createDataFrame([(1, "older", 5)], "k long, v string, seq long"))
    out = t.read(spark).collect()
    assert out[0]["v"] == "newer"  # higher user seq wins despite later commit


def test_first_row(spark, catalog):
    t = catalog.create_table(
        "db.fr", _schema("k bigint, v string"), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "first-row"})
    t.write(spark, spark.createDataFrame([(1, "first"), (2, "x")], "k long, v string"))
    t.write(spark, spark.createDataFrame([(1, "second")], "k long, v string"))
    out = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert out == {1: "first", 2: "x"}


def test_partial_update_last_non_null(spark, catalog):
    t = catalog.create_table(
        "db.pu", _schema("k bigint, a int, b string"), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update"})
    t.write(spark, spark.createDataFrame([(1, 10, None)], "k long, a int, b string"))
    t.write(spark, spark.createDataFrame([(1, None, "x")], "k long, a int, b string"))
    r = t.read(spark).collect()[0]
    assert (r["a"], r["b"]) == (10, "x")


def test_partial_update_sequence_groups(spark, catalog):
    """F4: group columns gated by their own sequence; a passing group update
    overwrites even with NULL; rows with null group-seq skipped for that
    group (PartialUpdateMergeFunction.updateWithSequenceGroup)."""
    t = catalog.create_table(
        "db.sg", _schema("k bigint, a int, b int, g1 int, c string, g2 int"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update",
                 "fields.g1.sequence-group": "a,b",
                 "fields.g2.sequence-group": "c"})
    rows = "k long, a int, b int, g1 int, c string, g2 int"
    t.write(spark, spark.createDataFrame([(1, 1, 1, 10, "c1", 20)], rows))
    # stale g1 (5 < 10): a,b ignored; fresh g2 (25 > 20): c updates
    t.write(spark, spark.createDataFrame([(1, 9, 9, 5, "c2", 25)], rows))
    # fresh g1 (15): a,b update, b explicitly NULL overwrites; g2 null → skip
    t.write(spark, spark.createDataFrame([(1, 7, None, 15, "zz", None)], rows))
    r = t.read(spark).collect()[0]
    assert (r["a"], r["b"], r["g1"], r["c"], r["g2"]) == (7, None, 15, "c2", 25)


def test_aggregation_engine_field_functions(spark, catalog):
    ddl = ("k bigint, s bigint, mx int, mn int, lv string, lnn string, "
           "fv string, cnt bigint, ba boolean, bo boolean, la string, "
           "col array<string>, pr double")
    t = catalog.create_table(
        "db.ag", _schema(ddl), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.s.aggregate-function": "sum",
                 "fields.mx.aggregate-function": "max",
                 "fields.mn.aggregate-function": "min",
                 "fields.lv.aggregate-function": "last_value",
                 "fields.lnn.aggregate-function": "last_non_null_value",
                 "fields.fv.aggregate-function": "first_value",
                 "fields.cnt.aggregate-function": "count",
                 "fields.ba.aggregate-function": "bool_and",
                 "fields.bo.aggregate-function": "bool_or",
                 "fields.la.aggregate-function": "listagg",
                 "fields.col.aggregate-function": "collect",
                 "fields.pr.aggregate-function": "product"})
    mk = lambda *vals: spark.createDataFrame([vals], ddl)
    t.write(spark, mk(1, 10, 5, 5, "v1", "n1", "f1", 1, True, False, "x", ["a"], 2.0))
    t.write(spark, mk(1, 20, 9, 2, None, None, "f2", 1, True, True, "y", ["b", "a"], 3.0))
    r = t.read(spark).collect()[0]
    assert r["s"] == 30
    assert r["mx"] == 9 and r["mn"] == 2
    assert r["lv"] is None            # last_value: null overwrites
    assert r["lnn"] == "n1"           # last_non_null keeps older non-null
    assert r["fv"] == "f1"
    assert r["cnt"] == 2
    assert r["ba"] is True and r["bo"] is True
    assert r["la"] == "x,y"
    assert r["col"] == ["a", "b", "a"]
    assert r["pr"] == 6.0


def test_aggregation_count_survives_compaction(spark, catalog):
    """Partial count states from compacted files must sum, not re-count."""
    t = catalog.create_table(
        "db.cnt", _schema("k bigint, c bigint"), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.c.aggregate-function": "count"})
    for _ in range(3):
        t.write(spark, spark.createDataFrame([(1, 1)], "k long, c long"))
    t.compact(spark, full=True)
    t.write(spark, spark.createDataFrame([(1, 1)], "k long, c long"))
    assert t.read(spark).collect()[0]["c"] == 4


def test_aggregation_sum_retracts(spark, catalog):
    t = catalog.create_table(
        "db.rt", _schema("k bigint, s bigint"), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.s.aggregate-function": "sum"})
    t.write(spark, spark.createDataFrame([(1, 10), (1, 5)], "k long, s long"))
    t.write(spark, spark.createDataFrame(
        [(1, 5, "-D")], "k long, s long, _row_kind string"))
    assert t.read(spark).collect()[0]["s"] == 10


def test_ignore_delete_option(spark, catalog):
    t = catalog.create_table(
        "db.igd", _schema("k bigint, v string"), primary_keys=["k"],
        options={"bucket": "1", "ignore-delete": "true"})
    t.write(spark, spark.createDataFrame([(1, "a")], "k long, v string"))
    t.write(spark, spark.createDataFrame([(1, "a", "-D")],
                                         "k long, v string, _row_kind string"))
    assert t.read(spark).count() == 1  # delete ignored


def test_multiple_sequence_fields(spark, catalog):
    """Fold order = (seq1, seq2, _SEQUENCE_NUMBER) lexicographic
    (UserDefinedSeqComparator over several sequence.field columns)."""
    t = catalog.create_table(
        "db.sf2", _schema("k bigint, v string, s1 bigint, s2 bigint"),
        primary_keys=["k"], options={"bucket": "1", "sequence.field": "s1,s2"})
    t.write(spark, spark.createDataFrame(
        [(1, "low-major", 1, 99), (2, "a", 5, 5)],
        "k long, v string, s1 long, s2 long"))
    t.write(spark, spark.createDataFrame(
        [(1, "high-major", 2, 0), (2, "b", 5, 4)],
        "k long, v string, s1 long, s2 long"))
    out = {r["k"]: r["v"] for r in t.read(spark).collect()}
    # k=1: s1 dominates (2 > 1) even though s2 is smaller
    # k=2: s1 ties, first commit's s2=5 beats 4 despite later commit
    assert out == {1: "high-major", 2: "a"}


def test_nested_update_keyed_upsert_and_retract(spark, catalog):
    """nested_update with nested-key: adds upsert by key, -D retracts by
    key, and a retract between two adds only cancels the earlier add
    (FieldNestedUpdateAgg.java:45 agg/retract interleaving)."""
    ddl = "k bigint, nested array<struct<id:bigint,v:string>>"
    t = catalog.create_table(
        "db.nu", _schema(ddl), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.nested.aggregate-function": "nested_update",
                 "fields.nested.nested-key": "id"})
    mk = lambda rows, extra="": spark.createDataFrame(rows, ddl + extra)
    t.write(spark, mk([(1, [(10, "a"), (11, "b")])]))
    t.write(spark, mk([(1, [(10, "a2")])]))                # upsert id=10
    t.write(spark, mk([(1, [(11, None)], "-D")],
                      extra=", _row_kind string"))          # retract id=11
    t.write(spark, mk([(1, [(11, "b2")])]))                # re-add id=11
    got = sorted((r["id"], r["v"]) for r in t.read(spark).collect()[0]["nested"])
    assert got == [(10, "a2"), (11, "b2")]


def test_nested_update_keyless_append_and_remove(spark, catalog):
    """Without nested-key: adds append; retract removes equal elements."""
    ddl = "k bigint, nested array<struct<id:bigint,v:string>>"
    t = catalog.create_table(
        "db.nu2", _schema(ddl), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.nested.aggregate-function": "nested_update"})
    t.write(spark, spark.createDataFrame([(1, [(10, "a"), (10, "a")])], ddl))
    t.write(spark, spark.createDataFrame([(1, [(11, "b")])], ddl))
    t.write(spark, spark.createDataFrame(
        [(1, [(10, "a")], "-D")], ddl + ", _row_kind string"))
    got = [(r["id"], r["v"]) for r in t.read(spark).collect()[0]["nested"]]
    assert got == [(11, "b")]  # removeIf drops every equal copy


def test_partial_update_sequence_group_aggregation(spark, catalog):
    """A sequence-group column with fields.<col>.aggregate-function is
    AGGREGATED over the group's passing rows, not overwritten
    (PartialUpdateMergeFunction.java:139-172: agg(accumulator, field) /
    agg(field, accumulator) — a fold over every row whose group sequence
    is non-null)."""
    t = catalog.create_table(
        "db.sga", _schema("k bigint, s int, mx int, g int, c string"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update",
                 "fields.g.sequence-group": "s,mx,c",
                 "fields.s.aggregate-function": "sum",
                 "fields.mx.aggregate-function": "max"})
    rows = "k long, s int, mx int, g int, c string"
    t.write(spark, spark.createDataFrame([(1, 10, 5, 1, "a")], rows))
    t.write(spark, spark.createDataFrame([(1, 20, 9, 3, "b")], rows))
    # null group seq: the whole group is skipped — s/mx/c unchanged
    t.write(spark, spark.createDataFrame([(1, 99, 99, None, "zz")], rows))
    # late (stale) group seq STILL aggregates s and mx, but c (no agg fn)
    # keeps its latest-by-group-seq value
    t.write(spark, spark.createDataFrame([(1, 5, 11, 2, "late")], rows))
    r = t.read(spark).collect()[0]
    assert r["s"] == 35          # 10 + 20 + 5 (99 skipped)
    assert r["mx"] == 11         # max(5, 9, 11)
    assert r["g"] == 3           # max passing group seq
    assert r["c"] == "b"         # last by group seq (3 > 2)


def test_partial_update_sequence_group_retract(spark, catalog):
    """-U/-D rows with a passing group sequence retract group columns:
    plain fields go NULL, sum fields subtract, and the group sequence
    advances (PartialUpdateMergeFunction.retractWithSequenceGroup). A
    later add with a fresh sequence re-sets the plain field."""
    t = catalog.create_table(
        "db.sgr", _schema("k bigint, v string, s int, g int, _rk string"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update",
                 "fields.g.sequence-group": "v,s",
                 "fields.s.aggregate-function": "sum",
                 "rowkind.field": "_rk"})
    rows = "k long, v string, s int, g int, _rk string"
    mk = lambda *vals: spark.createDataFrame([vals], rows)
    t.write(spark, mk(1, "a", 10, 1, "+I"))
    t.write(spark, mk(1, "x", 4, 2, "-U"))   # passing retract: v -> NULL, s -= 4
    t.write(spark, mk(2, "b", 7, 1, "+I"))
    t.write(spark, mk(2, "c", 1, 3, "+U"))   # later add re-sets v
    got = {r["k"]: r for r in t.read(spark).collect()}
    assert got[1]["v"] is None and got[1]["s"] == 6 and got[1]["g"] == 2
    assert got[2]["v"] == "c" and got[2]["s"] == 8 and got[2]["g"] == 3


def test_ignore_delete_skips_update_before(spark, catalog):
    """ignore-delete gates on isRetract(): -U rows are skipped exactly like
    -D (DeduplicateMergeFunction.java:50). A -U arriving after the last +U
    must not erase the key."""
    t = catalog.create_table(
        "db.igd", _schema("k bigint, v string, _rk string"),
        primary_keys=["k"],
        options={"bucket": "1", "ignore-delete": "true",
                 "rowkind.field": "_rk"})
    rows = "k long, v string, _rk string"
    t.write(spark, spark.createDataFrame([(1, "a", "+I")], rows))
    t.write(spark, spark.createDataFrame([(1, "a", "-U")], rows))
    t.write(spark, spark.createDataFrame([(2, "b", "+I")], rows))
    t.write(spark, spark.createDataFrame([(2, "b", "-D")], rows))
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b"}


def test_partial_update_multi_field_sequence_group(spark, catalog):
    """fields.a,b.sequence-group: the group sequence compares (a, b)
    lexicographically (UserDefinedSeqComparator); all seq fields update
    together on a passing row."""
    t = catalog.create_table(
        "db.msg", _schema("k bigint, v string, s1 int, s2 int"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update",
                 "fields.s1,s2.sequence-group": "v"})
    rows = "k long, v string, s1 int, s2 int"
    t.write(spark, spark.createDataFrame([(1, "a", 1, 9)], rows))
    # higher major wins despite lower minor
    t.write(spark, spark.createDataFrame([(1, "b", 2, 0)], rows))
    # stale major: ignored
    t.write(spark, spark.createDataFrame([(1, "c", 1, 99)], rows))
    r = t.read(spark).collect()[0]
    assert (r["v"], r["s1"], r["s2"]) == ("b", 2, 0)


def test_partial_update_nongroup_aggregation_allowed(spark, catalog):
    """With ANY sequence group defined, an aggregator on a NON-group field
    is legal and folds unconditionally on add rows
    (updateWithSequenceGroup's seqComparator==null branch)."""
    t = catalog.create_table(
        "db.nga", _schema("k bigint, v string, g int, total int"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update",
                 "fields.g.sequence-group": "v",
                 "fields.total.aggregate-function": "sum"})
    rows = "k long, v string, g int, total int"
    t.write(spark, spark.createDataFrame([(1, "a", 1, 10)], rows))
    # stale group seq: v ignored, but total STILL aggregates
    t.write(spark, spark.createDataFrame([(1, "zz", 0, 5)], rows))
    r = t.read(spark).collect()[0]
    assert (r["v"], r["total"]) == ("a", 15)


def test_partial_update_duplicate_group_membership_rejected(spark, catalog):
    import pytest
    t = catalog.create_table(
        "db.dup", _schema("k bigint, a int, g1 int, g2 int"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update",
                 "fields.g1.sequence-group": "a",
                 "fields.g2.sequence-group": "a"})
    rows = "k long, a int, g1 int, g2 int"
    t.write(spark, spark.createDataFrame([(1, 1, 1, 1)], rows))
    t.write(spark, spark.createDataFrame([(1, 2, 2, 2)], rows))
    with pytest.raises(ValueError, match="repeatedly"):
        t.read(spark).collect()


def test_partial_update_randomized_vs_reference_fold(spark):
    """Differential test of the whole sequence-group matrix: 300 keys of
    pseudo-random event sequences (adds/retracts, nulls, a 2-field group,
    a grouped sum, a non-group sum, a plain non-group field) merged by
    _partial_update must equal a direct Python re-implementation of the
    reference fold (updateWithSequenceGroup / retractWithSequenceGroup),
    processed in LSN order. One Spark job for all keys."""
    from incubator_paimon_spark.merge_engines import apply_merge
    from incubator_paimon_spark.metadata.schema import TableSchema
    from incubator_paimon_spark.types import SEQUENCE_NUMBER, VALUE_KIND

    schema = TableSchema.create(
        _schema("k bigint, v int, s int, g1 int, g2 int, t int, u int"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "partial-update",
                 "fields.g1,g2.sequence-group": "v,s",
                 "fields.s.aggregate-function": "sum",
                 "fields.t.aggregate-function": "sum"})

    x = 7

    def rnd(n):
        nonlocal x
        x = (x * 1103515245 + 12345) % (1 << 31)
        return x % n

    def maybe(n):  # small int or None
        r = rnd(n + 1)
        return None if r == 0 else r

    kinds = ["+I", "+U", "-U", "-D"]
    rows, expect = [], {}
    for k in range(300):
        n_events = 1 + rnd(6)
        state = {"v": None, "s": None, "g1": None, "g2": None,
                 "t": None, "u": None}
        saw_add = False
        for lsn in range(n_events):
            kind = kinds[rnd(4)]
            ev = {"v": maybe(5), "s": maybe(5), "g1": maybe(4),
                  "g2": maybe(4), "t": maybe(5), "u": maybe(5)}
            rows.append((k, ev["v"], ev["s"], ev["g1"], ev["g2"],
                         ev["t"], ev["u"], kind, lsn))
            key = lambda g1, g2: ((g1 is not None, g1 if g1 is not None else 0),
                                  (g2 is not None, g2 if g2 is not None else 0))
            empty = ev["g1"] is None and ev["g2"] is None
            passing = (not empty and
                       key(ev["g1"], ev["g2"]) >= key(state["g1"], state["g2"]))
            sum_agg = lambda acc, f: (acc if f is None else
                                      (f if acc is None else acc + f))
            sum_ret = lambda acc, f: (acc if f is None else
                                      (-f if acc is None else acc - f))
            if kind in ("-U", "-D"):
                if not empty:
                    if passing:
                        state["g1"], state["g2"] = ev["g1"], ev["g2"]
                        state["v"] = None
                        state["s"] = sum_ret(state["s"], ev["s"])
                    else:
                        state["s"] = sum_ret(state["s"], ev["s"])
                # non-group fields untouched by retracts
            else:
                saw_add = True
                if ev["u"] is not None:
                    state["u"] = ev["u"]
                state["t"] = sum_agg(state["t"], ev["t"])
                if not empty:
                    if passing:
                        state["g1"], state["g2"] = ev["g1"], ev["g2"]
                        state["v"] = ev["v"]
                        state["s"] = sum_agg(state["s"], ev["s"])
                    else:
                        state["s"] = sum_agg(ev["s"], state["s"])
        expect[k] = dict(state)

    df = spark.createDataFrame(
        rows, f"k long, v int, s int, g1 int, g2 int, t int, u int, "
              f"{VALUE_KIND} string, {SEQUENCE_NUMBER} long")
    got = {r["k"]: r for r in apply_merge(df, schema).collect()}
    assert set(got) == set(expect)
    for k, st_ in expect.items():
        for f_ in ("v", "s", "g1", "g2", "t", "u"):
            assert got[k][f_] == st_[f_], (k, f_, dict(got[k].asDict()), st_)


def test_dedup_randomized_vs_reference_fold(spark):
    """Randomized differential for deduplicate + sequence.field: for each
    key the survivor must be the row a reference-style LSN-order fold
    keeps — highest (seq, LSN) wins, null seq loses to any non-null, and
    a surviving retract erases the key."""
    from incubator_paimon_spark.merge_engines import apply_merge
    from incubator_paimon_spark.metadata.schema import TableSchema
    from incubator_paimon_spark.types import SEQUENCE_NUMBER, VALUE_KIND

    schema = TableSchema.create(
        _schema("k bigint, v int, seq int"), primary_keys=["k"],
        options={"bucket": "1", "sequence.field": "seq"})

    x = 99

    def rnd(n):
        nonlocal x
        x = (x * 1103515245 + 12345) % (1 << 31)
        return x % n

    kinds = ["+I", "+U", "-U", "-D"]
    rows, expect = [], {}
    for k in range(300):
        best = None  # (key_tuple, value, kind)
        for lsn in range(1 + rnd(5)):
            kind = kinds[rnd(4)]
            v = rnd(100)
            seq = None if rnd(4) == 0 else rnd(10)
            rows.append((k, v, seq, kind, lsn))
            key = ((seq is not None, seq if seq is not None else 0), lsn)
            if best is None or key >= best[0]:
                best = (key, v, kind)
        if best[2] in ("+I", "+U"):
            expect[k] = best[1]
    df = spark.createDataFrame(
        rows, f"k long, v int, seq int, {VALUE_KIND} string, "
              f"{SEQUENCE_NUMBER} long")
    got = {r["k"]: r["v"] for r in apply_merge(df, schema).collect()}
    assert got == expect


def test_aggregation_randomized_vs_reference_fold(spark):
    """Randomized differential for the aggregation engine across the core
    aggregator matrix (sum/max/min/last_value/last_non_null/first_value/
    count/bool_or/listagg) vs a Python fold in LSN order with the
    reference's null and retract rules."""
    from incubator_paimon_spark.merge_engines import apply_merge
    from incubator_paimon_spark.metadata.schema import TableSchema
    from incubator_paimon_spark.types import SEQUENCE_NUMBER, VALUE_KIND

    schema = TableSchema.create(
        _schema("k bigint, s int, mx int, mn int, lv int, lnn int, fv int, "
                "cnt bigint, bo boolean, la string"),
        primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.s.aggregate-function": "sum",
                 "fields.mx.aggregate-function": "max",
                 "fields.mn.aggregate-function": "min",
                 "fields.lv.aggregate-function": "last_value",
                 "fields.lnn.aggregate-function": "last_non_null_value",
                 "fields.fv.aggregate-function": "first_value",
                 "fields.cnt.aggregate-function": "count",
                 "fields.bo.aggregate-function": "bool_or",
                 "fields.la.aggregate-function": "listagg"})

    x = 1234

    def rnd(n):
        nonlocal x
        x = (x * 1103515245 + 12345) % (1 << 31)
        return x % n

    def maybe(n):
        r = rnd(n + 1)
        return None if r == 0 else r

    rows, expect = [], {}
    for k in range(200):
        st = {"s": None, "mx": None, "mn": None, "lv": None, "lnn": None,
              "fv": None, "cnt": 0, "bo": None, "la": None,
              "first_seen": False}
        for lsn in range(1 + rnd(5)):
            add = rnd(4) != 0  # 75% adds
            kind = ("+I", "+U")[rnd(2)] if add else ("-U", "-D")[rnd(2)]
            ev = {"s": maybe(9), "mx": maybe(9), "mn": maybe(9),
                  "lv": maybe(9), "lnn": maybe(9), "fv": maybe(9),
                  "cnt": 1, "bo": [None, True, False][rnd(3)],
                  "la": None if rnd(3) == 0 else f"t{rnd(5)}"}
            rows.append((k, ev["s"], ev["mx"], ev["mn"], ev["lv"],
                         ev["lnn"], ev["fv"], ev["cnt"], ev["bo"], ev["la"],
                         kind, lsn))
            if add:
                st["s"] = (ev["s"] if st["s"] is None else
                           st["s"] if ev["s"] is None else st["s"] + ev["s"])
                st["mx"] = (ev["mx"] if st["mx"] is None else st["mx"]
                            if ev["mx"] is None else max(st["mx"], ev["mx"]))
                st["mn"] = (ev["mn"] if st["mn"] is None else st["mn"]
                            if ev["mn"] is None else min(st["mn"], ev["mn"]))
                st["lv"] = ev["lv"]                      # null overwrites
                if ev["lnn"] is not None:
                    st["lnn"] = ev["lnn"]
                if not st["first_seen"]:
                    st["fv"] = ev["fv"]                  # first row, even null
                    st["first_seen"] = True
                st["cnt"] += 1                           # non-null cnt input
                if ev["bo"] is not None:
                    st["bo"] = ev["bo"] if st["bo"] is None else (st["bo"] or ev["bo"])
                if ev["la"] is not None:
                    st["la"] = (ev["la"] if st["la"] is None
                                else st["la"] + "," + ev["la"])
            else:
                # retract: sum/count subtract; the rest ignore retracts
                st["s"] = (st["s"] if ev["s"] is None else
                           (-ev["s"] if st["s"] is None else st["s"] - ev["s"]))
                st["cnt"] -= 1
        expect[k] = dict(st)
    df = spark.createDataFrame(
        rows, f"k long, s int, mx int, mn int, lv int, lnn int, fv int, "
              f"cnt long, bo boolean, la string, {VALUE_KIND} string, "
              f"{SEQUENCE_NUMBER} long")
    got = {r["k"]: r for r in apply_merge(df, schema).collect()}
    assert set(got) == set(expect)
    for k, st in expect.items():
        for f_ in ("s", "mx", "mn", "lv", "lnn", "fv", "cnt", "bo", "la"):
            assert got[k][f_] == st[f_], (k, f_, dict(got[k].asDict()), st)


def test_listagg_custom_delimiter(spark, catalog):
    t = catalog.create_table(
        "db.lad", _schema("k bigint, la string"), primary_keys=["k"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.la.aggregate-function": "listagg",
                 "fields.la.list-agg-delimiter": "|"})
    t.write(spark, spark.createDataFrame([(1, "a")], "k long, la string"))
    t.write(spark, spark.createDataFrame([(1, "b")], "k long, la string"))
    t.write(spark, spark.createDataFrame([(2, None)], "k long, la string"))
    got = {r["k"]: r["la"] for r in t.read(spark).collect()}
    assert got == {1: "a|b", 2: None}


def test_stop_trigger_forces_compaction(spark, catalog, customer):
    """num-sorted-run.stop-trigger: a bucket past the write-stall bar is
    compacted unconditionally even when the universal heuristics would
    decline (the reference stalls the writer; the sync hook merges)."""
    c = customer.select("c_custkey", "c_name").limit(40)
    # write-only writers accumulate runs with no compaction at all
    t = catalog.create_table("db.stoptr", c.schema,
                             primary_keys=["c_custkey"],
                             options={"bucket": "1", "write-only": "true",
                                      "num-sorted-run.compaction-trigger": "100",
                                      "num-sorted-run.stop-trigger": "4"})
    for _ in range(5):
        t.write(spark, c)
    from incubator_paimon_spark.compact import bucket_sorted_runs
    runs0 = len(bucket_sorted_runs(catalog.get_table("db.stoptr").entries_at()))
    assert runs0 == 5
    # a normal writer takes over: trigger=100 declines, stop=4 forces
    catalog.sql(spark, "ALTER TABLE db.stoptr SET TBLPROPERTIES "
                       "('write-only'='false')")
    t2 = catalog.get_table("db.stoptr")
    t2.write(spark, c)
    t3 = catalog.get_table("db.stoptr")
    assert len(bucket_sorted_runs(t3.entries_at())) == 1
    assert t3.read(spark).count() == 40
