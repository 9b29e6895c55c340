"""Property-based tests (hypothesis): the avro codec round-trips arbitrary
typed rows bit-exactly, and predicate stats-pruning is SOUND — a file whose
stats reject a predicate can never contain a matching row."""

from datetime import date, datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from incubator_paimon_spark.formats import avro_codec as A
from incubator_paimon_spark.predicate import Leaf, P

_SCHEMA = T.StructType([
    T.StructField("a", T.LongType()),
    T.StructField("b", T.StringType()),
    T.StructField("c", T.DoubleType()),
    T.StructField("d", T.BooleanType()),
    T.StructField("e", T.DateType()),
    T.StructField("f", T.ArrayType(T.IntegerType())),
    T.StructField("g", T.BinaryType()),
])
_AVRO = A.spark_schema_to_avro(_SCHEMA)

_row = st.fixed_dictionaries({
    "a": st.none() | st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
    "b": st.none() | st.text(max_size=40),
    "c": st.none() | st.floats(allow_nan=False, width=64),
    "d": st.none() | st.booleans(),
    "e": st.none() | st.dates(min_value=date(1, 1, 1),
                              max_value=date(9999, 1, 1)),
    "f": st.none() | st.lists(
        st.none() | st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
        max_size=8),
    "g": st.none() | st.binary(max_size=32),
})


@settings(max_examples=200, deadline=None)
@given(st.lists(_row, max_size=20), st.sampled_from(["null", "deflate"]))
def test_avro_roundtrip_property(rows, codec):
    data = A.write_container(_AVRO, rows, codec=codec, block_rows=7)
    got_schema, it = A.read_container(data)
    assert list(it) == rows
    assert got_schema == _AVRO


_vals = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=300, deadline=None)
@given(st.lists(_vals, min_size=1, max_size=30),
       st.sampled_from(["eq", "ne", "lt", "le", "gt", "ge"]),
       _vals)
def test_stats_pruning_sound_comparisons(values, op, lit):
    """If test_stats() rejects a file, NO value in the file may satisfy the
    predicate — pruning must never drop a matching row."""
    stats = {"x": {"min": min(values), "max": max(values),
                   "null_count": 0}}
    pred = Leaf(op, "x", lit)
    if not pred.test_stats(stats):
        import operator
        fn = {"eq": operator.eq, "ne": operator.ne, "lt": operator.lt,
              "le": operator.le, "gt": operator.gt, "ge": operator.ge}[op]
        assert not any(fn(v, lit) for v in values)


@settings(max_examples=200, deadline=None)
@given(st.lists(_vals, min_size=1, max_size=30),
       st.lists(_vals, min_size=1, max_size=5))
def test_stats_pruning_sound_in(values, lits):
    stats = {"x": {"min": min(values), "max": max(values), "null_count": 0}}
    pred = P.isin("x", lits)
    if not pred.test_stats(stats):
        assert not any(v in lits for v in values)


@settings(max_examples=200, deadline=None)
@given(st.lists(_vals, min_size=1, max_size=30), _vals, _vals)
def test_stats_pruning_sound_between(values, lo, hi):
    stats = {"x": {"min": min(values), "max": max(values), "null_count": 0}}
    pred = P.between("x", lo, hi)
    if not pred.test_stats(stats):
        assert not any(lo <= v <= hi for v in values)


# ---------------------------------------------------------- SQL masking
_sql_frag = st.text(
    alphabet=st.sampled_from(list("abcXYZ09_ ().,=<>'\"`;\n\t%")), max_size=40)


@settings(max_examples=500, deadline=None)
@given(_sql_frag)
def test_mask_literals_invariants(s):
    """For ARBITRARY text: masking is length-preserving, idempotent on its
    own output's unquoted regions, never leaves literal CONTENT visible
    (every char between an opening quote and its closer becomes \\x01),
    and leaves text outside quotes byte-identical."""
    from incubator_paimon_spark.sql import _mask_literals
    m = _mask_literals(s)
    assert len(m) == len(s)
    # walk the ORIGINAL with the same quote automaton and check per-char
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"', "`"):
            assert m[i] == ch  # opening quote preserved
            j = i + 1
            while j < n:
                if s[j] == ch:
                    if j + 1 < n and s[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            end = j if j < n else n
            for k in range(i + 1, end):
                assert m[k] == "\x01", (s, m, k)
            if j < n:
                assert m[j] == ch  # closing quote preserved
                i = j + 1
            else:
                i = n
        else:
            assert m[i] == ch, (s, m, i)
            i += 1


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="'\"`"),
               max_size=40))
def test_mask_literals_noop_without_quotes(s):
    from incubator_paimon_spark.sql import _mask_literals
    assert _mask_literals(s) == s


# -------------------------------------------- predicate IR differentials
def _rand_pred(draw):
    from incubator_paimon_spark.predicate import P
    leaf_kind = draw(st.sampled_from(
        ["eq", "ne", "lt", "le", "gt", "ge", "isin", "not_in",
         "is_null", "is_not_null", "starts_with", "between"]))
    field = draw(st.sampled_from(["a", "b", "s"]))
    if field == "s":
        if leaf_kind in ("isin", "not_in"):
            vals = draw(st.lists(st.sampled_from(
                ["x", "y", "zz", "prefix_1"]), min_size=1, max_size=3))
            return getattr(P, leaf_kind)(field, vals)
        if leaf_kind == "starts_with":
            return P.starts_with(field, draw(st.sampled_from(["x", "pre", ""])))
        if leaf_kind in ("is_null", "is_not_null"):
            return getattr(P, leaf_kind)(field)
        if leaf_kind == "between":
            lo, hi = sorted([draw(st.sampled_from(["a", "m", "zz"])),
                             draw(st.sampled_from(["a", "m", "zz"]))])
            return P.between(field, lo, hi)
        return getattr(P, leaf_kind)(field, draw(st.sampled_from(
            ["x", "y", "zz", ""])))
    v = draw(st.integers(-5, 15))
    if leaf_kind in ("isin", "not_in"):
        return getattr(P, leaf_kind)(
            field, draw(st.lists(st.integers(-5, 15), min_size=1, max_size=4)))
    if leaf_kind == "starts_with":
        return None  # string-only
    if leaf_kind in ("is_null", "is_not_null"):
        return getattr(P, leaf_kind)(field)
    if leaf_kind == "between":
        lo, hi = sorted([v, draw(st.integers(-5, 15))])
        return P.between(field, lo, hi)
    return getattr(P, leaf_kind)(field, v)


@st.composite
def _preds(draw, depth=0):
    if depth < 2 and draw(st.booleans()):
        left = draw(_preds(depth=depth + 1))
        right = draw(_preds(depth=depth + 1))
        return (left & right) if draw(st.booleans()) else (left | right)
    p = _rand_pred(draw)
    while p is None:
        p = _rand_pred(draw)
    return p


_ROWS = [
    {"a": 0, "b": 3, "s": "x"},
    {"a": 7, "b": None, "s": "prefix_1"},
    {"a": -3, "b": 14, "s": ""},
    {"a": None, "b": 0, "s": "zz"},
    {"a": 10, "b": 10, "s": None},
    {"a": 3, "b": -5, "s": "y"},
]


@settings(max_examples=80, deadline=None)
@given(_preds())
def test_predicate_value_agrees_with_spark_and_stats_conservative(pred):
    """Differential: for every random predicate tree, (1) test_value on a
    python row must equal Spark's evaluation of to_column() on the same
    row (SQL three-valued logic folded to False), and (2) test_stats over
    the rows' min/max/null stats must NEVER prune a file that contains a
    matching row — the conservative contract file skipping rests on."""
    spark = _prop_spark()
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["s"]) for r in _ROWS],
        "a int, b int, s string")
    got_spark = {(r["a"], r["b"], r["s"])
                 for r in df.filter(pred.to_column()).collect()}
    got_ir = {(r["a"], r["b"], r["s"]) for r in _ROWS
              if pred.test_value(r)}
    assert got_ir == got_spark
    # conservative stats: one "file" holding ALL rows
    vals = lambda f: [r[f] for r in _ROWS if r[f] is not None]
    stats = {f: {"min": min(vals(f)), "max": max(vals(f)),
                 "null_count": sum(r[f] is None for r in _ROWS)}
             for f in ("a", "b", "s")}
    if got_ir:
        assert pred.test_stats(stats), \
            f"pruned a file containing {len(got_ir)} matching rows"


_PROP_SPARK = None


def _prop_spark():
    global _PROP_SPARK
    if _PROP_SPARK is None:
        from incubator_paimon_spark import get_spark
        _PROP_SPARK = get_spark("prop_pred", cpus=2)
        _PROP_SPARK.sparkContext.setLogLevel("ERROR")
    return _PROP_SPARK
