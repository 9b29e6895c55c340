"""Incremental materialized aggregation views on engine tables.

The reference's aggregation merge engine (paimon-core/.../mergetree/
compact/aggregate/FieldAggregator.java and the fieldagg/ family) turns a
PK table into a fold: each commit appends per-key deltas, merge-on-read
yields the running aggregate. This module generalizes the pattern the
engine's own maintained stats tables use (DSIR counts, BM25 doc stats)
into a user-facing feature: declare `SELECT group_by, agg(col) ...` once,
and the view is maintained from the source table's changelog at
O(changed rows) per sync — never O(source).

Design (Spark-first):
- The view IS an engine table: PK = group-by columns,
  merge-engine=aggregation, one field aggregator per output column. All
  merge work is the engine's normal merge-on-read; reading the view is a
  plain table read.
- Maintenance is `sync.replay_changelog`: each chunk contributes one
  bounded partial-aggregate commit. sum/count RETRACT exactly — removed
  or pre-update row images enter the fold with sign −1, so UPDATE and
  DELETE on the source keep the view consistent, not just INSERT.
  min/max cannot retract from a fold (dropping the current minimum would
  need the runner-up); views containing them are append-only and the
  sync fails fast when the changelog carries removes.
- avg is derived: declared `avg` columns materialize hidden `__sum` /
  `__cnt` fields (both retractable) and `read_materialized` projects the
  quotient — the view stays exact under updates without storing floats
  that would drift.

Scale shape: each sync chunk is one groupBy over the chunk's changed
rows (map-side combined, output ≤ |touched groups|), one table commit.
The view's own size is |groups|, independent of source size; reads are
merge-on-read over PK buckets, so a 100 TB source with a 1 M-group view
costs the view's bytes, not the source's.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

_RETRACTABLE = {"sum", "count"}
_APPEND_ONLY = {"min", "max"}
_FNS = _RETRACTABLE | _APPEND_ONLY | {"avg"}

# sum of small ints must not overflow at corpus scale: widen the stored
# accumulator the way Spark's own sum() does
_SUM_TYPE = {"tinyint": "bigint", "smallint": "bigint", "int": "bigint",
             "bigint": "bigint", "float": "double", "double": "double"}


def _src_field(source_table, col: str):
    ss = source_table.schema.spark_schema()
    if col not in ss.fieldNames():
        raise ValueError(f"column {col!r} not in {source_table.name}")
    return ss[col]


def create_materialized_agg(catalog, name: str, source_table,
                            group_by: list[str],
                            aggs: dict[str, tuple[str, str]],
                            buckets: int = 4):
    """Create the view table for `SELECT group_by…, fn(col) AS out…`.

    `aggs` maps output column → (fn, source column); fn ∈ sum | count |
    min | max | avg. The definition is pinned in table options
    (`mv.*`) so sync_materialized_agg needs only the two tables.
    """
    import pyspark.sql.types as T

    if not group_by:
        raise ValueError("group_by must name at least one column")
    bad = {out: fn for out, (fn, _) in aggs.items() if fn not in _FNS}
    if bad:
        raise ValueError(f"unsupported aggregate(s) {bad}; "
                         f"supported: {sorted(_FNS)}")

    import os
    fields = [T.StructField(g, _src_field(source_table, g).dataType)
              for g in group_by]
    db_dir = os.path.basename(os.path.dirname(source_table.root_path))
    src_ident = (db_dir.removesuffix(".db") + "." + source_table.name)
    opts = {"bucket": str(buckets), "merge-engine": "aggregation",
            "mv.source": src_ident,
            "mv.group-by": ",".join(group_by),
            "mv.aggs": json.dumps({k: list(v) for k, v in aggs.items()})}

    def add(out, fn, stored_type):
        fields.append(T.StructField(out, stored_type))
        # count deltas fold as a SUM of ±1 contributions (the count
        # aggregator cannot retract); min/max use their own aggregators
        opts[f"fields.{out}.aggregate-function"] = \
            "sum" if fn in _RETRACTABLE else fn

    for out, (fn, col) in aggs.items():
        if fn == "count":
            add(out, fn, T.LongType())
        elif fn == "sum":
            st = _SUM_TYPE.get(
                _src_field(source_table, col).dataType.simpleString())
            if st is None:
                raise ValueError(f"sum({col}): non-numeric source column")
            add(out, fn, T.DoubleType() if st == "double" else T.LongType())
        elif fn == "avg":
            st = _SUM_TYPE.get(
                _src_field(source_table, col).dataType.simpleString())
            if st is None:
                raise ValueError(f"avg({col}): non-numeric source column")
            add(f"{out}__sum", "sum",
                T.DoubleType() if st == "double" else T.LongType())
            add(f"{out}__cnt", "count", T.LongType())
        else:  # min / max keep the source column's type
            fields.append(
                T.StructField(out, _src_field(source_table, col).dataType))
            opts[f"fields.{out}.aggregate-function"] = fn

    mv = catalog.create_table(name, T.StructType(fields),
                              primary_keys=list(group_by), options=opts)
    # unlike indexes bootstrapped from a source READ, a view always
    # starts empty — replay-from-the-beginning is always correct, so pin
    # the default consumer here (a custom consumer_id passed to
    # sync_materialized_agg still needs its own write_consumer pin)
    source_table.write_consumer(f"index:{mv.name}", 0)
    return mv


def _definition(mv_table):
    raw = mv_table.schema.options or {}
    group_by = raw["mv.group-by"].split(",")
    aggs = {k: tuple(v) for k, v in json.loads(raw["mv.aggs"]).items()}
    return group_by, aggs


def _partials(df, group_by, aggs, sign: int):
    """One bounded partial-aggregate frame: each retractable output is
    its signed contribution; min/max only ever see sign=+1."""
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            exprs.append(F.sum(F.lit(sign)).cast("long").alias(out))
        elif fn == "sum":
            exprs.append((F.sum(col) * sign).alias(out))
        elif fn == "avg":
            exprs.append((F.sum(col) * sign).alias(f"{out}__sum"))
            exprs.append(F.sum(F.lit(sign)).cast("long").alias(f"{out}__cnt"))
        elif fn == "min":
            exprs.append(F.min(col).alias(out))
        else:
            exprs.append(F.max(col).alias(out))
    return df.groupBy(*group_by).agg(*exprs)


def sync_materialized_agg(spark, source_table, mv_table,
                          consumer_id: str | None = None, **kw) -> int:
    """Advance the view to the source's latest snapshot by changelog
    replay (one bounded partial-aggregate commit per chunk, stamped
    `commit_identifier=snapshot id` — crash-replay is a filtered
    no-op). Returns source snapshots covered."""
    from .sync import replay_changelog

    group_by, aggs = _definition(mv_table)
    append_only = any(fn in _APPEND_ONLY for fn, _ in aggs.values())
    cid = consumer_id or f"index:{mv_table.name}"
    mv_schema = mv_table.schema.spark_schema()

    def apply(adds, removes, sid):
        plus = _partials(adds, group_by, aggs, +1)
        if append_only:
            if not removes.isEmpty():
                raise ValueError(
                    f"materialized view {mv_table.name} contains min/max "
                    f"(fold cannot retract) but the source changelog "
                    f"carries UPDATE/DELETE row images; rebuild the view "
                    f"or restrict it to sum/count/avg")
            net = plus
        else:
            minus = _partials(removes, group_by, aggs, -1)
            net = plus.unionByName(minus).groupBy(*group_by).agg(
                *[F.sum(c).alias(c) for c in plus.columns
                  if c not in group_by])
        cols = [F.col(f.name).cast(f.dataType) for f in mv_schema.fields]
        mv_table.write(spark, net.select(*cols), commit_identifier=sid)

    return replay_changelog(spark, source_table, cid, apply, **kw)


def refresh_materialized(spark, catalog, mv_table) -> int:
    """`REFRESH MATERIALIZED VIEW` body: resolve the pinned source
    identifier and sync. Returns source snapshots covered."""
    src_ident = (mv_table.schema.options or {}).get("mv.source")
    if not src_ident:
        raise ValueError(f"{mv_table.name} is not a materialized view "
                         f"(no mv.source option)")
    return sync_materialized_agg(spark, catalog.get_table(src_ident),
                                 mv_table)


def read_materialized(spark, mv_table):
    """Read the view with declared output columns: hidden avg partials
    project to the exact quotient; everything else passes through. A
    group whose rows were ALL retracted folds to count 0 — such groups
    are filtered out when the view carries a count (declare one to get
    group-deletion semantics; a sum-only view keeps the zeroed row)."""
    group_by, aggs = _definition(mv_table)
    df = mv_table.read(spark)
    cols = [F.col(g) for g in group_by]
    alive = None
    for out, (fn, _) in aggs.items():
        if fn == "avg":
            cols.append((F.col(f"{out}__sum")
                         / F.col(f"{out}__cnt")).alias(out))
            alive = alive if alive is not None else F.col(f"{out}__cnt")
        else:
            cols.append(F.col(out))
            if fn == "count" and alive is None:
                alive = F.col(out)
    if alive is not None:
        df = df.filter(alive > 0)
    return df.select(*cols)
