"""Incremental materialized aggregation views on engine tables.

The reference's aggregation merge engine (paimon-core/.../mergetree/
compact/aggregate/FieldAggregator.java and the fieldagg/ family) turns a
PK table into a fold: each commit appends per-key deltas, merge-on-read
yields the running aggregate. This module generalizes the pattern the
engine's own maintained stats tables use (DSIR counts, BM25 doc stats)
into a user-facing feature: declare `SELECT group_by, agg(col) ...` once,
and the view is maintained from the source table's changelog at
O(changed rows) per sync — never O(source), except the documented
dirty-group recompute below.

Design (Spark-first):
- The view IS an engine table: PK = group-by columns,
  merge-engine=aggregation. Reading the view is a plain table read.
- Maintenance is `sync.replay_changelog`: each chunk contributes one
  bounded commit. sum/count fields RETRACT exactly as fold deltas —
  removed or pre-update row images enter with sign −1 (the sum field
  aggregator nets them), so UPDATE and DELETE keep those outputs
  consistent with zero extra IO.
- avg is derived: declared `avg` columns materialize hidden `__sum` /
  `__cnt` fields (both retractable) and `read_materialized` projects the
  quotient — exact under updates, no float drift.
- min/max cannot retract from a fold (dropping the current minimum needs
  the runner-up), so they use the textbook hybrid: the stored field is a
  RESOLVED extreme under last_value (replacement) semantics; a sync
  chunk combines it with the chunk's own extreme for groups that only
  gained rows, and RECOMPUTES from the source — restricted to the dirty
  groups, a leftsemi join the planner can prune — for groups that lost
  rows. Views with min/max also carry a hidden `mv__alive` row count so
  fully-retracted groups disappear at read and a revived group cannot
  inherit a stale extreme.

Scale shape: each sync chunk is one groupBy over the chunk's changed
rows (map-side combined, output ≤ |touched groups|) plus, for min/max
views, one |groups|-sized view read and — only when the chunk deleted
or updated rows — one source scan semi-joined down to the dirty groups.
The view's own size is |groups|, independent of source size; a 100 TB
source with a 1 M-group view costs the view's bytes at read time.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

_RETRACTABLE = {"sum", "count", "avg"}
_EXTREMES = {"min", "max"}
_FNS = _RETRACTABLE | _EXTREMES

_ALIVE = "mv__alive"

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
                            buckets: int = 4,
                            where: str | None = None):
    """Create the view table for `SELECT group_by…, fn(col) AS out… …
    [WHERE pred]`.

    `aggs` maps output column → (fn, source column); fn ∈ sum | count |
    min | max | avg. `where` is an optional deterministic row predicate
    (Spark SQL expression over source columns — no subqueries): the
    view aggregates only matching rows, and because the changelog hands
    sync BOTH row images, an UPDATE that moves a row across the
    predicate boundary retracts/admits it correctly. The definition is
    pinned in table options (`mv.*`) so sync_materialized_agg needs
    only the two tables.
    """
    import os

    import pyspark.sql.types as T

    if not group_by:
        raise ValueError("group_by must name at least one column")
    bad = {out: fn for out, (fn, _) in aggs.items() if fn not in _FNS}
    if bad:
        raise ValueError(f"unsupported aggregate(s) {bad}; "
                         f"supported: {sorted(_FNS)}")

    fields = [T.StructField(g, _src_field(source_table, g).dataType)
              for g in group_by]
    db_dir = os.path.basename(os.path.dirname(source_table.root_path))
    src_ident = (db_dir.removesuffix(".db") + "." + source_table.name)
    opts = {"bucket": str(buckets), "merge-engine": "aggregation",
            "mv.source": src_ident,
            "mv.group-by": ",".join(group_by),
            "mv.aggs": json.dumps({k: list(v) for k, v in aggs.items()})}
    if where:
        opts["mv.where"] = where

    def add(out, agg_fn, stored_type):
        fields.append(T.StructField(out, stored_type))
        opts[f"fields.{out}.aggregate-function"] = agg_fn

    def sum_type(col, fn):
        st = _SUM_TYPE.get(
            _src_field(source_table, col).dataType.simpleString())
        if st is None:
            raise ValueError(f"{fn}({col}): non-numeric source column")
        return T.DoubleType() if st == "double" else T.LongType()

    if any(out.startswith("mv__") for out in aggs):
        raise ValueError("output names starting with 'mv__' are reserved")
    has_extreme = False
    for out, (fn, col) in aggs.items():
        if fn == "count":
            # count deltas fold as a SUM of ±1 contributions (the count
            # field aggregator cannot retract)
            add(out, "sum", T.LongType())
        elif fn == "sum":
            add(out, "sum", sum_type(col, fn))
        elif fn == "avg":
            add(f"{out}__sum", "sum", sum_type(col, fn))
            add(f"{out}__cnt", "sum", T.LongType())
        else:  # min / max: the stored value is a RESOLVED extreme under
            # replacement semantics; sync combines/recomputes (module doc)
            has_extreme = True
            add(out, "last_value", _src_field(source_table, col).dataType)
    if has_extreme:
        add(_ALIVE, "sum", T.LongType())

    names = [f.name for f in fields]
    dup = sorted({n for n in names if names.count(n) > 1})
    if dup:
        # e.g. an avg output named `x` plus a declared output `x__sum`
        raise ValueError(f"view column name collision: {dup}")

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
    return group_by, aggs, raw.get("mv.where")


def _delta_partials(df, group_by, aggs, sign: int, with_alive: bool):
    """Signed fold contributions for the retractable outputs of one
    chunk side (adds = +1, removed/previous images = −1)."""
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            exprs.append(F.sum(F.lit(sign)).cast("long").alias(out))
        elif fn == "sum":
            exprs.append((F.sum(col) * sign).alias(out))
        elif fn == "avg":
            exprs.append((F.sum(col) * sign).alias(f"{out}__sum"))
            exprs.append(F.sum(F.lit(sign)).cast("long")
                          .alias(f"{out}__cnt"))
    if with_alive:
        exprs.append(F.sum(F.lit(sign)).cast("long").alias(_ALIVE))
    return df.groupBy(*group_by).agg(*exprs)


def _extreme_exprs(aggs):
    return [(F.min(col) if fn == "min" else F.max(col)).alias(out)
            for out, (fn, col) in aggs.items() if fn in _EXTREMES]


def sync_materialized_agg(spark, source_table, mv_table,
                          consumer_id: str | None = None, **kw) -> int:
    """Advance the view to the source's latest snapshot by changelog
    replay (one bounded commit per chunk, stamped
    `commit_identifier=snapshot id` — crash-replay is a filtered no-op,
    so the combine-with-current-state step below can never
    double-apply). Returns source snapshots covered."""
    from .sync import replay_changelog

    group_by, aggs, where = _definition(mv_table)
    extremes = {out: v for out, v in aggs.items() if v[0] in _EXTREMES}
    cid = consumer_id or f"index:{mv_table.name}"
    mv_schema = mv_table.schema.spark_schema()

    def apply(adds, removes, sid):
        if where:
            # both row images filter independently: an UPDATE crossing
            # the predicate boundary retracts on one side and admits on
            # the other
            adds = adds.filter(F.expr(where))
            removes = removes.filter(F.expr(where))
        plus = _delta_partials(adds, group_by, aggs, +1, bool(extremes))
        minus = _delta_partials(removes, group_by, aggs, -1, bool(extremes))
        delta_cols = [c for c in plus.columns if c not in group_by]
        net = (plus.unionByName(minus).groupBy(*group_by)
               .agg(*[F.sum(c).alias(c) for c in delta_cols]))
        if extremes:
            net = _resolve_extremes(spark, source_table, mv_table, net,
                                    adds, removes, group_by, extremes,
                                    sid, where)
        cols = [F.col(f.name).cast(f.dataType) for f in mv_schema.fields]
        mv_table.write(spark, net.select(*cols), commit_identifier=sid)

    return replay_changelog(spark, source_table, cid, apply, **kw)


def _resolve_extremes(spark, source_table, mv_table, net, adds, removes,
                      group_by, extremes, sid, where=None):
    """Attach one RESOLVED value per min/max output to every touched
    group: groups that only gained rows combine the stored extreme with
    the chunk's (both folds are monotone under inserts); groups that
    lost rows ("dirty") are recomputed from the source, semi-joined down
    to just those groups — the bounded partial-recompute classic
    incremental view maintenance prescribes for non-invertible
    aggregates. A dirty group absent from the source resolves to NULL,
    so a later revival starts fresh instead of inheriting a stale
    extreme."""
    chunk = adds.groupBy(*group_by).agg(*_extreme_exprs(extremes))
    dirty = removes.select(*group_by).distinct() \
                   .withColumn("mv__dirty", F.lit(True))
    stored = mv_table.read(spark).select(
        *group_by, *[F.col(o).alias(f"mv__stored_{o}") for o in extremes])
    # read AS OF the chunk's end snapshot, not latest: with more chunks
    # pending, the latest state would leak future rows into this
    # chunk's resolved extremes (convergent for monotone min/max, but
    # each intermediate commit should reflect exactly its snapshot)
    src = source_table.read(spark, snapshot_id=sid)
    if where:
        src = src.filter(F.expr(where))
    recomputed = (src
                  .join(dirty.drop("mv__dirty"), group_by, "leftsemi")
                  .groupBy(*group_by).agg(*_extreme_exprs(extremes)))
    out = (net.join(chunk.select(
                        *group_by,
                        *[F.col(o).alias(f"mv__chunk_{o}") for o in extremes]),
                    group_by, "left")
              .join(dirty, group_by, "left")
              .join(stored, group_by, "left")
              .join(recomputed.select(
                        *group_by,
                        *[F.col(o).alias(f"mv__rec_{o}") for o in extremes]),
                    group_by, "left"))
    for o, (fn, _) in extremes.items():
        comb = F.least if fn == "min" else F.greatest
        resolved = F.when(F.col("mv__dirty"), F.col(f"mv__rec_{o}")) \
            .otherwise(comb(F.col(f"mv__stored_{o}"),
                            F.col(f"mv__chunk_{o}")))
        out = out.withColumn(o, resolved)
    return out.drop("mv__dirty",
                    *[f"mv__{p}_{o}" for o in extremes
                      for p in ("chunk", "stored", "rec")])


def materialize_stream(spark, source_table, mv_table, checkpoint: str,
                       trigger: dict | None = None):
    """Continuous view maintenance as a Structured Streaming query: the
    engine's streaming source on the source table is the TRIGGER (its
    offsets track source snapshots, so FOREIGN-process commits wake the
    daemon — the gap in-process auto_sync cannot cover), and each
    micro-batch runs the normal consumer-tracked sync. The batch's own
    rows are not applied directly: sync re-reads the changelog under
    `replay_changelog`'s pinned-chunk identifiers, so exactly-once
    comes from the table commit protocol rather than the stream's
    checkpoint, and the two progress trackers can never disagree about
    what has been applied (a replayed micro-batch finds the consumer
    already advanced and no-ops). Returns the StreamingQuery.
    """
    from ..datasource import register
    register(spark)
    # cover the backlog inline; the stream (scan.mode=latest on first
    # start, stored offsets on restart) only needs to wake us for
    # commits that arrive AFTER this point, so the trigger never
    # re-scans standing data
    sync_materialized_agg(spark, source_table, mv_table)
    st = (spark.readStream.format("paimon")
          .option("scan.mode", "latest").load(source_table.path))

    def on_batch(_batch_df, _batch_id):
        sync_materialized_agg(spark, source_table, mv_table)

    w = (st.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", checkpoint))
    return w.trigger(**(trigger or {"availableNow": True})).start()


def refresh_materialized(spark, catalog, mv_table) -> int:
    """`REFRESH MATERIALIZED VIEW` body: resolve the pinned source
    identifier and sync. Returns source snapshots covered."""
    src_ident = (mv_table.schema.options or {}).get("mv.source")
    if not src_ident:
        raise ValueError(f"{mv_table.name} is not a materialized view "
                         f"(no mv.source option)")
    return sync_materialized_agg(spark, catalog.get_table(src_ident),
                                 mv_table)


def check_materialized(spark, catalog, mv_table) -> dict:
    """Operational consistency check: compare the incremental view
    against a from-scratch GROUP BY over the source's CURRENT state.
    Doubles quantize to 6 digits before comparison (the incremental
    fold's float order legitimately differs in the last ulp). Returns
    {'consistent': bool, 'view_only': n, 'recompute_only': n}."""
    group_by, aggs, where = _definition(mv_table)
    src = catalog.get_table((mv_table.schema.options or {})["mv.source"])
    s = src.read(spark)
    if where:
        s = s.filter(F.expr(where))
    exprs = []
    for out, (fn, col) in aggs.items():
        f = {"count": lambda c: F.count(F.lit(1)), "sum": F.sum,
             "avg": F.avg, "min": F.min, "max": F.max}[fn]
        exprs.append(f(col).alias(out))
    scratch = s.groupBy(*group_by).agg(*exprs)
    view = read_materialized(spark, mv_table)

    def canon(df):
        cols = [F.round(F.col(f.name).cast("double"), 6).alias(f.name)
                if f.dataType.simpleString() in ("double", "float")
                else F.col(f.name) for f in df.schema.fields]
        return df.select(*cols)

    v, r = canon(view), canon(scratch.select(*view.columns))
    view_only = v.exceptAll(r).count()
    rec_only = r.exceptAll(v).count()
    return {"consistent": view_only == 0 and rec_only == 0,
            "view_only": view_only, "recompute_only": rec_only}


def read_materialized(spark, mv_table, catalog=None):
    """Read the view with declared output columns: hidden avg partials
    project to the exact quotient; everything else passes through. A
    group whose rows were ALL retracted folds to count 0 — such groups
    are filtered out when the view carries a count (declared, or the
    hidden `mv__alive` every min/max view maintains; a sum-only view
    keeps the zeroed row).

    Pass `catalog` to arm the same staleness guard the `*_indexed`
    query paths use: when the source has snapshots the view's consumer
    has not applied (foreign-process writer, missed hook), `warn`
    (default), `fail`, or stay `silent` per the view's
    ``index.staleness-check`` option."""
    group_by, aggs, _where = _definition(mv_table)
    if catalog is not None:
        from .sync import check_index_current
        src = catalog.get_table(
            (mv_table.schema.options or {})["mv.source"])
        check_index_current(
            src, f"index:{mv_table.name}",
            (mv_table.schema.options or {})
            .get("index.staleness-check", "warn"))
    df = mv_table.read(spark)
    cols = [F.col(g) for g in group_by]
    alive = F.col(_ALIVE) if _ALIVE in df.columns else None
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
