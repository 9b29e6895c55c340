"""Per-field aggregate functions for the `aggregation` merge engine.

Reference dispatch: paimon-core/src/main/java/org/apache/paimon/mergetree/
compact/aggregate/FieldAggregator.java:59-112 with one class per function
(FieldSumAgg.java:26, FieldMaxAgg.java:26, FieldLastValueAgg.java:24, ...).

Spark-first re-expression: each option string maps to a *Column aggregate
expression* evaluated inside ``groupBy(pk).agg(...)`` — i.e. hash aggregation
with map-side partial aggregation, whole-stage codegen, and spill, instead of
the reference's per-row fold inside the LSM merge iterator.

Fold-order fidelity: the reference folds rows in sequence order. Ordered
aggregates here take an ``order`` struct column ``(user seq fields...,
_SEQUENCE_NUMBER)`` so max_by/min_by reproduce the fold result without a sort.
For order-sensitive *list* results (listagg/collect) we sort the collected
(order, value) pairs per group — group-local, bounded by group size.

Partial-state fidelity across compaction: a compacted row stores the folded
partial state. For idempotent/associative functions (sum, max, min, bool_*,
last/first, product, listagg, collect, merge_map) re-folding partials is
exact. ``count`` partials are *values* not rows, so rows read from compacted
files (level > 0) contribute their stored count while raw level-0 rows
contribute 1-per-non-null — see the ``level`` column threading in read.py.
(Deviation from FieldCountAgg.java:44's quirky seed-with-1 behavior: we count
exactly; the reference's fold can undercount after compaction.)

Retraction (-U/-D rows): sum/count subtract (FieldSumAgg.retract); the
non-retractable functions ignore retract rows, equivalent to the reference's
``fields.<f>.ignore-retract`` wrapper (FieldIgnoreRetractAgg.java:22).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class AggCtx:
    order: Column        # struct(user-seq..., _SEQUENCE_NUMBER) — fold order
    is_add: Column       # _VALUE_KIND in (+I, +U)
    level: Column        # file LSM level (0 = raw input row)
    dtype: object = None  # Spark DataType of the field
    options: dict | None = None  # raw table options (per-field knobs)
    field: str = ""


def ordered_list(c: Column, order: Column, keep_nulls: bool = False) -> Column:
    """collect values as a seq-ordered array (group-local sort)."""
    pair = F.struct(order.alias("o"), c.alias("v"))
    if not keep_nulls:
        pair = F.when(c.isNotNull(), pair)
    return F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["v"])


def _adds_only(c: Column, ctx: AggCtx) -> Column:
    return F.when(ctx.is_add, c)


def agg_sum(c, ctx):
    # retractable: -U/-D subtract (FieldSumAgg)
    signed = F.when(ctx.is_add, c).otherwise(-c)
    return F.sum(signed)


def agg_product(c, ctx):
    lst = ordered_list(_adds_only(c, ctx), ctx.order)
    init = F.lit(None).cast("double")
    folded = F.aggregate(lst, init,
                         lambda acc, x: F.coalesce(acc * x.cast("double"), x.cast("double")))
    return folded if ctx.dtype is None else folded.cast(ctx.dtype)


def agg_max(c, ctx):
    return F.max(_adds_only(c, ctx))


def agg_min(c, ctx):
    return F.min(_adds_only(c, ctx))


def agg_last_value(c, ctx):
    # null value from the latest row *does* overwrite (FieldLastValueAgg)
    return F.max_by(c, F.when(ctx.is_add, ctx.order))


def agg_last_non_null_value(c, ctx):
    return F.max_by(c, F.when(ctx.is_add & c.isNotNull(), ctx.order))


def agg_first_value(c, ctx):
    return F.min_by(c, F.when(ctx.is_add, ctx.order))


def agg_first_non_null_value(c, ctx):
    return F.min_by(c, F.when(ctx.is_add & c.isNotNull(), ctx.order))


def agg_listagg(c, ctx):
    delim = ","
    if ctx.options:
        delim = ctx.options.get(f"fields.{ctx.field}.list-agg-delimiter", ",")
    lst = ordered_list(_adds_only(c, ctx), ctx.order)
    # zero non-null inputs fold to NULL, not '' — FieldListaggAgg leaves
    # the accumulator null when every agg(acc, in) saw a null input
    return F.when(F.size(lst) > 0, F.array_join(lst, delim))


def agg_bool_and(c, ctx):
    return F.bool_and(_adds_only(c, ctx))


def agg_bool_or(c, ctx):
    return F.bool_or(_adds_only(c, ctx))


def agg_count(c, ctx):
    # level-0 rows contribute 1 per non-null; compacted rows carry partials
    raw = F.when(c.isNotNull(), F.lit(1)).otherwise(F.lit(0)).cast("long")
    contrib = F.when(ctx.level > 0, c.cast("long")).otherwise(raw)
    signed = F.when(ctx.is_add, contrib).otherwise(-contrib)
    out = F.coalesce(F.sum(signed), F.lit(0))
    return out if ctx.dtype is None else out.cast(ctx.dtype)


def agg_collect(c, ctx):
    # field type is ARRAY<T>; inputs are arrays; merge = concat (+ distinct)
    flat = F.flatten(ordered_list(_adds_only(c, ctx), ctx.order))
    distinct = False
    if ctx.options:
        distinct = str(ctx.options.get(f"fields.{ctx.field}.distinct", "false")).lower() == "true"
    return F.array_distinct(flat) if distinct else flat


def agg_merge_map(c, ctx):
    # requires spark.sql.mapKeyDedupPolicy=LAST_WIN (set by session.get_spark)
    maps = ordered_list(_adds_only(c, ctx), ctx.order)
    empty = F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
    if ctx.dtype is not None:
        empty = F.map_from_entries(F.array().cast(f"array<struct<key:{ctx.dtype.keyType.simpleString()},value:{ctx.dtype.valueType.simpleString()}>>"))
    return F.aggregate(maps, empty, lambda acc, m: F.map_concat(acc, m))


def agg_primary_key(c, ctx):
    return F.first(c)


def agg_nested_update(c, ctx):
    """nested_update: the field is ARRAY<ROW> representing a nested table
    (FieldNestedUpdateAgg.java:45). With ``fields.<f>.nested-key`` set,
    add-rows upsert by key and retract-rows delete by key; without it,
    add-rows append and retract-rows remove equal elements.

    One interleaved fold over the seq-ordered (is_add, array) steps — a
    retract between two adds of the same key must only cancel the earlier
    add (agg/retract calls interleave in the reference's merge loop).
    Keep-last dedup runs once at the end: concat keeps every add, each
    retract step filters the accumulator, and the final pass keeps the
    latest row per key. Deterministic order: position of last occurrence.
    """
    nested_key: list[str] = []
    if ctx.options:
        nk = ctx.options.get(f"fields.{ctx.field}.nested-key")
        if nk:
            nested_key = [s.strip() for s in nk.split(",")]

    pair = F.when(c.isNotNull(), F.struct(ctx.order.alias("o"),
                                          ctx.is_add.alias("add"),
                                          c.alias("v")))
    steps = F.transform(F.array_sort(F.collect_list(pair)),
                        lambda s: F.struct(s["add"].alias("add"),
                                           s["v"].alias("v")))
    empty = F.array().cast(ctx.dtype)

    if nested_key:
        def kproj(x):
            return F.struct(*[x[k] for k in nested_key])

        folded = F.aggregate(
            steps, empty,
            lambda acc, st: F.when(st["add"], F.concat(acc, st["v"]))
            .otherwise(F.filter(acc, lambda x: ~F.exists(
                st["v"], lambda y: kproj(x).eqNullSafe(kproj(y))))))
        # keep-last per key: element i survives iff no later element shares
        # its key (group-local O(n²) over an in-memory array)
        result = F.filter(folded, lambda x, i: ~F.exists(
            F.slice(folded, i + F.lit(2), F.size(folded)),
            lambda y: kproj(x).eqNullSafe(kproj(y))))
    else:
        folded = F.aggregate(
            steps, empty,
            lambda acc, st: F.when(st["add"], F.concat(acc, st["v"]))
            .otherwise(F.filter(acc, lambda x: ~F.exists(
                st["v"], lambda y: x.eqNullSafe(y)))))
        result = folded
    # all-null / retract-only input folds to NULL like the reference's
    # null accumulator (never seeded by an add)
    has_add = F.exists(steps, lambda s: s["add"])
    return F.when(has_add, result).otherwise(F.lit(None).cast(ctx.dtype))


AGGREGATORS = {
    "sum": agg_sum,
    "product": agg_product,
    "max": agg_max,
    "min": agg_min,
    "last_value": agg_last_value,
    "last_non_null_value": agg_last_non_null_value,
    "first_value": agg_first_value,
    "first_non_null_value": agg_first_non_null_value,
    "first_not_null_value": agg_first_non_null_value,  # legacy alias
    "listagg": agg_listagg,
    "bool_and": agg_bool_and,
    "bool_or": agg_bool_or,
    "count": agg_count,
    "collect": agg_collect,
    "merge_map": agg_merge_map,
    "primary-key": agg_primary_key,
    "nested_update": agg_nested_update,
}
