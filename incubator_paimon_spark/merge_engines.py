"""Merge engines: the PK-table merge-on-read transforms.

Reference factory: paimon-core/.../table/PrimaryKeyTableUtils.java:52; engines:
- deduplicate: DeduplicateMergeFunction.java:31-84
- first-row:   FirstRowMergeFunction.java:33
- partial-update: PartialUpdateMergeFunction.java:57-474
- aggregation: AggregateMergeFunction.java:44

The reference folds rows per key inside an LSM loser-tree iterator
(SortMergeReaderWithLoserTree.java:34). Spark-first re-expression: one
``groupBy(partition..., pk...)`` per read with max_by/min_by/aggregate
expressions — hash aggregate with partial (map-side) aggregation, AQE-sized
shuffle, codegen; no per-row Python.

Fold order = (user sequence fields..., _SEQUENCE_NUMBER) — `sequence.field`
semantics per CoreOptions.java:535 with the commit LSN as tiebreak, matching
UserDefinedSeqComparator + KeyValue.sequenceNumber ordering. Nulls order
first (a null user-seq loses to any non-null), matching null-as-smallest
comparators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.aggregates import AGGREGATORS, AggCtx
from .metadata.schema import TableSchema
from .types import ADD_KINDS, RETRACT_KINDS, SEQUENCE_NUMBER, VALUE_KIND

LEVEL_COL = "__level"


def order_struct(schema: TableSchema) -> Column:
    cols = [F.col(c) for c in schema.core_options.sequence_field]
    cols.append(F.col(SEQUENCE_NUMBER))
    return F.struct(*cols)


def merge_key(schema: TableSchema) -> list[str]:
    """Group keys for the merge: partition keys + trimmed primary keys."""
    return list(schema.partition_keys) + schema.trimmed_primary_keys()


def apply_merge(df: DataFrame, schema: TableSchema, drop_deletes: bool = True) -> DataFrame:
    """drop_deletes=False is the intermediate-compaction mode: a surviving
    DELETE row must be kept so it can still cancel rows in older (higher)
    levels not part of the rewrite (DropDeleteReader applies only when the
    merge covers the whole key range down to the max level)."""
    engine = schema.core_options.merge_engine
    if engine == "deduplicate":
        return _dedup(df, schema, latest=True, drop_deletes=drop_deletes)
    if engine == "first-row":
        return _dedup(df, schema, latest=False)
    if engine == "partial-update":
        return _partial_update(df, schema)
    if engine == "aggregation":
        return _aggregation(df, schema)
    raise ValueError(engine)


def _user_columns(schema: TableSchema, df: DataFrame) -> list[str]:
    """Schema-ordered user columns present in df (the read may have been
    pruned to a projection before the merge)."""
    present = set(df.columns)
    return [c for c in schema.field_names() if c in present]


def _prepare(df: DataFrame, schema: TableSchema) -> DataFrame:
    if schema.core_options.ignore_delete:
        # ignore-delete skips EVERY retract kind (-U as well as -D):
        # DeduplicateMergeFunction.java:50 / FirstRowMergeFunction.java:55
        # gate on valueKind().isRetract(), not on DELETE alone
        df = df.filter(~F.col(VALUE_KIND).isin(*RETRACT_KINDS))
    return df


def _dedup(df: DataFrame, schema: TableSchema, latest: bool,
           drop_deletes: bool = True) -> DataFrame:
    """deduplicate / first-row via window row_number over the fold order.

    One exchange + one codegen'd sort + a streaming rank filter. This beats
    max_by(struct(all columns)) ~4x: struct-valued max_by forces an
    interpreted SortAggregate with sorts on BOTH sides of the shuffle, while
    row_number stays in whole-stage codegen. Fold order: (sequence fields...,
    _SEQUENCE_NUMBER), nulls smallest — a null user-seq loses to any
    non-null (UserDefinedSeqComparator). If the surviving row is a DELETE
    the key disappears (DeduplicateMergeFunction drop-delete path /
    DropDeleteReader).
    """
    from pyspark.sql import Window as W

    df = _prepare(df, schema)
    keys = merge_key(schema)
    ord_cols = [F.col(c) for c in schema.core_options.sequence_field]
    ord_cols.append(F.col(SEQUENCE_NUMBER))
    order = [c.desc_nulls_last() if latest else c.asc_nulls_first()
             for c in ord_cols]
    w = W.partitionBy(*keys).orderBy(*order)
    out = (df.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1).drop("__rn"))
    if drop_deletes:
        out = out.filter(F.col(VALUE_KIND).isin(*ADD_KINDS))
    return out.select(*_user_columns(schema, df), SEQUENCE_NUMBER, VALUE_KIND)


def _partial_update(df: DataFrame, schema: TableSchema) -> DataFrame:
    """partial-update: last non-null per column; sequence-groups gate their
    columns on the group's own sequence fields (PartialUpdateMergeFunction
    updateWithSequenceGroup: a passing group update overwrites with the new
    value *even when null*; rows whose group-seq fields are all null are
    skipped for that group). A group column that also declares
    `fields.<col>.aggregate-function` is AGGREGATED across the group's
    passing rows, not overwritten — the reference folds agg(accumulator,
    field) for in-order rows and agg(field, accumulator) for late ones
    (PartialUpdateMergeFunction.java:139-172), which over the whole group
    equals a fold in group-sequence order; the registry aggregators
    reproduce exactly that (ordered ones take the (group-seq, LSN) order
    struct, commutative ones don't care)."""
    opts = schema.core_options
    df = _prepare(df, schema)
    keys = merge_key(schema)
    ord_ = order_struct(schema)
    groups = opts.sequence_groups()  # (seq fields...) -> [cols]
    level = F.col(LEVEL_COL) if LEVEL_COL in df.columns else F.lit(0)

    col_group: dict[str, tuple[str, ...]] = {}
    for seq_fields, cols in groups.items():
        for c in cols + list(seq_fields):
            if c in col_group and col_group[c] != seq_fields:
                # PartialUpdateMergeFunction.Factory: "Field %s is defined
                # repeatedly by multiple groups"
                raise ValueError(
                    f"Field {c} is defined repeatedly by multiple "
                    f"sequence-groups")
            col_group[c] = seq_fields

    def _field_type(name):
        return next(f for f in schema.fields if f.name == name).type

    aggs = []
    is_add = F.col(VALUE_KIND).isin(*ADD_KINDS)
    for name in _user_columns(schema, df):
        if name in keys:
            continue
        c = F.col(name)
        agg_fn = opts.field_aggregate_function(name)
        if agg_fn is not None and agg_fn not in AGGREGATORS:
            raise ValueError(
                f"unknown aggregate function {agg_fn!r} for field {name}")
        if agg_fn is not None and name not in col_group:
            if not groups:
                raise NotImplementedError(
                    "aggregation inside partial-update requires a sequence-"
                    "group (reference: 'Must use sequence group for "
                    "aggregation functions')")
            # reference: once ANY group exists, an aggregator on a
            # non-group field is legal and folds UNCONDITIONALLY on add
            # rows (updateWithSequenceGroup seqComparator==null branch);
            # retracts skip it (retractWithSequenceGroup only visits
            # grouped fields)
            ctx = AggCtx(order=ord_, is_add=is_add, level=level,
                         dtype=_field_type(name), options=opts.raw,
                         field=name)
            aggs.append(AGGREGATORS[agg_fn](F.when(is_add, c), ctx)
                        .alias(name))
        elif name in col_group:
            gf = col_group[name]
            # group participation = ANY group seq field non-null
            # (isEmptySequenceGroup); multi-field groups compare
            # lexicographically, LSN as the tiebreak. Retracts participate
            # in group state (retractWithSequenceGroup — a passing -U/-D
            # nulls a plain field, retracts an agg field, advances seqs).
            non_empty = F.lit(False)
            for f_ in gf:
                non_empty = non_empty | F.col(f_).isNotNull()
            g_struct = F.struct(*[F.col(f_) for f_ in gf],
                                F.col(SEQUENCE_NUMBER))
            g_ord = F.when(non_empty, g_struct)
            if agg_fn is not None and name not in gf:
                # rows with an empty group sequence are skipped for this
                # group — mask the value so every aggregator ignores them;
                # retract rows flow through the aggregator's own retract
                # handling (e.g. sum subtracts)
                masked = F.when(non_empty, c)
                ctx = AggCtx(order=g_struct, is_add=is_add, level=level,
                             dtype=_field_type(name), options=opts.raw,
                             field=name)
                aggs.append(AGGREGATORS[agg_fn](masked, ctx).alias(name))
            elif name in gf:
                # seq field: value at the max passing (group-seq, LSN),
                # retracts included (they advance the group sequence)
                aggs.append(F.max_by(c, g_ord).alias(name))
            else:
                # plain group field: the LAST passing event decides — an
                # add overwrites (even with null), a retract nulls
                last = F.max_by(F.struct(F.col(VALUE_KIND).alias("k"),
                                         c.alias("v")), g_ord)
                aggs.append(F.when(last["k"].isin(*ADD_KINDS), last["v"])
                             .alias(name))
        else:
            aggs.append(F.max_by(c, F.when(is_add & c.isNotNull(), ord_)).alias(name))
    aggs.append(F.max(F.col(SEQUENCE_NUMBER)).alias(SEQUENCE_NUMBER))
    if opts.partial_update_remove_record_on_delete:
        aggs.append(F.max_by(F.col(VALUE_KIND), ord_).alias("__last_kind"))
        out = df.groupBy(*keys).agg(*aggs)
        out = out.filter(F.col("__last_kind").isin(*ADD_KINDS)).drop("__last_kind")
    else:
        out = df.groupBy(*keys).agg(*aggs)
    out = out.withColumn(VALUE_KIND, F.lit("+I"))
    return out.select(*_user_columns(schema, df), SEQUENCE_NUMBER, VALUE_KIND)


def _aggregation(df: DataFrame, schema: TableSchema) -> DataFrame:
    """aggregation engine: per-field aggregate from the registry
    (AggregateMergeFunction.java:44 + FieldAggregator.java:59-112).
    Default function when unspecified: last_non_null_value (the reference's
    default 'fields.default-aggregate-function' fallback)."""
    opts = schema.core_options
    df = _prepare(df, schema)
    keys = merge_key(schema)
    ord_ = order_struct(schema)
    is_add = F.col(VALUE_KIND).isin(*ADD_KINDS)
    level = F.col(LEVEL_COL) if LEVEL_COL in df.columns else F.lit(0)
    default_fn = opts.raw.get("fields.default-aggregate-function", "last_non_null_value")

    aggs = []
    present = set(_user_columns(schema, df))
    for f in schema.fields:
        if f.name in keys or f.name not in present:
            continue
        fn_name = opts.field_aggregate_function(f.name) or default_fn
        if fn_name not in AGGREGATORS:
            raise ValueError(f"unknown aggregate function {fn_name!r} for field {f.name}")
        ctx = AggCtx(order=ord_, is_add=is_add, level=level, dtype=f.type,
                     options=opts.raw, field=f.name)
        aggs.append(AGGREGATORS[fn_name](F.col(f.name), ctx).alias(f.name))
    aggs.append(F.max(F.col(SEQUENCE_NUMBER)).alias(SEQUENCE_NUMBER))
    out = df.groupBy(*keys).agg(*aggs)
    out = out.withColumn(VALUE_KIND, F.lit("+I"))
    return out.select(*_user_columns(schema, df), SEQUENCE_NUMBER, VALUE_KIND)
