"""CDC ingestion: JSON changelog parsers + write_changelog.

Parity with paimon-flink-cdc's format parsers (paimon-flink/paimon-flink-cdc/
.../action/cdc/format/{canal,debezium,maxwell,ogg}) re-expressed as pure
Spark column expressions — `from_json` + explode, no per-row Python — so a
Kafka topic of 10^9 CDC events parses inside whole-stage codegen.

Each parser takes a DataFrame with a JSON string column and the *value
schema* (the table's user schema) and returns rows of that schema plus
`_row_kind` ('+I'/'-U'/'+U'/'-D'), ready for `write_changelog` /
`Table.write` (the PK write path applies rowkind natively; SURVEY §2.1 CDC
row). UPDATE events emit the (-U, +U) pair like the reference's
RecordParser.

Formats (all public):
- debezium: {"before", "after", "op": c|r|u|d}
- canal:    {"data": [...], "old": [...], "type": INSERT|UPDATE|DELETE}
- maxwell:  {"data", "old", "type": insert|update|delete}
- ogg:      {"before", "after", "op_type": I|U|D}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .types import DELETE, INSERT, ROW_KIND, UPDATE_AFTER, UPDATE_BEFORE

_FORMATS = ("debezium", "canal", "maxwell", "ogg")


def parse_cdc(df: DataFrame, fmt: str, value_schema: T.StructType,
              value_col: str = "value") -> DataFrame:
    """Parse a JSON CDC column into changelog rows (value columns +
    _row_kind). Rows that don't parse are dropped (corrupt-record policy of
    the reference's parsers is skip-with-log)."""
    fmt = fmt.lower()
    if fmt == "debezium":
        return _before_after(df, value_col, value_schema,
                             before="before", after="after", op="op",
                             insert_ops=("c", "r"), update_ops=("u",),
                             delete_ops=("d",))
    if fmt == "ogg":
        return _before_after(df, value_col, value_schema,
                             before="before", after="after", op="op_type",
                             insert_ops=("I",), update_ops=("U",),
                             delete_ops=("D",))
    if fmt == "canal":
        return _data_old(df, value_col, value_schema, arrays=True,
                         type_field="type",
                         insert_t="INSERT", update_t="UPDATE",
                         delete_t="DELETE")
    if fmt == "maxwell":
        return _data_old(df, value_col, value_schema, arrays=False,
                         type_field="type",
                         insert_t="insert", update_t="update",
                         delete_t="delete")
    raise ValueError(f"unknown CDC format {fmt!r}; have {_FORMATS}")


def _row(struct_col: Column, schema: T.StructType, kind: str) -> Column:
    fields = [struct_col[f.name].alias(f.name) for f in schema.fields]
    return F.struct(*fields, F.lit(kind).alias(ROW_KIND))


def _before_after(df, value_col, schema, before, after, op,
                  insert_ops, update_ops, delete_ops) -> DataFrame:
    env = T.StructType([
        T.StructField(before, schema, True),
        T.StructField(after, schema, True),
        T.StructField(op, T.StringType(), True),
    ])
    p = F.from_json(F.col(value_col), env)
    b, a, o = p[before], p[after], p[op]
    rows = (F.when(o.isin(*insert_ops), F.array(_row(a, schema, INSERT)))
             .when(o.isin(*update_ops),
                   F.array(_row(b, schema, UPDATE_BEFORE),
                           _row(a, schema, UPDATE_AFTER)))
             .when(o.isin(*delete_ops), F.array(_row(b, schema, DELETE))))
    return _explode(df, rows, schema)


def _data_old(df, value_col, schema, arrays, type_field,
              insert_t, update_t, delete_t) -> DataFrame:
    data_t = T.ArrayType(schema) if arrays else schema
    env = T.StructType([
        T.StructField("data", data_t, True),
        T.StructField("old", data_t, True),
        T.StructField(type_field, T.StringType(), True),
    ])
    p = F.from_json(F.col(value_col), env)
    t = p[type_field]
    data = p["data"] if arrays else F.array(p["data"])
    old = p["old"] if arrays else F.array(p["old"])

    def merged_old(i: Column) -> Column:
        # canal/maxwell "old" carries only the changed fields' previous
        # values — the -U image is old overlaid on data (RecordParser)
        fields = []
        for f in schema.fields:
            ov = F.element_at(old, i)[f.name]
            dv = F.element_at(data, i)[f.name]
            fields.append(F.coalesce(ov, dv).alias(f.name))
        return F.struct(*fields, F.lit(UPDATE_BEFORE).alias(ROW_KIND))

    idx = F.sequence(F.lit(1), F.greatest(F.size(data), F.lit(0)))
    rows = (F.when(t == insert_t,
                   F.transform(data, lambda d: _row(d, schema, INSERT)))
             .when(t == delete_t,
                   F.transform(data, lambda d: _row(d, schema, DELETE)))
             .when(t == update_t,
                   F.flatten(F.transform(idx, lambda i: F.array(
                       merged_old(i),
                       _row(F.element_at(data, i), schema, UPDATE_AFTER))))))
    return _explode(df, rows, schema)


def _explode(df, rows_col: Column, schema: T.StructType) -> DataFrame:
    out = df.select(F.explode(rows_col).alias("__r"))
    cols = [F.col("__r")[f.name].alias(f.name) for f in schema.fields]
    cols.append(F.col("__r")[ROW_KIND].alias(ROW_KIND))
    return out.select(*cols)


def write_changelog(spark: SparkSession, table, changelog: DataFrame,
                    commit_identifier: int = -1, **kw):
    """Write a changelog DataFrame (user columns + _row_kind) to a PK table.
    The write path assigns sequence numbers in input order, so within one
    batch later events win — callers feeding from a queue should keep the
    source ordering per key (same contract as the reference's CDC sink)."""
    if ROW_KIND not in changelog.columns:
        raise ValueError(f"changelog must carry a {ROW_KIND} column")
    return table.new_write().write(spark, changelog,
                                   commit_identifier=commit_identifier, **kw)
