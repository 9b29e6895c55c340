"""CDC parser + lookup-join tests (paimon-flink-cdc format parsers /
FileStoreLookupFunction parity)."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_paimon_spark import cdc
from incubator_paimon_spark.streaming.lookup import lookup_join

SCHEMA = T.StructType([T.StructField("id", T.LongType()),
                       T.StructField("name", T.StringType()),
                       T.StructField("val", T.DoubleType())])


def _json_df(spark, events):
    return spark.createDataFrame([(json.dumps(e),) for e in events],
                                 "value string")


def test_debezium_parse(spark):
    events = [
        {"before": None, "after": {"id": 1, "name": "a", "val": 1.0}, "op": "c"},
        {"before": {"id": 1, "name": "a", "val": 1.0},
         "after": {"id": 1, "name": "a2", "val": 1.5}, "op": "u"},
        {"before": {"id": 1, "name": "a2", "val": 1.5}, "after": None, "op": "d"},
    ]
    out = cdc.parse_cdc(_json_df(spark, events), "debezium", SCHEMA)
    kinds = [r["_row_kind"] for r in out.collect()]
    assert kinds == ["+I", "-U", "+U", "-D"]


def test_canal_partial_old_image(spark):
    events = [{"data": [{"id": 1, "name": "new", "val": 1.0}],
               "old": [{"name": "prev"}], "type": "UPDATE"}]
    out = cdc.parse_cdc(_json_df(spark, events), "canal", SCHEMA).collect()
    assert (out[0]["name"], out[0]["_row_kind"]) == ("prev", "-U")
    assert (out[1]["name"], out[1]["_row_kind"]) == ("new", "+U")


def test_maxwell_and_ogg_roundtrip_to_table(spark, catalog):
    t = catalog.create_table("db.cdc", SCHEMA, primary_keys=["id"],
                             options={"bucket": "2"})
    maxwell = [
        {"data": {"id": 1, "name": "a", "val": 1.0}, "type": "insert"},
        {"data": {"id": 2, "name": "b", "val": 2.0}, "type": "insert"},
    ]
    cdc.write_changelog(spark, t,
                        cdc.parse_cdc(_json_df(spark, maxwell), "maxwell", SCHEMA))
    ogg = [
        {"before": {"id": 2, "name": "b", "val": 2.0},
         "after": {"id": 2, "name": "b2", "val": 9.0}, "op_type": "U"},
        {"before": {"id": 1, "name": "a", "val": 1.0}, "after": None,
         "op_type": "D"},
    ]
    cdc.write_changelog(spark, t,
                        cdc.parse_cdc(_json_df(spark, ogg), "ogg", SCHEMA))
    rows = [(r["id"], r["name"], r["val"]) for r in t.read(spark).collect()]
    assert rows == [(2, "b2", 9.0)]


def test_lookup_join_refreshes(spark, catalog, customer):
    dim = catalog.create_table("db.dim", customer.schema,
                               primary_keys=["c_custkey"],
                               options={"bucket": "2"})
    dim.write(spark, customer)
    facts = customer.select(F.col("c_custkey").alias("k")).limit(50)
    enriched = lookup_join(facts.withColumnRenamed("k", "c_custkey"), dim,
                           spark, on=["c_custkey"],
                           projection=["c_name", "c_acctbal"])
    assert enriched.count() == 50
    assert enriched.filter("c_name IS NULL").count() == 0
    # dim update is visible on the next call (per-batch refresh)
    dim.write(spark, customer.limit(50).withColumn("c_acctbal", F.lit(-5.0)))
    enriched2 = lookup_join(facts.withColumnRenamed("k", "c_custkey"), dim,
                            spark, on=["c_custkey"],
                            projection=["c_acctbal"])
    assert enriched2.filter("c_acctbal = -5.0").count() > 0


def test_lookup_join_max_pt(spark, catalog, orders):
    dim = catalog.create_table("db.dimp", orders.schema,
                               partition_keys=["o_orderstatus"])
    dim.write(spark, orders)
    facts = orders.select("o_orderkey").limit(20)
    out = lookup_join(facts, dim, spark, on=["o_orderkey"], max_pt=True,
                      projection=["o_orderstatus"])
    # only the max partition was loaded -> matched rows all carry it
    statuses = {r["o_orderstatus"] for r in out.collect() if r["o_orderstatus"]}
    assert len(statuses) <= 1


def test_partial_lookup_join(spark, catalog, customer):
    """PrimaryKeyPartialLookupTable parity: per-key LSM lookups enrich the
    batch, equal to the full-cache join; dim commits between batches are
    visible; non-PK keys and high-cardinality batches are rejected."""
    import pytest
    from incubator_paimon_spark.streaming.lookup import PartialLookup

    dim = catalog.create_table("db.pdim", customer.schema,
                               primary_keys=["c_custkey"],
                               options={"bucket": "2"})
    dim.write(spark, customer)
    pl = PartialLookup(dim, on=["c_custkey"],
                       projection=["c_name", "c_acctbal"])
    facts = customer.select("c_custkey").limit(50)
    got = pl.join(facts, spark)
    want = lookup_join(facts, dim, spark, on=["c_custkey"],
                       projection=["c_name", "c_acctbal"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # a dim commit between batches is visible (refreshFiles parity)
    dim.write(spark, customer.limit(50).withColumn("c_acctbal", F.lit(-5.0)))
    got2 = pl.join(facts, spark)
    assert got2.filter("c_acctbal = -5.0").count() == 50
    # unmatched keys null-extend under how="left"
    probe = spark.createDataFrame([(10 ** 9,)], "c_custkey long")
    assert pl.join(probe, spark).first()["c_name"] is None

    with pytest.raises(ValueError, match="full primary key"):
        PartialLookup(dim, on=["c_name"])
    small = PartialLookup(dim, on=["c_custkey"], max_keys=10)
    with pytest.raises(ValueError, match="distinct keys"):
        small.join(customer.select("c_custkey"), spark)
