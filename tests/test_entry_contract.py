"""Driver-contract smoke: entry() runs, queries()/oracle_sql() align, and a
sample of oracles hash-match via the local replica of the driver's compare."""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

SAMPLE = ["pricing_summary", "pk_upsert", "time_travel", "exact_dedup",
          "cosine_topk", "agg_engine"]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as E
    return E


def test_entry_runs(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["c_mktsegment", "revenue", "n_orders"]


def test_queries_oracles_aligned(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # every declared query has an oracle (full gate coverage)
    assert set(qs) == set(os_)


def test_sampled_oracles_match(spark, entry_mod):
    from tools.check_oracles import table_hash
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    for name in SAMPLE:
        sdf = qs[name](spark, sf)
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        assert len(srows) == len(drows), name
        assert sorted(scols) == sorted(dcols), name
        assert table_hash(scols, srows) == table_hash(dcols, drows), name
