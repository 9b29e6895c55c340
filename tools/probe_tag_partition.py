"""Probe: tag-to-partition reads scale as O(named tags), not O(history).

Builds a PK table with N_TAGS daily tags (one commit per day) and times
three shapes at the Python API (upsert-to-partitioned.md semantics):
  1. pruned  — dt equality: driver prunes to ONE tag before planning;
     cost must be flat in N_TAGS (one leg planned, one state read)
  2. plan_all — build the full N_TAGS-leg union lazily (NO execution):
     the metadata/planning cost a SHOW PARTITIONS-style tool pays
  3. sql_pruned — the TVF + WHERE dt='…' path where Catalyst
     constant-folds the per-leg literal; the executed plan must contain
     exactly ONE parquet scan regardless of N_TAGS

Usage: python tools/probe_tag_partition.py [n_tags] [rows_per_commit]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    n_tags = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from pyspark.sql import functions as F

    from incubator_paimon_spark import Catalog, P, get_spark
    from incubator_paimon_spark.read import read_tag_partitioned

    spark = get_spark("probe_tagpart", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="pmn_probe_tp_")
    cat = Catalog(wh)

    base = (spark.range(n_rows)
            .select(F.col("id").alias("k"),
                    (F.col("id") % 97).cast("double").alias("v")))
    t = cat.create_table("db.tp", base.schema, primary_keys=["k"],
                         options={"bucket": "4",
                                  "metastore.tag-to-partition": "dt"})
    for day in range(n_tags):
        t.write(spark, base.withColumn("v", F.col("v") + day))
        t.create_tag(f"2026-{1 + day // 28:02d}-{1 + day % 28:02d}",
                     day + 1)
    print(f"built {n_tags} tags x {n_rows} rows")

    name = t.list_tags()[n_tags // 2]
    t0 = time.time()
    one = read_tag_partitioned(spark, t, predicate=P.eq("dt", name))
    n1 = one.count()
    t_pruned = time.time() - t0

    t0 = time.time()
    _all = read_tag_partitioned(spark, t)  # plan only, no action
    t_plan_all = time.time() - t0

    t0 = time.time()
    df = cat.sql(spark, "SELECT * FROM paimon_tag_partitioned('db.tp') "
                        f"WHERE dt = '{name}'")
    n3 = df.count()
    t_sql = time.time() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("Scan parquet")

    # the TVF's optional tag PATTERN prunes legs before they are built:
    # O(matching tags) planning instead of O(all tags)
    t0 = time.time()
    df2 = cat.sql(spark, "SELECT * FROM paimon_tag_partitioned('db.tp', "
                         f"'{name}') WHERE dt = '{name}'")
    n4 = df2.count()
    t_sql_pat = time.time() - t0

    assert n1 == n_rows and n3 == n_rows and n4 == n_rows, \
        (n1, n3, n4, n_rows)
    print(f"pruned_read_s={t_pruned:.2f} plan_all_legs_s={t_plan_all:.2f} "
          f"sql_pruned_s={t_sql:.2f} executed_plan_scans={scans} "
          f"sql_pattern_s={t_sql_pat:.2f}")


if __name__ == "__main__":
    main()
