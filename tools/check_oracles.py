"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, schema (column
names), and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def canon(v):
    from datetime import date, datetime
    from decimal import Decimal
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import duckdb
    from incubator_paimon_spark import get_spark
    import __spark_entry__ as E

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    os_ = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR {type(ex).__name__}: {ex}"))
            print(f"{name:24s} SPARK-ERROR {ex}")
            continue
        if name not in os_:
            print(f"{name:24s} rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"{name:24s} DUCKDB-ERROR {ex}")
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        ok_hash = table_hash(scols, srows) == table_hash(dcols, drows)
        status = "OK" if (ok_count and ok_schema and ok_hash) else "MISMATCH"
        print(f"{name:24s} {status}  rows={len(srows)}/{len(drows)} "
              f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
              f"hash={'ok' if ok_hash else 'BAD'} ({time.time()-t0:.1f}s)")
        if status != "OK":
            failures.append((name, f"count={ok_count} schema={ok_schema} hash={ok_hash}"))
            if not ok_hash and ok_count and len(srows) < 50:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = sorted("|".join(canon(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                d_set = sorted("|".join(canon(r[i]) for i in dorder) for r in drows)
                for a, b in zip(s_set, d_set):
                    if a != b:
                        print(f"   spark: {a}\n   duck : {b}")
    print()
    if failures:
        print("FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
