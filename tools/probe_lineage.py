"""Scale probe for the lineage segment store (VERDICT r11 #2).

Writes N events through lineage.record (the production path, including
its opportunistic compaction), then measures: loose/segment file counts
(bounded?), driver read_rows latency, and sys.table_lineage serve time
(flat-cost?). Run: python tools/probe_lineage.py [n_events]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

from incubator_paimon_spark import Catalog, get_spark  # noqa: E402
from incubator_paimon_spark import lineage as L  # noqa: E402

wh = tempfile.mkdtemp(prefix="pmn_lineage_probe_")
cat = Catalog(wh)
spark = get_spark(cpus=8)
spark.sparkContext.setLogLevel("ERROR")

df = spark.createDataFrame([(1, "x")], "id long, v string")
t = cat.create_table("db.probe", df.schema, primary_keys=["id"],
                     options={"bucket": "1"})
t.write(spark, df)

t0 = time.time()
for i in range(N):
    L.record(f"job{i}", sinks=[(t, 1)])
w = time.time() - t0
d = os.path.join(wh, "_lineage")
names = os.listdir(d)
loose = sum(1 for n in names if n.startswith("ev-"))
segs = sum(1 for n in names if n.startswith("seg-"))
print(f"write: {N} events in {w:.1f}s ({N / w:.0f} ev/s) -> "
      f"{loose} loose + {segs} segments (threshold "
      f"{L.LINEAGE_SEGMENT_THRESHOLD})")

t0 = time.time()
rows = L.read_rows(wh)
print(f"driver read_rows: {len(rows)} rows in {time.time() - t0:.2f}s")

t0 = time.time()
n = cat.system(spark, "table_lineage").count()
print(f"sys.table_lineage cold: {n} rows in {time.time() - t0:.2f}s")
t0 = time.time()
n = cat.system(spark, "data_lineage").count()
print(f"sys.data_lineage:      {n} rows in {time.time() - t0:.2f}s")

t0 = time.time()
got = L.expire_lineage(wh, int(time.time() * 1000) + 1)
print(f"expire_lineage: {got} in {time.time() - t0:.2f}s")
print(f"post-expire files: {len(os.listdir(d))}")

shutil.rmtree(wh, ignore_errors=True)
