"""Capture .explain("formatted") for declared queries into plans/<round>/.

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each named queries() entry —
the physical-plan evidence the optimization rounds commit alongside code
(plan diffs: Exchange counts, join strategies, PushedFilters,
BatchEvalPython/ArrowEvalPython nodes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from incubator_paimon_spark import get_spark
    import __spark_entry__ as E

    spark = get_spark("capture-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    failed = []
    for n in names:
        try:
            df = qs[n](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{n}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(f"-- {n} ({suffix}) @ {sf_dir}\n")
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as ex:  # noqa: BLE001 — keep capturing the rest
            failed.append(n)
            print(f"{n}: FAILED {type(ex).__name__}: {ex}", file=sys.stderr)
    spark.stop()
    if failed:
        # a partial capture must not read as success — the committed
        # plan evidence would silently go missing
        print(f"FAILED plans: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
