"""Temporal operators: as-of join (point-in-time lookup).

The reference engine has no as-of join executor (host engines join for it;
see SURVEY §2.3) but every training-data / feature pipeline over event
streams needs one: "for each left row, the most recent right row at or
before its timestamp, per key". DuckDB ships it natively (ASOF JOIN), which
is exactly what the oracle uses.

Scale design (100 TB events, 1000 executors): a naive range join
(`l.ts >= r.ts` + window-max) explodes into a broadcast-nested-loop or an
O(n·m) per-key blowup. The classic distributed plan is UNION + WINDOW:

    tag right rows 0, left rows 1 → union → one shuffle on (keys) →
    sort within partition by (ts, tag) → last_value(right payload,
    ignorenulls) over rows unbounded-preceding..current → keep tag=1.

One shuffle, one sort, zero joins; Spark's window operator streams each key
group, so per-key cardinality never materializes in memory beyond the frame
(the running `last` is O(1) state). Skewed keys are bounded by the same
AQE/salting story as any keyed window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              tolerance: Column | None = None,
              suffix: str = "_r") -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` sharing the `on` keys (backward as-of join,
    pandas.merge_asof / DuckDB ASOF JOIN semantics). Left rows with no
    matching right row keep nulls.

    right_cols: right payload columns to attach (default: all non-key,
    non-ts columns), each renamed with `suffix` if it collides with a left
    column. The right side is first deduplicated to ONE row per (keys, ts)
    — the max by payload struct — so results are deterministic when the
    right side has timestamp ties (engines disagree on which tied row wins
    otherwise).

    tolerance: optional Column interval/duration; matches older than
    ``left.ts - tolerance`` are dropped (row kept, payload nulled) —
    pandas.merge_asof(tolerance=...) semantics.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}

    r = right.select(*on, F.col(right_ts).alias("__ts"),
                     F.struct(*right_cols).alias("__p"))

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"), F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"))
    r_tagged = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c) for c in left.columns],
        F.col("__ts"), F.lit(0).alias("__tag"), F.col("__p"))

    # right rows sort BEFORE left rows at the same ts → `<=` matches ties.
    # The window sort key is the SLIM (__ts, __tag) pair only — putting the
    # payload struct in orderBy would drag its bytes through the exchange's
    # sort comparator (VERDICT r5). Right-side timestamp ties dedupe inside
    # the AGGREGATE instead: max over struct(right_ts, payload) compares
    # lexicographically, so the running max is "latest right row at-or-
    # before, ties by max payload" — identical semantics to a pre-
    # aggregated max-by-payload, in O(1) window state, still ONE exchange.
    w = (W.partitionBy(*on).orderBy("__ts", "__tag")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    u = l_tagged.unionByName(r_tagged)
    u = (u.withColumn(
            "__best",
            F.max(F.when(F.col("__tag") == 0,
                         F.struct(F.col("__ts").alias("__rts"),
                                  F.col("__p")))).over(w))
          .filter(F.col("__tag") == 1)
          .withColumn("__m", F.col("__best.__p"))
          .withColumn("__mts", F.col("__best.__rts")))
    if tolerance is not None:
        too_old = F.col("__mts") < (F.col("__ts") - tolerance)
        u = u.withColumn("__m", F.when(too_old, F.lit(None)).otherwise(F.col("__m")))
    return u.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m").getField(c).alias(out_names[c]) for c in right_cols])
