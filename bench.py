"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric", "value", "unit", "queries", "sf", ...}.
Mapping to BASELINE.md anchors:
- pk_write_upsert  ↔ write Parquet 64.8 K rows/s (LSM PK write incl. commit)
- pk_read_full     ↔ read Parquet full row 975 K rows/s (merge-on-read scan)
- pk_read_projected↔ read ORC projected (column pruning path)
- compact_full     ↔ write ORC 94.3 K rows/s (compaction rewrite)
Plus engine analytics (q1/q5 equivalents) and LLM operators at scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _idx_wh(sf):
    return f"/tmp/pmn_idx_cache_v3_sf{sf}"


_SF1_WH = "/tmp/pmn_sf1_cache_v1"
_SF1_NAMES = ("li1_pk", "li1_orc", "li1_avro")


def _caches_ready(sf) -> bool:
    ok = os.path.exists(os.path.join(_idx_wh(sf), ".done"))
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        ok = ok and all(os.path.exists(os.path.join(_SF1_WH, f".done_{n}"))
                        for n in _SF1_NAMES)
    return ok


def build_caches():
    """One-time corpus/index cache builds in a THROWAWAY process + Spark
    session (r8 verdict #1: in-suite builds left executor-memory/GC
    pressure that taxed every write anchor scheduled after them by
    1.3-3.7× — avro_write 3.94→14.4 s with zero code change on its
    path). The timed suite only ever get_table()s these; a fresh host
    pays the builds in a session that is fully torn down before any
    timed section starts."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from incubator_paimon_spark import Catalog, get_spark
    from incubator_paimon_spark.operators import dedup as D
    from incubator_paimon_spark.operators import dedup_index as DIx
    from incubator_paimon_spark.operators import retrieval as Rx
    from incubator_paimon_spark.operators import similarity as S
    import __spark_entry__ as E

    spark = get_spark("bench-cache-build", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = E._t(spark, sf_dir, "documents")
    emb = E._t(spark, sf_dir, "embeddings")

    idx_wh = _idx_wh(sf)
    marker = os.path.join(idx_wh, ".done")
    if not os.path.exists(marker):
        cati = Catalog(idx_wh)
        # a prior partial build (no marker, tables exist) must not
        # wedge create_table or double-count the stats aggregator —
        # rebuild from clean tables
        for name in ("bench.mh", "bench.bm", "bench.bm_stats",
                     "bench.sdivf", "bench.sdivf_centroids",
                     "bench.segdf"):
            cati.drop_table(name)
        DIx.build_minhash_index(
            spark, cati, "bench.mh",
            docs.filter(F.col("doc_id") % 10 != 0), "text", "doc_id")
        Rx.build_bm25_index(spark, cati, "bench.bm", docs,
                            "text", "doc_id", term_buckets=64)
        S.build_ivf_table(spark, cati, "bench.sdivf", emb,
                          "embedding", num_centroids=32, dim=64, iters=0)
        t_sg = D.create_segment_df_table(cati, "bench.segdf",
                                         segment_words=10)
        D.update_segment_df_counts(spark, t_sg, docs, "text", "doc_id")
        with open(marker, "w") as fh:
            fh.write("ok")

    if sf == 0.1 and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        lineitem = E._t(spark, sf_dir, "lineitem")
        cat1 = Catalog(_SF1_WH)
        maxkey = lineitem.agg(F.max("l_orderkey")).collect()[0][0] + 1

        def _li10():
            parts = [lineitem.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * maxkey))
                for i in range(10)]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        def _cached(name, build):
            mk = os.path.join(_SF1_WH, f".done_{name}")
            if not os.path.exists(mk):
                cat1.drop_table(f"bench.{name}")
                build()
                with open(mk, "w") as fh:
                    fh.write("ok")

        def _build_pk():
            tb = cat1.create_table(
                "bench.li1_pk", lineitem.schema,
                primary_keys=["l_orderkey", "l_linenumber"],
                options={"bucket": "16"}, ignore_if_exists=True)
            tb.write(spark, _li10())
            # overlapping second commit so the read is a real merge
            upd1 = _li10().filter(F.col("l_orderkey") % 7 == 0) \
                .withColumn("l_quantity", F.col("l_quantity") + 1)
            tb.write(spark, upd1)

        def _build_orc():
            cat1.create_table(
                "bench.li1_orc", lineitem.schema,
                primary_keys=["l_orderkey", "l_linenumber"],
                options={"bucket": "16", "file.format": "orc"},
                ignore_if_exists=True).write(spark, _li10())

        def _build_avro():
            cat1.create_table(
                "bench.li1_avro", lineitem.schema,
                options={"file.format": "avro"},
                ignore_if_exists=True).write(spark, _li10())

        _cached("li1_pk", _build_pk)
        _cached("li1_orc", _build_orc)
        _cached("li1_avro", _build_avro)
    spark.stop()


def _prior_gated(sf: float) -> dict[str, float]:
    """Per-query medians of the LATEST gated BENCH_r{N}.json at the same
    scale factor — the drift bar each new measurement is checked against.
    A contended gating window poisoned BENCH_r13 suite-wide (~1.3x median
    drift with an empty operator diff); instead of adjudicating after the
    fact, any query that moves >1.25x re-measures with more reps in the
    SAME run before its number is recorded."""
    import glob
    import re
    best_n, prior = -1, {}
    here = os.path.dirname(os.path.abspath(__file__))
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:  # noqa: BLE001 — a corrupt artifact is not fatal
            continue
        # the driver's artifact wraps the bench JSON line under "parsed"
        inner = data.get("parsed") or data
        if not isinstance(inner, dict):
            continue
        got_sf = inner.get("sf", data.get("sf"))
        if got_sf != sf or int(m.group(1)) <= best_n:
            continue
        qs = dict(inner.get("queries") or {})
        if not qs and isinstance(data.get("tail"), str):
            # since r11 the artifact keeps only a FRONT-TRUNCATED tail of
            # the bench line (parsed: null). r14+ lines put `queries`
            # LAST so the block survives — parse it out; older tails
            # recover from the rep_spread fragments instead (min == the
            # best-of-reps value timed() records)
            t = data["tail"]
            i = t.rfind('"queries": {')
            if i >= 0:
                j = t.index('{', i)
                depth = 0
                for k2 in range(j, len(t)):
                    if t[k2] == '{':
                        depth += 1
                    elif t[k2] == '}':
                        depth -= 1
                        if depth == 0:
                            try:
                                qs = json.loads(t[j:k2 + 1])
                            except ValueError:
                                pass
                            break
            if not qs:
                qs = {mm.group(1): float(mm.group(2))
                      for mm in re.finditer(
                          r'"(\w+)":\s*\{"reps":\s*\d+,\s*"min":\s*([\d.]+)',
                          t)}
        if qs:
            best_n, prior = int(m.group(1)), qs
    return prior


DRIFT_BAR = 1.25       # re-measure when slower than prior by this ratio
DRIFT_FLOOR_SEC = 0.15  # sub-150ms timings are scheduler noise, skip
DRIFT_EXTRA_REPS = 3
# Queries that must NOT be re-run for drift diagnostics:
# - cold-cache anchors: extra reps would measure a warm path under a
#   cold name (point_lookup_cold);
# - non-idempotent mutation anchors: the first run changes the state the
#   measurement depends on, so a re-run times different work entirely —
#   re-running compact_full after it already compacted finds nothing and
#   records ~0.0 s, silently dropping the derived compact_rows_per_sec
#   (r14 verdict #1, repro /tmp/BENCH_JUDGE_r14.json). Everything that
#   commits, deletes, or compacts through timed() is listed; write
#   anchors that go through timed_write() are excluded because its
#   drift path builds FRESH tables per extra rep.
DRIFT_EXEMPT = {
    "point_lookup_cold",
    "pk_write_second_commit", "compact_full", "dv_delete",
    "dynamic_bucket_write", "zorder_compact",
    "lookup_cl_first_commit", "lookup_cl_update_commit",
    "stream_drain",
}


def drift_should_recheck(name: str, measured: float,
                         prior: float | None) -> bool:
    """True when `measured` drifted past the prior gated artifact enough
    to warrant an in-run re-measure — never for exempt (cold-semantics or
    state-mutating) anchors. Module-level so tests can pin the policy."""
    return bool(prior and prior >= DRIFT_FLOOR_SEC
                and measured > prior * DRIFT_BAR
                and name not in DRIFT_EXEMPT)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    if not _caches_ready(sf):
        # build BEFORE the timed session exists, in a child process whose
        # JVM is gone before any timed section starts
        import subprocess
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--build-caches"], check=True)

    from incubator_paimon_spark import Catalog, get_spark
    from incubator_paimon_spark.operators import dedup as D
    from incubator_paimon_spark.operators import similarity as S
    import __spark_entry__ as E

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    wh = tempfile.mkdtemp(prefix="pmn_bench_")
    cat = Catalog(wh)
    times: dict[str, float] = {}
    extra: dict[str, float] = {}
    rep_spread: dict[str, dict] = {}

    errors: dict[str, str] = {}
    prior = _prior_gated(sf)
    drift: dict[str, dict] = {}
    load_start = os.getloadavg()

    def quiesce():
        """Between-section hygiene: drop cached data, nudge the JVM GC,
        and re-warm with one untimed job, so a heavy section's leftover
        heap pressure cannot tax the next section's anchors (the r8
        regression cluster was everything scheduled after one build
        section)."""
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.range(10_000_000).select(F.sum("id")).collect()
        except Exception:  # noqa: BLE001 — hygiene must never fail the run
            pass

    def timed(name, fn, reps=1):
        """reps>1 (read-only paths): best-of-N, matching the reference
        micro-benchmarks' best/avg convention (TableReadBenchmark JMH);
        all rep durations land in rep_spread so a one-GC-pause outlier
        is visible instead of silently eaten or silently gated (the
        r9-r10 dsir_10x/semdedup_10x drift was single-shot noise).
        A failing query is recorded in `errors` and skipped — one broken
        query must never zero the whole round's numbers (VERDICT r4)."""
        best, out, ds = None, None, []
        try:
            for _ in range(reps):
                t0 = time.time()
                out = fn()
                dt = time.time() - t0
                ds.append(dt)
                best = dt if best is None or dt < best else best
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            import traceback
            errors[name] = traceback.format_exc(limit=3)
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            return None
        if drift_should_recheck(name, best, prior.get(name)):
            # Drifted vs the last gated artifact: re-measure NOW for the
            # DIAGNOSTIC record (host contention shows up as a healed
            # re-measure; a real regression stays put). The HEADLINE
            # number stays the protocol measurement — every query gets
            # the same rep count, so gated artifacts remain
            # protocol-comparable round over round (r14 advice: best-of-
            # extra-reps only for slow queries biased numbers downward).
            healed = best
            with_load = os.getloadavg()
            try:
                for _ in range(DRIFT_EXTRA_REPS):
                    t0 = time.time()
                    fn()  # diagnostic only — `out` stays the protocol run's
                    dt = time.time() - t0
                    healed = dt if dt < healed else healed
            except Exception:  # noqa: BLE001 — diagnostics must not fail the run
                pass
            drift[name] = {"prior": prior.get(name),
                           "protocol_best": round(best, 3),
                           "healed_best": round(healed, 3),
                           "extra_reps": DRIFT_EXTRA_REPS,
                           "loadavg": [round(x, 2) for x in with_load]}
        times[name] = round(best, 3)
        if len(ds) > 1:
            ds.sort()
            rep_spread[name] = {"reps": len(ds), "min": round(ds[0], 3),
                                "median": round(ds[len(ds) // 2], 3),
                                "max": round(ds[-1], 3)}
        return out

    from contextlib import contextmanager

    @contextmanager
    def section(name):
        """Isolate a setup+timed block: a crash in table creation or an
        un-timed write records an error and skips only this block."""
        try:
            yield
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            import traceback
            errors[f"section:{name}"] = traceback.format_exc(limit=3)
            print(f"[bench] section {name} FAILED: {exc}", file=sys.stderr)

    def rate(key, n, out_name):
        # only derivable when the timed query actually succeeded
        if times.get(key):
            extra[out_name] = round(n / times[key])

    def timed_write(name, mk, write, reps=3):
        """Write anchors: `reps` runs into FRESH tables (mk(i) creates,
        untimed; write(table) is timed); the gated number is the MEDIAN
        — a single GC pause must not move an anchor (r8: one-shot
        avro_write swung 3.7× with no code change) — with min/max kept
        in `rep_spread`. Returns the last run's table for downstream
        sections."""
        ds, last = [], None
        try:
            for i in range(reps):
                tb = mk(i)
                t0 = time.time()
                write(tb)
                ds.append(time.time() - t0)
                last = tb
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            import traceback
            errors[name] = traceback.format_exc(limit=3)
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            return last
        med = sorted(ds)[len(ds) // 2]
        if drift_should_recheck(name, med, prior.get(name)):
            # Diagnostic re-measure with extra FRESH-table runs (mk() per
            # rep keeps this idempotent); the HEADLINE stays the protocol
            # median so artifacts remain protocol-comparable — see timed().
            with_load = os.getloadavg()
            extra_ds = []
            try:
                for j in range(DRIFT_EXTRA_REPS - 1):
                    tb = mk(reps + j)
                    t0 = time.time()
                    write(tb)
                    extra_ds.append(time.time() - t0)
                    last = tb
            except Exception:  # noqa: BLE001 — keep the original median
                pass
            healed = sorted(ds + extra_ds)[(len(ds) + len(extra_ds)) // 2]
            drift[name] = {"prior": prior.get(name),
                           "protocol_median": round(med, 3),
                           "healed_median": round(healed, 3),
                           "extra_reps": len(extra_ds),
                           "loadavg": [round(x, 2) for x in with_load]}
        times[name] = round(med, 3)
        ds.sort()
        rep_spread[name] = {"reps": len(ds), "min": round(ds[0], 3),
                            "max": round(ds[-1], 3)}
        return last

    lineitem = E._t(spark, sf_dir, "lineitem")
    n_lineitem = lineitem.count()

    t = None
    with section("pk_table"):
        # --- PK write (upsert path: repartition by bucket, sort, stats, commit)
        t = timed_write(
            "pk_write_upsert",
            lambda i: cat.create_table(
                f"bench.li_pk_{i}", lineitem.schema,
                primary_keys=["l_orderkey", "l_linenumber"],
                options={"bucket": "16"}),
            lambda tb: tb.write(spark, lineitem))
        rate("pk_write_upsert", n_lineitem, "pk_write_rows_per_sec")

        # second commit (overlapping keys) so reads exercise a real merge
        upd = lineitem.filter(F.col("l_orderkey") % 7 == 0) \
                      .withColumn("l_quantity", F.col("l_quantity") + 1)
        n_upd = upd.count()
        timed("pk_write_second_commit", lambda: t.write(spark, upd))

        # --- PK merge-on-read full scan
        timed("pk_read_full", lambda: t.read(spark).count(), reps=3)
        rate("pk_read_full", n_lineitem, "pk_read_rows_per_sec")

        # --- projected scan (2 cols through the merge)
        timed("pk_read_projected",
              lambda: t.read(spark, projection=["l_orderkey", "l_quantity"])
                       .agg(F.sum("l_quantity")).collect(), reps=3)

        # --- compaction rewrite
        timed("compact_full", lambda: t.compact(spark, full=True))
        rate("compact_full", n_lineitem + n_upd, "compact_rows_per_sec")

        # --- read-optimized scan after compaction (raw path, no merge)
        timed("read_optimized", lambda: t.read(spark).count(), reps=3)

        # --- PK point lookup (LocalTableQuery parity, query.py): 200 keys
        # against the compacted LSM. Cold pays the per-file index builds;
        # warm is the steady-state hash-probe path a lookup join sees.
        keys = [(r["l_orderkey"], r["l_linenumber"]) for r in
                lineitem.select("l_orderkey", "l_linenumber")
                        .orderBy("l_orderkey", "l_linenumber").limit(200)
                        .collect()]
        q = t.new_query()
        timed("point_lookup_cold", lambda: sum(
            1 for r in q.lookup_many(keys) if r is not None))
        got = timed("point_lookup_warm", lambda: sum(
            1 for r in q.lookup_many(keys) if r is not None), reps=5)
        q.close()
        if got is not None and got != len(keys):
            errors["point_lookup_warm"] = f"hits {got} != {len(keys)}"
        if "point_lookup_warm" in times and times["point_lookup_warm"] > 0:
            extra["point_lookups_per_sec"] = int(
                len(keys) / times["point_lookup_warm"])

    # --- analytics on raw parquet (host-engine surface)
    # untimed warm read first (r9 verdict #4): the r9 quiesce regime
    # stopped these queries inheriting warm file/codec state from
    # earlier sections, drifting q5 +63% / events_sessions +34% with no
    # code change on the path — touch every input once OUTSIDE the
    # timed region so the numbers measure the query, not the cache
    # regime the previous section happened to leave behind
    for _tbl in ("lineitem", "orders", "customer", "supplier", "nation",
                 "region", "events"):
        try:
            E._t(spark, sf_dir, _tbl).count()
        except Exception:  # noqa: BLE001 — warmup must never fail the run
            pass
    timed("q1_pricing_summary",
          lambda: E.q_pricing_summary(spark, sf_dir).collect(), reps=3)
    timed("q5_local_supplier",
          lambda: E.q_local_supplier_volume(spark, sf_dir).collect(), reps=3)
    timed("events_sessions",
          lambda: E.q_events_sessions(spark, sf_dir).collect(), reps=3)

    # --- LLM operators at scale
    docs = E._t(spark, sf_dir, "documents")
    timed("minhash_lsh_pairs",
          lambda: D.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16,
                                      bands=4, min_est_jaccard=0.7).count(), reps=3)
    timed("dedup_clusters",
          lambda: D.dedup_clusters(docs, "text", "doc_id").count())
    emb = E._t(spark, sf_dir, "embeddings")
    timed("cosine_topk",
          lambda: S.cosine_topk(emb, "embedding", E.QUERY_VEC, 10).collect(), reps=3)
    timed("exact_dedup", lambda: D.exact_duplicates(docs, "text", "doc_id").count(), reps=3)
    timed("contamination",
          lambda: D.ngram_contamination(
              docs, docs.filter(F.col("doc_id") % 20 == 0),
              "text", "doc_id", n=5).count(), reps=3)
    timed("boilerplate_removal",
          lambda: D.remove_frequent_segments(docs, "text", "doc_id",
                                             segment_words=10,
                                             max_doc_freq=1).count(), reps=3)
    timed("span_dedup",
          lambda: D.remove_duplicate_spans(docs, "text", "doc_id",
                                           span_words=10).count(), reps=3)
    timed("crosscorpus_neardup",
          lambda: D.minhash_lsh_pairs_between(
              docs.filter(F.col("doc_id") % 10 == 0),
              docs.filter(F.col("doc_id") % 10 != 0),
              "text", "doc_id").count(), reps=3)
    with section("maintained_indexes"):
        # r8: the amortized-index shapes. Index BUILDS are one-time
        # corpus costs, built by the --build-caches CHILD PROCESS (its
        # session is gone before any timed section — r9, verdict #1);
        # the timed rows are the per-query/nightly costs the indexes
        # exist to shrink — crosscorpus_indexed vs crosscorpus_neardup
        # is the 90× §6 probe at bench scale.
        from incubator_paimon_spark.operators import dedup_index as DIx
        from incubator_paimon_spark.operators import retrieval as Rx
        cati = Catalog(_idx_wh(sf))
        t_mh = cati.get_table("bench.mh")
        t_bp = cati.get_table("bench.bm")
        t_bs = cati.get_table("bench.bm_stats")
        t_sd = cati.get_table("bench.sdivf")
        timed("crosscorpus_indexed",
              lambda: D.minhash_lsh_pairs_between(
                  docs.filter(F.col("doc_id") % 10 == 0), None,
                  "text", "doc_id",
                  base_index=DIx.read_minhash_index(spark, t_mh)).count(),
              reps=3)
        timed("bm25_indexed_search",
              lambda: Rx.bm25_search_indexed(
                  spark, t_bp, t_bs,
                  ["merge", "vector", "stream"], k=20).collect(), reps=3)
        # vs semdedup below: the O(n·k) assignment is the stored
        # partition layout, each run pays only the per-cluster pass
        timed("semdedup_indexed",
              lambda: S.semdedup_from_index(
                  spark, t_sd, "embedding", "vec_id",
                  threshold=0.4).filter("keep").count(), reps=3)
        t_sg = cati.get_table("bench.segdf")
        # vs boilerplate_removal above: one segmentation pass + a join
        # against maintained doc-frequencies, no corpus-wide recount
        timed("boilerplate_indexed",
              lambda: D.remove_frequent_segments_from_table(
                  spark, docs, t_sg, "text", "doc_id",
                  max_doc_freq=1).count(), reps=3)
    timed("kmeans_2iter",
          lambda: S.ivf_centroids(emb, "embedding", "vec_id",
                                  num_centroids=8, dim=64,
                                  iters=2).count(), reps=3)
    # SemDeDup's prescribed operating point is many clusters (k ≈ n/150
    # here): per-cluster pair count — the quadratic term — stays bounded
    timed("semdedup",
          lambda: S.semdedup(emb, "embedding", "vec_id", num_centroids=32,
                             threshold=0.4, dim=64).filter("keep").count(),
          reps=3)
    from incubator_paimon_spark.operators.retrieval import bm25_search
    timed("bm25_search",
          lambda: bm25_search(docs, "text", "doc_id",
                              ["merge", "vector", "stream"], k=20).collect(),
          reps=3)
    from incubator_paimon_spark.operators.sampling import dsir_logweights
    timed("dsir_weights",
          lambda: dsir_logweights(
              docs, docs.filter(F.col("doc_id") % 20 == 0),
              "text", "doc_id").count(), reps=3)
    from incubator_paimon_spark.operators import text as TXo
    timed("repetition_stats",
          lambda: TXo.repetition_stats(docs, "text", "doc_id").count(), reps=3)
    # sum() forces the entropy column (count() would prune it away)
    timed("char_entropy",
          lambda: docs.select(TXo.char_entropy(F.col("text")).alias("e"))
                      .agg(F.sum("e")).collect(), reps=3)
    from incubator_paimon_spark.operators.temporal import asof_join as _asof
    events = E._t(spark, sf_dir, "events")
    n_events = events.count()

    def run_asof():
        left = events.filter(F.col("event_type") == "purchase") \
                     .select("event_id", "user_id", "ts", "value")
        right = events.filter(F.col("event_type") == "click") \
                      .select("user_id", "ts", "value")
        return _asof(left, right, ["user_id"], "ts", "ts",
                     right_cols=["value"]).count()

    timed("asof_join", run_asof, reps=3)
    rate("asof_join", n_events, "asof_rows_per_sec")

    # --- row-level ops + new write modes
    from incubator_paimon_spark import P
    orders = E._t(spark, sf_dir, "orders")
    n_orders = orders.count()
    with section("dv_table"):
        tdv = cat.create_table("bench.dv", orders.schema,
                               options={"deletion-vectors.enabled": "true"})
        tdv.write(spark, orders)
        timed("dv_delete", lambda: tdv.delete_where(spark, P.lt("o_orderkey", 1000)))
        timed("dv_read", lambda: tdv.read(spark).count(), reps=3)

    with section("dyn_table"):
        tdyn = cat.create_table("bench.dyn", orders.schema,
                                primary_keys=["o_orderkey"],
                                options={"bucket": "-1",
                                         "dynamic-bucket.target-row-num":
                                             str(max(n_orders // 16, 1)),
                                         "dynamic-bucket.assigner-parallelism":
                                             "16"})
        timed("dynamic_bucket_write", lambda: tdyn.write(spark, orders))
        rate("dynamic_bucket_write", n_orders, "dyn_write_rows_per_sec")

    with section("orc_table"):
        quiesce()
        torc = timed_write(
            "orc_write",
            lambda i: cat.create_table(
                f"bench.orc_{i}", lineitem.schema,
                primary_keys=["l_orderkey", "l_linenumber"],
                options={"bucket": "16", "file.format": "orc"}),
            lambda tb: tb.write(spark, lineitem))
        rate("orc_write", n_lineitem, "orc_write_rows_per_sec")
        timed("orc_read", lambda: torc.read(spark).count(), reps=3)

    with section("zorder"):
        quiesce()
        tz = cat.create_table("bench.zo", lineitem.schema)
        tz.write(spark, lineitem)
        timed("zorder_compact",
              lambda: tz.compact(spark, order_by=["l_orderkey", "l_partkey"],
                                 strategy="zorder"))

    customer = E._t(spark, sf_dir, "customer")
    n_customer = customer.count()
    with section("avro_table"):
        # pure-Python avro codec: parquet-staged write + transcode; decode
        # via mapInPandas over the schema-compiled columnar decoder
        # (formats/avro_decode.py). lineitem (600 K rows), not customer
        # (15 K), so fixed per-commit costs don't swamp the per-row signal.
        quiesce()
        tav = timed_write(
            "avro_write",
            lambda i: cat.create_table(f"bench.avro_{i}", lineitem.schema,
                                       options={"file.format": "avro"}),
            lambda tb: tb.write(spark, lineitem))
        rate("avro_write", n_lineitem, "avro_write_rows_per_sec")
        timed("avro_read", lambda: tav.read(spark).count(), reps=3)
        rate("avro_read", n_lineitem, "avro_read_rows_per_sec")

    with section("lookup_changelog"):
        # changelog-producer=lookup: second commit pays the key lookup +
        # diff + changelog-file write inside the commit
        quiesce()
        tlk = cat.create_table("bench.lkcl", customer.schema,
                               primary_keys=["c_custkey"],
                               options={"bucket": "8",
                                        "changelog-producer": "lookup"})
        timed("lookup_cl_first_commit", lambda: tlk.write(spark, customer))
        upd_c = customer.filter(F.col("c_custkey") % 9 == 0) \
                        .withColumn("c_acctbal", F.col("c_acctbal") + 1)
        timed("lookup_cl_update_commit", lambda: tlk.write(spark, upd_c))

    with section("stream_drain"):
        # executor-side stream reader: drain the orders table in one
        # availableNow pass through readStream.format("paimon")
        import tempfile as _tf
        from incubator_paimon_spark.datasource import register as _reg
        quiesce()
        _reg(spark)
        tso = cat.create_table("bench.stream_src", orders.schema)
        tso.write(spark, orders)

        # untimed warm-up: the FIRST streaming query in a session pays
        # ~5 s of one-time machinery (offset-log classes, sink JIT) that
        # has nothing to do with this engine's read path — measured 7.4 s
        # for 1.5 K rows cold vs 2.5 s for 150 K warm. Drain a 1-row table
        # once so the timed drain reflects steady-state throughput.
        warm = cat.create_table("bench.stream_warm", orders.schema)
        warm.write(spark, orders.limit(1))
        wo, wc = _tf.mkdtemp(prefix="pmn_bsw_"), _tf.mkdtemp(prefix="pmn_bswc_")
        (spark.readStream.format("paimon").option("scan.mode", "earliest")
         .load(warm.path).writeStream.format("parquet").option("path", wo)
         .option("checkpointLocation", wc)
         .trigger(availableNow=True).start().awaitTermination(120))
        shutil.rmtree(wo, ignore_errors=True)
        shutil.rmtree(wc, ignore_errors=True)

        def drain():
            out = _tf.mkdtemp(prefix="pmn_bso_")
            ck = _tf.mkdtemp(prefix="pmn_bsc_")
            q = (spark.readStream.format("paimon")
                 .option("scan.mode", "earliest").load(tso.path)
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            finished = q.awaitTermination(300)
            if not finished:
                # never count partial output or delete dirs under a live query
                q.stop()
                raise TimeoutError("stream_drain did not finish in 300s")
            n = spark.read.parquet(out).count()
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(ck, ignore_errors=True)
            return n

        drained = timed("stream_drain", drain)
        if drained is not None:
            assert drained == n_orders, (drained, n_orders)
            rate("stream_drain", n_orders, "stream_rows_per_sec")
    with section("ops_10x"):
        # r8 (VERDICT r7 #5): gate the r7 probe scale points so a
        # regression in the new operators' SCALE behavior shows up in
        # BENCH_r{N}, not just SURVEY prose. Same construction as the
        # SURVEY §6 probes — 10× replicas of the sf0.1 corpora:
        # documents → 50 K docs in 10-copy cliques, embeddings → 20 K
        # vectors; semdedup at its probe operating point k=320.
        # Reference times (quiet host): bm25 7.0 s, dsir 23.1 s,
        # semdedup 58.7 s. Disable: SPARK_GRAFT_10X=0.
        if os.environ.get("SPARK_GRAFT_10X", "1") != "0" and sf == 0.1:
            quiesce()
            maxdoc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
            docs10 = (docs.select("doc_id", "text")
                      .crossJoin(spark.range(10)
                                 .select(F.col("id").alias("rep")))
                      .select((F.col("doc_id") + F.col("rep") * maxdoc)
                              .alias("doc_id"), "text"))
            maxvec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
            emb10 = (emb.select("vec_id", "embedding")
                     .crossJoin(spark.range(10)
                                .select(F.col("id").alias("rep")))
                     .select((F.col("vec_id") + F.col("rep") * maxvec)
                             .alias("vec_id"), "embedding"))
            timed("bm25_10x",
                  lambda: bm25_search(docs10, "text", "doc_id",
                                      ["merge", "vector", "stream"],
                                      k=20).collect())
            timed("dsir_10x",
                  lambda: dsir_logweights(
                      docs10, docs10.filter(F.col("doc_id") % 20 == 0),
                      "text", "doc_id").count(), reps=3)
            timed("semdedup_10x",
                  lambda: S.semdedup(emb10, "embedding", "vec_id",
                                     num_centroids=320, threshold=0.4,
                                     dim=64).filter("keep").count(), reps=3)

    with section("sf1_reads"):
        # Read anchors at amortized scale (6 M rows): at sf0.1 the fast
        # reads finish in ~0.4-0.5 s, dominated by fixed Spark job
        # overhead, which makes per-row comparisons against the
        # reference's JMH anchors (TableReadBenchmark.java:51-79) noisy.
        # Tables are built once into a versioned /tmp cache by the
        # --build-caches child process (setup is UNtimed AND out of
        # session); only the reads are measured. Disable: SPARK_GRAFT_SF1=0.
        if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf == 0.1:
            quiesce()
            cat1 = Catalog(_SF1_WH)
            n_sf1 = n_lineitem * 10

            t1pk = cat1.get_table("bench.li1_pk")
            got = timed("sf1_pk_read_full",
                        lambda: t1pk.read(spark).count(), reps=3)
            if got is not None:
                # the sf0.1 lineitem testdata carries duplicate
                # (l_orderkey, l_linenumber) pairs, so the PK merge
                # legitimately folds rows — expect 10× the distinct pairs
                n_pk = lineitem.select("l_orderkey", "l_linenumber") \
                               .distinct().count() * 10
                assert got == n_pk, (got, n_pk)
            # rows/s numerator stays the WRITTEN row count, matching the
            # sf0.1 anchors' convention (merge work scales with input rows)
            rate("sf1_pk_read_full", n_sf1, "sf1_pk_read_rows_per_sec")
            timed("sf1_pk_read_projected",
                  lambda: t1pk.read(spark,
                                    projection=["l_orderkey", "l_quantity"])
                  .agg(F.sum("l_quantity")).collect(), reps=3)

            t1orc = cat1.get_table("bench.li1_orc")
            timed("sf1_orc_read", lambda: t1orc.read(spark).count(), reps=3)
            rate("sf1_orc_read", n_sf1, "sf1_orc_read_rows_per_sec")

            t1av = cat1.get_table("bench.li1_avro")
            timed("sf1_avro_read", lambda: t1av.read(spark).count(), reps=3)
            rate("sf1_avro_read", n_sf1, "sf1_avro_read_rows_per_sec")

    if t is not None:
        timed("incremental_read",
              lambda: __import__(
                  "incubator_paimon_spark.streaming.source",
                  fromlist=["incremental_between"])
              .incremental_between(spark, t, 1, 2).count(), reps=3)

    shutil.rmtree(wh, ignore_errors=True)

    total = round(sum(times.values()), 3)
    # key order is deliberate: the round driver archives only a FRONT-
    # TRUNCATED tail of this line, so the load-bearing fields (queries,
    # derived rates, suite total) sit at the END where they survive;
    # bulky diagnostics (rep_spread) go first
    result = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "rows": {"lineitem": n_lineitem},
    }
    if rep_spread:
        result["rep_spread"] = rep_spread
    if errors:
        result["errors"] = {k: v.splitlines()[-1] if v else v
                            for k, v in errors.items()}
    if drift:
        result["drift_rechecks"] = drift
    result["load_sentinel"] = {
        "start": [round(x, 2) for x in load_start],
        "end": [round(x, 2) for x in os.getloadavg()],
    }
    result["derived"] = extra
    result["queries"] = times
    result["suite_seconds"] = total
    line = json.dumps(result)
    # full-fidelity sidecar: survives any stdout truncation in the
    # driver's artifact (committed by the round driver with the tree)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, f"BENCH_SELF_sf{sf}.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    print(line)


if __name__ == "__main__":
    if "--build-caches" in sys.argv:
        build_caches()
    else:
        main()
