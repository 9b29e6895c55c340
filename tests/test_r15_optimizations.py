"""r15 optimization equivalence pins.

Every rewrite this round is a cost-shape change that must be
value-IDENTICAL to the formulation it replaced (the driver re-hashes
every declared query against the DuckDB oracle). These tests pin each
rewrite against an inline reconstruction of the pre-r15 expression:

- `text.bind` (let-binding) against naked per-element re-evaluation;
- the vectorized grouped-pandas semdedup verdict against the
  per-cluster self-join + smallest-id formula, including the NaN
  (zero-norm vector) comparison semantics;
- the single-pass bm25 scorer against the two-pass stats+scan scorer;
- the cached-featurization dsir against a recompute from its pieces.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 — fixture


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_bind_evaluates_once_with_identical_values(spark):
    """bind(col, body) == body(col) value-for-value (the whole point is
    that only the evaluation COUNT changes), incl. null propagation."""
    from incubator_paimon_spark.operators.text import bind, words
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "  x  "), (4, None)],
        "id long, t string")

    def body(ws):
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(ws) - 1, F.lit(1))),
            lambda i: F.concat_ws("-", F.slice(ws, i, 2)))

    bound = df.select("id", bind(words(F.col("t")), body).alias("v")).collect()
    naked = df.select("id", body(words(F.col("t"))).alias("v")).collect()
    assert sorted(map(tuple, bound)) == sorted(map(tuple, naked))


def test_shingles_and_segments_match_naive_python(spark):
    """shingles / _segments_exploded after the let-binding still produce
    the exact windows a naive Python tokenizer yields."""
    from incubator_paimon_spark.operators.dedup import (_segments_exploded,
                                                        shingles)
    rows = [(1, "the quick brown fox jumps"), (2, "one"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["sh"] for r in
           df.select("doc_id", shingles(F.col("text"), 3).alias("sh"))
             .collect()}
    for i, t in rows:
        ws = t.split()
        exp = []
        for s in range(max(len(ws) - 2, 1)):
            sh = " ".join(ws[s:s + 3])
            if sh not in exp:
                exp.append(sh)
        if not ws:
            exp = [""]
        assert got[i] == exp, (i, got[i], exp)
    segs = {(r["id"], r["pos"]): r["seg"] for r in
            _segments_exploded(df, "text", "doc_id", 2).collect()}
    assert segs == {(1, 0): "the quick", (1, 1): "brown fox",
                    (1, 2): "jumps", (2, 0): "one"}


def test_simhash_matches_unbound_formula(spark):
    """simhash after the let-binding == the pre-r15 naked expression."""
    from incubator_paimon_spark.operators.dedup import h32, simhash
    from incubator_paimon_spark.operators.text import words
    df = _docs(spark).limit(50)

    def old_simhash(col, bits=32):
        hashes = F.transform(words(col), lambda w: h32(w))
        bit_votes = F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda j: F.aggregate(
                hashes, F.lit(0),
                lambda acc, h: acc + F.when(F.bit_get(h, j) == 1,
                                            F.lit(1)).otherwise(F.lit(-1))))
        return F.aggregate(
            F.zip_with(bit_votes, F.sequence(F.lit(0), F.lit(bits - 1)),
                       lambda v, j: F.when(v > 0,
                                           F.pow(F.lit(2.0), j).cast("long"))
                                     .otherwise(F.lit(0).cast("long"))),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    got = df.select("doc_id", simhash(F.col("text")).alias("s"),
                    old_simhash(F.col("text")).alias("o")).collect()
    assert all(r["s"] == r["o"] for r in got)


def test_semdedup_verdict_matches_join_formula(spark):
    """The grouped-pandas verdict == the pre-r15 per-cluster self-join
    (quantize(dot/(na*nb),4) >= thr with id_a < id_b, heads capped) on
    real embeddings; a zero-norm vector sharing a cluster still fails
    LOUDLY (the join form hit ANSI DIVIDE_BY_ZERO on the same rows)."""
    from incubator_paimon_spark.operators.similarity import (
        _semdedup_verdict, assign_ivf, dot, ivf_centroids, norm, semdedup)
    from incubator_paimon_spark.operators.text import quantize
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
             .select("vec_id", "embedding")
    cents = ivf_centroids(e, "embedding", "vec_id", 4, dim=64, iters=0)
    slim = assign_ivf(e, cents, "embedding", "vec_id") \
        .select(F.col("vec_id").alias("id"), "centroid_id",
                F.col("embedding").alias("v"))
    for cap in (None, 3):
        got = {r["vec_id"]: r["keep"] for r in _semdedup_verdict(
            slim, "vec_id", 0.4, cap, True).collect()}
        nr = slim.withColumn("nrm", norm(F.col("v")))
        heads = nr
        if cap is not None:
            from pyspark.sql import Window as W
            w = W.partitionBy("centroid_id").orderBy("id")
            heads = (nr.withColumn("rn", F.row_number().over(w))
                       .filter(F.col("rn") <= cap).drop("rn"))
        a = heads.select(F.col("id").alias("id_a"), "centroid_id",
                         F.col("v").alias("va"), F.col("nrm").alias("na"))
        b = nr.select(F.col("id").alias("id_b"), "centroid_id",
                      F.col("v").alias("vb"), F.col("nrm").alias("nb"))
        sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        dup = {r["id_b"] for r in
               (a.join(b, "centroid_id")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .filter(quantize(sim, 4) >= 0.4)
                 .select("id_b").distinct().collect())}
        exp = {r["id"]: r["id"] not in dup for r in nr.select("id").collect()}
        assert got == exp, f"cap={cap}"
    # zero-norm vectors sharing a cluster fail loudly, as the ANSI
    # division did pre-r15
    withzero = e.unionByName(spark.createDataFrame(
        [(10**6, [0.0] * 64), (10**6 + 1, [0.0] * 64)],
        "vec_id long, embedding array<float>"))
    with pytest.raises(Exception, match="zero-norm"):
        semdedup(withzero, "embedding", "vec_id", num_centroids=2,
                 threshold=0.4, dim=64).collect()


def test_bm25_single_pass_matches_two_pass_scorer(spark):
    """The r15 single-tokenize bm25_search == the pre-r15 two-pass
    stats+scan scorer, bit-for-bit (same tf/dl/df/N/avgdl, same float
    addition order) — duplicated query terms included."""
    import math

    from incubator_paimon_spark.operators.retrieval import (
        bm25_corpus_stats, bm25_search)
    from incubator_paimon_spark.operators.text import quantize, words
    d = _docs(spark)
    for terms in (["merge", "vector", "stream"], ["merge", "merge"],
                  ["absentterm"], []):
        got = bm25_search(d, "text", "doc_id", terms, k=20).collect()
        n, avgdl, dfs = bm25_corpus_stats(d, "text", terms)
        ws = F.transform(words(F.col("text")), lambda w: F.lower(w))
        dl = F.size(ws)
        score = F.lit(0.0)
        k1, b = 1.2, 0.75
        for t in terms:
            t = t.lower()
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            def _eq(term):
                return lambda w: w == term
            tf = F.size(F.filter(ws, _eq(t))).cast("double")
            denom = tf + k1 * (1.0 - b + b * dl.cast("double")
                               / F.lit(avgdl if avgdl else 1.0))
            score = score + F.lit(idf) * tf * (k1 + 1.0) / denom
        exp = (d.select(F.col("doc_id").alias("id"),
                        quantize(score, 4).alias("score"))
                .filter(F.col("score") > 0)
                .orderBy(F.col("score").desc(), F.col("id"))
                .limit(20).collect())
        assert sorted(map(tuple, got)) == sorted(map(tuple, exp)), terms


def test_dsir_cached_featurization_matches_pieces(spark):
    """dsir_logweights (cached feature arrays, checkpointed result) ==
    a recompute assembled from its own unchanged pieces."""
    from incubator_paimon_spark.operators.sampling import (
        _hashed_features, _logratio_local, _score_features, dsir_logweights)
    d = _docs(spark).limit(200)
    tgt = d.filter(F.col("doc_id") % 20 == 0)
    got = dsir_logweights(d, tgt, "text", "doc_id", buckets=512).collect()
    raw_f = _hashed_features(d, "text", "doc_id", 512)
    tgt_f = _hashed_features(tgt, "text", "doc_id", 512)
    qc = raw_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("qn"))
    pc = tgt_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("pn"))
    lw, dflt = _logratio_local(qc, pc, 512)
    exp = _score_features(raw_f, lw, dflt).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_char_entropy_matches_struct_fold(spark):
    """The r15 run-length char_entropy == the r6 per-char struct fold,
    raw doubles (same run-order summation, same log2 calls)."""
    from incubator_paimon_spark.operators.text import char_entropy
    d = _docs(spark).select("doc_id", "text").limit(200)

    def old_entropy(col):
        n = F.length(col)
        schars = F.array_sort(F.split(col, ""))

        def run_term(run):
            return F.when(run > 0, run * F.log2(run)).otherwise(F.lit(0.0))

        total = F.aggregate(
            schars,
            F.struct(F.lit("").alias("prev"), F.lit(0.0).alias("run"),
                     F.lit(0.0).alias("s")),
            lambda acc, c: F.when(
                c == acc["prev"],
                F.struct(acc["prev"].alias("prev"),
                         (acc["run"] + 1).alias("run"), acc["s"].alias("s"))
            ).otherwise(
                F.struct(c.alias("prev"), F.lit(1.0).alias("run"),
                         (acc["s"] + run_term(acc["run"])).alias("s"))),
            lambda acc: acc["s"] + run_term(acc["run"]))
        ent = F.log2(n.cast("double")) - total / n
        return F.when(n > 0, ent).otherwise(F.lit(0.0))

    extra = spark.createDataFrame(
        [(10**6, ""), (10**6 + 1, "aaaa"), (10**6 + 2, "abab x")],
        "doc_id long, text string")
    got = d.unionByName(extra) \
           .select(char_entropy(F.col("text")).alias("n"),
                   old_entropy(F.col("text")).alias("o")).collect()
    assert all(r["n"] == r["o"] for r in got)


def test_quality_score_and_lang_id_unchanged(spark):
    """quality_score / lang_id after the let-binding == the pre-r15
    multi-tokenize formulas."""
    from incubator_paimon_spark.operators.text import (
        digit_ratio, lang_id, mean_word_length, punct_ratio, quality_score,
        quantize, stopword_ratio)
    d = _docs(spark).limit(100)

    def old_quality(col):
        len_score = F.least(F.length(col).cast("double") / F.lit(400.0),
                            F.lit(1.0))
        mwl = mean_word_length(col)
        mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0),
                           F.lit(1.0)).otherwise(F.lit(0.5))
        sw = stopword_ratio(col)
        sw_score = F.when((sw >= 0.05) & (sw <= 0.6),
                          F.lit(1.0)).otherwise(F.lit(0.5))
        noise = punct_ratio(col) + digit_ratio(col)
        noise_score = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 2)
        return quantize(len_score * 0.3 + mwl_score * 0.2 + sw_score * 0.25
                        + noise_score * 0.25, 4)

    got = d.select(quality_score(F.col("text")).alias("q"),
                   old_quality(F.col("text")).alias("o"),
                   lang_id(F.col("text")).alias("l")).collect()
    assert all(r["q"] == r["o"] for r in got)
    # lang_id smoke: still classifies the synthetic corpus rows
    assert all(r["l"] is not None for r in got)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_minhash_pairs_score_before_dedup_matches_old_order(spark):
    """r15 shuffle-bytes restructure: minhash_lsh_pairs now scores and
    thresholds BEFORE dropDuplicates (the exchange carries a double, not
    two signature arrays). est_jaccard is a pure function of the two
    signatures and each signature is determined by its id, so the pair
    set must equal the old join->dedup(sigs)->score->filter order —
    pinned here against an inline reconstruction, for both the self-join
    and the cross-corpus variant (including a boilerplate clique that
    produces duplicate band-collision candidates, the case where the
    dedup exchange actually matters)."""
    from incubator_paimon_spark.operators.dedup import (
        minhash_banded, minhash_lsh_pairs, minhash_lsh_pairs_between)
    from incubator_paimon_spark.operators.text import quantize

    docs = _docs(spark).limit(300)
    # append a near-identical clique so several (band, bh) buckets collide
    clique = spark.createDataFrame(
        [(9000 + i, "the same boilerplate banner text repeated verbatim "
                    "across mirrored pages " + ("x" if i % 2 else ""))
         for i in range(8)], "doc_id long, text string")
    docs = docs.select("doc_id", "text").union(clique)

    nh, bands, n = 16, 4, 3
    new = minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=nh,
                            bands=bands, shingle_n=n)

    # inline reconstruction of the pre-restructure order
    exploded = minhash_banded(docs, "text", "doc_id", nh, bands, n)
    from pyspark.sql import Window as W
    w = W.partitionBy("band", "bh").orderBy("id")
    left = (exploded.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") <= 10_000).drop("__rn")).alias("l")
    right = exploded.alias("r")
    pairs = (left.join(right, (F.col("l.band") == F.col("r.band"))
                       & (F.col("l.bh") == F.col("r.bh"))
                       & (F.col("l.id") < F.col("r.id")))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     F.col("l.sig").alias("sig_a"), F.col("r.sig").alias("sig_b"))
             .dropDuplicates(["id_a", "id_b"]))
    agree = F.size(F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"),
                                       lambda a, b: a == b), lambda x: x))
    old = (pairs.withColumn("est_jaccard",
                            quantize(agree.cast("double") / F.lit(nh), 4))
                .filter(F.col("est_jaccard") >= 0.5)
                .select("id_a", "id_b", "est_jaccard"))

    assert sorted(map(tuple, new.collect())) == \
        sorted(map(tuple, old.collect()))
    # the clique must actually have produced duplicate candidates for
    # this pin to exercise the dedup path
    assert new.filter(F.col("id_a") >= 9000).count() > 0

    new_b = minhash_lsh_pairs_between(clique, docs, "text", "doc_id",
                                      num_hashes=nh, bands=bands, shingle_n=n)
    nb = minhash_banded(clique, "text", "doc_id", nh, bands, n,
                        id_alias="new_id", sig_alias="new_sig")
    bb = minhash_banded(docs, "text", "doc_id", nh, bands, n,
                        id_alias="base_id", sig_alias="base_sig")
    bb = (bb.withColumn("__rn", F.row_number().over(
              W.partitionBy("band", "bh").orderBy("base_id")))
            .filter(F.col("__rn") <= 10_000).drop("__rn"))
    pairs_b = (nb.join(bb, ["band", "bh"])
                 .dropDuplicates(["new_id", "base_id"]))
    agree_b = F.size(F.filter(F.zip_with(F.col("new_sig"),
                                         F.col("base_sig"),
                                         lambda x, y: x == y), lambda x: x))
    old_b = (pairs_b.withColumn("est_jaccard",
                                quantize(agree_b.cast("double") / F.lit(nh), 4))
                    .filter(F.col("est_jaccard") >= 0.5)
                    .select("new_id", "base_id", "est_jaccard"))
    assert sorted(map(tuple, new_b.collect())) == \
        sorted(map(tuple, old_b.collect()))
