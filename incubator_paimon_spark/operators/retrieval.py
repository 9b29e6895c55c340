"""Lexical retrieval over the documents table: BM25 scoring/search.

Okapi BM25 with the Lucene idf variant (Robertson & Zaragoza 2009; the
`(N - df + 0.5)/(df + 0.5)` log form with +1 to keep idf positive). The
corpus statistics the formula needs (N, average doc length, per-term
document frequency) are ONE aggregate pass — |terms| + 2 counters,
map-side combined, collected to the driver as scalars (control-plane
sized at any corpus scale). Scoring is then a pure Column projection
over the scan (tf per query term via `filter`/`size` on the token
array — JVM-side, zero shuffle), and top-k is Spark's
TakeOrderedAndProject, so a BM25 search over 100 TB of documents costs
one stats pass + one scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import quantize, words


def bm25_corpus_stats(df: DataFrame, text_col: str,
                      query_terms: list[str]) -> tuple[int, float, dict]:
    """(N, avgdl, {term: df}) in one aggregate pass; terms are matched
    lowercase whole-token and the returned dict is keyed lowercase."""
    terms = [t.lower() for t in query_terms]
    ws = F.transform(words(F.col(text_col)), lambda w: F.lower(w))
    aggs = [F.count(F.lit(1)).alias("n"),
            F.avg(F.size(ws)).alias("avgdl")]
    for i, t in enumerate(terms):
        aggs.append(F.sum(F.array_contains(ws, t).cast("int"))
                     .alias(f"df{i}"))
    row = df.agg(*aggs).collect()[0]
    return (row["n"], float(row["avgdl"] or 0.0),
            {t: row[f"df{i}"] or 0 for i, t in enumerate(terms)})


def bm25_search(df: DataFrame, text_col: str, id_col: str,
                query_terms: list[str], k: int = 10,
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25: (id, score). Deterministic ties by id."""
    n, avgdl, dfs = bm25_corpus_stats(df, text_col, query_terms)
    ws = F.transform(words(F.col(text_col)), lambda w: F.lower(w))
    dl = F.size(ws)
    score = F.lit(0.0)
    for t in query_terms:
        t = t.lower()
        idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        tf = F.size(F.filter(ws, lambda w: w == t)).cast("double")
        denom = tf + k1 * (1.0 - b + b * dl.cast("double")
                           / F.lit(avgdl if avgdl else 1.0))
        score = score + F.lit(idf) * tf * (k1 + 1.0) / denom
    return (df.select(F.col(id_col).alias("id"),
                      quantize(score, 4).alias("score"))
              .filter(F.col("score") > 0)
              .orderBy(F.col("score").desc(), F.col("id"))
              .limit(k))


# ----------------------------------------------------------------------
def rrf_fuse(rankings: list[tuple[DataFrame, str]], k: int = 10,
             rrf_k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    already-truncated ranked lists. Each input is (df, score_col) where
    df has columns (id, score_col) and holds AT MOST the caller's
    per-ranker top-N — the ranks are recomputed here with a
    deterministic (score desc, id) row_number so fusion never depends
    on a DataFrame's (unstable) physical order.

    Returns (id, rrf_score, rank_0..rank_{m-1}); absent-from-a-list ids
    contribute nothing for that list (the standard RRF convention).

    Scale: the inputs are top-N lists (control-plane sized) — the
    single-partition row_number windows here are over ≤N rows each; the
    corpus-sized work happened inside the upstream searches."""
    from pyspark.sql import Window as W

    fused = None
    rank_cols = []
    for i, (df, score_col) in enumerate(rankings):
        w = W.orderBy(F.col(score_col).desc(), F.col("id"))
        r = df.select("id", F.row_number().over(w).alias(f"rank_{i}"))
        rank_cols.append(f"rank_{i}")
        fused = r if fused is None else fused.join(r, "id", "full")
    score = None
    for rc in rank_cols:
        term = F.coalesce(1.0 / (F.lit(rrf_k) + F.col(rc)), F.lit(0.0))
        score = term if score is None else score + term
    return (fused.select("id", quantize(score, 6).alias("rrf_score"),
                         *rank_cols)
                 .orderBy(F.col("rrf_score").desc(), F.col("id"))
                 .limit(k))


def hybrid_search(docs: DataFrame, embeddings: DataFrame, text_col: str,
                  id_col: str, vec_col: str, vec_id_col: str,
                  query_terms: list[str], query_vec: list[float],
                  k: int = 10, k_each: int = 20,
                  rrf_k: int = 60) -> DataFrame:
    """Hybrid retrieval: RRF fusion of BM25 (lexical) and exact-cosine
    (semantic) top-k_each lists — the standard curation / eval-set
    mining shape. Returns (id, rrf_score, rank_0=lexical,
    rank_1=semantic).

    The two searches are the engine's proven scale shapes (BM25 =
    stats pass + scoring projection + TakeOrdered; cosine = scan +
    TakeOrdered; swap in quantized/IVF variants for bigger corpora);
    fusion itself touches ≤ 2·k_each rows. `id_col` and `vec_id_col`
    must identify the same documents."""
    from .similarity import cosine_topk

    lex = bm25_search(docs, text_col, id_col, query_terms, k=k_each)
    sem = (cosine_topk(embeddings, vec_col, query_vec, k_each,
                       id_col=vec_id_col)
           .select(F.col(vec_id_col).alias("id"), "cosine"))
    return rrf_fuse([(lex, "score"), (sem, "cosine")], k=k, rrf_k=rrf_k)
