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
    lowercase whole-token."""
    ws = F.transform(words(F.col(text_col)), lambda w: F.lower(w))
    aggs = [F.count(F.lit(1)).alias("n"),
            F.avg(F.size(ws)).alias("avgdl")]
    for i, t in enumerate(query_terms):
        aggs.append(F.sum(F.array_contains(ws, t.lower()).cast("int"))
                     .alias(f"df{i}"))
    row = df.agg(*aggs).collect()[0]
    return (row["n"], float(row["avgdl"] or 0.0),
            {t: row[f"df{i}"] or 0 for i, t in enumerate(query_terms)})


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
