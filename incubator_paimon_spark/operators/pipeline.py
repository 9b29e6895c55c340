"""End-to-end corpus curation pipeline — the composition a training-data
run actually executes, as one lazy DataFrame program:

    quality/lang gate → exact dedup → near-dup cluster removal → split

Each stage is one of this package's scan-shaped operators, so the whole
pipeline is: two scans' worth of column work + one groupBy (exact dedup) +
the banded LSH join + O(log n) component rounds + a hash-range projection.
Nothing is driver-materialized; at 100 TB every stage is the same plan it
is at test scale. Deterministic end to end (md5-derived hashing only), so
the full pipeline is oracle-checkable as a single SQL statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import sampling as S
from . import text as TX


def curate_corpus(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", lang_col: str = "lang",
                  lang: str = "en", min_quality: float = 0.6,
                  min_tokens: int = 10, near_dup_threshold: float = 0.7,
                  weights: tuple = (0.8, 0.1, 0.1)) -> DataFrame:
    """Returns (id_col, quality, split) for the surviving documents."""
    q = TX.quality_score(F.col(text_col))
    filtered = (df.withColumn("__q", q)
                  .filter((F.col(lang_col) == lang)
                          & (F.col("__q") >= min_quality)
                          & (TX.token_count(F.col(text_col)) >= min_tokens)))
    exact = D.dedup_exact(filtered, text_col, id_col)
    clusters = D.dedup_clusters(exact, text_col, id_col,
                                threshold=near_dup_threshold)
    losers = (clusters.filter(~F.col("is_canonical"))
                      .select(F.col("id").alias(id_col)))
    survivors = exact.join(losers, id_col, "left_anti")
    out = S.train_val_test_split(survivors, id_col, weights)
    return out.select(F.col(id_col), F.col("__q").alias("quality"), "split")
