"""Sequence packing: assign documents to fixed-token-budget packs.

Training pipelines concatenate documents into fixed-size token sequences
(pack-and-split). The assignment here is the cumulative-sum form: within an
ordered stream of documents, a document's pack is
``floor(tokens_before_it / max_tokens)`` — pack boundaries fall wherever
the running token total crosses a multiple of the budget, and a document
longer than the budget simply spans packs (the downstream tokenizer splits
it; this operator only decides grouping).

Scale shape: a single global ordered window would funnel 100 TB through
ONE shuffle partition. Instead documents are sharded by ``id % num_shards``
and packed independently per shard — ``num_shards`` parallel windows, each
a bounded partition, and the pack key is ``(shard, pack_id)``. Ordering
within a shard is by document id, so the assignment is deterministic and
reproducible from any engine (the modulo shard function is portable SQL,
unlike engine-specific hash functions).

No reference-repo counterpart: this is one of the LLM-data-pipeline
operators layered on the table engine (like dedup/similarity), built from
plain window aggregates — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count

__all__ = ["pack_sequences", "pack_summary"]


def pack_sequences(df: DataFrame, text_col: str, id_col: str,
                   max_tokens: int, num_shards: int = 32) -> DataFrame:
    """Input rows + ``(n_tokens, shard, pack_id)`` pack assignment."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    out = df.withColumn("n_tokens", token_count(F.col(text_col)).cast("long")) \
            .withColumn("shard", F.pmod(F.col(id_col), F.lit(num_shards))
                        .cast("int"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn(
        "pack_id", F.floor(cum_before / max_tokens).cast("long"))


def pack_summary(df: DataFrame, text_col: str, id_col: str,
                 max_tokens: int, num_shards: int = 32) -> DataFrame:
    """Per-pack roll-up: document count and token total per (shard, pack).

    Every pack's token total is < max_tokens + the length of its last
    document (cumsum semantics); the roll-up is the cheap way to audit the
    whole assignment.
    """
    packed = pack_sequences(df, text_col, id_col, max_tokens, num_shards)
    return (packed.groupBy("shard", "pack_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("pack_tokens"),
                 F.min(id_col).alias("first_id"),
                 F.max(id_col).alias("last_id")))
