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


# ----------------------------------------------------------------------
# Incremental curation: the same pipeline maintained ACROSS crawls by
# the engine's own tables — nightly cost is O(crawl), never O(corpus).
# ----------------------------------------------------------------------
def create_curation_state(spark, catalog, prefix: str,
                          text_col: str = "text", id_col: str = "doc_id",
                          num_hashes: int = 16, bands: int = 4,
                          shingle_n: int = 3) -> dict:
    """The three maintained structures the incremental pipeline rides:

    - `survivors`: PK = md5(text), fields (id, text, quality) under the
      aggregation merge engine with MIN on every field — per-field min
      equals the min-id row's fields here because text (and therefore
      quality, a pure function of it) is identical within a PK group,
      so the table IS the exact-dedup survivor set, corpus-wide,
      updated per crawl commit. changelog-producer=lookup emits the
      -U/+U survivor flips (a later crawl bringing a SMALLER id for a
      known text retracts the old survivor) that drive everything
      downstream.
    - a MinHash signature index over the survivors (changelog-synced,
      so a retracted survivor's signatures leave the index).
    - the incremental cluster table (`update_dedup_clusters`).
    """
    import pyspark.sql.types as T
    from . import dedup_index as DI
    schema = T.StructType([T.StructField("th", T.StringType()),
                           T.StructField(id_col, T.LongType()),
                           T.StructField(text_col, T.StringType()),
                           T.StructField("__q", T.DoubleType())])
    survivors = catalog.create_table(
        f"{prefix}_survivors", schema, primary_keys=["th"],
        options={"bucket": "2", "merge-engine": "aggregation",
                 f"fields.{id_col}.aggregate-function": "min",
                 f"fields.{text_col}.aggregate-function": "min",
                 "fields.__q.aggregate-function": "min",
                 "changelog-producer": "lookup"})
    index = DI.create_minhash_index_table(
        catalog, f"{prefix}_mh", text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n)
    survivors.write_consumer(f"index:{prefix}_mh", 0)
    clusters = D.create_dedup_clusters_table(catalog, f"{prefix}_clusters")
    return {"survivors": survivors, "index": index, "clusters": clusters,
            "text_col": text_col, "id_col": id_col, "prefix": prefix}


def curate_ingest(spark, state: dict, crawl: DataFrame,
                  lang_col: str = "lang", lang: str = "en",
                  min_quality: float = 0.6, min_tokens: int = 10,
                  near_dup_threshold: float = 0.7) -> None:
    """Ingest one crawl: gate -> upsert into the survivor table (the
    engine's min-aggregation does corpus-wide exact dedup) -> sync the
    signature index from the survivor changelog -> pair the CHANGED
    survivors against the full index -> merge into the cluster table.
    Every step is O(crawl) + touched state; the standing corpus is
    never re-scanned."""
    from ..types import ADD_KINDS, ROW_KIND
    from . import dedup_index as DI
    tcol, icol = state["text_col"], state["id_col"]
    survivors, index = state["survivors"], state["index"]

    q = TX.quality_score(F.col(tcol))
    gated = (crawl.withColumn("__q", q)
                  .filter((F.col(lang_col) == lang)
                          & (F.col("__q") >= min_quality)
                          & (TX.token_count(F.col(tcol)) >= min_tokens)))
    rows = gated.select(F.md5(F.col(tcol)).alias("th"),
                        F.col(icol), F.col(tcol), "__q")
    before = survivors.snapshots.latest_id() or 0
    survivors.write(spark, rows)
    after = survivors.snapshots.latest_id()
    DI.sync_minhash_index(spark, survivors, index,
                          consumer_id=f"index:{state['prefix']}_mh")
    changed = (survivors.incremental(spark, before, after, changelog=True)
               .filter(F.col(ROW_KIND).isin(*ADD_KINDS))
               .select(F.col(icol), F.col(tcol)))
    nh, bd, sh = DI.index_params(index)
    pairs = (D.minhash_lsh_pairs_between(
                 changed, None, tcol, icol, num_hashes=nh, bands=bd,
                 shingle_n=sh, min_est_jaccard=near_dup_threshold,
                 base_index=DI.read_minhash_index(spark, index))
             .filter(F.col("new_id") != F.col("base_id"))
             .select(F.col("new_id").alias("id_a"),
                     F.col("base_id").alias("id_b"), "est_jaccard"))
    D.update_dedup_clusters(spark, state["clusters"], pairs)


def curate_result(spark, state: dict,
                  weights: tuple = (0.8, 0.1, 0.1)) -> DataFrame:
    """The curated corpus as of the last ingest: survivors minus
    non-canonical near-dup cluster members, split deterministically —
    identical to `curate_corpus` over the union of all crawls (the
    cluster table may hold rows for since-retracted survivors, but a
    stale id is always larger than the live id that replaced it, so it
    can never be a component minimum and never flips a live verdict;
    the anti-join consults only live survivor ids)."""
    icol = state["id_col"]
    srv = state["survivors"].read(spark)
    losers = (D.read_dedup_clusters(spark, state["clusters"])
               .filter(~F.col("is_canonical"))
               .select(F.col("id").alias(icol)))
    out = S.train_val_test_split(srv.join(losers, icol, "left_anti"),
                                 icol, weights)
    return out.select(F.col(icol), F.col("__q").alias("quality"), "split")
