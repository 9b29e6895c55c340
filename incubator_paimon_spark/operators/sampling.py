"""Deterministic sampling + dataset splitting for training-data pipelines.

Random sampling is useless at 100 TB pipeline scale: re-runs must select the
SAME rows (resumable jobs, reproducible ablations, cross-engine audits), so
every operator here derives its decision from a stable hash of a key column —
no RNG, no seed plumbing, identical output on Spark and any SQL engine that
has md5. This mirrors how production corpus pipelines do held-out splits
(hash-mod on a document id), not `TABLESAMPLE`.

Scale shape: each operator is a single scan with a pure Column predicate /
projection — no shuffle, no state, trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h32

# h32 yields a uniform 32-bit value; bucket into 1e6 slots for rate math
_SLOTS = 1_000_000


def hash_bucket(col: Column, slots: int = _SLOTS) -> Column:
    """Stable bucket in [0, slots) from a key column (any type; stringified
    the same way on the SQL side)."""
    return h32(col.cast("string")) % slots


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic ~`rate` sample: keep rows whose key hashes into the
    first rate*slots buckets. Re-running (or running in DuckDB) selects the
    identical rows."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(F.col(key_col)) < int(rate * _SLOTS))


def train_val_test_split(df: DataFrame, key_col: str,
                         weights: tuple[float, float, float] = (0.98, 0.01, 0.01),
                         split_col: str = "split") -> DataFrame:
    """Add a `split` column ('train' | 'val' | 'test') by hash range —
    stable under re-runs and under corpus growth (a document never migrates
    between splits when other documents are added, unlike percent_rank
    schemes that leak val into train as data arrives)."""
    if len(weights) != 3 or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must be 3 values summing to 1, got {weights}")
    b = hash_bucket(F.col(key_col))
    t_hi = int(weights[0] * _SLOTS)
    v_hi = t_hi + int(weights[1] * _SLOTS)
    return df.withColumn(
        split_col,
        F.when(b < t_hi, F.lit("train"))
         .when(b < v_hi, F.lit("val"))
         .otherwise(F.lit("test")))


def mixture_sample(df: DataFrame, key_col: str, domain_col: str,
                   target_mix: dict[str, float]) -> DataFrame:
    """Downsample to a TARGET MIXTURE of domains (the data-mixing step of a
    pretraining pipeline: "the corpus must be 60% web / 30% code / 10%
    papers"): compute, per domain g with current count n_g and target share
    pi_g, the keep-rate r_g = C*pi_g/n_g where C = min_g(n_g/pi_g) — the
    largest total size for which no domain must be UPsampled. Domains not in
    target_mix are dropped. Selection is the stable hash-bucket predicate,
    so re-runs (and the SQL oracle) pick identical rows.

    Scale shape: one map-side-combined groupBy for the domain counts
    (#domains rows — control-plane, collected to the driver), then a single
    scan with a CASE predicate. No join, no shuffle of the data itself.
    """
    if not target_mix or abs(sum(target_mix.values()) - 1.0) > 1e-9:
        raise ValueError(f"target_mix must sum to 1, got {target_mix}")
    counts = {r["d"]: r["n"]
              for r in df.filter(F.col(domain_col).isin(*target_mix))
                         .groupBy(F.col(domain_col).alias("d"))
                         .agg(F.count(F.lit(1)).alias("n")).collect()}
    missing = sorted(g for g, pi in target_mix.items()
                     if pi > 0 and g not in counts)
    if missing:
        raise ValueError(f"target_mix domains absent from corpus: {missing}")
    c = min(counts[g] / pi for g, pi in target_mix.items() if pi > 0)
    rates = {g: (c * pi / counts[g] if pi > 0 else 0.0)
             for g, pi in target_mix.items()}
    return stratified_hash_sample(df, key_col, domain_col, rates,
                                  default_rate=0.0)


def temperature_epochs(df: DataFrame, domain_col: str, token_col: str,
                       tau: float, total_tokens: float | None = None,
                       max_epochs: float = 4.0) -> DataFrame:
    """Per-domain epoch plan for temperature-based mixture re-balancing
    (Arivazhagan et al. 2019 §4; the UniMax epoch cap of Chung et al.
    2023): domain d with token mass T_d gets target share
    p_d ∝ T_d^(1/tau), i.e. tau=1 keeps the natural mix and tau→∞ moves
    toward uniform, boosting scarce domains. With token budget B
    (default: the corpus' own total, a pure re-balance) the plan is
    e_d = min(max_epochs, B·p_d / T_d) — the cap stops any scarce
    domain from being repeated into memorization territory. Returns
    (domain, domain_tokens, epochs).

    Every step is a Column expression (pow/sum/least in double math) so
    the SQL oracle reproduces the plan bit-for-bit; the frame is
    #domains rows — control-plane sized.
    """
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    dom = (df.groupBy(F.col(domain_col).alias("domain"))
             .agg(F.sum(token_col).cast("double").alias("domain_tokens")))
    w = F.pow(F.col("domain_tokens"), F.lit(1.0 / tau))
    # ordered unbounded frame: both Spark and the SQL oracle fold the
    # handful of per-domain doubles in domain order, so the shares are
    # bit-identical cross-engine (an unordered total's fold order is
    # engine-internal)
    everything = (Window.partitionBy().orderBy("domain")
                  .rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing))
    sw = F.sum(w).over(everything)
    b = (F.lit(float(total_tokens)) if total_tokens is not None
         else F.sum("domain_tokens").over(everything))
    e = F.least(F.lit(float(max_epochs)), b * w / sw / F.col("domain_tokens"))
    return dom.select("domain", "domain_tokens", e.alias("epochs"))


def temperature_mixture(df: DataFrame, key_col: str, domain_col: str,
                        tau: float, token_col: str,
                        total_tokens: float | None = None,
                        max_epochs: float = 4.0,
                        epoch_col: str = "epoch") -> DataFrame:
    """Materialize the temperature mixture: each row is repeated
    floor(e_d) times plus one more for the deterministic hash fraction
    of its domain, with an `epoch` column (0-based copy index) so the
    output key is (key, epoch). Unlike mixture_sample (downsample-only)
    this UPSAMPLES scarce domains — the actual shape of pretraining
    mixes, where code/papers run multiple epochs against one pass of web.

    Scale shape: one map-side-combined #domains aggregate, an explicit
    broadcast join of the plan, then a single scan + explode. The data
    itself is never shuffled; output size is bounded by
    max_epochs × |df| by construction.
    """
    plan = temperature_epochs(df, domain_col, token_col, tau,
                              total_tokens, max_epochs)
    e = F.col("epochs")
    thr = F.round((e - F.floor(e)) * _SLOTS).cast("long")
    # reserved join-key alias: with domain_col == "domain", joining on
    # the raw name and drop("domain") would drop BOTH sides' columns
    # and break the final select (r9 advice)
    plan = plan.select(F.col("domain").alias("_mv_domain"),
                       F.floor(e).cast("long").alias("_full"),
                       thr.alias("_thr"))
    joined = df.join(F.broadcast(plan),
                     df[domain_col] == plan["_mv_domain"], "inner") \
               .drop("_mv_domain")
    copies = (F.col("_full")
              + F.when(hash_bucket(F.col(key_col)) < F.col("_thr"), 1)
                 .otherwise(0))
    seq = F.when(copies > 0, F.sequence(F.lit(0), (copies - 1).cast("int"))) \
           .otherwise(F.array().cast("array<int>"))
    return (joined.select(*df.columns, F.explode(seq).alias(epoch_col)))


def leakage_safe_split(df: DataFrame, text_col: str, id_col: str,
                       weights: tuple[float, float, float] = (0.98, 0.01, 0.01),
                       split_col: str = "split") -> DataFrame:
    """train/val/test split that cannot leak duplicated text across the
    boundary: the split decision hashes the duplicate GROUP's canonical
    representative (min id over the normalized-text fingerprint), not
    the row, so every copy of a document — byte-identical or
    whitespace/case-reformatted — lands on the same side. Plain
    hash-splits put near-identical copies in both train and test, which
    inflates eval (Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better" measures exactly this leak).

    Scale shape: one hash-partitioned window (min over the fingerprint
    — the same shuffle key exact dedup uses) then a pure projection; no
    join, no driver state.
    """
    if len(weights) != 3 or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must be 3 values summing to 1, got {weights}")
    from .text import fingerprint
    rep = F.min(F.col(id_col)).over(
        Window.partitionBy(fingerprint(F.col(text_col))))
    b = hash_bucket(rep)
    t_hi = int(weights[0] * _SLOTS)
    v_hi = t_hi + int(weights[1] * _SLOTS)
    return df.withColumn(
        split_col,
        F.when(b < t_hi, F.lit("train"))
         .when(b < v_hi, F.lit("val"))
         .otherwise(F.lit("test")))


def stratified_hash_sample(df: DataFrame, key_col: str, strata_col: str,
                           rates: dict[str, float],
                           default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample low-quality
    languages, keep all high-resource ones): `rates` maps stratum value →
    keep rate. Still a single scan — the rate lookup is a CASE expression,
    not a join."""
    b = hash_bucket(F.col(key_col))
    expr = F.lit(int(default_rate * _SLOTS))
    for value, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == value,
                      F.lit(int(rate * _SLOTS))).otherwise(expr)
    return df.filter(b < expr)


def cap_per_group(df: DataFrame, group_col: str, id_col: str,
                  max_per_group: int, order_col: str | None = None,
                  descending: bool = True, salt: int = 16) -> DataFrame:
    """Per-source document cap (the C4/RefinedWeb "no single domain
    dominates" rule): keep at most `max_per_group` rows per group —
    the TOP rows by `order_col` (a quality score, length, ...) or,
    with order_col=None, a deterministic hash-ordered subset. Ties
    break on the stable id hash then the id itself, so the kept SET
    is a pure function of the data: re-runs, any `salt`, and the SQL
    oracle all select identical rows.

    Scale shape: the naive single window puts a whole mega-domain in
    ONE task (web corpora routinely have 100 M-page domains — the
    exact skew a 1000-executor job dies on). Instead: two-phase top-N.
    Phase 1 windows over (group, h32(id) % salt) and keeps
    `max_per_group` per sub-group — any row in the group's global
    top-N is also in its sub-group's top-N, so no survivor is lost.
    Phase 2 re-caps the ≤ salt×N survivors per group with the plain
    window. Each phase is one shuffle; phase 2's partitions are
    bounded at salt×N rows regardless of domain size."""
    from pyspark.sql.window import Window
    if max_per_group < 1:
        raise ValueError(f"max_per_group must be >= 1, got {max_per_group}")
    tiebreak = h32(F.col(id_col).cast("string"))
    order = []
    if order_col is not None:
        c = F.col(order_col)
        order.append(c.desc() if descending else c.asc())
    order += [tiebreak.asc(), F.col(id_col).asc()]
    out = df
    if salt and salt > 1:
        w1 = (Window.partitionBy(F.col(group_col),
                                 F.pmod(tiebreak, F.lit(salt)))
                    .orderBy(*order))
        out = (out.withColumn("__rn", F.row_number().over(w1))
                  .filter(F.col("__rn") <= max_per_group).drop("__rn"))
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (out.withColumn("__rn", F.row_number().over(w2))
               .filter(F.col("__rn") <= max_per_group).drop("__rn"))


# ----------------------------------------------------------------------
def _feature_buckets(text_col: Column, buckets: int) -> Column:
    """array<long> of hashed lowercase unigram+bigram feature buckets
    (the DSIR feature space) for one document, in document order. The
    word array is let-bound (`text.bind`) so the bigram zip and the
    size/slice references share ONE tokenize per row — the un-bound
    form re-evaluated split+lower six times per row (r15 plan audit)."""
    from .text import bind, words

    def mk(wl):
        bigrams = F.when(F.size(wl) > 1, F.zip_with(
            F.slice(wl, 1, F.size(wl) - 1),
            F.slice(wl, 2, F.size(wl) - 1),
            lambda a, b_: F.concat(a, F.lit(" "), b_))) \
            .otherwise(F.array().cast("array<string>"))
        return F.transform(F.concat(wl, bigrams),
                           lambda f: h32(f) % buckets)

    return bind(F.transform(words(text_col), lambda w: F.lower(w)), mk)


def _hashed_features(df: DataFrame, text_col: str, id_col: str,
                     buckets: int) -> DataFrame:
    """(id, bucket) rows: hashed lowercase unigram + bigram features
    (the DSIR feature space). One explode; buckets are ints, so the
    downstream shuffles move (long, int) pairs, never text."""
    return df.select(F.col(id_col).alias("id"),
                     F.explode(_feature_buckets(F.col(text_col),
                                                buckets)).alias("bucket"))


def linear_quality_scorer(df: DataFrame, text_col: str, id_col: str,
                          weights: list[float], bias: float = 0.0
                          ) -> DataFrame:
    """Model-based quality scoring, the fastText-classifier shape every
    production curation pipeline runs (CCNet/LLaMA wiki-ref filters):
    a LINEAR model over hashed unigram+bigram features —
    score = bias + Σ w[h(feature) % buckets] — with `weights` trained
    OFFLINE (fastText, sklearn, anything that emits a hashed-bag
    linear layer; len(weights) IS the bucket count). Returns
    (id, score): the raw log-odds, monotone in the classifier
    probability — threshold it directly (sigmoid is deliberately left
    off so the score stays in bit-exact linear arithmetic any SQL
    engine reproduces).

    Scale shape: one explode to (id, bucket) int pairs, a broadcast
    join against the ≤|weights|-row weight relation, one (id, double)
    sum — the text itself never shuffles (the DSIR plan, reused)."""
    spark = df.sparkSession
    buckets = len(weights)
    if buckets < 1:
        raise ValueError("weights must be non-empty")
    w = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(weights)],
        "bucket long, w double")
    feat = _hashed_features(df, text_col, id_col, buckets)
    from .text import quantize
    return (feat.join(F.broadcast(w), "bucket", "left")
                .groupBy("id")
                .agg(quantize(F.lit(float(bias))
                              + F.sum(F.coalesce(F.col("w"), F.lit(0.0))),
                              4).alias("score")))


def dsir_logweights(df: DataFrame, target: DataFrame, text_col: str,
                    id_col: str, buckets: int = 8192) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al. 2023,
    arXiv:2302.03169): log w(doc) = Σ_f log p̂(f) − log q̂(f) over the
    document's hashed unigram+bigram features, where p̂ comes from the
    TARGET distribution (the small high-quality set you want more of)
    and q̂ from the raw corpus, both Laplace-smoothed over `buckets`
    hash buckets. Returns (id, log_weight): high = looks like target.

    Scale shape: two map-side-combined feature-count aggregates (each
    at most `buckets` result rows — control-plane), a broadcast join of
    the per-bucket log-ratio table onto the corpus features, and one
    (id → sum) aggregation whose shuffle carries (long id, double)
    pairs only. The raw text never shuffles.
    """
    from pyspark import StorageLevel

    # The raw corpus's hashed feature arrays are needed TWICE — once for
    # the q̂ bucket counts, once for the per-doc score sum — and the
    # tokenize+md5 featurization is the operator's dominant cost, so
    # persist the (id, bucket-array) projection and pay it ONCE
    # (guide §1.2 step 1: don't compute things twice). State is
    # ~8 B/feature, disk-spillable; released before returning.
    arrs = df.select(F.col(id_col).alias("id"),
                     _feature_buckets(F.col(text_col), buckets).alias("bk")) \
             .persist(StorageLevel.MEMORY_AND_DISK)
    try:
        raw_f = arrs.select("id", F.explode("bk").alias("bucket"))
        tgt_f = _hashed_features(target, text_col, id_col, buckets)
        # count tables are ≤ buckets rows — cache them so the totals and
        # the log-ratio join reuse ONE aggregation pass per corpus
        # instead of re-running the feature explode (bounded memory:
        # ~2 ints × buckets); released in the finally — a failed action
        # must not pin them (VERDICT r7 #3's leak class)
        qc = raw_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("qn")).cache()
        pc = tgt_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("pn")).cache()
        try:
            lw, default_lw = _logratio_local(qc, pc, buckets)
        finally:
            qc.unpersist()
            pc.unpersist()
        # scored corpus IS the q corpus here: every bucket exists in qc,
        # so default_lw never fires and results match the pre-r8 inner
        # join. Materialize the (id, log_weight) result eagerly so the
        # feature arrays can be released NOW — the semdedup
        # localCheckpoint pattern (VERDICT r7 #3).
        return _score_features(raw_f, lw,
                               default_lw).localCheckpoint(eager=True)
    finally:
        arrs.unpersist()


def _logratio_local(qc: DataFrame, pc: DataFrame, buckets: int):
    """Laplace-smoothed log p̂/q̂ per bucket as a DRIVER-materialized
    local relation (≤ buckets rows of (long, double) — control-plane),
    plus the smoothed ratio for a bucket in NEITHER table (both counts
    0) — the value novel features of an unseen batch must score.
    The rebuilt local relation broadcasts the same doubles bit-for-bit
    (Python float IS a double), and being RDD-free it pins no executor
    storage."""
    import math
    spark = qc.sparkSession
    qtot = qc.agg(F.sum("qn")).collect()[0][0] or 0
    ptot = pc.agg(F.sum("pn")).collect()[0][0] or 0
    default_lw = (math.log(1.0 / (ptot + buckets))
                  - math.log(1.0 / (qtot + buckets)))
    lw_rows = (qc.join(pc, "bucket", "full")
                 .select("bucket",
                         (F.log((F.coalesce(F.col("pn"), F.lit(0)) + 1.0)
                                / F.lit(float(ptot + buckets)))
                          - F.log((F.coalesce(F.col("qn"), F.lit(0)) + 1.0)
                                  / F.lit(float(qtot + buckets)))).alias("lw"))
                 .collect())
    return (spark.createDataFrame(lw_rows, "bucket long, lw double"),
            default_lw)


def _score_features(feat: DataFrame, lw: DataFrame,
                    default_lw: float = 0.0) -> DataFrame:
    """Σ log-ratio over a document's features: (id, log_weight). The
    shuffle carries (id, double) pairs only — text never moves.
    `default_lw` is the Laplace-smoothed ratio for a bucket ABSENT from
    both count tables — impossible when the scored corpus is the q
    corpus (the from-scratch path, where inner-join semantics were
    accidentally correct), but real when scoring a NOT-yet-ingested
    batch against maintained counts (r8 review)."""
    from .text import quantize
    return (feat.join(F.broadcast(lw), "bucket", "left")
                .groupBy("id")
                .agg(quantize(F.sum(F.coalesce(F.col("lw"),
                                               F.lit(default_lw))), 4)
                     .alias("log_weight")))


# ----------------------------------------------------------------------
# Incrementally-maintained DSIR: the q/p bucket counts as
# aggregation-merge-engine PK tables, updated per ingest commit
# ----------------------------------------------------------------------
def create_dsir_counts_table(catalog, name: str, buckets: int = 8192):
    """A (bucket PK, n) table with the SUM field aggregator
    (`merge-engine=aggregation`, `fields.n.aggregate-function=sum` —
    the reference's FieldSumAgg, paimon-common/.../fieldagg/): each
    commit appends per-bucket deltas and merge-on-read yields running
    totals, so importance weights stay incrementally consistent with
    the corpus without ever recounting it. ≤ `buckets` merged rows —
    control-plane sized at any corpus scale."""
    import pyspark.sql.types as T
    schema = T.StructType([T.StructField("bucket", T.LongType()),
                           T.StructField("n", T.LongType())])
    return catalog.create_table(
        name, schema, primary_keys=["bucket"],
        options={"bucket": "1", "merge-engine": "aggregation",
                 "fields.n.aggregate-function": "sum",
                 "dsir.buckets": str(buckets)})


def update_dsir_counts(spark, counts_table, df_batch: DataFrame,
                       text_col: str, id_col: str):
    """Commit one ingest batch's feature-count DELTAS to a counts table
    (one bounded aggregate over the batch + one tiny commit). The sum
    aggregator folds them into the running totals on read."""
    buckets = int((counts_table.schema.options or {})["dsir.buckets"])
    deltas = (_hashed_features(df_batch, text_col, id_col, buckets)
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
    counts_table.write(spark, deltas)


def dsir_logweights_from_tables(spark, df: DataFrame, raw_counts,
                                target_counts, text_col: str,
                                id_col: str) -> DataFrame:
    """DSIR log-weights where q̂/p̂ come from maintained count tables
    instead of corpus passes: weights for tonight's scoring are
    consistent with every commit ingested so far, and the cost is
    O(|df|) feature hashing + two ≤buckets-row table reads — the
    standing corpus is never re-counted (same amortization the minhash
    signature index applies to near-dup candidates)."""
    buckets = int((raw_counts.schema.options or {})["dsir.buckets"])
    tb = int((target_counts.schema.options or {})["dsir.buckets"])
    if tb != buckets:
        raise ValueError(f"bucket mismatch: raw={buckets} target={tb}")
    qc = raw_counts.read(spark).select("bucket", F.col("n").alias("qn"))
    pc = target_counts.read(spark).select("bucket", F.col("n").alias("pn"))
    lw, default_lw = _logratio_local(qc, pc, buckets)
    feat = _hashed_features(df, text_col, id_col, buckets)
    # scoring a NOT-yet-ingested batch: its novel features hit buckets
    # in neither count table and must get the smoothed default, not be
    # silently dropped (r8 review)
    return _score_features(feat, lw, default_lw)


def dsir_sample(df: DataFrame, target: DataFrame, text_col: str,
                id_col: str, n: int, buckets: int = 8192) -> DataFrame:
    """DSIR selection: the n documents with the highest perturbed
    importance weight log w + g, g a DETERMINISTIC per-id Gumbel
    (−ln(−ln(u)), u = (h32(id)+0.5)/2³² — no RNG, so re-runs and the
    SQL oracle pick identical rows; the Gumbel-max trick makes top-n by
    perturbed weight equivalent to sampling without replacement with
    probability ∝ w). Returns (id, log_weight, key)."""
    from .text import quantize
    lwdf = dsir_logweights(df, target, text_col, id_col, buckets)
    u = (h32(F.col("id").cast("string")) + 0.5) / F.lit(float(1 << 32))
    g = -F.log(-F.log(u))
    return (lwdf.select("id", "log_weight",
                        quantize(F.col("log_weight") + g, 4).alias("key"))
                .orderBy(F.col("key").desc(), F.col("id"))
                .limit(n))


def sync_dsir_counts(spark, source_table, counts_table, text_col: str,
                     id_col: str, consumer_id: str | None = None,
                     **kw) -> int:
    """Advance a DSIR counts table to the source table's latest
    snapshot by replaying its changelog: per snapshot, one bounded
    (≤2·buckets-row) NET bucket-delta commit — counts(new rows) minus
    counts(previous images of updated/deleted rows); the sum aggregator
    folds negative deltas, so weights stay consistent through updates
    and deletes, not just appends. Progress = a consumer on the
    source."""
    from .sync import replay_changelog

    buckets = int((counts_table.schema.options or {})["dsir.buckets"])
    cid = consumer_id or f"index:{counts_table.name}"

    def apply(adds, removes, sid):
        plus = (_hashed_features(adds, text_col, id_col, buckets)
                .groupBy("bucket").agg(F.count(F.lit(1)).alias("p")))
        minus = (_hashed_features(removes, text_col, id_col, buckets)
                 .groupBy("bucket").agg(F.count(F.lit(1)).alias("m")))
        net = (plus.join(minus, "bucket", "full")
                   .select("bucket",
                           (F.coalesce(F.col("p"), F.lit(0))
                            - F.coalesce(F.col("m"), F.lit(0)))
                           .cast("long").alias("n"))
                   .filter(F.col("n") != 0))
        # identifier = source snapshot id: crash-replay is a no-op
        # commit, so count deltas can never double-apply
        counts_table.write(spark, net, commit_identifier=sid)

    return replay_changelog(spark, source_table, cid, apply, **kw)
