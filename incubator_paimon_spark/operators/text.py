"""Text analysis operators for LLM data pipelines (SURVEY §7.1 step 8).

All pure Column expressions (JVM-side, codegen'd) — no Python UDFs — so they
run at scan speed over 100 TB of documents. Every operator has a matching
ANSI/DuckDB SQL form used by the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, digits: int = 4) -> Column:
    """floor(x*10^d + 0.5)/10^d — deterministic half-up rounding built from
    IEEE ops both Spark and DuckDB compute bit-identically (plain round()
    differs between engines exactly at representation boundaries)."""
    scale = float(10 ** digits)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)

# small multilingual stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "los", "las", "que", "es", "un", "una", "por", "con", "para"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"],
}

QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


def bind(col: Column, body) -> Column:
    """Let-binding for expression trees: evaluate `col` ONCE per row and
    hand it to `body` as a bound lambda variable. Catalyst does no CSE
    inside higher-order-function lambda bodies, so a non-trivial subtree
    referenced from a per-element lambda (the tokenize split inside a
    windowing transform, say) is re-evaluated for EVERY element —
    O(len²) per row (the char_entropy fold hit the same wall in r6:
    measured 340× on 2 k-char docs). Wrapping the subtree as the
    one-element array ARGUMENT of a transform makes Catalyst evaluate it
    once; the body sees it as a lambda variable, which is a cheap slot
    read per reference. Pure expression rewrite: same values, same
    order, same null behavior (guide §1.2 step 2 — per-task work)."""
    return F.element_at(F.transform(F.array(col), body), 1)


def words(col: Column) -> Column:
    """Whitespace tokenization; empty text → empty array."""
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(col), r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(words(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-approximation: word-chunks + punctuation + digit runs, the usual
    ~4-chars-per-token heuristic refined by an explicit regex split."""
    pieces = F.split(F.trim(col), r"(?=[^\w\s])|(?<=[^\w\s])|\s+")
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or QUALITY_STOPWORDS)])
    ws = words(col)
    n = F.size(ws)
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, F.lower(w))))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    cleaned = F.regexp_replace(col, r"[^\w\s]", "")
    return F.when(n > 0, (n - F.length(cleaned)).cast("double") / n).otherwise(0.0)


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    cleaned = F.regexp_replace(col, r"[0-9]", "")
    return F.when(n > 0, (n - F.length(cleaned)).cast("double") / n).otherwise(0.0)


def mean_word_length(col: Column) -> Column:
    ws = words(col)
    n = F.size(ws)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(n > 0, total.cast("double") / n).otherwise(0.0)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length saturation, healthy mean
    word length, some-but-not-too-many stopwords, low punctuation/digit
    noise. Deterministic, SQL-expressible (oracle mirrors it exactly).
    The whole score folds inside ONE let-binding of the word array —
    a single tokenize per row (was 3; and a struct-of-subscores form
    still re-evaluated the binding once per field reference, since
    expression dedup does not see through lambda-bearing subtrees).
    The final sum keeps the original left-to-right addition order
    bit-for-bit."""
    def mk(ws):
        len_score = F.least(F.length(col).cast("double") / F.lit(400.0),
                            F.lit(1.0))
        n = F.size(ws)
        total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
        mwl = F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))
        mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0),
                           F.lit(1.0)).otherwise(F.lit(0.5))
        sw_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
        hits = F.size(F.filter(ws, lambda w: F.array_contains(sw_arr,
                                                              F.lower(w))))
        sw = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
        sw_score = F.when((sw >= 0.05) & (sw <= 0.6),
                          F.lit(1.0)).otherwise(F.lit(0.5))
        noise = punct_ratio(col) + digit_ratio(col)
        noise_score = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 2)
        return quantize(len_score * 0.3 + mwl_score * 0.2 + sw_score * 0.25
                        + noise_score * 0.25, 4)

    return bind(words(col), mk)


def lang_id(col: Column) -> Column:
    """Stopword-hit language ID with deterministic tie-break (first language
    in LANG_STOPWORDS order wins ties). The lowered word array is
    let-bound: the nested when-chain references each language's hit count
    several times, and every un-bound reference re-tokenized the row."""
    def mk(ws):
        scores = []
        for lang, sws in LANG_STOPWORDS.items():
            arr = F.array(*[F.lit(s) for s in sws])
            scores.append((lang, F.size(F.filter(
                ws, lambda w: F.array_contains(arr, w)))))
        best = None
        best_score = None
        for lang, sc in reversed(scores):  # reversed so earlier langs win ties
            if best is None:
                best, best_score = F.lit(lang), sc
            else:
                best = F.when(sc >= best_score, F.lit(lang)).otherwise(best)
                best_score = F.when(sc >= best_score, sc).otherwise(best_score)
        return F.when(best_score > 0, best).otherwise(F.lit("und"))

    return bind(F.transform(words(col), lambda w: F.lower(w)), mk)


# conservative regex subset shared by Spark (Java regex) and SQL oracles
# (RE2): no lookaround, no possessive quantifiers, ASCII word boundaries
REDACT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
REDACT_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
REDACT_NUMRUN = r"\b\d{7,}\b"


def redact(col: Column) -> Column:
    """PII scrubbing for training corpora: emails → [EMAIL], IPv4 literals
    → [IP], then any remaining 7+-digit run (phone/account/SSN-shaped) →
    [NUM]. Order matters — IPs must be rewritten before bare digit runs.
    Pure Column regexp_replace chain (JVM-side, whole-stage codegen); the
    patterns are deliberately the regex subset Java and RE2 share, so a SQL
    oracle reproduces the output byte-for-byte."""
    out = F.regexp_replace(col, REDACT_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, REDACT_IPV4, "[IP]")
    return F.regexp_replace(out, REDACT_NUMRUN, "[NUM]")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace/case-normalized text —
    stable under reformatting, the cheap exact-near-dup key."""
    normalized = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(normalized)


def rolling_hash_fingerprint(col: Column, window: int = 4) -> Column:
    """Winnowing-style fingerprint: minimum 32-bit hash over word n-gram
    shingles (robust to local edits). Word array let-bound — the window
    lambda would otherwise re-tokenize per shingle."""
    def mk(ws):
        n = F.size(ws)
        idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
        shingles = F.transform(idx,
                               lambda i: F.concat_ws(" ", F.slice(ws, i,
                                                                  window)))
        hashes = F.transform(shingles, lambda s:
                             F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
                             .cast("long"))
        return F.array_min(hashes)

    return bind(words(col), mk)


def corpus_stats(df: DataFrame, text_col: str) -> DataFrame:
    """One-row corpus summary: doc count, total/mean tokens, exact p50/p90/
    p99 token counts. Exact percentiles (not approx) so the number is
    reproducible and cross-engine checkable; at 100 TB swap in
    percentile_approx — the plan shape (single partial+final agg, no
    shuffle beyond the final gather) is identical."""
    tc = token_count(F.col(text_col))
    d = df.select(tc.alias("__tc"))
    pct = F.percentile(F.col("__tc"), F.array(F.lit(0.5), F.lit(0.9),
                                              F.lit(0.99)))
    return d.agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum("__tc").alias("total_tokens"),
        quantize(F.avg("__tc"), 4).alias("mean_tokens"),
        quantize(pct[0], 4).alias("p50_tokens"),
        quantize(pct[1], 4).alias("p90_tokens"),
        quantize(pct[2], 4).alias("p99_tokens"))


def kmv_distinct_estimate(df: DataFrame, col, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-cardinality sketch (Bar-Yossef et al. 2002,
    public literature): estimate = (k-1) / max(k smallest normalized
    hashes), exact count when fewer than k distinct values exist.
    Deterministic (md5-derived hashes, no RNG) so the estimate is
    bit-reproducible and cross-engine checkable — unlike HLL approx sketches
    whose binary registers differ per engine.

    Plan: distinct on the 8-byte hash (one shuffle), then TakeOrdered k —
    the k-smallest pass is a map-side partial top-k, never a full sort."""
    from .dedup import h32
    h = (h32(F.col(col).cast("string")).cast("double") / F.lit(2.0 ** 32))
    kmin = (df.select(h.alias("__h")).distinct()
              .orderBy("__h").limit(k))
    return kmin.agg(
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
         .otherwise(F.round((F.lit(float(k - 1)) / F.max("__h")), 2))
         .alias("distinct_est"),
        F.count(F.lit(1)).alias("k_used"))


def top_terms(df: DataFrame, text_col: str, id_col: str, k: int = 20,
              min_len: int = 3) -> DataFrame:
    """Exact top-k terms by document frequency: per-doc distinct terms
    (array_distinct before the explode — cheaper than a post-explode
    distinct shuffle) → explode → groupBy(term) → TakeOrdered. One explode
    + one shuffle on the term key; ties broken by term so output is
    total-ordered and reproducible."""
    terms = F.array_distinct(
        F.filter(F.transform(words(F.col(text_col)), F.lower),
                 lambda t: F.length(t) >= min_len))
    w = df.select(F.col(id_col), F.explode(terms).alias("term"))
    return (w.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
             .orderBy(F.desc("doc_freq"), F.asc("term")).limit(k))


def repetition_stats(df: DataFrame, text_col: str, id_col: str,
                     gram_n: int = 2) -> DataFrame:
    """Within-document repetition signals (the Gopher / MassiveText quality
    rules — Rae et al. 2021 §A1.1, public methodology): repeated content
    inside ONE document marks low-quality generated/boilerplate text.

    Returns per doc: (id, n_words, dup_word_frac, dup_gram_frac,
    top_gram_frac) where dup_word_frac = 1 - distinct/total words,
    dup_gram_frac is the same over word n-grams, and top_gram_frac is the
    share of the single most-frequent n-gram. Empty docs yield zeros.

    Scale shape: ZERO shuffles — every stat is a per-row expression on the
    scan. The stats are all WITHIN-document, so no cross-row frequency
    table is needed: the n-gram mode comes from array_sort + a run-length
    F.aggregate over the sorted gram hashes (O(n log n) per row, JVM-side
    whole-stage codegen, no explode/groupBy/join). An earlier draft
    exploded grams through two keyed aggregations and a join — 3 shuffles
    and a double text scan for numbers each row already owns.

    r15: the word and gram-hash arrays are STAGED as columns in their own
    projections (attribute reads are free; CollapseProject keeps non-cheap
    aliases referenced more than once), where the inline form re-tokenized
    per gram window inside the lambda and re-built the gram array once per
    referencing stat.
    """
    ws = F.col("__ws")
    grams = F.col("__grams")
    # most-frequent-gram count = longest run in the sorted hash array
    init = F.struct(F.lit(None).cast("long").alias("prev"),
                    F.lit(0).alias("run"), F.lit(0).alias("best"))

    def step(acc, g):
        run = F.when(acc.getField("prev").eqNullSafe(g),
                     acc.getField("run") + 1).otherwise(F.lit(1))
        return F.struct(g.alias("prev"), run.alias("run"),
                        F.greatest(acc.getField("best"), run).alias("best"))

    top = F.aggregate(F.array_sort(grams), init, step,
                      lambda acc: acc.getField("best"))
    n_grams = F.size(grams)
    n_distinct_grams = F.size(F.array_distinct(grams))
    n_words = F.size(ws)
    n_distinct_words = F.size(F.array_distinct(ws))
    frac = lambda num, den: quantize(
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 4)
    staged = df.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("__ws"))
    staged = staged.select(
        "id", "__ws",
        F.when(F.size(ws) >= gram_n, F.transform(
            F.sequence(F.lit(1),
                       F.greatest(F.size(ws) - gram_n + 1, F.lit(1))),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i, gram_n)))
        )).otherwise(F.array()).alias("__grams"))
    return staged.select(
        "id", n_words.alias("n_words"),
        frac(n_words - n_distinct_words, n_words).alias("dup_word_frac"),
        frac(n_grams - n_distinct_grams, n_grams).alias("dup_gram_frac"),
        frac(top, n_grams).alias("top_gram_frac"))


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    max_words: int = 200, overlap: int = 20) -> DataFrame:
    """Split documents into overlapping word-window chunks — the standard
    preprocessing step before embedding / RAG indexing (chunk size bounded
    by the encoder's context, overlap preserving cross-boundary context).

    Chunk k covers words [k*stride, k*stride + max_words) with
    stride = max_words - overlap; the final chunk may be short; documents
    shorter than max_words yield exactly one chunk (empty docs one empty
    chunk, so no document silently disappears from the index).

    Returns (id, chunk_id, chunk_text, chunk_words). Scale shape: pure
    projection + posexplode — zero shuffles; output rows ≈ input words /
    stride regardless of document skew (a 1M-word document becomes ~5k
    rows, never one task's giant string).
    """
    if overlap >= max_words:
        raise ValueError(f"overlap ({overlap}) must be < max_words ({max_words})")
    stride = max_words - overlap

    # word array let-bound: the per-chunk slice lambda would otherwise
    # re-tokenize the document once per chunk (r15)
    def mk(ws):
        n_chunks = F.greatest(
            F.ceil((F.size(ws) - F.lit(overlap)) / F.lit(stride)).cast("int"),
            F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda k: F.slice(ws, k * stride + 1, max_words))

    chunks = bind(words(F.col(text_col)), mk)
    return (df.select(F.col(id_col).alias("id"),
                      F.posexplode(chunks).alias("chunk_id", "cw"))
              .select("id", "chunk_id",
                      F.array_join(F.col("cw"), " ").alias("chunk_text"),
                      F.size(F.col("cw")).alias("chunk_words")))


# ----------------------------------------------------------------------
def char_entropy(col: Column) -> Column:
    """Shannon entropy (bits) of the per-document character distribution —
    the classic cheap perplexity proxy: machine-generated noise and
    boilerplate sit at the distribution's tails. Pure Column expressions,
    zero shuffles: sort the chars, mark run boundaries, fold run lengths.
    O(n log n) per document vs the naive frequency-map fold's
    O(n × alphabet) map rebuild per character (VERDICT r6 #3)."""
    # entropy = -Σ p·log2 p = log2(n) − (Σ_runs cnt·log2 cnt)/n. r15
    # shape: run STARTS via one filter over positions (element_at on the
    # let-bound sorted array is O(1)), run lengths via zip_with against
    # the shifted starts, then one double fold — no per-char struct
    # allocation (the r6 accumulator built a 3-field struct per char,
    # ~1.4× slower; run terms still sum in run order, so values are
    # bit-identical — pinned in test_r15_optimizations).
    n = F.length(col)

    def mk(schars):
        m = F.size(schars)
        starts = F.filter(
            F.sequence(F.lit(1), m),
            lambda i: (i == 1) | (F.element_at(schars, i)
                                  != F.element_at(schars, i - 1)))
        return bind(starts, lambda st: F.aggregate(
            F.zip_with(st,
                       F.concat(F.slice(st, 2, F.size(st) - 1),
                                F.array(m + 1)),
                       lambda a, b: (b - a).cast("double")),
            F.lit(0.0),
            lambda acc, r: acc + F.when(r > 0,
                                        r * F.log2(r)).otherwise(F.lit(0.0))))

    total = bind(F.array_sort(F.split(col, "")), mk)
    ent = F.log2(n.cast("double")) - total / n
    return F.when(n > 0, ent).otherwise(F.lit(0.0))


def gopher_quality_filter(df: DataFrame, text_col: str, id_col: str,
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_ratio: float = 0.1,
                          min_stopword_hits: int = 2) -> DataFrame:
    """Document-level quality gate from the published Gopher rules
    (Rae et al. 2021, App. A) plus C4's terminal-punctuation check
    (Raffel et al. 2020) — the standard pre-training corpus filter:
    word-count window, mean-word-length window, symbol ratio (# and …),
    a minimum number of distinct common-stopword hits, and whether the
    doc ends in terminal punctuation. Returns one row per document:
    (id, n_words, mean_word_len, symbol_ratio, stopword_hits,
    ends_terminal, keep) — keep = all rules pass; callers filter or
    route on it. A zero-shuffle scan projection like the other text
    stats: every rule is a Column expression. The word array is staged
    as a column in its own projection (r15) so the rules share one
    tokenize per row instead of one per referencing rule."""
    staged = df.select(F.col(id_col).alias("id"),
                       F.col(text_col).alias("__t"),
                       words(F.col(text_col)).alias("__ws"))
    ws = F.col("__ws")
    n_words = F.size(ws)
    mean_len = F.when(n_words > 0,
                      F.aggregate(ws, F.lit(0),
                                  lambda a, w: a + F.length(w))
                      .cast("double") / n_words).otherwise(F.lit(0.0))
    n_chars = F.length(F.col("__t"))
    symbols = n_chars - F.length(F.regexp_replace(F.col("__t"),
                                                  r"[#…]", ""))
    sym_ratio = F.when(n_chars > 0,
                       symbols.cast("double") / n_chars).otherwise(F.lit(0.0))
    lowered = F.transform(ws, lambda w: F.lower(w))
    hits = F.size(F.array_intersect(
        lowered, F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])))
    ends_terminal = F.col("__t").rlike(r"[.!?\"']\s*$")
    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
            & (sym_ratio <= max_symbol_ratio)
            & (hits >= min_stopword_hits)
            & ends_terminal)
    return staged.select(
        "id",
        n_words.alias("n_words"),
        quantize(mean_len, 4).alias("mean_word_len"),
        quantize(sym_ratio, 4).alias("symbol_ratio"),
        hits.alias("stopword_hits"),
        ends_terminal.alias("ends_terminal"),
        keep.alias("keep"))


def line_stats(df: DataFrame, text_col: str, id_col: str,
               short_line_chars: int = 10) -> DataFrame:
    """Line-level quality signals from the published CCNet / C4 /
    RedPajama-v2 / FineWeb rule sets, one row per document:
    (id, n_lines, dup_line_frac, frac_lines_end_terminal,
    frac_short_lines, frac_bullet_lines, mean_line_len). Boilerplate-
    and template-heavy pages score high on dup_line_frac / bullet
    fraction and low on terminal punctuation — the standard line-shape
    quality gate that complements the word-level gopher_quality_filter.
    Pure Column expressions over split(text, '\\n'): a zero-shuffle scan
    projection at any corpus size. The line array is staged as a column
    (r15) so the six stats share one split per row."""
    staged = df.select(F.col(id_col).alias("id"),
                       F.split(F.col(text_col), "\n").alias("__lines"))
    lines = F.col("__lines")
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    dup_frac = F.when(n > 0, (n - nd).cast("double") / n).otherwise(F.lit(0.0))
    def frac(pred):
        return F.when(n > 0, F.size(F.filter(lines, pred)).cast("double") / n) \
                .otherwise(F.lit(0.0))
    end_terminal = frac(lambda l: l.rlike(r"[.!?\"']\s*$"))
    short = frac(lambda l: F.length(F.trim(l)) < short_line_chars)
    bullet = frac(lambda l: F.trim(l).rlike(r"^([-*•]|\d+[.)])\s"))
    total_len = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    mean_len = F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0))
    return staged.select(
        "id",
        n.alias("n_lines"),
        quantize(dup_frac, 4).alias("dup_line_frac"),
        quantize(end_terminal, 4).alias("frac_lines_end_terminal"),
        quantize(short, 4).alias("frac_short_lines"),
        quantize(bullet, 4).alias("frac_bullet_lines"),
        quantize(mean_len, 4).alias("mean_line_len"))
