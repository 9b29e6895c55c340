"""DuckDB oracle SQL for every entry in __spark_entry__.queries().

Each statement runs against the driver's pre-registered views (region nation
customer supplier part orders lineitem events documents embeddings) and must
hash-match the Spark result: same column names, same rounding, same types
(DuckDB HUGEINT sums are cast to BIGINT).

The engine-semantics oracles express what the fixture tables in
__spark_entry__._fixtures *mean* (window dedup, partial-update fold, state
diff, overwrite effect) directly over the raw tables — an independent
derivation, not a re-run of the engine.

The LLM-operator oracles replicate the operators' exact arithmetic: the
shared 32-bit hash is ('0x'||substr(md5(x),1,8))::BIGINT == Spark
conv(substring(md5(x),1,8),16,10).
"""

from __future__ import annotations

# fixed query vector, duplicated from __spark_entry__ (kept in sync by test)
QUERY_VEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]

_WORDS = ("CASE WHEN length(trim({t})) = 0 THEN [] "
          "ELSE string_split_regex(trim({t}), '\\s+') END")


def _q(expr: str, digits: int = 4) -> str:
    """floor(x*10^d + 0.5)/10^d — bit-identical to Spark's quantize()
    (plain round() diverges between engines at representation boundaries)."""
    scale = 10 ** digits
    return f"(floor(({expr}) * {scale}.0 + 0.5) / {scale}.0)"

_H32 = "('0x' || substr(md5({x}), 1, 8))::BIGINT"

_QUALITY_STOPWORDS = ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'for', 'on', 'with']

_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "los", "las", "que", "es", "un", "una", "por", "con", "para"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"],
}


def _sql_list(xs):
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


def _stop_ratio(words_expr, stopwords):
    hits = (f"len(list_filter({words_expr}, "
            f"w -> list_contains({_sql_list(stopwords)}, lower(w))))")
    n = f"len({words_expr})"
    return f"(CASE WHEN {n} > 0 THEN {hits}::DOUBLE / {n} ELSE 0.0 END)"


def _punct_ratio(t):
    return (f"(CASE WHEN length({t}) > 0 THEN (length({t}) - "
            f"length(regexp_replace({t}, '[^\\w\\s]', '', 'g')))::DOUBLE / length({t}) "
            f"ELSE 0.0 END)")


def _digit_ratio(t):
    return (f"(CASE WHEN length({t}) > 0 THEN (length({t}) - "
            f"length(regexp_replace({t}, '[0-9]', '', 'g')))::DOUBLE / length({t}) "
            f"ELSE 0.0 END)")


_MINHASH_P = (1 << 31) - 1


def _minhash_perms(num_hashes):
    """Same (a, b) permutation family as operators.dedup.minhash_perms."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    return [(h(f"a:{i}") % (_MINHASH_P - 1) + 1, h(f"b:{i}") % _MINHASH_P)
            for i in range(num_hashes)]


def _minhash_sql(num_hashes, bands, shingle_n, table="documents",
                 id_col="doc_id", text_col="text"):
    """Shared WITH-prefix: words → shingles → shingle hashes → permutation
    minhash signature → banded buckets → candidate pairs."""
    rows = num_hashes // bands
    w = _WORDS.format(t=text_col)
    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {_MINHASH_P}))"
        for a, b in _minhash_perms(num_hashes))
    band_selects = []
    for b in range(bands):
        parts = " || ',' || ".join(f"sig[{b*rows + r + 1}]::VARCHAR" for r in range(rows))
        band_selects.append(
            f"SELECT id, sig, {b} AS band, md5({parts}) AS bh FROM sig")
    banded = " UNION ALL ".join(band_selects)
    return f"""
WITH w AS (
  SELECT {id_col} AS id, {w} AS ws FROM {table}
), sh AS (
  SELECT id, list_distinct(list_transform(
      range(1, greatest(len(ws) - {shingle_n} + 1, 1) + 1),
      i -> array_to_string(ws[i:i+{shingle_n - 1}], ' '))) AS shingles
  FROM w
), sig AS (
  SELECT id, [{sig_items}] AS sig FROM (
    SELECT id, list_transform(shingles, s -> {_H32.format(x='s')}) AS hs
    FROM sh)
), banded AS (
  {banded}
), pairs AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.sig AS sig_a, r.sig AS sig_b
  FROM banded l JOIN banded r ON l.band = r.band AND l.bh = r.bh AND l.id < r.id
)"""


def _cosine_sql(vec_expr, qv):
    dim = len(qv)
    q = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    dot = (f"list_sum(list_transform(range(1, {dim + 1}), "
           f"i -> {vec_expr}[i]::DOUBLE * ({q})[i]))")
    nv = (f"sqrt(list_sum(list_transform({vec_expr}, "
          f"x -> x::DOUBLE * x::DOUBLE)))")
    nq = f"sqrt(list_sum(list_transform({q}, x -> x::DOUBLE * x::DOUBLE)))"
    return f"({dot} / ({nv} * {nq}))"


def _pair_cosine_sql(a, b):
    dot = (f"list_sum(list_transform(range(1, 65), "
           f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")
    na = f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))"
    return f"({dot} / ({na} * {nb}))"


def _lang_case():
    langs = list(_LANG_STOPWORDS)
    scores = {
        lang: (f"len(list_filter(lws, w -> list_contains("
               f"{_sql_list(sws)}, w)))")
        for lang, sws in _LANG_STOPWORDS.items()
    }
    whens = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{l2}" for l2 in langs[i + 1:])
        whens.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{langs[-1]}' END"
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    score_cols = ", ".join(f"{expr} AS s_{lang}" for lang, expr in scores.items())
    return score_cols, case, best


_sc, _case, _best = _lang_case()

ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------- host SQL
ORACLES["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["shipping_priority"] = """
SELECT l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ORACLES["local_supplier_volume"] = """
SELECT n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""

ORACLES["revenue_forecast"] = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["top_customers"] = """
SELECT c_custkey, c_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLES["order_rank_window"] = """
SELECT o_custkey, o_orderkey, rk, round(o_totalprice, 2) AS price
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""

ORACLES["cube_rollup"] = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLES["semi_anti"] = """
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""

ORACLES["uncommitted_parts"] = """
SELECT p_brand, count(*) AS n_parts, round(sum(p_retailprice), 2) AS value
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""

ORACLES["above_avg_orders"] = """
SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
"""

ORACLES["events_sessions"] = """
WITH e AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM e
), g AS (
  SELECT user_id, sess_id, count(*) AS n_events,
         round(sum(value), 2) AS sess_value
  FROM s GROUP BY user_id, sess_id
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_events,
       round(sum(sess_value), 2) AS total_value
FROM g GROUP BY user_id
"""

ORACLES["stream_sessions"] = ORACLES["events_sessions"]

ORACLES["events_hourly"] = """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
       count(*) AS n, round(sum(value), 2) AS v
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""

# ------------------------------------------------------- engine semantics
ORACLES["pk_upsert"] = """
SELECT c_custkey, c_name, c_nationkey,
  round(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE -1.0 END, 2) AS c_acctbal,
  c_mktsegment
FROM customer
"""

ORACLES["point_lookup"] = """
SELECT c_custkey, c_name, c_nationkey,
  round(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE -1.0 END, 2) AS c_acctbal,
  c_mktsegment
FROM customer
WHERE c_custkey <= 600 AND c_custkey % 5 = 2
"""

ORACLES["partial_lookup"] = """
SELECT c_custkey, c_name,
  round(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE -1.0 END, 2) AS c_acctbal
FROM customer WHERE c_custkey % 11 = 3
"""

ORACLES["nested_update"] = """
WITH kept AS (
  SELECT o_custkey, o_orderkey,
    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
         ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 7 <> 0
)
SELECT o_custkey AS custkey,
  (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1)::INT AS pos,
  o_orderkey AS okey, round(price, 2) AS price
FROM kept
"""

ORACLES["cdc_ingest"] = """
SELECT c_custkey, c_name,
  round(CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 100 ELSE c_acctbal END, 2)
    AS c_acctbal,
  c_mktsegment
FROM customer WHERE c_custkey % 9 <> 0
"""

ORACLES["rowkind_field"] = """
SELECT c_custkey, c_name,
  round(CASE WHEN c_custkey % 6 = 1 THEN c_acctbal + 250.0 ELSE c_acctbal END, 2)
    AS c_acctbal,
  CASE WHEN c_custkey % 6 = 1 THEN '+U' ELSE '+I' END AS op
FROM customer WHERE c_custkey % 6 <> 0
"""

ORACLES["deletion_vectors"] = """
SELECT c_custkey, c_name,
  round(CASE WHEN c_mktsegment = 'MACHINERY' THEN 777.0 ELSE c_acctbal END, 2)
    AS c_acctbal,
  c_mktsegment
FROM customer WHERE c_custkey >= 100
"""

ORACLES["dynamic_bucket"] = """
SELECT c_custkey, c_name, c_nationkey,
  round(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE -1.0 END, 2) AS c_acctbal,
  c_mktsegment
FROM customer
"""

ORACLES["cross_partition"] = """
SELECT c_custkey,
  CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
  c_name
FROM customer
"""

ORACLES["pk_latest_event"] = """
SELECT user_id, event_type, max(event_id) AS event_id,
       round(arg_max(value, event_id), 2) AS value
FROM events GROUP BY user_id, event_type
"""

ORACLES["pk_first_event"] = """
SELECT user_id, event_type, min(event_id) AS event_id,
       round(arg_min(value, event_id), 2) AS value
FROM events GROUP BY user_id, event_type
"""

ORACLES["partial_update"] = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
FROM orders
"""

ORACLES["agg_engine"] = """
SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty,
       round(max(l_extendedprice), 2) AS max_price,
       count(*)::BIGINT AS n_items
FROM lineitem GROUP BY l_orderkey
"""

ORACLES["orc_format"] = """
SELECT o_orderkey, o_orderstatus,
  round(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice ELSE -1.0 END, 2)
    AS o_totalprice
FROM orders
"""

ORACLES["avro_format"] = """
SELECT c_custkey, c_nationkey,
  round(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE -1.0 END, 2)
    AS c_acctbal
FROM customer
"""

ORACLES["hilbert_cluster"] = """
SELECT l_returnflag,
  count(*)::BIGINT AS cnt,
  sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
  min(l_orderkey) AS min_ok
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["time_travel"] = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey % 2 = 0
"""

ORACLES["incremental"] = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey % 2 = 1
"""

ORACLES["delete_update_compact"] = """
SELECT c_custkey, c_nationkey,
  round(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 1000.0
             ELSE c_acctbal END, 2) AS c_acctbal,
  c_mktsegment
FROM customer WHERE c_nationkey <> 7
"""

ORACLES["changelog_diff"] = """
SELECT '-D' AS _row_kind, c_custkey, round(c_acctbal, 2) AS c_acctbal
FROM customer WHERE c_nationkey = 7
UNION ALL
SELECT '-U', c_custkey, round(c_acctbal, 2)
FROM customer WHERE c_nationkey <> 7 AND c_mktsegment = 'BUILDING'
UNION ALL
SELECT '+U', c_custkey, round(c_acctbal + 1000.0, 2)
FROM customer WHERE c_nationkey <> 7 AND c_mktsegment = 'BUILDING'
"""

ORACLES["merge_multi_when"] = """
SELECT c_custkey, c_nationkey,
  round(CASE WHEN c_nationkey < 5 THEN 1.0 ELSE 2.0 END, 2) AS c_acctbal
FROM customer WHERE c_nationkey < 15
"""

ORACLES["lookup_changelog"] = """
SELECT '-U' AS _row_kind, c_custkey, round(c_acctbal, 2) AS c_acctbal
FROM customer WHERE c_custkey % 3 = 0
UNION ALL
SELECT '+U', c_custkey, round(c_acctbal + 100.0, 2)
FROM customer WHERE c_custkey % 3 = 0
"""

ORACLES["merge_into"] = """
SELECT c_custkey, c_name,
  round(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 500.0
             ELSE c_acctbal END, 2) AS c_acctbal
FROM customer
UNION ALL
SELECT c_custkey + 1000000, 'new', round(c_acctbal, 2)
FROM customer WHERE c_custkey % 5 = 1
"""

ORACLES["dynamic_overwrite"] = """
SELECT o_orderkey, o_orderstatus,
  round(CASE WHEN o_orderstatus = 'F' THEN 0.0 ELSE o_totalprice END, 2)
    AS o_totalprice
FROM orders
"""

ORACLES["partition_prune"] = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders WHERE o_orderstatus = 'O'
GROUP BY o_orderstatus
"""

# same shape through the executor-side manifest planner (the 'P'
# partition is untouched by the fixture's dynamic overwrite of 'F')
ORACLES["partition_prune_distributed"] = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders WHERE o_orderstatus = 'P'
GROUP BY o_orderstatus
"""

# $partitions rollup with mark_partition_done flags on O and P; the 'F'
# dynamic overwrite replaced that partition with the same row count
ORACLES["partition_done_marker"] = """
SELECT '{"o_orderstatus": "' || o_orderstatus || '"}' AS partition,
       count(*) AS record_count,
       o_orderstatus IN ('O', 'P') AS done
FROM orders GROUP BY o_orderstatus
"""

# the same rollup served by the DISTRIBUTED groupBy over the manifest
# parquet (threshold forced) — must hash-match the driver-path sibling
ORACLES["partitions_distributed"] = ORACLES["partition_done_marker"]

# the native SQL catalog serves the same merged PK state pk_upsert gates
ORACLES["sql_catalog_read"] = ORACLES["pk_upsert"]

# hive-partitioned zero-copy migrate: the pruned read of the migrated
# table (partition column reconstructed from the path by the reader)
# must equal the plain filtered source
ORACLES["migrate_partitioned"] = """
SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderstatus
FROM orders WHERE o_orderstatus = 'F'
"""

# CREATE OR REPLACE TABLE ... AS SELECT through StagingTableCatalog
# (gated r14): the table is REPLACED, so the second CTAS's projection
# and filter are what the read must serve
ORACLES["sql_ctas"] = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
       o_orderstatus
FROM orders WHERE o_orderstatus <> 'P'
"""

# row-level SQL through the native catalog (gated r14, VERDICT r13 #1):
# sql_delete_native replays customer_mut's DELETE + UPDATE via plain
# spark.sql against <cat>.fx names (SupportsDelete seam + the
# PaimonSqlExtensions rule), so it shares delete_update_compact's
# oracle; sql_merge_native replays customer_merge's MERGE INTO the same
# way, sharing merge_into's oracle.
ORACLES["sql_delete_native"] = ORACLES["delete_update_compact"]
ORACLES["sql_merge_native"] = ORACLES["merge_into"]
# native CALL <cat>.sys.compact through Spark 4's ProcedureCatalog
# (gated r15, VERDICT r14 #4): replays customer_mut's DML natively and
# compacts via plain-SQL CALL, so the post-compaction merged state
# shares delete_update_compact's oracle.
ORACLES["sql_call_compact"] = ORACLES["delete_update_compact"]

# generic session catalog (spark_catalog itself Paimon-aware, gated
# r14): warehouse PK table's MERGED state (pk_upsert's fold) joined to a
# plain non-Paimon relation in one prefix-less statement
ORACLES["generic_catalog_read"] = """
SELECT c.c_custkey, c.c_name,
  round(CASE WHEN c.c_custkey % 3 = 0 THEN c.c_acctbal ELSE -1.0 END, 2)
    AS c_acctbal,
  n.n_name
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
"""

# the fixture's two MERGE INTO jobs (USING temp views -> sink-only
# endpoints) at their commit snapshots: write = snap 1, merge = snap 2
ORACLES["lineage_rows"] = """
SELECT * FROM (VALUES
  ('sink', 'fx', 'customer_merge', CAST(2 AS BIGINT), 'merge_into'),
  ('sink', 'fx', 'customer_mwm',   CAST(2 AS BIGINT), 'merge_into'))
  AS t(direction, database_name, table_name, snapshot_id, job_name)
"""

ORACLES["schema_evolution"] = """
SELECT o_orderkey, round(o_totalprice, 2) AS price,
       NULL::VARCHAR AS o_orderpriority
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, round(o_totalprice, 2), o_orderpriority
FROM orders WHERE o_orderkey % 2 = 1
"""

# ---------------------------------------------------------- LLM operators
_w_text = _WORDS.format(t="text")

ORACLES["doc_stats"] = f"""
SELECT doc_id,
  len({_w_text})::INT AS n_tokens,
  length(text)::INT AS n_chars_actual,
  md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
  {_q(_stop_ratio(_w_text, _QUALITY_STOPWORDS))} AS stop_ratio,
  {_q(_punct_ratio('text'))} AS punct_ratio
FROM documents
"""

_mwl = (f"(CASE WHEN len({_w_text}) > 0 THEN "
        f"list_sum(list_transform({_w_text}, w -> length(w)))::DOUBLE / len({_w_text}) "
        f"ELSE 0.0 END)")

ORACLES["doc_quality"] = f"""
WITH q AS (
  SELECT doc_id,
    least(length(text)::DOUBLE / 400.0, 1.0) AS len_score,
    (CASE WHEN {_mwl} >= 3.0 AND {_mwl} <= 10.0 THEN 1.0 ELSE 0.5 END) AS mwl_score,
    (CASE WHEN {_stop_ratio(_w_text, _QUALITY_STOPWORDS)} >= 0.05
           AND {_stop_ratio(_w_text, _QUALITY_STOPWORDS)} <= 0.6
          THEN 1.0 ELSE 0.5 END) AS sw_score,
    greatest(0.0, 1.0 - ({_punct_ratio('text')} + {_digit_ratio('text')}) * 2) AS noise_score
  FROM documents
)
SELECT doc_id,
  {_q('len_score * 0.3 + mwl_score * 0.2 + sw_score * 0.25 + noise_score * 0.25')} AS quality
FROM q
"""

ORACLES["lang_id"] = f"""
WITH scored AS (
  SELECT list_transform({_w_text}, w -> lower(w)) AS lws FROM documents
), s2 AS (
  SELECT {_sc} FROM scored
)
SELECT (CASE WHEN {_best} > 0 THEN {_case} ELSE 'und' END) AS lang_pred,
       count(*) AS n
FROM s2 GROUP BY 1
"""

ORACLES["pack_sequences"] = """
WITH d AS (
  SELECT doc_id, (doc_id % 8)::INT AS shard,
    len(CASE WHEN length(trim(text)) = 0 THEN []
             ELSE string_split_regex(trim(text), '\\s+') END)::BIGINT AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
    COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM d
)
SELECT shard, floor(cb / 2048.0)::BIGINT AS pack_id, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS pack_tokens,
       min(doc_id) AS first_id, max(doc_id) AS last_id
FROM c GROUP BY 1, 2
"""

ORACLES["pii_redact"] = """
WITH p AS (
  SELECT doc_id,
    text || ' contact user' || doc_id::VARCHAR || '@example.com from 10.0.'
         || (doc_id % 256)::VARCHAR || '.7 acct '
         || (doc_id + 10000000)::VARCHAR AS t2
  FROM documents
), r AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(t2,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g'),
      '\\b\\d{7,}\\b', '[NUM]', 'g') AS red
  FROM p
)
SELECT doc_id, md5(red) AS red_fp,
       strpos(red, '[EMAIL]') > 0 AS has_email,
       strpos(red, '[IP]') > 0 AS has_ip,
       regexp_matches(red, '\\d{7,}') AS digit_leak
FROM r
"""

ORACLES["exact_dedup"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
)
SELECT md5(text) AS text_hash, count(*) AS dup_count, min(doc_id) AS keep_id
FROM corpus GROUP BY md5(text) HAVING count(*) > 1
"""

_EST = _q("len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i])) / 16.0")
ORACLES["minhash_pairs"] = _minhash_sql(16, 4, 3) + f"""
SELECT id_a, id_b, {_EST} AS est_jaccard
FROM pairs
WHERE {_EST} >= 0.7
"""

_HB = "(('0x' || substr(md5({k}::VARCHAR), 1, 8))::BIGINT % 1000000)"

ORACLES["corpus_stats"] = f"""
WITH tc AS (SELECT len({_w_text})::BIGINT AS t FROM documents)
SELECT count(*) AS doc_count,
  sum(t)::BIGINT AS total_tokens,
  round(avg(t), 4) AS mean_tokens,
  round(quantile_cont(t, 0.5), 4) AS p50_tokens,
  round(quantile_cont(t, 0.9), 4) AS p90_tokens,
  round(quantile_cont(t, 0.99), 4) AS p99_tokens
FROM tc
"""

ORACLES["kmv_distinct"] = f"""
WITH kmin AS (
  SELECT DISTINCT {_H32.format(x='text')}::DOUBLE / 4294967296.0 AS h
  FROM documents ORDER BY h LIMIT 64
)
SELECT CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
       ELSE round(63.0 / max(h), 2) END AS distinct_est,
       count(*) AS k_used
FROM kmin
"""

ORACLES["top_terms"] = f"""
WITH t AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
      list_transform({_w_text}, w -> lower(w)),
      w -> length(w) >= 3))) AS term
  FROM documents
)
SELECT term, count(*) AS doc_freq
FROM t GROUP BY term
ORDER BY doc_freq DESC, term ASC LIMIT 20
"""

ORACLES["hash_split"] = f"""
WITH s AS (
  SELECT doc_id,
    CASE WHEN {_HB.format(k='doc_id')} < 800000 THEN 'train'
         WHEN {_HB.format(k='doc_id')} < 900000 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM s GROUP BY split
"""

# matview_incremental: the view was maintained through insert / update
# (+7 on doc_id%10==0) / delete (doc_id%97==0) commits; the oracle is
# the from-scratch GROUP BY over that final state — incremental must
# equal recompute.
ORACLES["matview_incremental"] = f"""
WITH cur AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 7
              ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 97 <> 0
)
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars_sum,
       {_q('sum(n_chars)::DOUBLE / count(*)')} AS avg_chars
FROM cur GROUP BY source ORDER BY source
"""

# matview_filtered: final source state = updates applied (%7 triples,
# else %11 shrinks), %13 deleted; the filtered GROUP BY with min/max is
# what the hybrid-maintained view must equal.
ORACLES["matview_filtered"] = """
WITH cur AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN n_chars * 3
              WHEN doc_id % 11 = 0 THEN greatest(n_chars - 20, 1)
              ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 13 <> 0
)
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars_sum,
       min(n_chars)::BIGINT AS min_chars, max(n_chars)::BIGINT AS max_chars
FROM cur WHERE n_chars < 306
GROUP BY source ORDER BY source
"""

# matview_distinct: the maintained KMV sketch must equal a from-scratch
# sketch over the final state — k smallest distinct md5-derived hashes,
# exact count below k, (k-1)/(max/2^32) above, rounded 2 (the identical
# arithmetic of matview._kmv_estimate / text.kmv_distinct_estimate).
ORACLES["matview_distinct"] = f"""
WITH cur AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 7
              ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 97 <> 0
),
h AS (
  SELECT DISTINCT source, {_H32.format(x='n_chars::VARCHAR')} AS hh
  FROM cur
),
topk AS (
  SELECT source, hh,
         row_number() OVER (PARTITION BY source ORDER BY hh) AS rn
  FROM h
),
sk AS (
  SELECT source, count(*) AS n, max(hh) AS mx
  FROM topk WHERE rn <= 16 GROUP BY source
)
SELECT source,
       CASE WHEN n < 16 THEN n::DOUBLE
            ELSE round(15.0 / (mx::DOUBLE / 4294967296.0), 2) END AS n_vals
FROM sk ORDER BY source
"""

# temperature_mix: the whole plan (shares, epochs, fractional-copy
# threshold) is recomputed in SQL double math with the SAME expression
# shapes and an ORDERED window fold, so epochs match Spark bit-for-bit;
# membership of the fractional copy is the shared md5 hash-bucket.
ORACLES["temperature_mix"] = f"""
WITH dom AS (
  SELECT source, sum(n_chars)::DOUBLE AS t FROM documents GROUP BY source
),
plan AS (
  SELECT source,
    least(3.0, sum(t) OVER w * pow(t, 0.5) / sum(pow(t, 0.5)) OVER w / t)
      AS e
  FROM dom
  WINDOW w AS (ORDER BY source
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
cop AS (
  SELECT d.doc_id, d.source,
    floor(e)::BIGINT
    + CASE WHEN {_HB.format(k='d.doc_id')}
                < round((e - floor(e)) * 1000000)::BIGINT
           THEN 1 ELSE 0 END AS n
  FROM documents d JOIN plan USING (source)
),
ex AS (
  SELECT doc_id, source, unnest(range(n))::INT AS epoch
  FROM cop WHERE n > 0
)
SELECT source, epoch, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM ex GROUP BY source, epoch ORDER BY source, epoch
"""

# leakage_split: split decided by the duplicate group's min-id
# representative over the normalized-text fingerprint — every copy of a
# document lands on one side.
ORACLES["leakage_split"] = f"""
WITH rep AS (
  SELECT doc_id,
    min(doc_id) OVER (PARTITION BY
      md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS rep_id
  FROM documents
),
s AS (
  SELECT doc_id,
    CASE WHEN {_HB.format(k='rep_id')} < 800000 THEN 'train'
         WHEN {_HB.format(k='rep_id')} < 900000 THEN 'val'
         ELSE 'test' END AS split
  FROM rep
)
SELECT split, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM s GROUP BY split
"""

# source_cap: top-N per domain by n_chars, ties on the raw 32-bit md5
# prefix then doc_id — the identical total order the Spark window uses,
# so the kept SET matches for any salt.
ORACLES["source_cap"] = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY n_chars DESC,
                    {_H32.format(x="doc_id::VARCHAR")} ASC,
                    doc_id ASC) AS rn
  FROM documents
)
SELECT source, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum,
       sum(n_chars)::BIGINT AS chars_sum
FROM ranked WHERE rn <= 40 GROUP BY source
"""

ORACLES["stratified_sample"] = f"""
SELECT lang, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM documents
WHERE {_HB.format(k='doc_id')} <
      CASE WHEN lang = 'en' THEN 1000000 ELSE 300000 END
GROUP BY lang
"""

# connected components over the LSH pairs by transitive closure (recursive
# CTE is exact on oracle-scale graphs; the Spark side runs alternating-star)
ORACLES["dedup_clusters"] = _minhash_sql(16, 4, 3) + f"""
, edges0 AS (
  SELECT id_a AS a, id_b AS b FROM pairs WHERE {_EST} >= 0.7
), edges AS (
  SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
  ) SELECT * FROM r
), comp AS (
  SELECT src AS id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
)
SELECT c.id, c.cluster_id,
       count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
       c.id = c.cluster_id AS is_canonical
FROM comp c
"""

# incrementally maintained clusters (bootstrap half + crawl merge) must
# equal the from-scratch clustering of the full corpus: same banding on
# both halves and the cross pass ⇒ identical candidate pair set
ORACLES["clusters_incremental"] = ORACLES["dedup_clusters"]

# quality-aware survivor selection: same cluster CTEs, winner = argmax
# quality (ties -> min id) per cluster; quality arithmetic is the exact
# replay defined below (_QUALITY_EXPR), so the ordering keys agree
# byte-for-byte between engines. Defined after _QUALITY_EXPR exists.

_QUALITY_EXPR = _q(
    "least(length(text)::DOUBLE / 400.0, 1.0) * 0.3 + "
    f"(CASE WHEN {_mwl} >= 3.0 AND {_mwl} <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.2 + "
    f"(CASE WHEN {_stop_ratio(_w_text, _QUALITY_STOPWORDS)} >= 0.05 "
    f"AND {_stop_ratio(_w_text, _QUALITY_STOPWORDS)} <= 0.6 "
    f"THEN 1.0 ELSE 0.5 END) * 0.25 + "
    f"greatest(0.0, 1.0 - ({_punct_ratio('text')} + {_digit_ratio('text')}) * 2) * 0.25")

ORACLES["canonical_by_quality"] = _minhash_sql(16, 4, 3) + f"""
, edges0 AS (
  SELECT id_a AS a, id_b AS b FROM pairs WHERE {_EST} >= 0.7
), edges AS (
  SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
  ) SELECT * FROM r
), comp AS (
  SELECT src AS id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
), qual AS (
  SELECT doc_id AS id, {_QUALITY_EXPR} AS q FROM documents
)
SELECT c.id, c.cluster_id,
       count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
       row_number() OVER (PARTITION BY c.cluster_id
                          ORDER BY q DESC, c.id ASC) = 1 AS keep
FROM comp c JOIN qual USING (id)
"""

# full curation pipeline: gate -> exact dedup -> near-dup cluster removal ->
# split; the minhash WITH-prefix is re-rooted onto the deduped subset
_mh_ex = _minhash_sql(16, 4, 3, table="ex", id_col="doc_id",
                      text_col="text").replace("\nWITH w AS", "\n, w AS", 1)
ORACLES["corpus_pipeline"] = f"""
WITH filtered AS (
  SELECT doc_id, text, {_QUALITY_EXPR} AS q FROM documents
  WHERE lang = 'en' AND {_QUALITY_EXPR} >= 0.6 AND len({_w_text}) >= 10
), ex AS (
  SELECT min(doc_id) AS doc_id, text, min(q) AS q
  FROM filtered GROUP BY text
){_mh_ex}
, edges0 AS (
  SELECT id_a AS a, id_b AS b FROM pairs WHERE {_EST} >= 0.7
), edges AS (
  SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
  ) SELECT * FROM r
), losers AS (
  SELECT src AS id FROM reach GROUP BY src
  HAVING least(src, min(dst)) <> src
)
SELECT doc_id, q AS quality,
  CASE WHEN {_HB.format(k='doc_id')} < 800000 THEN 'train'
       WHEN {_HB.format(k='doc_id')} < 900000 THEN 'val'
       ELSE 'test' END AS split
FROM ex WHERE doc_id NOT IN (SELECT id FROM losers)
"""

# the engine-maintained two-crawl curation (survivor min-aggregation
# table + changelog-synced signature index + incremental clusters)
# must equal the one-shot pipeline over the union
ORACLES["curation_incremental"] = ORACLES["corpus_pipeline"]

_JAC = _q("CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) > 0 "
          "THEN len(list_filter(sh_a, x -> list_contains(sh_b, x)))::DOUBLE "
          "/ len(list_distinct(list_concat(sh_a, sh_b))) ELSE 0.0 END")
ORACLES["ngram_jaccard"] = _minhash_sql(16, 8, 3) + f"""
, withsh AS (
  SELECT p.id_a, p.id_b, a.shingles AS sh_a, b.shingles AS sh_b
  FROM pairs p
  JOIN sh a ON a.id = p.id_a
  JOIN sh b ON b.id = p.id_b
)
SELECT id_a, id_b, {_JAC} AS jaccard
FROM withsh
WHERE {_JAC} >= 0.5
"""

ORACLES["simhash"] = f"""
WITH h AS (
  SELECT doc_id,
    list_transform({_w_text}, x -> {_H32.format(x='x')}) AS hs
  FROM documents
)
SELECT doc_id,
  coalesce(list_sum(list_transform(range(0, 32), j ->
    CASE WHEN coalesce(list_sum(list_transform(hs,
           h -> CASE WHEN (h // (2 ** j)::BIGINT) % 2 = 1 THEN 1 ELSE -1 END)), 0) > 0
         THEN (2 ** j)::BIGINT ELSE 0 END)), 0)::BIGINT AS simhash
FROM h
"""

_QV_LIT = "[" + ", ".join(repr(float(x)) for x in QUERY_VEC) + "]"

ORACLES["cosine_topk"] = f"""
SELECT vec_id, {_q(_cosine_sql('embedding', QUERY_VEC))} AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id
LIMIT 10
"""

ORACLES["ivf_search"] = ORACLES["cosine_topk"]
ORACLES["ivf_table_search"] = ORACLES["cosine_topk"]


# quantized_topk: int8 symmetric quantization (floor(x/scale + 0.5),
# scale = max|v|/127) then cosine over the integer codes.
_QZ_CODES = ("list_transform(embedding, x -> CASE WHEN qs > 0 THEN "
             "floor(x::DOUBLE / qs + 0.5)::INT ELSE 0 END)")
ORACLES["quantized_topk"] = f"""
WITH qz AS (
  SELECT vec_id, {_QZ_CODES} AS codes FROM (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
             AS qs
    FROM embeddings)
)
SELECT vec_id, {_q(_cosine_sql('codes', QUERY_VEC))} AS cosine
FROM qz
ORDER BY cosine DESC, vec_id
LIMIT 10
"""

ORACLES["embedding_neardup"] = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  {_q(_pair_cosine_sql('a.embedding', 'b.embedding'))} AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_q(_pair_cosine_sql('a.embedding', 'b.embedding'))} >= 0.4
"""


def _lsh_bucket_sql(col: str, num_planes: int = 8, dim: int = 64) -> str:
    """Regenerate dedup.lsh_plane_weights' md5-seeded hyperplanes and fold
    sign bits MSB-first, mirroring embedding_near_dups' bucket expression
    (term order matches Spark's left fold so float sums agree bit-for-bit)."""
    from incubator_paimon_spark.operators.dedup import lsh_plane_weights
    parts = []
    for p in range(num_planes):
        w = lsh_plane_weights(p, dim)
        dot = " + ".join(f"{col}[{i + 1}]::DOUBLE * ({w[i]!r})"
                         for i in range(dim))
        parts.append(f"(CASE WHEN ({dot}) >= 0 "
                     f"THEN {1 << (num_planes - 1 - p)} ELSE 0 END)")
    return " + ".join(parts)


ORACLES["embedding_lsh"] = f"""
WITH e AS (SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  {_q(_pair_cosine_sql('a.embedding', 'b.embedding'))} AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_q(_pair_cosine_sql('a.embedding', 'b.embedding'))} >= 0.2
"""


# ------------------------------------------------------------- multimodal
ORACLES["media_meta"] = """
SELECT doc_id AS media_id,
  octet_length(text::BLOB) AS media_size,
  md5(text) AS media_md5
FROM documents
"""

# frame arithmetic mirror of multimodal.frame_sample(every=4, frame_size=256):
# chunk i of [0..floor(max(len-1,0)/256)], kept when i % 4 == 0;
# frame i length = clamp(len - i*256, 0, 256)
ORACLES["media_frames"] = """
WITH f AS (
  SELECT doc_id AS media_id,
    octet_length(text::BLOB) AS len,
    floor(greatest(octet_length(text::BLOB) - 1, 0) / 256.0)::BIGINT AS top
  FROM documents
)
SELECT media_id,
  len(list_filter(range(0, top + 1), i -> i % 4 = 0)) AS n_frames,
  list_sum(list_transform(list_filter(range(0, top + 1), i -> i % 4 = 0),
    i -> least(256, greatest(len - i * 256, 0))))::BIGINT AS frame_bytes
FROM f
"""

# _fake_feature mirror: f_i = int(md5(bytes || i as 2 BE bytes)[:4]) / 2^32,
# stored as float32 then quantized — ::FLOAT reproduces the precision loss
def _feature_sql(i):
    h = f"md5(text || ':{i}')"
    v = f"(('0x' || substr({h}, 1, 8))::BIGINT / 4294967296.0)"
    return _q(f"{v}::FLOAT::DOUBLE", 4)

ORACLES["media_features"] = f"""
SELECT doc_id AS media_id,
  {_feature_sql(0)} AS f0,
  {_feature_sql(1)} AS f1,
  {_feature_sql(2)} AS f2,
  {_feature_sql(3)} AS f3
FROM documents
"""

# media_real_decode mirror: the Spark side builds an 8x4 24bpp BMP whose
# 96 pixel bytes are the ASCII codes of substr(repeat(md5(text),3),1,96)
# in file order [B,G,R] per pixel, then REALLY decodes it
# (operators/media_codecs.decode_bmp) and emits per-channel means of the
# decoded array. The oracle replays the construction arithmetic: channel
# means over the 32 pixels are sums of known ASCII codes / 32 (a power of
# two, so float32 round-trips exactly). 1-based byte 3k+1=B, 3k+2=G, 3k+3=R.
def _bmp_chan_mean_sql(off):
    return (f"round(list_avg(list_transform(range(0, 32), "
            f"k -> ascii(substr(s, 3 * k + {off}, 1)))), 4)")

# media_wav_decode mirror: 32 8-bit mono PCM samples ARE the ASCII codes
# of md5(text); the decoder centers at 128. mean = (sum-32*128)/32 is exact
# (power-of-two divide over small ints); rms rounds to 4 decimals on both
# sides (numpy sqrt vs duckdb sqrt agree far beyond that).
ORACLES["media_wav_decode"] = """
WITH p AS (
  SELECT doc_id AS media_id, md5(text) AS s FROM documents
), v AS (
  SELECT media_id,
    list_transform(range(0, 32), k -> ascii(substr(s, k + 1, 1)) - 128) AS xs
  FROM p
)
SELECT media_id, 8000.0 AS rate, 32.0 AS frames,
  round(list_avg(xs)::FLOAT::DOUBLE, 4) AS mean_pcm,
  round(sqrt(list_avg(list_transform(xs, x -> x * x)))::FLOAT::DOUBLE, 4)
    AS rms_pcm
FROM v
"""

ORACLES["media_real_decode"] = f"""
WITH p AS (
  SELECT doc_id AS media_id, substr(repeat(md5(text), 3), 1, 96) AS s
  FROM documents
)
SELECT media_id, 8.0 AS width, 4.0 AS height,
  {_bmp_chan_mean_sql(3)} AS mean_r,
  {_bmp_chan_mean_sql(2)} AS mean_g,
  {_bmp_chan_mean_sql(1)} AS mean_b
FROM p
"""

# media_png_decode mirror: the same 96 md5-derived bytes are the pixels
# of a REAL zlib-compressed 8x4 RGB PNG (filter types 0/1/2/4 across the
# rows), decoded by media_codecs.decode_png — PNG stores RGB in order,
# so 1-based byte 3k+1=R, 3k+2=G, 3k+3=B (the BMP mirror's reverse)
ORACLES["media_png_decode"] = f"""
WITH p AS (
  SELECT doc_id AS media_id, substr(repeat(md5(text), 3), 1, 96) AS s
  FROM documents
)
SELECT media_id, 8.0 AS width, 4.0 AS height,
  {_bmp_chan_mean_sql(1)} AS mean_r,
  {_bmp_chan_mean_sql(2)} AS mean_g,
  {_bmp_chan_mean_sql(3)} AS mean_b
FROM p
"""


# ------------------------------------------------- r5 pipeline operators

# asof_join: DuckDB has a NATIVE ASOF JOIN — the one-line spec our
# union+window Spark plan must reproduce. Right side deduped to one row
# per (user, ts) first (max value) so timestamp ties are deterministic.
ORACLES["asof_join"] = """
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, max(value) AS rv FROM events
  WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
       round(l.value, 4) AS purchase_value,
       round(rv, 4) AS last_click_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""

# contamination: 5-gram hashes per doc; eval set = doc_id % 20 == 0.
_C_N = 5
_C_SH = (f"list_distinct(list_transform("
         f"range(1, greatest(len(ws) - {_C_N} + 1, 1) + 1), "
         f"i -> array_to_string(ws[i:i+{_C_N - 1}], ' ')))")
ORACLES["contamination"] = f"""
WITH w AS (
  SELECT doc_id AS id, {_WORDS.format(t='text')} AS ws FROM documents
), h AS (
  SELECT id, list_transform({_C_SH}, s -> {_H32.format(x='s')}) AS hs
  FROM w
), x AS (
  SELECT id, unnest(hs) AS hv FROM h
), ev AS (
  SELECT DISTINCT hv AS eh FROM x WHERE id % 20 = 0
), agg AS (
  SELECT x.id, count(*) AS total_ngrams, count(ev.eh) AS hit_ngrams
  FROM x LEFT JOIN ev ON x.hv = ev.eh
  GROUP BY x.id
)
SELECT id, total_ngrams, hit_ngrams,
  {_q("hit_ngrams / total_ngrams")} AS contamination
FROM agg
"""

# boilerplate_removal: 10-word segments, drop those in >1 distinct doc,
# reassemble in order.
ORACLES["boilerplate_removal"] = f"""
WITH w AS (
  SELECT doc_id AS id, {_WORDS.format(t='text')} AS ws FROM documents
), seg0 AS (
  SELECT id, i AS pos, array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS seg
  FROM w, UNNEST(range(0, greatest(ceil(len(ws)/10.0)::BIGINT, 1))) AS t(i)
), seg AS (
  SELECT * FROM seg0 WHERE seg <> ''
), freq AS (
  SELECT md5(seg) AS sh, count(DISTINCT id) AS df FROM seg GROUP BY 1
), j AS (
  SELECT s.id, s.pos, s.seg, f.df <= 1 AS keep
  FROM seg s JOIN freq f ON md5(s.seg) = f.sh
), reb AS (
  SELECT id,
    COALESCE(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE keep), '')
      AS clean_text,
    count(*) FILTER (WHERE keep) AS kept_segments,
    count(*) FILTER (WHERE NOT keep) AS removed_segments
  FROM j GROUP BY id
)
SELECT d.doc_id AS id, COALESCE(r.clean_text, '') AS clean_text,
       COALESCE(r.kept_segments, 0)::BIGINT AS kept_segments,
       COALESCE(r.removed_segments, 0)::BIGINT AS removed_segments
FROM documents d LEFT JOIN reb r ON r.id = d.doc_id
"""

# the maintained segment-DF table covers exactly the scored corpus in
# the gated-rotation entry, so indexed output == from-scratch output
ORACLES["boilerplate_indexed"] = ORACLES["boilerplate_removal"]

# quality_model: fastText-shape linear scorer over hashed unigram+bigram
# features (512 buckets); the entry's weights are the deterministic
# w[b] = ((b*2654435761) % 1000)/1000 - 0.5 formula, replayed here
ORACLES["quality_model"] = f"""
WITH w AS (
  SELECT doc_id AS id,
         list_transform({{}}, x -> lower(x)) AS ws
  FROM documents
),
f AS (
  SELECT id, {{}} % 512 AS bucket FROM (
    SELECT id, unnest(ws || CASE WHEN len(ws) > 1
      THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
      ELSE []::VARCHAR[] END) AS f
    FROM w)
)
SELECT id,
       floor((0.1 + sum(((bucket * 2654435761) % 1000) / 1000.0 - 0.5))
             * 10000.0 + 0.5) / 10000.0 AS score
FROM f GROUP BY id
""".format(_WORDS.format(t='text'), _H32.format(x='f'))


# span_dedup: overlapping 10-word windows; a window's text in >= 2
# distinct docs marks its word positions; docs rebuilt from uncovered
# words. Same h32/word conventions as the Spark side.
_SD_N = 10
ORACLES["span_dedup"] = f"""
WITH w AS (
  SELECT doc_id AS id, {_WORDS.format(t='text')} AS ws FROM documents
), sh AS (
  SELECT id, i - 1 AS pos,
         {_H32.format(x="array_to_string(ws[i:i+" + str(_SD_N - 1) + "], ' ')")} AS h
  FROM w, UNNEST(range(1, greatest(len(ws) - {_SD_N} + 1, 0) + 1)) AS t(i)
), dup AS (
  SELECT h FROM sh GROUP BY h HAVING count(DISTINCT id) >= 2
), starts AS (
  SELECT sh.id, sh.pos FROM sh JOIN dup USING (h)
), covered AS (
  SELECT DISTINCT id, pos + k AS wi
  FROM starts, UNNEST(range(0, {_SD_N})) AS r(k)
), wordrows AS (
  SELECT id, ws[i] AS word, i - 1 AS wi
  FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i)
), kept AS (
  SELECT wr.id, wr.word, wr.wi FROM wordrows wr
  LEFT JOIN covered c ON wr.id = c.id AND wr.wi = c.wi
  WHERE c.wi IS NULL
), reb AS (
  SELECT id, string_agg(word, ' ' ORDER BY wi) AS clean_text,
         count(*) AS kept_words
  FROM kept GROUP BY id
)
SELECT w.id, COALESCE(r.clean_text, '') AS clean_text,
       len(w.ws)::BIGINT AS total_words,
       (len(w.ws) - COALESCE(r.kept_words, 0))::BIGINT AS removed_words
FROM w LEFT JOIN reb r ON r.id = w.id
"""




# gopher_filter: published Gopher/C4 rules as SQL over the same word
# split; list_distinct before intersect mirrors Spark's array_intersect
# distinct semantics.
_GF_WS = _WORDS.format(t='text')
_GF_SW = "[" + ", ".join(f"'{w}'" for w in _QUALITY_STOPWORDS) + "]"
ORACLES["gopher_filter"] = f"""
WITH g AS (
  SELECT doc_id AS id, text, {_GF_WS} AS ws FROM documents
), m AS (
  SELECT id, text, len(ws)::BIGINT AS n_words,
    CASE WHEN len(ws) > 0 THEN
      list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)
      ELSE 0.0 END AS mwl,
    CASE WHEN length(text) > 0 THEN
      (length(text) - length(regexp_replace(text, '[#…]', '', 'g')))::DOUBLE
        / length(text) ELSE 0.0 END AS symr,
    len(list_intersect(list_distinct(list_transform(ws, w -> lower(w))),
                       {_GF_SW}))::BIGINT AS hits,
    regexp_matches(text, '[.!?"'']\\s*$') AS terminal
  FROM g
)
SELECT id, n_words, {_q('mwl')} AS mean_word_len,
       {_q('symr')} AS symbol_ratio, hits AS stopword_hits,
       terminal AS ends_terminal,
       (n_words >= 10 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        AND symr <= 0.1 AND hits >= 2 AND terminal) AS keep
FROM m
"""

# char_entropy: -sum(p log2 p) over per-doc char frequencies.
ORACLES["char_entropy"] = f"""
WITH ch AS (
  SELECT doc_id, unnest(string_split_regex(text, '')) AS c
  FROM documents WHERE length(text) > 0
), f AS (
  SELECT doc_id, c, count(*)::DOUBLE AS cnt FROM ch GROUP BY 1, 2
), n AS (
  SELECT doc_id, length(text)::DOUBLE AS n FROM documents
)
SELECT d.doc_id AS id,
  COALESCE({_q('sum(-(cnt / n.n) * log2(cnt / n.n))')}, 0.0) AS entropy
FROM documents d
JOIN n ON n.doc_id = d.doc_id
LEFT JOIN f ON f.doc_id = d.doc_id
GROUP BY d.doc_id, n.n
"""


# kmeans: two unrolled Lloyd iterations. Assignment = row_number over
# (cosine DESC, cid DESC) — the same (sim, cid) struct-max order the
# Spark assign uses; refinement = per-position avg cast to FLOAT (the
# same float32 rounding Spark's .cast("float") applies); empty clusters
# keep the previous centroid via the COALESCE join.
def _km_assign(cents: str, out: str) -> str:
    cos = _pair_cosine_sql('e.embedding', 'c.cv')
    return f"""{out} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {cos} DESC, c.cid DESC) AS rn
    FROM e, {cents} c)
  WHERE rn = 1
)"""


def _km_refine(assign: str, prev: str, out: str) -> str:
    return f"""{out}_m AS (
  SELECT a.cid, t.i AS pos, avg(e.embedding[t.i]::DOUBLE)::FLOAT AS m
  FROM {assign} a JOIN e USING (vec_id), UNNEST(range(1, 65)) t(i)
  GROUP BY a.cid, t.i
), {out}_l AS (
  SELECT cid, list(m ORDER BY pos) AS cv FROM {out}_m GROUP BY cid
), {out} AS (
  SELECT p.cid, COALESCE(l.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN {out}_l l USING (cid)
)"""


_KM_FINAL_COS = _pair_cosine_sql('e.embedding', 'c.cv')
ORACLES["kmeans"] = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
s0 AS (
  SELECT vec_id AS cid, embedding AS cv FROM e
  ORDER BY md5(vec_id::VARCHAR) LIMIT 4
),
{_km_assign('s0', 'a0')},
{_km_refine('a0', 's0', 'c1')},
{_km_assign('c1', 'a1')},
{_km_refine('a1', 'c1', 'c2')},
{_km_assign('c2', 'a2')}
SELECT a2.cid AS centroid_id, count(*) AS n_members,
       {_q(f'avg({_KM_FINAL_COS})')} AS mean_cos
FROM a2 JOIN e USING (vec_id) JOIN c2 c ON a2.cid = c.cid
GROUP BY a2.cid
"""

# crosscorpus_neardup: banded signatures over all docs, split new
# (id % 10 = 0) vs base, join on (band, bh) across the split.
_CC_EST = _q("len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i])) / 16.0")
ORACLES["crosscorpus_neardup"] = _minhash_sql(16, 4, 3) + f"""
, nb AS (SELECT * FROM banded WHERE id % 10 = 0)
, bb AS (SELECT * FROM banded WHERE id % 10 <> 0)
, cpairs AS (
  SELECT DISTINCT nb.id AS new_id, bb.id AS base_id,
         nb.sig AS sig_a, bb.sig AS sig_b
  FROM nb JOIN bb ON nb.band = bb.band AND nb.bh = bb.bh
)
SELECT new_id, base_id, {_CC_EST} AS est_jaccard
FROM cpairs WHERE {_CC_EST} >= 0.5
"""

# stream_neardup: streaming band-bucket claims replayed as SQL — with
# batches ordered (doc_id % 2, doc_id), the first claimant of every
# (band, bh) bucket is min of that key; a doc is kept iff it IS the
# first claimant in all of its bands.
# crosscorpus_indexed: the index-backed query must return the exact
# pairs the from-scratch signature pass returns — shared oracle.
ORACLES["crosscorpus_indexed"] = ORACLES["crosscorpus_neardup"]

ORACLES["stream_neardup"] = _minhash_sql(16, 4, 3) + """
, keymap AS (
  SELECT id, band, bh, (id % 2) * 4294967296 + id AS k FROM banded
), firsts AS (
  SELECT band, bh, min(k) AS k0 FROM keymap GROUP BY band, bh
)
SELECT id AS doc_id FROM (
  SELECT km.id, min(CASE WHEN km.k = f.k0 THEN 1 ELSE 0 END) AS all_first
  FROM keymap km JOIN firsts f ON km.band = f.band AND km.bh = f.bh
  GROUP BY km.id
) WHERE all_first = 1
"""

# mixture_sample: rates derived from counts — C = min(n/pi); slot cutoff =
# trunc(C*pi/n*1e6); the arithmetic is the same IEEE double sequence the
# Python driver computes, so the cutoffs agree bit-for-bit.
ORACLES["mixture_sample"] = f"""
WITH pi AS (
  SELECT * FROM (VALUES ('src0', 0.5::DOUBLE), ('src1', 0.3::DOUBLE),
                        ('src2', 0.2::DOUBLE)) t(d, pi)
), cnt AS (
  SELECT source AS d, count(*) AS n FROM documents
  WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1
), c AS (
  SELECT min(n / pi) AS c FROM cnt JOIN pi USING (d)
), slots AS (
  SELECT d, floor((SELECT c FROM c) * pi / n * 1000000)::BIGINT AS s
  FROM cnt JOIN pi USING (d)
)
SELECT doc_id, source FROM documents JOIN slots ON source = d
WHERE {_HB.format(k='doc_id')} < s
"""


# repetition: within-doc dup-word / dup-2-gram / top-2-gram fractions.
# Spark counts gram frequencies on xxhash64 of the gram; the oracle counts
# the gram STRINGS — identical stats barring a 64-bit collision.
ORACLES["repetition"] = f"""
WITH w AS (
  SELECT doc_id AS id, {_WORDS.format(t='text')} AS ws FROM documents
), base AS (
  SELECT id, len(ws)::INT AS n_words,
    len(list_distinct(ws))::INT AS n_distinct_words,
    CASE WHEN len(ws) >= 2 THEN
      list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
                     i -> array_to_string(ws[i:i+1], ' '))
    ELSE [] END AS grams
  FROM w
), ex AS (
  SELECT id, unnest(grams) AS g FROM base
), pg AS (
  SELECT id, g, count(*) AS c FROM ex GROUP BY 1, 2
), pd AS (
  SELECT id, sum(c) AS n_grams, count(*) AS n_distinct_grams,
         max(c) AS top FROM pg GROUP BY 1
)
SELECT b.id, b.n_words,
  {_q("CASE WHEN b.n_words > 0 THEN (b.n_words - b.n_distinct_words)"
      " / b.n_words ELSE 0.0 END")} AS dup_word_frac,
  {_q("CASE WHEN COALESCE(pd.n_grams, 0) > 0 THEN"
      " (pd.n_grams - pd.n_distinct_grams) / pd.n_grams"
      " ELSE 0.0 END")} AS dup_gram_frac,
  {_q("CASE WHEN COALESCE(pd.n_grams, 0) > 0 THEN"
      " pd.top / pd.n_grams ELSE 0.0 END")} AS top_gram_frac
FROM base b LEFT JOIN pd ON pd.id = b.id
"""


# doc_chunks: overlapping 40-word windows, stride 32, 0-based chunk ids;
# every document yields >= 1 chunk (empty docs one empty chunk).
ORACLES["doc_chunks"] = f"""
WITH w AS (
  SELECT doc_id AS id, {_WORDS.format(t='text')} AS ws FROM documents
), n AS (
  SELECT id, ws,
    greatest(ceil((len(ws) - 8) / 32.0)::INT, 1) AS n_chunks
  FROM w
)
SELECT id, k::INT AS chunk_id,
  array_to_string(ws[(k*32+1):(k*32+40)], ' ') AS chunk_text,
  len(ws[(k*32+1):(k*32+40)])::INT AS chunk_words
FROM n, UNNEST(range(0, n_chunks)) AS t(k)
"""


# semdedup: iters=0 SemDeDup — seed centroids (md5-ordered ids), argmax-
# cosine assignment (same (cosine, cid DESC) tie order as assign_ivf),
# then inside each cluster a vector is a duplicate iff some SMALLER id
# in the cluster has quantized cosine >= 0.4 to it.
ORACLES["semdedup"] = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
s0 AS (
  SELECT vec_id AS cid, embedding AS cv FROM e
  ORDER BY md5(vec_id::VARCHAR) LIMIT 4
),
{_km_assign('s0', 'a0')},
dup AS (
  SELECT DISTINCT bb.vec_id AS id
  FROM a0 aa JOIN a0 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
  JOIN e ea ON ea.vec_id = aa.vec_id
  JOIN e eb ON eb.vec_id = bb.vec_id
  WHERE {_q(_pair_cosine_sql('ea.embedding', 'eb.embedding'))} >= 0.4
)
SELECT e.vec_id, a0.cid AS centroid_id, (dup.id IS NULL) AS keep
FROM e JOIN a0 USING (vec_id) LEFT JOIN dup ON dup.id = e.vec_id
"""

# index-backed semdedup reads the SAME iters=0 assignment from the
# maintained IVF table — results must be row-identical to from-scratch
ORACLES["semdedup_indexed"] = ORACLES["semdedup"]


# bm25: Lucene-variant BM25 for query terms (merge, vector, stream),
# k1=1.2 b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)); zero-score
# docs dropped; ties by id.
def _bm25_term_sql(term: str) -> str:
    tf = f"len(list_filter(ws, x -> x = '{term}'))::DOUBLE"
    df_ = f"(SELECT sum(list_contains(ws, '{term}')::INT) FROM w)"
    idf = f"ln(1.0 + ((SELECT n FROM stats) - {df_} + 0.5) / ({df_} + 0.5))"
    return (f"({idf} * {tf} * 2.2 / ({tf} + 1.2 * (0.25 + 0.75 * "
            f"len(ws)::DOUBLE / (SELECT avgdl FROM stats))))")


ORACLES["bm25"] = f"""
WITH w AS (
  SELECT doc_id AS id,
         list_transform({_WORDS.format(t='text')}, x -> lower(x)) AS ws
  FROM documents
),
stats AS (SELECT count(*) AS n, avg(len(ws))::DOUBLE AS avgdl FROM w)
SELECT id, score FROM (
  SELECT id, {_q(' + '.join(_bm25_term_sql(t) for t in ('merge', 'vector', 'stream')))} AS score
  FROM w)
WHERE score > 0
ORDER BY score DESC, id LIMIT 20
"""

# dsir / dsir_sample: hashed unigram+bigram features (h32 % 8192),
# Laplace-smoothed target/raw log-ratio per bucket, summed per doc;
# the sample adds deterministic per-id Gumbel noise and takes top-50.
_DSIR_CORE = f"""
WITH w AS (
  SELECT doc_id AS id,
         list_transform({_WORDS.format(t='text')}, x -> lower(x)) AS ws
  FROM documents
),
f AS (
  SELECT id, {_H32.format(x='f')} % 8192 AS bucket FROM (
    SELECT id, unnest(ws || CASE WHEN len(ws) > 1
      THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
      ELSE []::VARCHAR[] END) AS f
    FROM w)
),
tf AS (SELECT * FROM f WHERE id % 20 = 0),
qc AS (SELECT bucket, count(*) AS qn FROM f GROUP BY 1),
pc AS (SELECT bucket, count(*) AS pn FROM tf GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM f) AS qtot,
               (SELECT count(*) FROM tf) AS ptot),
lw AS (
  SELECT COALESCE(qc.bucket, pc.bucket) AS bucket,
         ln((COALESCE(pn, 0) + 1.0) / (ptot + 8192))
         - ln((COALESCE(qn, 0) + 1.0) / (qtot + 8192)) AS lw
  FROM qc FULL JOIN pc ON qc.bucket = pc.bucket, tot
),
dw AS (
  SELECT f.id, {_q('sum(lw)')} AS log_weight
  FROM f JOIN lw USING (bucket) GROUP BY f.id
)
"""

ORACLES["dsir"] = _DSIR_CORE + "SELECT id, log_weight FROM dw"

# dsir_incremental: weights computed from the aggregation-merge-engine
# count tables (two-commit ingest) must hash-match a from-scratch
# recompute — so the oracle IS the dsir oracle.
ORACLES["dsir_incremental"] = ORACLES["dsir"]


ORACLES["dsir_sample"] = _DSIR_CORE + f"""
SELECT id, log_weight,
  {_q("log_weight + (-ln(-ln((" + _H32.format(x='id::VARCHAR') + " + 0.5) / 4294967296.0)))")} AS key
FROM dw
ORDER BY key DESC, id LIMIT 50
"""


# line_stats: CCNet/C4/RedPajama/FineWeb line-shape signals; split on
# \n always yields >= 1 element so the n>0 guards collapse.
_LS_Q = "len(lines)"
_LS_TERM = "len(list_filter(lines, x -> regexp_matches(x, '[.!?\"'']\\s*$')))::DOUBLE / " + _LS_Q
_LS_SHORT = "len(list_filter(lines, x -> length(trim(x)) < 10))::DOUBLE / " + _LS_Q
_LS_BULLET = ("len(list_filter(lines, x -> regexp_matches(trim(x), "
              "'^([-*\u2022]|[0-9]+[.)])\\s')))::DOUBLE / " + _LS_Q)
_LS_MEAN = "list_sum(list_transform(lines, x -> length(x)))::DOUBLE / " + _LS_Q
_LS_DUP = "(len(lines) - len(list_distinct(lines)))::DOUBLE / " + _LS_Q
ORACLES["line_stats"] = f"""
WITH l AS (
  SELECT doc_id AS id, string_split(text, chr(10)) AS lines FROM documents
)
SELECT id,
  len(lines)::INT AS n_lines,
  {_q(_LS_DUP)} AS dup_line_frac,
  {_q(_LS_TERM)} AS frac_lines_end_terminal,
  {_q(_LS_SHORT)} AS frac_short_lines,
  {_q(_LS_BULLET)} AS frac_bullet_lines,
  {_q(_LS_MEAN)} AS mean_line_len
FROM l
"""


# hybrid_search: RRF fusion (k=60) of the bm25 top-20 (quantized score,
# ties by id) and the exact-cosine top-20; ranks are row_number over
# each truncated list's own ordering; missing-from-a-list contributes 0.
ORACLES["hybrid_search"] = f"""
WITH w AS (
  SELECT doc_id AS id,
         list_transform({_WORDS.format(t='text')}, x -> lower(x)) AS ws
  FROM documents
),
stats AS (SELECT count(*) AS n, avg(len(ws))::DOUBLE AS avgdl FROM w),
lex AS (
  SELECT id, score, row_number() OVER (ORDER BY score DESC, id) AS rank_0
  FROM (
    SELECT id, {_q(' + '.join(_bm25_term_sql(t) for t in ('merge', 'vector', 'stream')))} AS score
    FROM w)
  WHERE score > 0
  ORDER BY score DESC, id LIMIT 20
),
sem AS (
  SELECT id, cosine, row_number() OVER (ORDER BY cosine DESC, id) AS rank_1
  FROM (SELECT vec_id AS id, {_q(_cosine_sql('embedding', QUERY_VEC))} AS cosine
        FROM embeddings)
  ORDER BY cosine DESC, id LIMIT 20
)
SELECT COALESCE(lex.id, sem.id) AS id,
       {_q("COALESCE(1.0 / (60 + rank_0), 0) + COALESCE(1.0 / (60 + rank_1), 0)", 6)} AS rrf_score,
       rank_0, rank_1
FROM lex FULL JOIN sem ON lex.id = sem.id
ORDER BY rrf_score DESC, id LIMIT 10
"""

# bm25_indexed: the postings-index search must return the exact top-k
# the full-corpus scorer returns (docs scoring 0 have no posting for
# any query term) — shared oracle.
ORACLES["bm25_indexed"] = ORACLES["bm25"]

# hybrid_indexed: both rankers index-backed at exact-parity settings
# (nprobe=all) must fuse to the identical ranking — shared oracle.
ORACLES["hybrid_indexed"] = ORACLES["hybrid_search"]

# ivf_synced_search: a changelog-synced updatable IVF table searched at
# nprobe=all is exact — shared oracle with cosine_topk.
ORACLES["ivf_synced_search"] = ORACLES["cosine_topk"]

# ivf_quantized_search: quantized-IVF table at nprobe=all == cosine over
# the int8 codes of the whole corpus — shared oracle.
ORACLES["ivf_quantized_search"] = ORACLES["quantized_topk"]

# matview_nulls (r10): update commit NULLed n_chars on doc_id%3==0,
# %97 deleted; COUNT(*) vs COUNT(col) vs AVG NULL-skipping under
# incremental maintenance must equal the SQL semantics exactly.
ORACLES["matview_nulls"] = f"""
WITH cur AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 3 = 0 THEN NULL
              ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 97 <> 0
)
SELECT source, count(*) AS n_rows, count(n_chars) AS n_vals,
       sum(n_chars)::BIGINT AS chars_sum,
       {_q('sum(n_chars)::DOUBLE / count(n_chars)')} AS avg_chars
FROM cur GROUP BY source ORDER BY source
"""

# matview_append (r10): no-PK append source, second commit re-appends
# doc_id%4==0 as true duplicate rows — the view over UNION ALL.
ORACLES["matview_append"] = """
WITH cur AS (
  SELECT source, n_chars FROM documents
  UNION ALL
  SELECT source, n_chars FROM documents WHERE doc_id % 4 = 0
)
SELECT source, count(*) AS n_rows, sum(n_chars)::BIGINT AS chars_sum,
       min(n_chars)::BIGINT AS lo, max(n_chars)::BIGINT AS hi
FROM cur GROUP BY source ORDER BY source
"""

# bucketed_append (r10): bucket-key routed append table; the engine-side
# read bucket-prunes on the IN filter, semantics are a plain filter.
ORACLES["bucketed_append"] = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_custkey IN (7, 70, 700)
"""

# tag_partitioned (r10): tag-to-partition view — partition 2023-10-16 is
# the sentinel-balance state at tag 1, 2023-10-17 the post-upsert state.
ORACLES["tag_partitioned"] = """
SELECT c_custkey, '2023-10-16' AS dt, -1.0 AS c_acctbal FROM customer
UNION ALL
SELECT c_custkey, '2023-10-17' AS dt,
  round(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE -1.0 END, 2)
    AS c_acctbal
FROM customer
"""

# rescale_bucket (r10): F partition overwritten at the new bucket count
# with +10000 prices (an integer shift keeps the 2-decimal tail — no
# round-tie digits), then an upsert of o_orderkey%10==0 into the new
# layout; other partitions keep the old layout. Merge-on-read semantics
# are layout-independent, so the oracle is plain last-write-wins.
ORACLES["rescale_bucket"] = """
SELECT o_orderkey, o_orderstatus, o_custkey,
  round(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0 THEN 1.0
             WHEN o_orderstatus = 'F' THEN o_totalprice + 10000.0
             ELSE o_totalprice END, 2) AS o_totalprice
FROM orders
"""

# SQL INSERT INTO the native catalog's PK table (r13): the two INSERTs
# replicate customer_pk's construction, so the merged state is the same
ORACLES["sql_insert_pk"] = ORACLES["pk_upsert"]
