"""Oracle family block 02: streaming surface + dedup/LSH ladder.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    T = ns.T
    W = ns.W
    X5_ORACLE = ns.X5_ORACLE
    _e2e_pipeline_oracle = ns._e2e_pipeline_oracle
    _qv1_oracle = ns._qv1_oracle
    _x10_oracle = ns._x10_oracle
    _x5b_oracle = ns._x5b_oracle
    _x5c_oracle = ns._x5c_oracle
    e2e_weather_pipeline = ns.e2e_weather_pipeline
    qv1_quality_verdict = ns.qv1_quality_verdict
    set1_anti_join = ns.set1_anti_join
    set2_intersect = ns.set2_intersect
    set3_semi_join = ns.set3_semi_join
    sql1_quality_sql = ns.sql1_quality_sql
    st1_windowed_counts = ns.st1_windowed_counts
    st2_stream_dedup = ns.st2_stream_dedup
    st9_sliding_windows = ns.st9_sliding_windows
    u1_union_agg = ns.u1_union_agg
    w1_topk_per_group = ns.w1_topk_per_group
    w2_running_total = ns.w2_running_total
    w3_lag_delta = ns.w3_lag_delta
    x10_embedding_dup_pairs = ns.x10_embedding_dup_pairs
    x11_train_split = ns.x11_train_split
    x1_dedup_exact = ns.x1_dedup_exact
    x3_ngram_jaccard_pairs = ns.x3_ngram_jaccard_pairs
    x5_cosine_topk = ns.x5_cosine_topk
    x5b_cosine_topk_lsh = ns.x5b_cosine_topk_lsh
    x5c_lsh_recall = ns.x5c_lsh_recall
    x6_lang_id = ns.x6_lang_id
    x6b_lang_id_ngram = ns.x6b_lang_id_ngram
    x7_quality_score = ns.x7_quality_score
    x8_token_stats = ns.x8_token_stats
    x9_fingerprint = ns.x9_fingerprint
    x9b_rolling_hash = ns.x9b_rolling_hash
    jacc_toks = (
        "list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), "
        "'\\s+', ' ', 'g')), ' '), t -> t <> '')"
    )

    d.update({
        "sql1_quality_sql": """
SELECT count(DISTINCT l_suppkey) AS unique_suppliers,
       CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_flags,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty,
       count(*) AS total_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
""",
        "w1_topk_per_group": """
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders) WHERE rank <= 3
""",
        "w2_running_total": f"""
SELECT o_custkey, o_orderkey,
       {W.round_half_up_sql(
           "sum(o_totalprice) OVER (PARTITION BY o_custkey "
           "ORDER BY o_orderdate ASC, o_orderkey ASC "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running_total
FROM orders
""",
        "w3_lag_delta": f"""
SELECT o_custkey, o_orderkey,
       {W.round_half_up_sql(
           "o_totalprice - lag(o_totalprice, 1) OVER "
           "(PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)", 2)}
           AS price_delta,
       CAST(date_diff('day',
            lag(CAST(o_orderdate AS DATE), 1) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
            CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
FROM orders
""",
        "set1_anti_join": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
        "set2_intersect": """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
""",
        "set3_semi_join": """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s.s_suppkey
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
""",
        "u1_union_agg": """
WITH u AS (
  SELECT * FROM orders WHERE o_totalprice > 50000
  UNION ALL
  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS sum_total
FROM u GROUP BY o_orderstatus
""",
        "x1_dedup_exact": f"""
SELECT {T.fingerprint_md5_sql('text')} AS fp, count(*) AS n_dups,
       min(doc_id) AS keeper
FROM documents GROUP BY 1
""",
        "x3_ngram_jaccard_pairs": f"""
WITH toks AS (
  SELECT doc_id, {jacc_toks} AS l FROM documents
), sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
         ELSE list_transform(range(1, len(l) - 1), i -> array_to_string(l[i:i+2], ' '))
    END)) AS sh
  FROM toks
), hot AS (
  SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 50
), sh AS (
  SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), 6) >= 0.4
""",
        "x5_cosine_topk": X5_ORACLE,
        "x5b_cosine_topk_lsh": _x5b_oracle(),
        "x5c_lsh_recall": _x5c_oracle(),
        "x10_embedding_dup_pairs": _x10_oracle(),
        "e2e_weather_pipeline": _e2e_pipeline_oracle(),
        "qv1_quality_verdict": _qv1_oracle(),
        "x9b_rolling_hash": """
SELECT doc_id, list_reduce(
  [0::BIGINT] || list_transform(
    regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ''),
    c -> ascii(c)::BIGINT),
  (acc, x) -> (acc * 257 + x) % 1000000007) AS rhash
FROM documents
""",
        "x6_lang_id": f"""
SELECT doc_id, {T.lang_id_sql('text')} AS pred_lang FROM documents
""",
        "x6b_lang_id_ngram": f"""
SELECT doc_id, {T.lang_id_ngram_sql('text')} AS pred_lang FROM documents
""",
        "x7_quality_score": f"""
SELECT doc_id, {T.quality_score_sql('text')} AS q_score FROM documents
""",
        "x8_token_stats": f"""
SELECT source, count(*) AS n_docs,
       round(avg({T.token_count_sql('text')}), 4) AS avg_tokens,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source
""",
        "x9_fingerprint": f"""
SELECT doc_id, {T.fingerprint_md5_sql('text')} AS fp FROM documents
""",
        "x11_train_split": """
SELECT doc_id,
       CASE WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 900 THEN 'train'
            WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 950 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
        "st1_windowed_counts": f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, {W.round_half_up_sql('sum(value)', 4)} AS sum_value
FROM events GROUP BY 1, 2
""",
        "st9_sliding_windows": f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS b0, event_type, value
  FROM events
), s AS (
  SELECT unnest([b0, b0 - INTERVAL '30 minutes']) AS window_start,
         event_type, value
  FROM b
)
SELECT window_start, event_type, count(*) AS n_events,
       {W.round_half_up_sql('sum(value)', 4)} AS sum_value
FROM s GROUP BY 1, 2
""",
        "st2_stream_dedup": """
SELECT DISTINCT user_id, event_type FROM events
""",
    })
