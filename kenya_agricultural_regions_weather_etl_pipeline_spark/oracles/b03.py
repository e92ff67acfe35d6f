"""Oracle family block 03: vector top-k + text quality + sampling.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    F = ns.F
    PK = ns.PK
    SMP = ns.SMP
    T = ns.T
    W = ns.W
    a10_grouping_sets = ns.a10_grouping_sets
    a11_filtered_agg = ns.a11_filtered_agg
    a12_stats_aggregates = ns.a12_stats_aggregates
    a5_rollup = ns.a5_rollup
    a8_cube = ns.a8_cube
    e2e_training_prep = ns.e2e_training_prep
    q7_correlated_subquery = ns.q7_correlated_subquery
    q8_not_exists = ns.q8_not_exists
    set4_full_outer = ns.set4_full_outer
    st3_session_windows = ns.st3_session_windows
    st4_stateful_running_totals = ns.st4_stateful_running_totals
    st5_stream_static_join = ns.st5_stream_static_join
    st6_foreach_batch_upsert = ns.st6_foreach_batch_upsert
    w4_moving_average = ns.w4_moving_average
    w5_rank_functions = ns.w5_rank_functions
    w6_value_windows = ns.w6_value_windows
    x12_top_bigrams = ns.x12_top_bigrams
    x13_doc_frequency = ns.x13_doc_frequency
    x15_stratified_sample = ns.x15_stratified_sample
    x16_doc_chunks = ns.x16_doc_chunks
    x20_unigram_lm_score = ns.x20_unigram_lm_score
    x21_repetition_score = ns.x21_repetition_score
    x22_decontamination = ns.x22_decontamination
    x23_domain_mixture = ns.x23_domain_mixture
    x24_c4_filters = ns.x24_c4_filters
    x25_tfidf_top_terms = ns.x25_tfidf_top_terms

    d.update({
        "st6_foreach_batch_upsert": """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
""",
        "st5_stream_static_join": f"""
WITH dim AS (
  SELECT range::INT AS bucket, 'SEG' || (range % 5)::VARCHAR AS segment
  FROM range(15)
)
SELECT segment, count(*) AS n_events,
       {W.round_half_up_sql('sum(value)', 4)} AS sum_value
FROM events JOIN dim ON (user_id % 15) = bucket
GROUP BY segment
""",
        "st3_session_windows": f"""
WITH o AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
), g AS (
  SELECT user_id, ts, value,
         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM o
), s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       count(*) AS n_events,
       {W.round_half_up_sql('sum(value)', 4)} AS sum_value
FROM s GROUP BY user_id, sid
""",
        "st4_stateful_running_totals": f"""
SELECT user_id, count(*) AS n_events,
       {W.round_half_up_sql('sum(value)', 4)} AS sum_value
FROM events GROUP BY user_id
""",
        "a5_rollup": """
SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP (source, lang)
""",
        "a8_cube": f"""
SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       count(*) AS n_docs,
       {W.round_half_up_sql("CAST(sum(n_chars) AS DOUBLE) / count(*)", 2)}
           AS avg_chars
FROM documents GROUP BY CUBE (source, lang)
""",
        "x12_top_bigrams": """
WITH toks AS (
  SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents
), bg AS (
  SELECT t[i] || ' ' || t[i + 1] AS bigram
  FROM toks, unnest(range(1, len(t))) AS u(i)
)
SELECT bigram, count(*) AS n FROM bg
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 50
""",
        "x13_doc_frequency": f"""
WITH terms AS (
  SELECT unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS term
  FROM documents
), dfc AS (
  SELECT term, count(*) AS df FROM terms GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT term, df,
       {W.round_half_up_sql("ln(CAST(n_docs AS DOUBLE) / df)", 6)} AS idf
FROM dfc, n
ORDER BY df DESC, term ASC LIMIT 100
""",
        "x15_stratified_sample": f"""
SELECT doc_id, lang FROM documents
WHERE {SMP.stratified_hash_sample_sql(
            "text",
            "lang",
            {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.25},
            default_rate=0.1,
        )}
""",
        "x16_doc_chunks": PK.chunk_documents_sql(chunk_size=50, overlap=10),
        "x20_unigram_lm_score": f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), vocab AS (
  SELECT term, count(*) AS tf FROM toks GROUP BY term
), total AS (SELECT sum(tf) AS corpus_tokens FROM vocab)
SELECT doc_id, count(*) AS n_tokens,
       {W.round_half_up_sql(
           "avg(ln(CAST(tf AS DOUBLE) / corpus_tokens))", 4
       )} AS avg_logprob
FROM toks JOIN vocab USING (term), total
GROUP BY doc_id
""",
        "w4_moving_average": f"""
SELECT event_id, user_id,
       {W.round_half_up_sql(
           "avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
           "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)", 6
       )} AS mov_avg
FROM events
""",
        "x21_repetition_score": f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
), tri AS (
  SELECT doc_id,
         CAST(greatest(len(t) - 2, 0) AS INT) AS n_trigrams,
         CASE WHEN len(t) < 3 THEN 0.0
              ELSE {W.round_half_up_sql(
                  "1.0 - CAST(len(list_distinct("
                  "list_transform(range(1, len(t) - 1),"
                  " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"
                  ")) AS DOUBLE) / (len(t) - 2)", 6
              )} END AS trigram_dup_frac
  FROM toks
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
  FROM toks, unnest(range(1, len(t))) AS u(i)
), per AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
), top AS (
  SELECT doc_id, {W.round_half_up_sql(
      "CAST(max(c) AS DOUBLE) / sum(c)", 6
  )} AS top_bigram_frac
  FROM per GROUP BY doc_id
)
SELECT tri.doc_id, n_trigrams, trigram_dup_frac,
       COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac
FROM tri LEFT JOIN top ON tri.doc_id = top.doc_id
""",
        "x22_decontamination": """
WITH s AS (
  SELECT doc_id, text,
         CASE WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 900
              THEN 'train' ELSE 'eval' END AS split
  FROM documents
), toks AS (
  SELECT doc_id, split,
         list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
           '\\s+', ' ', 'g')), ' '), t -> t <> '') AS l
  FROM s
), sh AS (
  SELECT doc_id, split, unnest(list_distinct(
    CASE WHEN len(l) < 5 THEN [array_to_string(l, ' ')]
         ELSE list_transform(range(1, len(l) - 3),
                             i -> array_to_string(l[i:i+4], ' '))
    END)) AS sh
  FROM toks
), tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
te AS (SELECT doc_id, sh FROM sh WHERE split = 'eval')
SELECT doc_id, count(*) AS n_shared_shingles
FROM te JOIN tr USING (sh)
GROUP BY doc_id
""",
        "q7_correlated_subquery": """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                      FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
""",
        "e2e_training_prep": """
WITH deduped AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             ORDER BY doc_id ASC) AS rn
    FROM documents) WHERE rn = 1
), split AS (
  SELECT doc_id, lang, text,
         CASE WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 900
              THEN 'train' ELSE 'eval' END AS split
  FROM deduped
), toks5 AS (
  SELECT doc_id, split,
         list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
           '\\s+', ' ', 'g')), ' '), t -> t <> '') AS l
  FROM split
), sh AS (
  SELECT doc_id, split, unnest(list_distinct(
    CASE WHEN len(l) < 5 THEN [array_to_string(l, ' ')]
         ELSE list_transform(range(1, len(l) - 3),
                             i -> array_to_string(l[i:i+4], ' '))
    END)) AS sh
  FROM toks5
), contaminated AS (
  SELECT DISTINCT te.doc_id
  FROM (SELECT doc_id, sh FROM sh WHERE split = 'train') te
  JOIN (SELECT DISTINCT sh FROM sh WHERE split = 'eval') tr USING (sh)
), clean AS (
  SELECT s.doc_id, s.lang, s.text FROM split s
  WHERE s.split = 'train'
    AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
), ctoks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t
  FROM clean
), sized AS (
  SELECT doc_id, lang, t, len(t) AS n,
         greatest(1, CAST(ceil((len(t) - 10) / 40.0) AS INT)) AS n_chunks
  FROM ctoks
), chunks AS (
  SELECT doc_id, lang, CAST(u.i AS INT) AS chunk_id,
         CAST(least(50, n - u.i*40) AS INT) AS n_tokens
  FROM sized, LATERAL unnest(range(0, n_chunks)) AS u(i)
), packed AS (
  SELECT lang, n_tokens,
         CAST(floor((sum(n_tokens) OVER (
                PARTITION BY lang ORDER BY doc_id, chunk_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) - n_tokens) / 256) AS INT) AS pack_id
  FROM chunks
)
SELECT lang, pack_id, count(*) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
FROM packed GROUP BY lang, pack_id
""",
        "q8_not_exists": """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
""",
        "w5_rank_functions": """
SELECT o_orderkey, o_custkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist()    OVER w AS cdist,
       ntile(4)       OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
        "a11_filtered_agg": """
SELECT l_returnflag,
       count(*) AS n_rows,
       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       CAST(sum(l_quantity) FILTER (WHERE l_tax > 0.04) AS BIGINT)
         AS qty_high_tax,
       count(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00')
         AS n_recent
FROM lineitem
GROUP BY l_returnflag
""",
        "x23_domain_mixture": f"""
WITH copies AS (
  SELECT doc_id, source, n_chars,
         {SMP.domain_mixture_sql_copies(
             "text", "source", {"src0": 2.5, "src1": 0.5}, 1.0
         )} AS n_copies
  FROM documents
), exploded AS (
  SELECT doc_id, source, n_chars
  FROM copies, LATERAL unnest(range(0, n_copies)) AS u(i)
  WHERE n_copies > 0
)
SELECT source, count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_rows_out,
       CAST(sum(n_chars) AS BIGINT) AS chars_out
FROM exploded GROUP BY source
""",
        "x24_c4_filters": f"""
WITH flags AS (
  SELECT lang,
         (len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) < 15)
           AS too_short,
         ({T.mean_token_len_sql("text")} < 3.0
          OR {T.mean_token_len_sql("text")} > 10.0) AS bad_word_len
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
       CAST(sum(CASE WHEN bad_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_word_len,
       CAST(sum(CASE WHEN NOT (too_short OR bad_word_len) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keep
FROM flags GROUP BY lang
""",
        "x25_tfidf_top_terms": f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), total AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         {W.round_half_up_sql("tf * ln(n_docs::DOUBLE / df)", 6)} AS tfidf
  FROM tf JOIN dfc USING (term) CROSS JOIN total
)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored)
WHERE rnk <= 3
""",
        "w6_value_windows": """
SELECT event_id, user_id,
       first_value(event_id)  OVER w AS cheapest_event,
       last_value(event_id)   OVER w AS priciest_event,
       nth_value(event_id, 2) OVER w AS second_event
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY value ASC NULLS FIRST, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
        "a12_stats_aggregates": f"""
SELECT l_returnflag,
       {W.round_half_up_sql("stddev_samp(l_quantity)", 4)} AS sd_qty,
       {W.round_half_up_sql("var_samp(l_quantity)", 4)} AS var_qty,
       {W.round_half_up_sql("corr(l_quantity, l_extendedprice)", 4)}
         AS corr_qty_price,
       {W.round_half_up_sql("covar_samp(l_discount, l_tax)", 4)}
         AS covar_disc_tax,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
        "set4_full_outer": """
SELECT status, count(*) AS n_keys, CAST(sum(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders
FROM (
  SELECT CASE WHEN o.o_custkey IS NULL THEN 'customer_only'
              WHEN c.c_custkey IS NULL THEN 'order_only'
              ELSE 'both' END AS status,
         o.n_orders
  FROM customer c
  FULL OUTER JOIN (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
  ) o ON c.c_custkey = o.o_custkey
)
GROUP BY status
""",
        "a10_grouping_sets": """
SELECT COALESCE(source, 'ALL') AS source,
       COALESCE(lang, 'ALL') AS lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY GROUPING SETS ((source), (lang), ())
""",
    })
