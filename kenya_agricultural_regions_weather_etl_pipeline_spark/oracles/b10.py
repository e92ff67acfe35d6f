"""Oracle family block 10: assignments from x76_ngram_diversity.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    T = ns.T
    W = ns.W
    a21_histogram = ns.a21_histogram
    q28_supplier_concentration = ns.q28_supplier_concentration
    q29_rfm_segmentation = ns.q29_rfm_segmentation
    q30_order_cadence = ns.q30_order_cadence
    r8_bitemporal_asof = ns.r8_bitemporal_asof
    sql6_parameterized = ns.sql6_parameterized
    st18_corpus_telemetry = ns.st18_corpus_telemetry
    w19_ewma = ns.w19_ewma
    w20_funnel_latency = ns.w20_funnel_latency
    w21_standardize = ns.w21_standardize
    w22_prorata_allocation = ns.w22_prorata_allocation
    x65_split_repair = ns.x65_split_repair
    x66_code_switch_detect = ns.x66_code_switch_detect
    x67_k_anonymity = ns.x67_k_anonymity
    x68_token_budget_select = ns.x68_token_budget_select
    x69_dataset_card = ns.x69_dataset_card
    x70_source_overlap = ns.x70_source_overlap
    x71_embedding_qa = ns.x71_embedding_qa
    x72_dup_quality_interaction = ns.x72_dup_quality_interaction
    x73_declared_lang_audit = ns.x73_declared_lang_audit
    x74_label_centroid_similarity = ns.x74_label_centroid_similarity
    x75_heaps_law = ns.x75_heaps_law
    x76_ngram_diversity = ns.x76_ngram_diversity

    d["x76_ngram_diversity"] = f"""
WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
), tris AS (
  SELECT source, unnest(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
  FROM toks WHERE len(t) >= 3
), per AS (
  SELECT source, tri, count(*) AS n FROM tris GROUP BY 1, 2
)
SELECT source, CAST(sum(n) AS BIGINT) AS n_trigrams,
       CAST(count(*) AS BIGINT) AS n_distinct,
       {W.round_half_up_sql("count(*)::DOUBLE / sum(n)", 6)}
         AS diversity_ratio
FROM per GROUP BY source
"""
    d["r8_bitemporal_asof"] = """
WITH versions AS (
  SELECT o_orderkey, o_totalprice AS price, o_orderdate AS valid_from, 1 AS tx
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice * 1.02 AS price,
         o_orderdate + INTERVAL 30 DAY AS valid_from, 2 AS tx
  FROM orders WHERE o_orderkey % 13 = 0
), probe AS (
  SELECT o_orderkey, o_orderdate + INTERVAL 45 DAY AS v_at FROM orders
), t1 AS (
  SELECT o_orderkey, price AS price_asof_tx1 FROM (
    SELECT v.o_orderkey, price,
           row_number() OVER (PARTITION BY v.o_orderkey
             ORDER BY valid_from DESC, tx DESC) AS rn
    FROM versions v JOIN probe p ON p.o_orderkey = v.o_orderkey
    WHERE tx <= 1 AND valid_from <= v_at) WHERE rn = 1
), t2 AS (
  SELECT o_orderkey, price AS price_asof_tx2 FROM (
    SELECT v.o_orderkey, price,
           row_number() OVER (PARTITION BY v.o_orderkey
             ORDER BY valid_from DESC, tx DESC) AS rn
    FROM versions v JOIN probe p ON p.o_orderkey = v.o_orderkey
    WHERE tx <= 2 AND valid_from <= v_at) WHERE rn = 1
)
SELECT o_orderkey, price_asof_tx1, price_asof_tx2,
       (price_asof_tx1 <> price_asof_tx2)::INT AS restated
FROM t1 JOIN t2 USING (o_orderkey)
"""
    d["w22_prorata_allocation"] = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(o_totalprice * 5 + 0.5) AS BIGINT) AS budget_c,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS w_c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), shares AS (
  SELECT l_orderkey, l_linenumber, budget_c,
         (budget_c * w_c) // sum(w_c) OVER (PARTITION BY l_orderkey)
           AS base_c,
         (budget_c * w_c) % sum(w_c) OVER (PARTITION BY l_orderkey)
           AS rem
  FROM base
), lo AS (
  SELECT *, budget_c - sum(base_c) OVER (PARTITION BY l_orderkey)
           AS leftover
  FROM shares
)
SELECT l_orderkey, l_linenumber,
       CAST(base_c + (row_number() OVER (PARTITION BY l_orderkey
              ORDER BY rem DESC, l_linenumber ASC) <= leftover)::INT
            AS BIGINT) AS alloc_cents
FROM lo
"""
    d["sql6_parameterized"] = """
SELECT p_brand,
       sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4))::DOUBLE
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1' AND l_extendedprice > 1000.0
GROUP BY p_brand
"""
    d["x75_heaps_law"] = """
WITH t AS (SELECT count(*) / 10 AS decile_size FROM documents),
toks AS (
  SELECT least(CAST(floor(doc_id::DOUBLE / decile_size) AS BIGINT), 9)
           AS decile,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents CROSS JOIN t
), bg AS (
  SELECT decile,
         unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS term
  FROM toks WHERE len(l) >= 2
), first_seen AS (
  SELECT term, min(decile) AS first_decile FROM bg GROUP BY term
), census AS (
  SELECT first_decile, CAST(count(*) AS BIGINT) AS n_new_terms
  FROM first_seen GROUP BY first_decile
)
SELECT first_decile AS decile, n_new_terms,
       CAST(sum(n_new_terms) OVER (ORDER BY first_decile
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM census
"""
    d["q30_order_cadence"] = f"""
WITH gaps AS (
  SELECT o_custkey,
         CAST(date_diff('day',
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC),
           o_orderdate) AS BIGINT) AS gap_days
  FROM orders
  QUALIFY gap_days IS NOT NULL
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
       {W.round_half_up_sql("quantile_cont(gap_days, 0.5)", 4)}
         AS median_gap_days,
       {W.round_half_up_sql("quantile_cont(gap_days, 0.9)", 4)}
         AS p90_gap_days
FROM gaps JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""
    d["w21_standardize"] = f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY event_type
)
SELECT event_id, event_type,
       {W.round_half_up_sql("(value - mu) / sd", 4)} AS z_value
FROM events JOIN stats USING (event_type)
"""
    d["x74_label_centroid_similarity"] = f"""
WITH dims AS (
  SELECT label, u.dim AS dim, u.v AS v FROM (
    SELECT label, unnest(list_transform(embedding,
      (x, i) -> struct_pack(dim := i, v := x::DOUBLE))) AS u
    FROM embeddings
  )
), coord AS (
  SELECT label, dim, avg(v) AS m FROM dims GROUP BY 1, 2
), cent AS (
  SELECT label, list(m ORDER BY dim) AS cvec FROM coord GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       {W.round_half_up_sql(
           "list_dot_product(a.cvec, b.cvec)"
           " / (sqrt(list_dot_product(a.cvec, a.cvec))"
           " * sqrt(list_dot_product(b.cvec, b.cvec)))", 4)}
         AS centroid_cosine
FROM cent a JOIN cent b ON a.label < b.label
"""
    d["q29_rfm_segmentation"] = """
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(o_totalprice::DECIMAL(18,4)) AS monetary
  FROM orders GROUP BY o_custkey
), anchor AS (SELECT max(o_orderdate) AS anchor FROM orders),
base AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_order, anchor) AS BIGINT) AS recency_days,
         frequency, monetary::DOUBLE AS monetary
  FROM per_cust CROSS JOIN anchor
), th AS (
  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rt,
         quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS ft,
         quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mt
  FROM base
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(6 - (1 + (recency_days > rt[1])::INT + (recency_days > rt[2])::INT
                 + (recency_days > rt[3])::INT + (recency_days > rt[4])::INT)
            AS INT) AS r_score,
       CAST(1 + (frequency > ft[1])::INT + (frequency > ft[2])::INT
              + (frequency > ft[3])::INT + (frequency > ft[4])::INT
            AS INT) AS f_score,
       CAST(1 + (monetary > mt[1])::INT + (monetary > mt[2])::INT
              + (monetary > mt[3])::INT + (monetary > mt[4])::INT
            AS INT) AS m_score
FROM base CROSS JOIN th
"""
    d["x73_declared_lang_audit"] = f"""
SELECT lang, {T.lang_id_sql('text')} AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""
    d["st18_corpus_telemetry"] = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum({T.token_count_sql('text')}) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       {W.round_half_up_sql(
           f"CAST(sum(CAST(floor(({T.quality_score_sql('text')})"
           " * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
           " / (1000000.0 * count(*))", 4)}
         AS mean_quality
FROM documents GROUP BY lang
"""
    d["w20_funnel_latency"] = """
WITH fc AS (
  SELECT user_id, min(epoch_us(ts)) AS first_click_us
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT e.user_id, any_value(first_click_us) AS first_click_us,
       min(epoch_us(ts)) AS first_purchase_us,
       min(epoch_us(ts)) - any_value(first_click_us) AS latency_us
FROM events e JOIN fc ON fc.user_id = e.user_id
WHERE e.event_type = 'purchase' AND epoch_us(ts) > first_click_us
GROUP BY e.user_id
"""
    d["x72_dup_quality_interaction"] = f"""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         {T.quality_score_sql('text')} AS q
  FROM documents
), copies AS (
  SELECT fp, count(*) AS n_copies FROM fp GROUP BY fp
)
SELECT CASE WHEN n_copies >= 3 THEN '3+'
            ELSE CAST(n_copies AS VARCHAR) END AS copy_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       {W.round_half_up_sql("avg(q)", 4)} AS mean_quality
FROM fp JOIN copies USING (fp)
GROUP BY 1
"""
    d["x70_source_overlap"] = """
WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
           '\\s+', ' ', 'g')), ' '), t -> t <> '') AS l
  FROM documents
), fps AS (
  SELECT DISTINCT source, unnest(list_distinct(
    CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
         ELSE list_transform(range(1, len(l) - 1), i -> array_to_string(l[i:i+2], ' '))
    END)) AS fp
  FROM toks
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_docs
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
"""
    d["x71_embedding_qa"] = f"""
WITH v AS (
  SELECT label, len(embedding) AS dim,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(dim) AS BIGINT) AS min_dim,
       CAST(max(dim) AS BIGINT) AS max_dim,
       CAST(sum((nrm = 0.0)::INT) AS BIGINT) AS n_zero_vecs,
       {W.round_half_up_sql("min(nrm)", 4)} AS min_norm,
       {W.round_half_up_sql("avg(nrm)", 4)} AS mean_norm,
       {W.round_half_up_sql("max(nrm)", 4)} AS max_norm
FROM v GROUP BY label
"""
    d["x69_dataset_card"] = f"""
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({T.token_count_sql('text')}) AS BIGINT) AS n_tokens,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         {W.round_half_up_sql(
             f"avg({T.quality_score_sql('text')})", 4)} AS mean_quality
  FROM documents
), dups AS (
  SELECT CAST(count(*) - count(DISTINCT
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
         AS BIGINT) AS n_dup_docs
  FROM documents
), top_lang AS (
  SELECT lang AS top_lang FROM documents
  GROUP BY lang ORDER BY count(*) DESC, lang ASC LIMIT 1
)
SELECT * FROM base CROSS JOIN dups CROSS JOIN top_lang
"""
    d["x68_token_budget_select"] = f"""
WITH scored AS (
  SELECT doc_id, {T.quality_score_sql('text')} AS q,
         CAST({T.token_count_sql('text')} AS BIGINT) AS n_tokens
  FROM documents
), ranked AS (
  SELECT doc_id, q, n_tokens,
         sum(n_tokens) OVER (ORDER BY q DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM scored
)
SELECT doc_id, q, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
FROM ranked WHERE cum <= 10000
"""
    d["w19_ewma"] = f"""
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         list(value ORDER BY event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       {W.round_half_up_sql(
           "list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc)", 6)}
         AS ewma_value
FROM per_user
"""
    d["a21_histogram"] = f"""
WITH b AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 10)) AS BIGINT), 9)
         AS bin,
       CAST(count(*) AS BIGINT) AS n_orders,
       {W.round_half_up_sql(
           "any_value(lo) + least(CAST(floor((o_totalprice - lo)"
           " / ((hi - lo) / 10)) AS BIGINT), 9)"
           " * (any_value(hi) - any_value(lo)) / 10", 4)} AS bin_lo
FROM orders CROSS JOIN b
GROUP BY 1
"""
    d["q28_supplier_concentration"] = f"""
WITH sup AS (
  SELECT * FROM supplier WHERE s_acctbal > 0
), per_nation AS (
  SELECT n_name, sum(s_acctbal::DECIMAL(18,4)) AS bal,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM sup JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
), total AS (
  SELECT sum(s_acctbal::DECIMAL(18,4)) AS total_bal FROM sup
)
SELECT n_name, bal::DOUBLE AS balance, n_suppliers,
       {W.round_half_up_sql("bal::DOUBLE / total_bal::DOUBLE * 100", 6)}
         AS share_pct
FROM per_nation CROSS JOIN total
WHERE {W.round_half_up_sql("bal::DOUBLE / total_bal::DOUBLE * 100", 6)} > 4.0
"""
    d["x67_k_anonymity"] = """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS group_size,
       (count(*) < 5)::INT AS at_risk
FROM customer GROUP BY c_nationkey, c_mktsegment
"""
    d["x66_code_switch_detect"] = f"""
WITH sents AS (
  SELECT doc_id, u.s AS s FROM (
    SELECT doc_id,
           unnest(list_transform(regexp_split_to_array(text, '\\.\\s+'),
                  (x, i) -> struct_pack(pos := i, s := x))) AS u
    FROM documents
  ) WHERE u.s <> ''
), langs AS (
  SELECT doc_id, {T.lang_id_sql('s')} AS pred FROM sents
), per_lang AS (
  SELECT doc_id, pred, count(*) AS n FROM langs GROUP BY 1, 2
), dominant AS (
  SELECT doc_id, pred AS dominant_lang FROM (
    SELECT doc_id, pred,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, pred ASC) AS rnk
    FROM per_lang) WHERE rnk = 1
), stats AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_sents,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM per_lang GROUP BY doc_id
)
SELECT doc_id, n_sents, n_langs, dominant_lang,
       (n_langs >= 2)::INT AS is_mixed
FROM stats JOIN dominant USING (doc_id)
"""
    d["x65_split_repair"] = """
WITH s AS (
  SELECT doc_id, text,
         CASE WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 900 THEN 'train'
              WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 950 THEN 'val'
              ELSE 'test' END AS split
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
hits AS (
  SELECT DISTINCT sh.doc_id FROM sh JOIN tr USING (sh)
  WHERE sh.split <> 'train'
)
SELECT s.doc_id, split AS old_split,
       CASE WHEN hits.doc_id IS NOT NULL THEN 'train' ELSE split END
         AS new_split,
       CASE WHEN hits.doc_id IS NOT NULL THEN 'eval_contaminated'
            ELSE 'clean' END AS reason
FROM s LEFT JOIN hits ON hits.doc_id = s.doc_id
"""
