"""Oracle family block 11: assignments from x64_dup_growth_curve.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    T = ns.T
    W = ns.W
    a17_heavy_hitters = ns.a17_heavy_hitters
    a19_group_mode = ns.a19_group_mode
    a20_winsorized_mean = ns.a20_winsorized_mean
    q23_bilateral_trade = ns.q23_bilateral_trade
    q24_market_share = ns.q24_market_share
    q25_promo_revenue = ns.q25_promo_revenue
    st15_streaming_heavy_hitters = ns.st15_streaming_heavy_hitters
    st16_cdc_apply_stream = ns.st16_cdc_apply_stream
    st17_vector_index_ingest = ns.st17_vector_index_ingest
    st19_model_score_stream = ns.st19_model_score_stream
    st22_vector_serve_stream = ns.st22_vector_serve_stream
    w16_seasonal_anomaly = ns.w16_seasonal_anomaly
    w17_yoy_compare = ns.w17_yoy_compare
    w18_pareto_concentration = ns.w18_pareto_concentration
    x2c_minhash_portable = ns.x2c_minhash_portable
    x40b_semantic_dedup_adaptive = ns.x40b_semantic_dedup_adaptive
    x49_triangle_cooccurrence = ns.x49_triangle_cooccurrence
    x55_fuzzy_decontamination = ns.x55_fuzzy_decontamination
    x56_tokenizer_fertility = ns.x56_tokenizer_fertility
    x57_hard_negatives = ns.x57_hard_negatives
    x58_zipf_slope = ns.x58_zipf_slope
    x59_line_dedup = ns.x59_line_dedup
    x5d_cosine_topk_ivf = ns.x5d_cosine_topk_ivf
    x63_rag_self_retrieval = ns.x63_rag_self_retrieval
    x64_dup_growth_curve = ns.x64_dup_growth_curve
    x85_dedup_modality_audit = ns.x85_dedup_modality_audit

    d["x64_dup_growth_curve"] = """
WITH t AS (SELECT count(*) / 10 AS decile_size FROM documents),
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
), first AS (
  SELECT fp, min(doc_id) AS first_id FROM fp GROUP BY fp
)
SELECT least(CAST(floor(doc_id::DOUBLE / decile_size) AS BIGINT), 9) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum((doc_id > first_id)::INT) AS BIGINT) AS n_dups
FROM fp JOIN first USING (fp) CROSS JOIN t
GROUP BY 1
"""
    d["a20_winsorized_mean"] = f"""
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       {W.round_half_up_sql(
           "avg(greatest(least(l_extendedprice, hi), lo))", 4)}
         AS winsorized_mean
FROM lineitem JOIN bounds USING (l_returnflag)
GROUP BY l_returnflag
"""
    d["x63_rag_self_retrieval"] = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT sum(dl) AS _toks, count(*) AS _n FROM dl
), qterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT doc_id AS query_id, unnest(
      list_filter(regexp_split_to_array(lower(text), '\\s+'),
                  t -> t <> '')[1:8]) AS term
    FROM documents WHERE doc_id % 50 = 0
  )
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT query_id, tf.doc_id,
         {W.round_half_up_sql(
             "sum(ln((_n - df + 0.5) / (df + 0.5) + 1.0)"
             " * (tf * (1.2 + 1))"
             " / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (_toks / _n))))", 6)}
           AS bm25
  FROM qterms
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY query_id, tf.doc_id
), ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, CAST(rnk AS BIGINT) AS parent_rank,
       {W.round_half_up_sql("1.0 / rnk", 6)} AS reciprocal_rank
FROM ranked WHERE doc_id = query_id
"""
    d["w18_pareto_concentration"] = f"""
WITH rev AS (
  SELECT l_partkey,
         sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)) AS rev
  FROM lineitem GROUP BY 1
), total AS (
  SELECT sum(rev) AS total_rev FROM rev
), top AS (
  SELECT l_partkey, rev FROM rev
  ORDER BY rev DESC, l_partkey ASC LIMIT 100
)
SELECT CAST(row_number() OVER (ORDER BY rev DESC, l_partkey ASC) AS BIGINT)
         AS rnk,
       l_partkey, rev::DOUBLE AS revenue,
       {W.round_half_up_sql(
           "(sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC"
           " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE"
           " / total_rev::DOUBLE * 100", 6)} AS cum_share_pct
FROM top CROSS JOIN total
"""
    d["x59_line_dedup"] = """
WITH sents AS (
  SELECT doc_id, u.pos AS pos, u.s AS s FROM (
    SELECT doc_id,
           unnest(list_transform(regexp_split_to_array(text, '\\.\\s+'),
                  (x, i) -> struct_pack(pos := i, s := x))) AS u
    FROM documents
  ) WHERE u.s <> ''
), survivors AS (
  SELECT doc_id, pos, s FROM (
    SELECT doc_id, pos, s,
           row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(s), '\\s+', ' ', 'g')))
             ORDER BY doc_id ASC, pos ASC) AS rn
    FROM sents
  ) WHERE rn = 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(s, '. ' ORDER BY pos) AS clean_text
FROM survivors GROUP BY doc_id
"""
    d["w17_yoy_compare"] = f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         sum(o_totalprice::DECIMAL(18,4)) AS rev
  FROM orders GROUP BY 1, 2
), lagged AS (
  SELECT y, m, rev, lag(rev, 12) OVER (ORDER BY y, m) AS prev
  FROM monthly
)
SELECT y, m, rev::DOUBLE AS revenue, prev::DOUBLE AS revenue_prev_year,
       {W.round_half_up_sql(
           "(rev - prev)::DOUBLE / prev::DOUBLE * 100", 4)} AS yoy_pct
FROM lagged
"""
    d["a19_group_mode"] = """
SELECT l_returnflag, l_quantity AS modal_quantity,
       CAST(n AS BIGINT) AS n_occurrences
FROM (
  SELECT l_returnflag, l_quantity, count(*) AS n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY count(*) DESC, l_quantity ASC) AS rnk
  FROM lineitem GROUP BY l_returnflag, l_quantity
) WHERE rnk = 1
"""
    d["x58_zipf_slope"] = f"""
WITH tf AS (
  SELECT term, count(*) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS term
    FROM documents
  ) GROUP BY term
), top AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
  FROM tf ORDER BY freq DESC, term ASC LIMIT 200
), xy AS (
  SELECT ln(rank::DOUBLE) AS x, ln(freq::DOUBLE) AS y FROM top
), s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_terms,
       {W.round_half_up_sql(
           "(n * sxy - sx * sy) / (n * sxx - sx * sx)", 4)} AS zipf_slope,
       {W.round_half_up_sql(
           "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n", 4)}
         AS zipf_intercept
FROM s
"""
    d["x56_tokenizer_fertility"] = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum({T.bpe_ish_token_count_sql('text')}) AS BIGINT) AS sum_bpe_tokens,
       CAST(sum({T.token_count_sql('text')}) AS BIGINT) AS sum_ws_tokens,
       {W.round_half_up_sql(
           f"sum({T.bpe_ish_token_count_sql('text')})::DOUBLE"
           f" / greatest(sum({T.token_count_sql('text')}), 1)", 6)} AS fertility,
       {W.round_half_up_sql(
           f"sum(length(text))::DOUBLE"
           f" / greatest(sum({T.bpe_ish_token_count_sql('text')}), 1)", 6)}
         AS chars_per_token
FROM documents GROUP BY lang
"""
    d["x57_hard_negatives"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(cv, qv)
           / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) AS sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
), banded AS (
  SELECT query_id, vec_id, sim FROM scored WHERE sim >= 0.3 AND sim < 0.8
)
SELECT query_id, vec_id, round(sim, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM banded) WHERE rank <= 5
"""
    d["st16_cdc_apply_stream"] = """
WITH base AS (SELECT o_orderkey, o_totalprice FROM orders)
SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.10
            WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.05
            ELSE o_totalprice END AS o_totalprice
FROM base
WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0)
UNION ALL
SELECT o_orderkey + 100000000 AS o_orderkey,
       o_totalprice + 1.0 AS o_totalprice
FROM base WHERE o_orderkey % 11 = 0
"""
    d["x55_fuzzy_decontamination"] = f"""
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
), sh0 AS (
  SELECT doc_id, split, unnest(list_distinct(
    CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
         ELSE list_transform(range(1, len(l) - 1), i -> array_to_string(l[i:i+2], ' '))
    END)) AS sh
  FROM toks
), hot AS (
  SELECT sh FROM sh0 WHERE split = 'train' GROUP BY sh HAVING count(*) > 50
), tr AS (
  SELECT doc_id AS train_id, sh FROM sh0
  WHERE split = 'train' AND sh NOT IN (SELECT sh FROM hot)
), te AS (
  SELECT doc_id AS eval_id, sh FROM sh0
  WHERE split = 'eval' AND sh NOT IN (SELECT sh FROM hot)
), sa AS (SELECT train_id, count(*) AS n_a FROM tr GROUP BY 1),
sb AS (SELECT eval_id, count(*) AS n_b FROM te GROUP BY 1),
inter AS (
  SELECT train_id, eval_id, count(*) AS inter
  FROM tr JOIN te USING (sh) GROUP BY 1, 2
), pairs AS (
  SELECT train_id, eval_id,
         round(inter::DOUBLE / (sa.n_a + sb.n_b - inter), 6) AS jaccard
  FROM inter JOIN sa USING (train_id) JOIN sb USING (eval_id)
  WHERE round(inter::DOUBLE / (sa.n_a + sb.n_b - inter), 6) >= 0.2
)
SELECT train_id, CAST(count(*) AS BIGINT) AS n_eval_matches,
       max(jaccard) AS max_jaccard
FROM pairs GROUP BY train_id
"""
    d["x49_triangle_cooccurrence"] = """
WITH pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), e AS (
  SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2
)
SELECT e1.pa AS part_a, e1.pb AS part_b, e2.pb AS part_c
FROM e e1
JOIN e e2 ON e2.pa = e1.pb
JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
"""
    d["w16_seasonal_anomaly"] = f"""
WITH base AS (
  SELECT event_id, event_type, hour(ts) AS hod, value FROM events
), med AS (
  SELECT event_type, hod, quantile_cont(value, 0.5) AS med
  FROM base GROUP BY event_type, hod
), prof AS (
  SELECT b.event_type, b.hod, first(m.med) AS med,
         quantile_cont(abs(b.value - m.med), 0.5) AS mad
  FROM base b JOIN med m USING (event_type, hod)
  GROUP BY b.event_type, b.hod
)
SELECT b.event_id, b.event_type, b.hod,
       {W.round_half_up_sql("b.value", 4)} AS value,
       {W.round_half_up_sql("p.med", 4)} AS cohort_median,
       {W.round_half_up_sql("p.mad", 4)} AS cohort_mad
FROM base b JOIN prof p USING (event_type, hod)
WHERE abs(b.value - p.med) > 3 * p.mad
"""
    d["a17_heavy_hitters"] = """
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
), n AS (SELECT CAST(count(*) AS BIGINT) AS total_items FROM tok)
SELECT tok, CAST(count(*) AS BIGINT) AS cnt, total_items
FROM tok, n
GROUP BY tok, total_items
HAVING count(*) * 200 > total_items
"""
    # st15's exact final pass answers the same question as a17 — one
    # oracle, two engines (batch two-pass vs streaming MG fold).
    d["x85_dedup_modality_audit"] = f"""
WITH tp AS (
  SELECT id_a, id_b FROM ({d["x2c_minhash_portable"].strip()}) t
), sp AS (
  SELECT id_a, id_b, 1 AS has_sem
  FROM ({d["x40b_semantic_dedup_adaptive"].strip()}) s
), j AS (
  SELECT CASE
           WHEN tp.id_a IS NOT NULL AND sp.has_sem IS NOT NULL THEN 'both'
           WHEN tp.id_a IS NOT NULL THEN 'text_only'
           ELSE 'semantic_only'
         END AS agreement
  FROM tp FULL OUTER JOIN sp USING (id_a, id_b)
)
SELECT agreement, CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY agreement
"""
    d["st15_streaming_heavy_hitters"] = d["a17_heavy_hitters"]
    # st17's incrementally-ingested IVF index must answer probes
    # identically to the batch x5d search — one oracle covers both
    d["st17_vector_index_ingest"] = d["x5d_cosine_topk_ivf"]
    # st22 serves the same query set from the same index shape in
    # streaming batches — drained union == the batch search
    d["st22_vector_serve_stream"] = d["x5d_cosine_topk_ivf"]
    # st19 deploys w16's trained profile to the stream — scoring is
    # stateless per row, so the streamed flag set == the batch filter
    d["st19_model_score_stream"] = d["w16_seasonal_anomaly"]
    d["q23_bilateral_trade"] = """
WITH supp AS (
  SELECT s_suppkey, n_name AS supp_nation
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2')
), cust AS (
  SELECT c_custkey, n_name AS cust_nation
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2')
)
SELECT supp_nation, cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supp ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN cust ON o_custkey = c_custkey
WHERE supp_nation <> cust_nation
GROUP BY supp_nation, cust_nation, year(l_shipdate)
"""
    d["q24_market_share"] = f"""
WITH cust_asia AS (
  SELECT c_custkey
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), supp AS (
  SELECT s_suppkey, n_name AS supp_nation
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
), agg AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         sum(CASE WHEN supp_nation = 'NATION_3'
                  THEN CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS _num,
         sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS _den
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN cust_asia ON o_custkey = c_custkey
  JOIN supp ON l_suppkey = s_suppkey
  WHERE p_type = 'PROMO'
  GROUP BY year(o_orderdate)
)
SELECT o_year,
       {W.round_half_up_sql(
           "CAST(_num AS DOUBLE) / CAST(_den AS DOUBLE)", 6)} AS mkt_share,
       CAST(_den AS DOUBLE) AS total_revenue
FROM agg
"""
    d["q25_promo_revenue"] = f"""
WITH agg AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
         sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS _promo,
         sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS _total,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY year(l_shipdate)
)
SELECT l_year,
       {W.round_half_up_sql(
           "100.0 * CAST(_promo AS DOUBLE) / CAST(_total AS DOUBLE)", 6)}
         AS promo_share,
       CAST(_total AS DOUBLE) AS total_revenue,
       n_items
FROM agg
"""
