"""Oracle family block 08: assignments from w10_ohlc_bars.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    BM25_B = ns.BM25_B
    BM25_K1 = ns.BM25_K1
    BM25_QUERY_TERMS = ns.BM25_QUERY_TERMS
    M = ns.M
    S = ns.S
    W = ns.W
    a18_column_profiler = ns.a18_column_profiler
    b3_bloom_filter_join = ns.b3_bloom_filter_join
    io5_snapshot_diff = ns.io5_snapshot_diff
    q11_funnel = ns.q11_funnel
    q12_cohort_retention = ns.q12_cohort_retention
    q14_rolling_active_users = ns.q14_rolling_active_users
    q15_market_basket = ns.q15_market_basket
    qv2_expectation_suite = ns.qv2_expectation_suite
    r5_merge_cdc = ns.r5_merge_cdc
    r6_incremental_rollup = ns.r6_incremental_rollup
    w10_ohlc_bars = ns.w10_ohlc_bars
    w9_resample_gapfill = ns.w9_resample_gapfill
    x27_chunk_dedup = ns.x27_chunk_dedup
    x28_tf_cosine_pairs = ns.x28_tf_cosine_pairs
    x51_bm25_retrieval = ns.x51_bm25_retrieval
    x52_hybrid_retrieval = ns.x52_hybrid_retrieval

    d["w10_ohlc_bars"] = """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS h, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       max(value) AS high,
       min(value) AS low,
       count(*) AS n_ticks
FROM r GROUP BY user_id, h
"""
    d["w9_resample_gapfill"] = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         count(*) AS n
  FROM events GROUP BY user_id, h
), spans AS (
  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM spans
)
SELECT g.user_id,
       strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
       hr.n IS NULL AS was_gap,
       CAST(last_value(hr.n IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS events_filled
FROM grid g
LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
"""
    d["x27_chunk_dedup"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(ceil(len(t) / 10.0) AS INT)),
           i -> array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ')))
           AS chunk_text
  FROM toks
), dfreq AS (
  SELECT chunk_text, count(DISTINCT doc_id) AS df
  FROM chunks GROUP BY chunk_text
)
SELECT c.doc_id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks
FROM chunks c JOIN dfreq d USING (chunk_text)
GROUP BY c.doc_id
"""
    d["q11_funnel"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, count(*) AS n_users FROM s1
UNION ALL
SELECT '2_click' AS stage, count(*) AS n_users FROM s2
UNION ALL
SELECT '3_purchase' AS stage, count(*) AS n_users FROM s3
"""
    d["q15_market_basket"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), part_n AS (
  SELECT l_partkey, count(*) AS c FROM li GROUP BY l_partkey
), tot AS (
  SELECT count(DISTINCT l_orderkey) AS n_ord FROM li
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS c_ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
)
SELECT part_a, part_b,
       CAST(c_ab AS BIGINT) AS n_together,
       (floor(c_ab * CAST(n_ord AS DOUBLE) / (pa.c * pb.c)
              * 1000000 + 0.5) / 1000000 + 0.0) AS lift
FROM pairs
JOIN part_n pa ON pa.l_partkey = part_a
JOIN part_n pb ON pb.l_partkey = part_b
CROSS JOIN tot
ORDER BY lift DESC, part_a ASC, part_b ASC
LIMIT 20
"""
    d["q14_rolling_active_users"] = """
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), bounds AS (
  SELECT min(day) AS lo, max(day) AS hi FROM pairs
), dau AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM pairs GROUP BY day
), contrib AS (
  SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS wday
  FROM pairs
), wau AS (
  SELECT wday, count(DISTINCT user_id) AS wau_7d FROM contrib GROUP BY wday
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau_7d
FROM dau d JOIN wau w ON d.day = w.wday CROSS JOIN bounds b
WHERE d.day >= b.lo + INTERVAL 6 DAY AND d.day <= b.hi
"""
    d["q12_cohort_retention"] = """
WITH first_seen AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
)
SELECT strftime(CAST(f.t0 AS DATE), '%Y-%m-%d') AS cohort_day,
       CAST(floor(date_diff('day', CAST(f.t0 AS DATE),
                            CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
         AS week_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN first_seen f USING (user_id)
GROUP BY cohort_day, week_offset
"""
    d["x28_tf_cosine_pairs"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
                               i -> array_to_string(t[i:i+4], ' ')))
           AS term
  FROM toks
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM sh GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), nd AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
), capped AS (
  SELECT tf.doc_id, tf.term, tf.tf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
  WHERE dfreq.df * 100 <= nd.n_docs OR dfreq.df <= 2
), norms AS (
  SELECT doc_id, sum(tf * tf) AS n2 FROM capped GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.tf * b.tf) AS dot
  FROM capped a JOIN capped b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot
FROM dots
JOIN norms na ON na.doc_id = id_a
JOIN norms nb ON nb.doc_id = id_b
WHERE 25 * dot * dot >= 9 * na.n2 * nb.n2
"""
    d["r5_merge_cdc"] = """
WITH t AS (
  SELECT o_orderkey, o_totalprice FROM orders
), changes AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'delete'
              ELSE 'upsert' END AS op,
         o_totalprice * 1.05 AS o_totalprice
  FROM orders
  WHERE o_orderkey % 7 = 0 OR o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey + 100000000 AS o_orderkey,
         'upsert' AS op,
         o_totalprice + 1.0 AS o_totalprice
  FROM orders
  WHERE o_orderkey % 11 = 0
)
SELECT coalesce(c.o_orderkey, t.o_orderkey) AS o_orderkey,
       CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice
            ELSE t.o_totalprice END AS o_totalprice
FROM t FULL OUTER JOIN changes c ON t.o_orderkey = c.o_orderkey
WHERE c.o_orderkey IS NULL OR c.op <> 'delete'
"""
    d["r6_incremental_rollup"] = f"""
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n_events,
       {W.round_half_up_sql(
           "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)", 4)}
         AS sum_value,
       {W.round_half_up_sql(
           "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)}
         AS avg_value
FROM events
GROUP BY 1, 2
"""
    _terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    _k1p1, _k1 = repr(BM25_K1 + 1), repr(BM25_K1)
    _omb, _b = repr(1 - BM25_B), repr(BM25_B)
    d["x51_bm25_retrieval"] = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(sum(dl) AS BIGINT) AS _toks, count(*) AS _n FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({_terms}) GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT doc_id,
       {W.round_half_up_sql(
           "sum(ln((_n - df + 0.5) / (df + 0.5) + 1.0)"
           f" * (tf * {_k1p1}) / (tf + {_k1}"
           f" * ({_omb} + {_b} * dl / (_toks / _n))))", 6)} AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM tf JOIN dfc USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC LIMIT 20
"""
    d["a18_column_profiler"] = """
WITH n AS (SELECT count(*) AS n_rows FROM orders)
SELECT 'o_orderkey' AS column, n_rows,
       (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS n_null,
       (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct,
       (SELECT CAST(min(o_orderkey) AS DOUBLE) FROM orders) AS min_num,
       (SELECT CAST(max(o_orderkey) AS DOUBLE) FROM orders) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM n
UNION ALL
SELECT 'o_custkey', n_rows,
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
       (SELECT count(DISTINCT o_custkey) FROM orders),
       (SELECT CAST(min(o_custkey) AS DOUBLE) FROM orders),
       (SELECT CAST(max(o_custkey) AS DOUBLE) FROM orders),
       NULL, NULL
FROM n
UNION ALL
SELECT 'o_totalprice', n_rows,
       (SELECT count(*) FROM orders WHERE o_totalprice IS NULL),
       (SELECT count(DISTINCT o_totalprice) FROM orders),
       (SELECT min(o_totalprice) FROM orders),
       (SELECT max(o_totalprice) FROM orders),
       NULL, NULL
FROM n
UNION ALL
SELECT 'o_orderstatus', n_rows,
       (SELECT count(*) FROM orders WHERE o_orderstatus IS NULL),
       (SELECT count(DISTINCT o_orderstatus) FROM orders),
       NULL, NULL,
       (SELECT min(o_orderstatus) FROM orders),
       (SELECT max(o_orderstatus) FROM orders)
FROM n
UNION ALL
SELECT 'o_orderpriority', n_rows,
       (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL),
       (SELECT count(DISTINCT o_orderpriority) FROM orders),
       NULL, NULL,
       (SELECT min(o_orderpriority) FROM orders),
       (SELECT max(o_orderpriority) FROM orders)
FROM n
"""
    d["qv2_expectation_suite"] = """
WITH agg AS (
  SELECT count(*) AS _n,
         count(DISTINCT (l_orderkey, l_linenumber)) AS _uniq,
         sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v1,
         sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS v2,
         sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.5)
                  THEN 1 ELSE 0 END) AS v3,
         sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                  THEN 1 ELSE 0 END) AS v4
  FROM lineitem
), rows_ AS (
  SELECT 'orderkey_not_null' AS expectation, v1 AS violations, _n FROM agg
  UNION ALL
  SELECT 'quantity_non_negative', v2, _n FROM agg
  UNION ALL
  SELECT 'discount_in_range', v3, _n FROM agg
  UNION ALL
  SELECT 'returnflag_in_set', v4, _n FROM agg
  UNION ALL
  SELECT 'line_key_unique', _n - _uniq, _n FROM agg
)
SELECT expectation, CAST(violations AS BIGINT) AS violations,
       CAST(_n AS BIGINT) AS n_rows, violations = 0 AS passed
FROM rows_
"""
    d["io5_snapshot_diff"] = """
WITH d AS (SELECT doc_id, source FROM documents),
diff AS (
  SELECT doc_id,
         CASE WHEN source = 'src3' THEN 'added'
              WHEN source = 'src0' THEN 'removed'
              WHEN source = 'src1' THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM d WHERE source IN ('src0', 'src1', 'src2', 'src3')
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM diff GROUP BY status
"""
    d["x52_hybrid_retrieval"] = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(sum(dl) AS BIGINT) AS _toks, count(*) AS _n FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({_terms}) GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), bm AS (
  SELECT doc_id,
         {W.round_half_up_sql(
             "sum(ln((_n - df + 0.5) / (df + 0.5) + 1.0)"
             f" * (tf * {_k1p1}) / (tf + {_k1}"
             f" * ({_omb} + {_b} * dl / (_toks / _n))))", 6)} AS bm25
  FROM tf JOIN dfc USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
), lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
           AS lex_rank
  FROM bm QUALIFY lex_rank <= 50
), qv AS (
  SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT c.vec_id AS doc_id,
         list_dot_product(c.embedding::DOUBLE[], qvec)
           / (sqrt(list_dot_product(c.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]))
              * sqrt(list_dot_product(qvec, qvec))) AS sim
  FROM embeddings c CROSS JOIN qv
), sem AS (
  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC)
           AS sem_rank
  FROM scored QUALIFY sem_rank <= 50
), fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         lex.lex_rank, sem.sem_rank,
         coalesce(1.0 / (60 + lex.lex_rank), 0.0)
           + coalesce(1.0 / (60 + sem.sem_rank), 0.0) AS _rrf
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, {W.round_half_up_sql("_rrf", 6)} AS rrf_score,
       CAST(lex_rank AS INT) AS lex_rank,
       CAST(sem_rank AS INT) AS sem_rank
FROM fused
ORDER BY _rrf DESC, doc_id ASC LIMIT 20
"""
    d["b3_bloom_filter_join"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
GROUP BY o_orderpriority
"""
