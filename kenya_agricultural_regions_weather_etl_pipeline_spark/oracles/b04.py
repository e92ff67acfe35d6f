"""Oracle family block 04: joins, sets, windows, TF-IDF/LM scoring.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    PK = ns.PK
    RD = ns.RD
    SMP = ns.SMP
    T = ns.T
    V = ns.V
    W = ns.W
    X5H_PARAMS = ns.X5H_PARAMS
    _SEMDEDUP_ADAPTIVE_C0 = ns._SEMDEDUP_ADAPTIVE_C0
    _semdedup_oracle_sql = ns._semdedup_oracle_sql
    _semdedup_seed_c0 = ns._semdedup_seed_c0
    mm2_frame_sample = ns.mm2_frame_sample
    p12_local_time = ns.p12_local_time
    p13_error_safe_arithmetic = ns.p13_error_safe_arithmetic
    q10_having_filter = ns.q10_having_filter
    st13_stream_outer_join = ns.st13_stream_outer_join
    st20_semantic_dedup_ingest = ns.st20_semantic_dedup_ingest
    st7_stream_stream_join = ns.st7_stream_stream_join
    x17_sequence_packing = ns.x17_sequence_packing
    x18_pii_redaction = ns.x18_pii_redaction
    x19_embedding_quantize = ns.x19_embedding_quantize
    x29_kmeans_step = ns.x29_kmeans_step
    x31_length_curriculum = ns.x31_length_curriculum
    x32_remove_repeated_spans = ns.x32_remove_repeated_spans
    x33_pmi_collocations = ns.x33_pmi_collocations
    x35_source_vocab_overlap = ns.x35_source_vocab_overlap
    x36_langid_agreement = ns.x36_langid_agreement
    x40_semantic_dedup_pairs = ns.x40_semantic_dedup_pairs
    x40b_semantic_dedup_adaptive = ns.x40b_semantic_dedup_adaptive
    x40c_semantic_dedup_balanced = ns.x40c_semantic_dedup_balanced
    x41_quality_weighted_sample = ns.x41_quality_weighted_sample
    x42_sentence_split_udtf = ns.x42_sentence_split_udtf
    x5d_cosine_topk_ivf = ns.x5d_cosine_topk_ivf
    x5g_ivf_adaptive_probe = ns.x5g_ivf_adaptive_probe
    x5h_ivfpq_search = ns.x5h_ivfpq_search
    x5i_filtered_search = ns.x5i_filtered_search
    x8b_bpe_token_stats = ns.x8b_bpe_token_stats
    QCODES, QSCALE = V.quantize_int8_sql("embedding::DOUBLE[]")

    d.update({
        "st7_stream_stream_join": """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
        "st13_stream_outer_join": """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
        "x17_sequence_packing": PK.pack_sequences_sql(
            "documents", T.token_count_sql("text"), budget=256
        ),
        "x18_pii_redaction": f"""
SELECT c_custkey,
       {RD.redact_text_sql('c_name')} AS clean_name,
       {RD.mask_keep_last_sql('c_name')} AS masked_name,
       CAST(len(regexp_extract_all(c_name, '{RD.PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(
           regexp_replace(c_name, '{RD.PHONE_RE}', '{RD.PHONE_TOKEN}', 'g'),
           '{RD.DIGIT_RUN_RE}')) AS INT) AS n_digit_runs
FROM customer
""",
        "x19_embedding_quantize": f"""
SELECT vec_id,
       array_to_string({QCODES}, ',') AS codes,
       {W.round_half_up_sql(QSCALE, 9)} AS scale
FROM embeddings
""",
        "x5d_cosine_topk_ivf": f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, cvec, centroid_id AS cell FROM (
    SELECT c.vec_id, c.cvec, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id < 8
), probes AS (
  SELECT query_id, qvec, centroid_id AS cell FROM (
    SELECT q.query_id, q.qvec, cent.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {V.cosine_sql('qvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= 2
), scored AS (
  SELECT query_id, vec_id, {V.cosine_sql('cvec', 'qvec')} AS sim
  FROM assigned JOIN probes USING (cell)
)
SELECT query_id, vec_id, round(sim, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 10
""",
        # filtered search: x5d machinery, full-corpus codebook, corpus
        # narrowed to label=3 before assignment (per-vector assignment
        # is independent, so filter-then-assign == assign-then-filter)
        "x5i_filtered_search": f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM embeddings
  WHERE label = 3
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, cvec, centroid_id AS cell FROM (
    SELECT c.vec_id, c.cvec, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id < 8
), probes AS (
  SELECT query_id, qvec, centroid_id AS cell FROM (
    SELECT q.query_id, q.qvec, cent.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {V.cosine_sql('qvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= 2
), scored AS (
  SELECT query_id, vec_id, {V.cosine_sql('cvec', 'qvec')} AS sim
  FROM assigned JOIN probes USING (cell)
)
SELECT query_id, vec_id, round(sim, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 10
""",
        # IVF-PQ: x5d's cells + x44's integer-grid PQ codes + ADC
        # table-sum shortlist + exact rerank — every stage replayed.
        # Geometry comes from X5H_PARAMS (shared with the Spark call)
        # and the sub-vector length derives from len(qv), so the oracle
        # tracks both retunes and a regenerated embedding width.
        "x5h_ivfpq_search": f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < {X5H_PARAMS["n_centroids"]}
), assigned AS (
  SELECT vec_id, cvec, centroid_id AS cell FROM (
    SELECT c.vec_id, c.cvec, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id < 8
), probes AS (
  SELECT query_id, centroid_id AS cell FROM (
    SELECT q.query_id, cent.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {V.cosine_sql('qvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= {X5H_PARAMS["n_probe"]}
), g AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x*1000000.0+0.5) AS BIGINT)) AS qv,
         len(embedding) // {X5H_PARAMS["n_sub"]} AS sl
  FROM embeddings
), m_ids AS (
  SELECT CAST(unnest(range(0,{X5H_PARAMS["n_sub"]})) AS INT) AS m
), cent_sub AS (
  SELECT CAST(vec_id AS INT) AS cid, m, qv[m*sl+1 : m*sl+sl] AS cv
  FROM g, m_ids WHERE vec_id < {X5H_PARAMS["n_codes"]}
), data_sub AS (
  SELECT vec_id, m, qv[m*sl+1 : m*sl+sl] AS dv FROM g, m_ids
), codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT d.vec_id, d.m, cs.cid,
           row_number() OVER (PARTITION BY d.vec_id, d.m ORDER BY
             list_sum(list_transform(range(1, len(d.dv)+1),
               i -> (d.dv[i]-cs.cv[i])*(d.dv[i]-cs.cv[i]))), cs.cid) AS rn
    FROM data_sub d JOIN cent_sub cs ON d.m = cs.m) t WHERE rn = 1
), adc AS (
  SELECT qs.vec_id AS query_id, qs.m, cs.cid AS code,
         list_sum(list_transform(range(1, len(qs.dv)+1),
           i -> (qs.dv[i]-cs.cv[i])*(qs.dv[i]-cs.cv[i]))) AS adc_d2
  FROM data_sub qs JOIN cent_sub cs ON qs.m = cs.m
  WHERE qs.vec_id < 8
), scored AS (
  SELECT p.query_id, a.vec_id, sum(adc.adc_d2) AS adc
  FROM probes p
  JOIN assigned a USING (cell)
  JOIN codes ON codes.vec_id = a.vec_id
  JOIN adc ON adc.query_id = p.query_id
          AND adc.m = codes.m AND adc.code = codes.code
  GROUP BY 1, 2
), short AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc, vec_id) AS r
    FROM scored) WHERE r <= {X5H_PARAMS["shortlist"]}
), rer AS (
  SELECT s.query_id, s.vec_id, {V.cosine_sql('cvec', 'qvec')} AS sim
  FROM short s
  JOIN c ON c.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, vec_id, round(sim, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM rer) WHERE rank <= {X5H_PARAMS["k"]}
""",
        # x5d's oracle with the adaptive probe rule: cells join their
        # member counts, and each query keeps the smallest centroid-
        # similarity-ordered prefix whose cumulative population reaches
        # min_candidates=64 (running sum over ROWS ... 1 PRECEDING)
        "x5g_ivf_adaptive_probe": f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, cvec, centroid_id AS cell FROM (
    SELECT c.vec_id, c.cvec, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), sizes AS (
  SELECT cell, count(*) AS cell_n FROM assigned GROUP BY cell
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id < 8
), ranked AS (
  SELECT q.query_id, q.qvec, cent.centroid_id AS cell, s.cell_n,
         {V.cosine_sql('qvec', 'cent_vec')} AS cent_sim
  FROM q CROSS JOIN cent
  JOIN sizes s ON s.cell = cent.centroid_id
), probes AS (
  SELECT query_id, qvec, cell FROM (
    SELECT *, coalesce(sum(cell_n) OVER (PARTITION BY query_id
                 ORDER BY cent_sim DESC, cell ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
    FROM ranked) WHERE cum_before < 64
), scored AS (
  SELECT query_id, vec_id, {V.cosine_sql('cvec', 'qvec')} AS sim
  FROM assigned JOIN probes USING (cell)
)
SELECT query_id, vec_id, round(sim, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 10
""",
        "x8b_bpe_token_stats": f"""
SELECT source, count(*) AS n_docs,
       round(avg({T.bpe_ish_token_count_sql('text')}), 4) AS avg_bpe_tokens,
       CAST(sum({T.bpe_ish_token_count_sql('text')}) AS BIGINT) AS sum_bpe_tokens
FROM documents GROUP BY source
""",
        "mm2_frame_sample": """
WITH v AS (
  SELECT range AS asset_id, (range * 40)::INT AS duration_ms
  FROM range(64) WHERE range % 3 = 2
), f AS (
  SELECT asset_id, CAST(unnest(range(greatest(duration_ms // 200, 1))) AS INT) AS frame_idx
  FROM v
)
SELECT asset_id, frame_idx, (frame_idx * 200)::INT AS frame_ts_ms,
       (18 + length(frame_idx::VARCHAR))::INT AS frame_bytes
FROM f
""",
        "q10_having_filter": """
SELECT o_custkey, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_spend
FROM orders
GROUP BY o_custkey
HAVING count(*) > 25
""",
        "x33_pmi_collocations": """
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
), uni AS (
  SELECT unnest(t) AS w FROM toks
), uc AS (
  SELECT w, count(*) AS c_w FROM uni GROUP BY w
), big AS (
  SELECT t[i+1] AS w1, t[i+2] AS w2
  FROM toks, unnest(range(greatest(len(t)-1, 0))) AS r(i)
), bc AS (
  SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY w1, w2 HAVING count(*) >= 5
), tot AS (
  SELECT (SELECT count(*) FROM uni) AS n_tok,
         (SELECT count(*) FROM big) AS m_big
)
SELECT w1 || ' ' || w2 AS bigram,
       CAST(c_ab AS BIGINT) AS n_pair,
       (floor((ln(c_ab::DOUBLE) + 2.0 * ln(n_tok::DOUBLE)
               - ln(m_big::DOUBLE) - ln(a.c_w::DOUBLE)
               - ln(b.c_w::DOUBLE)) * 1000000 + 0.5) / 1000000 + 0.0) AS pmi
FROM bc
JOIN uc a ON a.w = bc.w1
JOIN uc b ON b.w = bc.w2
CROSS JOIN tot
ORDER BY pmi DESC, bigram ASC
LIMIT 20
""",
        "x32_remove_repeated_spans": """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
), chunked AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(t) / 10.0) AS INT)),
                        i -> array_to_string(t[(i*10+1):(i*10+10)], ' '))
           AS chunks
  FROM toks
), kept AS (
  SELECT doc_id, chunks,
         list_filter(chunks, (c, i) -> list_position(chunks, c) = i) AS k
  FROM chunked
)
SELECT doc_id,
       CAST(len(chunks) AS INT) AS n_chunks,
       CAST(len(chunks) - len(k) AS INT) AS n_removed,
       array_to_string(k, ' ') AS cleaned_text
FROM kept
""",
        "x36_langid_agreement": f"""
WITH preds AS (
  SELECT doc_id,
         {T.lang_id_sql('text')} AS lang_stopword,
         {T.lang_id_ngram_sql('text')} AS lang_trigram
  FROM documents
)
SELECT lang_stopword, lang_trigram, count(*) AS n_docs
FROM preds GROUP BY 1, 2
""",
        "x42_sentence_split_udtf": """
WITH s AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split(text, '.'),
                          p -> regexp_replace(p, '^\\s+|\\s+$', '', 'g')),
           p -> p <> '') AS sentences
  FROM documents
)
SELECT doc_id,
       CAST(len(sentences) AS BIGINT) AS n_sentences,
       CAST(list_max(list_transform(sentences, p -> length(p))) AS INT)
         AS longest
FROM s WHERE len(sentences) > 0
""",
        "x41_quality_weighted_sample": f"""
WITH scored AS (
  SELECT source,
         {SMP.split_bucket_sql('text')} AS bucket,
         CAST(floor((0.1 + 0.8 * {T.quality_score_sql('text')}) * 1000 + 0.5)
              AS INT) AS mille
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN bucket < mille THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       (floor(sum(mille) / (1000.0 * count(*)) * 1000000 + 0.5) / 1000000
        + 0.0) AS avg_p_keep
FROM scored GROUP BY source
""",
        # 2 Lloyd iterations from the lowest-vec_id seeds; the update
        # quantizes coordinates to an int64 micro-grid before summing so
        # trained centroids are bit-identical to the Spark side (see
        # operators/similarity.lloyd_trained_centroids)
        "x40_semantic_dedup_pairs": _semdedup_oracle_sql(
            "SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8"
        ),
        # adaptive k = ceil(N / target): same Lloyd replay, seed count
        # derived from count(*) OVER () instead of a pinned literal
        "x40b_semantic_dedup_adaptive": _semdedup_oracle_sql(
            _SEMDEDUP_ADAPTIVE_C0
        ),
        # balanced-exponent policy: k = ceil(sqrt(N)) (see x40c docstring)
        "x40c_semantic_dedup_balanced": _semdedup_oracle_sql(
            _semdedup_seed_c0("ceil(sqrt(n_vecs))")
        ),
        # st20 = x40c's √N pair machinery (r8: the trainer moved off
        # the k∝N policy whose offline Lloyd cost dominated the 10×
        # probe) + the streaming drop rule (dropped iff the LARGER id
        # of a verified same-cell pair), rolled up per label over the
        # untouched embeddings table
        "st20_semantic_dedup_ingest": _semdedup_oracle_sql(
            _semdedup_seed_c0("ceil(sqrt(n_vecs))"),
            """
, dropped AS (
  SELECT DISTINCT id_b FROM pairs
)
SELECT emb.label,
       CAST(count(*) AS BIGINT) AS n_survivors,
       min(emb.vec_id) AS min_id,
       max(emb.vec_id) AS max_id
FROM embeddings emb
LEFT JOIN dropped ON emb.vec_id = dropped.id_b
WHERE dropped.id_b IS NULL
GROUP BY emb.label
""",
        ),
        "x29_kmeans_step": """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c AS (
  SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8
), d AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
  FROM e CROSS JOIN c
)
SELECT cid, count(*) AS n_members,
       min(vec_id) AS min_member, max(vec_id) AS max_member
FROM d WHERE rn = 1
GROUP BY cid
""",
        "x31_length_curriculum": f"""
WITH hist AS (
  SELECT {T.token_count_sql('text')} AS n_tok, count(*) AS n_docs
  FROM documents GROUP BY 1
), cum AS (
  SELECT n_tok, n_docs,
         sum(n_docs) OVER (ORDER BY n_tok) AS cum,
         (SELECT sum(n_docs) FROM hist) AS total
  FROM hist
)
SELECT CASE WHEN 4 * cum <= total THEN 'Q1'
            WHEN 2 * cum <= total THEN 'Q2'
            WHEN 4 * cum <= 3 * total THEN 'Q3'
            ELSE 'Q4' END AS tier,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       min(n_tok) AS min_tokens, max(n_tok) AS max_tokens
FROM cum GROUP BY 1
""",
        "x35_source_vocab_overlap": f"""
WITH terms AS (
  SELECT DISTINCT source,
         unnest(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '\\s+'), t -> t <> ''))) AS term
  FROM documents
), sizes AS (
  SELECT source, count(*) AS n_terms FROM terms GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
  FROM terms a JOIN terms b USING (term)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_inter,
       {W.round_half_up_sql(
           "n_inter::DOUBLE / (sa.n_terms + sb.n_terms - n_inter)", 6)}
         AS vocab_jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
""",
        "p13_error_safe_arithmetic": f"""
WITH safe AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE value / (event_id % 7) END AS ratio,
         try_cast(json_extract_string(props, '$.k') AS INT) AS k_int,
         event_id % 7 AS denom
  FROM events
)
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN denom = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_zero,
       CAST(count(ratio) AS BIGINT) AS n_ratio_ok,
       CAST(count(k_int) AS BIGINT) AS n_k_parsed,
       {W.round_half_up_sql('min(ratio)', 6)} AS min_ratio,
       {W.round_half_up_sql('max(ratio)', 6)} AS max_ratio
FROM safe GROUP BY event_type
""",
        "p12_local_time": f"""
SELECT CAST(extract(hour FROM ts + INTERVAL 3 HOUR) AS INT) AS local_hour,
       count(*) AS n_events,
       {W.round_half_up_sql("avg(value)", 4)} AS avg_value
FROM events
GROUP BY 1
""",
    })
