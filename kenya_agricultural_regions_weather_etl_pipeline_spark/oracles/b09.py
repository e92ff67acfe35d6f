"""Oracle family block 09: assignments from x50_char_entropy.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    T = ns.T
    W = ns.W
    _hyperplane = ns._hyperplane
    q26_late_shipment_priority = ns.q26_late_shipment_priority
    q27_forecast_revenue = ns.q27_forecast_revenue
    q31_brand_margin = ns.q31_brand_margin
    st14_streaming_near_dedup = ns.st14_streaming_near_dedup
    w23_burstiness = ns.w23_burstiness
    w24_stickiness = ns.w24_stickiness
    x2c_minhash_portable = ns.x2c_minhash_portable
    x4b_simhash_portable = ns.x4b_simhash_portable
    x50_char_entropy = ns.x50_char_entropy
    x53_gopher_rules = ns.x53_gopher_rules
    x54_dsir_importance = ns.x54_dsir_importance
    x60_knn_label_accuracy = ns.x60_knn_label_accuracy
    x61_matryoshka_fidelity = ns.x61_matryoshka_fidelity
    x62_source_divergence = ns.x62_source_divergence
    x77_split_balance = ns.x77_split_balance
    x78_jl_projection = ns.x78_jl_projection
    x80_dedup_policy_budget = ns.x80_dedup_policy_budget

    d["x50_char_entropy"] = f"""
WITH ch AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ''), c -> c <> ''))
           AS ch
  FROM documents
), cnt AS (
  SELECT doc_id, ch, count(*) AS nc FROM ch GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(sum(nc) AS BIGINT) AS n_chars2,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       {W.round_half_up_sql(
           "ln(sum(nc)) - sum(nc * ln(nc)) / sum(nc)", 4)} AS entropy_nats
FROM cnt GROUP BY doc_id
"""
    _gf = T.gopher_filter_flags_sql("text", min_tokens=20)
    d["x53_gopher_rules"] = f"""
SELECT source, count(*) AS n_docs,
       CAST(sum({_gf['flag_token_count']}::INT) AS BIGINT) AS n_flag_token_count,
       CAST(sum({_gf['flag_word_len']}::INT) AS BIGINT) AS n_flag_word_len,
       CAST(sum({_gf['flag_symbol']}::INT) AS BIGINT) AS n_flag_symbol,
       CAST(sum({_gf['flag_alpha']}::INT) AS BIGINT) AS n_flag_alpha,
       CAST(sum({_gf['flag_stopword']}::INT) AS BIGINT) AS n_flag_stopword,
       CAST(sum({_gf['keep']}::INT) AS BIGINT) AS n_keep
FROM documents GROUP BY source
"""
    _rh = (
        "list_reduce([0::BIGINT] || list_transform("
        "regexp_split_to_array(trim(regexp_replace(lower(term), '\\s+', ' ', 'g')), ''),"
        " c -> ascii(c)::BIGINT), (acc, x) -> (acc * 257 + x) % 1000000007)"
    )
    d["x54_dsir_importance"] = f"""
WITH tb AS (
  SELECT doc_id, lang, {_rh} % 64 AS b
  FROM (
    SELECT doc_id, lang,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS term
    FROM documents
  )
), raw AS (SELECT b, count(*) AS cr FROM tb GROUP BY b),
tgt AS (SELECT b, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY b),
lm AS (
  SELECT raw.b, cr, coalesce(ct, 0) AS ct
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b
), tot AS (
  SELECT sum(cr) AS r_total, sum(ct) AS t_total FROM lm
), perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         {W.round_half_up_sql(
             "avg(ln((ct + 1)::DOUBLE / (t_total + 64))"
             " - ln((cr + 1)::DOUBLE / (r_total + 64)))", 4)} AS dsir_logratio
  FROM tb JOIN lm ON tb.b = lm.b CROSS JOIN tot
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, dsir_logratio,
       (dsir_logratio > 0)::INT AS selected
FROM perdoc
"""
    d["q26_late_shipment_priority"] = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""
    d["q27_forecast_revenue"] = """
SELECT sum((l_extendedprice * l_discount)::DECIMAL(18,4))::DOUBLE AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )

    _sig_cols = ",\n         ".join(
        f"min(({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {MINHASH_P}) AS sig{j}"
        for j in range(16)
    )
    _band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(',', "
        + ", ".join(f"sig{b * 4 + r}" for r in range(4))
        + ") AS key FROM sig"
        for b in range(4)
    )
    # shared portable-MinHash CTE chain: shingle → rolling hash →
    # 16-way universal-hash signatures → 4-band LSH buckets →
    # candidates → exact-Jaccard verified ``pairs``. x2c reports the
    # pairs; st14's streaming survivor rollup derives from them (a doc
    # is dropped iff it appears as the LARGER id of a verified pair).
    # r9 split: candidate chain (toks -> cand) and the exact-Jaccard
    # verify tail are separate builders so the re-pointed x2
    # (candidates) and x2b (0.4-verify) reuse the same machinery —
    # default 0.5 emission stays byte-identical to the r7 literal.
    _mh_cand_ctes = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
           '\\s+', ' ', 'g')), ' '), t -> t <> '') AS l
  FROM documents
), shg AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
         ELSE list_transform(range(1, len(l) - 1), i -> array_to_string(l[i:i+2], ' '))
    END)) AS sh
  FROM toks
), h AS (
  SELECT doc_id, sh, list_reduce(
    [0::BIGINT] || list_transform(
      regexp_split_to_array(trim(regexp_replace(lower(sh), '\\s+', ' ', 'g')), ''),
      c -> ascii(c)::BIGINT),
    (acc, x) -> (acc * 257 + x) % {MINHASH_P}) AS h
  FROM shg
), sig AS (
  SELECT doc_id, count(*) AS n_sh,
         {_sig_cols}
  FROM h GROUP BY doc_id
), bands AS (
  {_band_rows}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""

    def _mh_verify_tail(threshold: float) -> str:
        return f""", inter AS (
  SELECT id_a, id_b, count(*) AS i
  FROM cand
  JOIN shg sa ON sa.doc_id = id_a
  JOIN shg sb ON sb.doc_id = id_b AND sb.sh = sa.sh
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b,
         round(i::DOUBLE / (na.n_sh + nb.n_sh - i), 6) AS jaccard
  FROM inter
  JOIN sig na ON na.doc_id = id_a
  JOIN sig nb ON nb.doc_id = id_b
  WHERE round(i::DOUBLE / (na.n_sh + nb.n_sh - i), 6) >= {threshold}
)"""

    _mh_pairs_ctes = _mh_cand_ctes + _mh_verify_tail(0.5)
    d["x2c_minhash_portable"] = (
        _mh_pairs_ctes + "\nSELECT id_a, id_b, jaccard FROM pairs\n"
    )
    # r9 re-points (VERDICT r8 #4): the legacy xxhash64 sketches gain
    # exact oracles on the portable family — x2 is the raw candidate
    # stage, x2b the 0.4-threshold verify (x2c keeps 0.5).
    d["x2_minhash_lsh_pairs"] = (
        _mh_cand_ctes + "\nSELECT id_a, id_b FROM cand\n"
    )
    d["x2b_minhash_verified"] = (
        _mh_cand_ctes
        + _mh_verify_tail(0.4)
        + "\nSELECT id_a, id_b, jaccard FROM pairs\n"
    )
    d["st14_streaming_near_dedup"] = (
        _mh_pairs_ctes
        + """
, dropped AS (
  SELECT DISTINCT id_b FROM pairs
)
SELECT doc.source,
       CAST(count(*) AS BIGINT) AS n_survivors,
       min(doc.doc_id) AS min_id,
       max(doc.doc_id) AS max_id
FROM documents doc
LEFT JOIN dropped ON doc.doc_id = dropped.id_b
WHERE dropped.id_b IS NULL
GROUP BY doc.source
"""
    )
    d["x60_knn_label_accuracy"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS true_label
  FROM embeddings WHERE vec_id < 64
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv, label FROM embeddings
), scored AS (
  SELECT q.query_id, q.true_label, c.vec_id, c.label AS pred_label,
         list_dot_product(cv, qv)
           / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) AS sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
), best AS (
  SELECT query_id, true_label, pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, vec_id ASC) AS rn
    FROM scored) WHERE rn = 1
)
SELECT true_label, CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum((pred_label = true_label)::INT) AS BIGINT) AS n_correct
FROM best GROUP BY true_label
"""
    d["x61_matryoshka_fidelity"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
), full_nn AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(cv, qv)
               / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) DESC,
             c.vec_id ASC) AS rn
    FROM c CROSS JOIN q) WHERE rn <= 5
), trunc_nn AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(cv[1:16], qv[1:16])
               / (sqrt(list_dot_product(cv[1:16], cv[1:16]))
                  * sqrt(list_dot_product(qv[1:16], qv[1:16]))) DESC,
             c.vec_id ASC) AS rn
    FROM c CROSS JOIN q) WHERE rn <= 5
)
SELECT f.query_id, CAST(count(*) AS BIGINT) AS overlap_at_5
FROM full_nn f JOIN trunc_nn t
  ON t.query_id = f.query_id AND t.vec_id = f.vec_id
GROUP BY f.query_id
"""
    d["x62_source_divergence"] = f"""
WITH tb AS (
  SELECT source, {_rh} % 64 AS b
  FROM (
    SELECT source,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS term
    FROM documents
  )
), counts AS (
  SELECT source, b, count(*) AS c FROM tb GROUP BY 1, 2
), totals AS (
  SELECT source, sum(c) AS t FROM counts GROUP BY 1
), dense AS (
  SELECT totals.source, bk.b,
         (coalesce(c, 0) + 1)::DOUBLE / (t + 64) AS p
  FROM totals
  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bk
  LEFT JOIN counts ON counts.source = totals.source AND counts.b = bk.b
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.p AS p, b.p AS q
  FROM dense a JOIN dense b ON a.b = b.b AND a.source < b.source
)
SELECT source_a, source_b,
       {W.round_half_up_sql(
           "sum(0.5 * p * ln(p / ((p + q) / 2))"
           " + 0.5 * q * ln(q / ((p + q) / 2)))", 6)} AS js_divergence
FROM pairs GROUP BY source_a, source_b
"""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.dedup import (
        SIMHASH_A,
        SIMHASH_B,
        SIMHASH_PORTABLE_BITS,
    )

    _vote_cols = ",\n         ".join(
        f"sum(2 * ((({SIMHASH_A[j]} * h + {SIMHASH_B[j]}) % {MINHASH_P}) % 2) - 1)"
        f" AS s{j}"
        for j in range(SIMHASH_PORTABLE_BITS)
    )
    _fp_expr = " + ".join(
        f"(s{j} > 0)::BIGINT * {1 << j}" for j in range(SIMHASH_PORTABLE_BITS)
    )
    # r9: threshold parameterized so the re-pointed x4 (hamming <= 2,
    # the tighter policy point) shares the machinery — default 3
    # emission byte-identical to the r7 literal.
    def _simhash_portable_sql(max_hamming: int) -> str:
        return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
), h AS (
  SELECT doc_id, list_reduce(
    [0::BIGINT] || list_transform(
      regexp_split_to_array(trim(regexp_replace(lower(tok), '\\s+', ' ', 'g')), ''),
      c -> ascii(c)::BIGINT),
    (acc, x) -> (acc * 257 + x) % {MINHASH_P}) AS h
  FROM toks
), votes AS (
  SELECT doc_id,
         {_vote_cols}
  FROM h GROUP BY doc_id
), fp AS (
  SELECT doc_id, {_fp_expr} AS fp FROM votes
), blocked AS (
  SELECT doc_id, fp, b, (fp >> (12 * b)) & 4095 AS key
  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fa, b.fp AS fb
  FROM blocked a JOIN blocked b
    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(fa, fb)) <= {max_hamming}
"""

    d["x4b_simhash_portable"] = _simhash_portable_sql(3)
    d["x4_simhash_pairs"] = _simhash_portable_sql(2)
    d["x80_dedup_policy_budget"] = f"""
WITH ranked AS (
  SELECT CAST({T.token_count_sql('text')} AS BIGINT) AS n_tok,
         row_number() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
           ORDER BY doc_id ASC) AS rn
  FROM documents
)
SELECT CAST(sum(n_tok) AS BIGINT) AS tokens_keep_all,
       CAST(sum(CASE WHEN rn <= 2 THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_cap2,
       CAST(sum(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_full_dedup,
       CAST(count(*) AS BIGINT) AS n_docs
FROM ranked
"""
    d["w24_stickiness"] = f"""
WITH daily AS (
  SELECT day, count(*) AS dau FROM (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
  ) GROUP BY day
), davg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days, avg(dau) AS avg_dau FROM daily
), mau AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS mau FROM events
)
SELECT n_days, {W.round_half_up_sql("avg_dau", 4)} AS avg_dau, mau,
       {W.round_half_up_sql("avg_dau / mau", 4)} AS stickiness
FROM davg CROSS JOIN mau
"""
    d["q31_brand_margin"] = f"""
WITH j AS (
  SELECT p_brand,
         sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4)) AS revenue_d,
         sum((p_retailprice * l_quantity * 0.8)::DECIMAL(18,4)) AS cost_d,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, revenue_d::DOUBLE AS revenue, cost_d::DOUBLE AS cost,
       n_lines,
       {W.round_half_up_sql(
           "(revenue_d - cost_d)::DOUBLE / revenue_d::DOUBLE * 100", 4)}
         AS margin_pct
FROM j
"""
    _jl_planes = [
        "[" + ",".join(str(_hyperplane(64, b, 16)[d]) for d in range(64)) + "]::DOUBLE[]"
        for b in range(16)
    ]
    _jl_proj = (
        "["
        + ", ".join(f"list_dot_product(v, {p}) / 4.0" for p in _jl_planes)
        + "]"
    )
    _d2 = (
        lambda x, y, n: (
            f"sqrt(list_reduce([0.0::DOUBLE] || list_transform(range(1, {n + 1}),"
            f" i -> ({x}[i] - {y}[i]) * ({x}[i] - {y}[i])), (a, b) -> a + b))"
        )
    )
    d["x78_jl_projection"] = f"""
WITH probes AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {_jl_proj} AS p
  FROM embeddings WHERE vec_id < 16
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {W.round_half_up_sql(_d2('a.v', 'b.v', 64), 4)} AS d_orig,
       {W.round_half_up_sql(_d2('a.p', 'b.p', 16), 4)} AS d_proj,
       {W.round_half_up_sql(
           _d2('a.p', 'b.p', 16) + " / " + _d2('a.v', 'b.v', 64), 4)}
         AS distortion_ratio
FROM probes a JOIN probes b ON a.vec_id < b.vec_id
"""
    d["x77_split_balance"] = f"""
WITH s AS (
  SELECT text,
         CASE WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 900 THEN 'train'
              WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 950 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       {W.round_half_up_sql(f"avg({T.quality_score_sql('text')})", 4)}
         AS mean_quality,
       {W.round_half_up_sql(
           f"stddev_samp({T.quality_score_sql('text')})", 4)} AS sd_quality,
       {W.round_half_up_sql(f"avg({T.token_count_sql('text')})", 4)}
         AS mean_tokens
FROM s GROUP BY split
"""
    d["w23_burstiness"] = f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts) ASC, event_id ASC) AS gap_us
  FROM events
  QUALIFY gap_us IS NOT NULL
), per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         avg(gap_us) AS mu, stddev_samp(gap_us) AS sd
  FROM gaps GROUP BY user_id
)
SELECT user_id, n_gaps,
       {W.round_half_up_sql("sd / mu", 4)} AS burstiness_cv
FROM per WHERE n_gaps >= 2
"""
