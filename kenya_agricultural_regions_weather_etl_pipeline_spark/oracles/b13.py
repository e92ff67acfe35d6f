"""Oracle family block 13: assignments from io6_compaction_plan.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    F = ns.F
    IO6_TARGET_ROWS = ns.IO6_TARGET_ROWS
    LA = ns.LA
    T = ns.T
    V = ns.V
    W = ns.W
    a20_data_contract = ns.a20_data_contract
    a21_drift_psi = ns.a21_drift_psi
    io10_compaction_execute = ns.io10_compaction_execute
    io6_compaction_plan = ns.io6_compaction_plan
    mm9_perceptual_dedup = ns.mm9_perceptual_dedup
    st25_bpe_stats_stream = ns.st25_bpe_stats_stream
    st26_contract_stream = ns.st26_contract_stream
    st27_drift_stream = ns.st27_drift_stream
    st29_nb_deploy_stream = ns.st29_nb_deploy_stream
    x100_nb_quality_classifier = ns.x100_nb_quality_classifier
    x101_temperature_mixture = ns.x101_temperature_mixture
    x102_crossdoc_span_dedup = ns.x102_crossdoc_span_dedup
    x104_classifier_calibration = ns.x104_classifier_calibration
    x87_bpe_pair_counts = ns.x87_bpe_pair_counts
    x89_zorder_locality = ns.x89_zorder_locality
    x91_cell_occupancy = ns.x91_cell_occupancy

    d["io6_compaction_plan"] = f"""
WITH inv AS (
  SELECT CAST(l_shipdate AS DATE) AS f_date,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
), planned AS (
  SELECT f_date, n_rows,
         COALESCE(sum(n_rows) OVER (ORDER BY f_date
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM inv
)
SELECT CAST(cum_before // {IO6_TARGET_ROWS} AS BIGINT) AS file_group,
       CAST(count(*) AS BIGINT) AS n_input_files,
       CAST(sum(n_rows) AS BIGINT) AS total_rows,
       strftime(min(f_date), '%Y-%m-%d') AS first_date,
       strftime(max(f_date), '%Y-%m-%d') AS last_date
FROM planned GROUP BY 1
"""
    d["io10_compaction_execute"] = f"""
WITH inv AS (
  SELECT CAST(l_shipdate AS DATE) AS f_date,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
), planned AS (
  SELECT f_date,
         CAST(COALESCE(sum(n_rows) OVER (ORDER BY f_date
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {IO6_TARGET_ROWS} AS BIGINT) AS file_group
  FROM inv
), rows_g AS (
  SELECT p.file_group, l.l_orderkey, l.l_linenumber, p.f_date
  FROM lineitem l JOIN planned p ON CAST(l.l_shipdate AS DATE) = p.f_date
)
SELECT file_group,
       CAST(count(*) AS BIGINT) AS total_rows,
       CAST(count(DISTINCT f_date) AS BIGINT) AS n_input_files,
       CAST(sum((7919 * l_orderkey + l_linenumber) % 1000000007)
            % 1000000007 AS BIGINT) AS fingerprint
FROM rows_g GROUP BY file_group ORDER BY file_group
"""
    d["x91_cell_occupancy"] = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM embeddings
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(ceil(sqrt(count(*))) AS BIGINT) AS nc
  FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < (SELECT nc FROM nn)
), assigned AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT e.vec_id, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {V.cosine_sql('cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1
), cells AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS occ FROM assigned GROUP BY cell
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_occupied,
         min(occ) AS occ_min, max(occ) AS occ_max,
         sum(CAST(floor(CAST(occ AS DOUBLE) * ln(CAST(occ AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT)) AS _qsum
  FROM cells
)
SELECT (SELECT nc FROM nn) AS n_centroids,
       n_occupied, occ_min, occ_max,
       {W.round_half_up_sql(
           "CAST(occ_max AS DOUBLE) / (CAST((SELECT n FROM nn) AS DOUBLE)"
           " / CAST((SELECT nc FROM nn) AS DOUBLE))", 6)} AS hotspot_factor,
       {W.round_half_up_sql(
           "ln(CAST((SELECT n FROM nn) AS DOUBLE))"
           " - (CAST(_qsum AS DOUBLE) / 1000000.0)"
           " / CAST((SELECT n FROM nn) AS DOUBLE)", 6)} AS entropy_nats
FROM agg
"""
    d["x89_zorder_locality"] = f"""
WITH base AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h
  FROM events
), stats AS (
  SELECT min(u) AS umin, max(u) AS umax,
         min(h) AS hmin, max(h) AS hmax
  FROM base
), nrm AS (
  SELECT u, h,
         ((u - umin) * 65536) // (umax - umin + 1) AS un,
         ((h - hmin) * 65536) // (hmax - hmin + 1) AS hn
  FROM base CROSS JOIN stats
), z AS (
  SELECT u, h, {LA.zorder_key_sql('un', 'hn', 16)} AS zval FROM nrm
)
SELECT CAST(zval >> 26 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       min(u) AS u_min, max(u) AS u_max,
       min(h) AS h_min, max(h) AS h_max
FROM z GROUP BY 1
"""
    d["x87_bpe_pair_counts"] = """
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wf FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS w
    FROM documents)
  GROUP BY w
), pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair, wf
  FROM words, LATERAL unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
)
SELECT pair, CAST(sum(wf) AS BIGINT) AS pair_count
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT 50
"""
    # st25 folds x87's pair-count monoid per batch — drained top-50
    # == the batch statistic exactly
    d["st25_bpe_stats_stream"] = d["x87_bpe_pair_counts"]
    d["a20_data_contract"] = """
WITH wide AS (
  SELECT count(*) AS _n,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS _null_key,
         count(DISTINCT o_orderkey) AS _nd_key,
         sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
                  THEN 1 ELSE 0 END) AS _range_price,
         sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS _bad_status,
         sum(CASE WHEN o_orderdate < DATE '1992-01-01'
                    OR o_orderdate > DATE '1998-12-31'
                  THEN 1 ELSE 0 END) AS _bad_date
  FROM orders
), orph AS (
  SELECT count(*) AS _orphans FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), rows_ AS (
  SELECT 'not_null' AS expectation, 'o_orderkey' AS target,
         CAST(_null_key AS BIGINT) AS violations FROM wide
  UNION ALL
  SELECT 'unique', 'o_orderkey', CAST(_n - _nd_key AS BIGINT) FROM wide
  UNION ALL
  SELECT 'range_0_1m', 'o_totalprice', CAST(_range_price AS BIGINT) FROM wide
  UNION ALL
  SELECT 'allowed_values', 'o_orderstatus', CAST(_bad_status AS BIGINT) FROM wide
  UNION ALL
  SELECT 'date_bounds', 'o_orderdate', CAST(_bad_date AS BIGINT) FROM wide
  UNION ALL
  SELECT 'ref_integrity', 'o_custkey', CAST(_orphans AS BIGINT) FROM orph
)
SELECT expectation, target, violations, (violations = 0) AS passed FROM rows_
"""
    # st26 folds the same contract per arriving micro-batch — drained
    # scoreboard == the batch contract exactly (one oracle for both)
    d["st26_contract_stream"] = d["a20_data_contract"]
    d["x101_temperature_mixture"] = f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({T.token_count_sql('text')}) AS BIGINT) AS tokens_in
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(tokens_in) AS DOUBLE) AS _tot,
         sum(sqrt(CAST(tokens_in AS DOUBLE))) AS _z
  FROM per_src
)
SELECT source, n_docs, tokens_in,
       {W.round_half_up_sql('CAST(tokens_in AS DOUBLE) / _tot', 6)}
         AS share_in,
       {W.round_half_up_sql('sqrt(CAST(tokens_in AS DOUBLE)) / _z', 6)}
         AS weight,
       {W.round_half_up_sql(
           'sqrt(CAST(tokens_in AS DOUBLE)) / _z * _tot'
           ' / CAST(tokens_in AS DOUBLE)', 4)} AS epoch_factor,
       CAST(floor(sqrt(CAST(tokens_in AS DOUBLE)) / _z * _tot + 0.5)
            AS BIGINT) AS target_tokens
FROM per_src CROSS JOIN tot
ORDER BY source
"""
    d["a21_drift_psi"] = f"""
WITH binned AS (
  SELECT (source = 'src0') AS is_cur,
         LEAST(CAST(floor(n_chars / 64.0) AS INT), 15) AS chars_bin,
         LEAST(CAST(floor(({T.token_count_sql('text')}) / 16.0) AS INT),
               15) AS tok_bin
  FROM documents
), longf AS (
  SELECT is_cur, 'n_chars' AS metric, chars_bin AS bin FROM binned
  UNION ALL
  SELECT is_cur, 'n_tokens' AS metric, tok_bin AS bin FROM binned
), counts AS (
  SELECT metric, bin,
         CAST(sum(CASE WHEN NOT is_cur THEN 1 ELSE 0 END) AS BIGINT)
           AS c_ref,
         CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT)
           AS c_cur
  FROM longf GROUP BY metric, bin
), grid AS (
  SELECT m.metric, CAST(g.range AS INT) AS bin
  FROM (SELECT 'n_chars' AS metric UNION ALL SELECT 'n_tokens') m
  CROSS JOIN range(0, 16) g
), dense AS (
  SELECT grid.metric, grid.bin,
         COALESCE(counts.c_ref, 0) AS c_ref,
         COALESCE(counts.c_cur, 0) AS c_cur
  FROM grid LEFT JOIN counts
    ON grid.metric = counts.metric AND grid.bin = counts.bin
), tot AS (
  SELECT metric, CAST(sum(c_ref) AS BIGINT) AS n_ref,
         CAST(sum(c_cur) AS BIGINT) AS n_cur
  FROM dense GROUP BY metric
), terms AS (
  SELECT dense.metric, tot.n_ref, tot.n_cur,
         CAST(floor(
           ((c_cur + 0.5) / (n_cur + 8.0) - (c_ref + 0.5) / (n_ref + 8.0))
           * ln(((c_cur + 0.5) / (n_cur + 8.0))
                / ((c_ref + 0.5) / (n_ref + 8.0)))
           * 100000000.0 + 0.5) AS BIGINT) AS term_q
  FROM dense JOIN tot ON dense.metric = tot.metric
), psi AS (
  SELECT metric, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
         {W.round_half_up_sql(
             'CAST(sum(term_q) AS DOUBLE) / 100000000.0', 6)} AS psi
  FROM terms GROUP BY metric
)
SELECT metric, n_ref, n_cur, psi, (psi > 0.2) AS drifted
FROM psi ORDER BY metric
"""
    # mm9: the oracle replays decode → resize → 4×4 sample → threshold
    # in pure integer SQL from the synthetic pixel formula, computing
    # BOTH editions' sample coordinates independently (it would expose
    # a broken resize mapping rather than assume the invariance proof)
    d["mm9_perceptual_dedup"] = """
WITH assets AS (
  SELECT range AS a, (8 + range % 5) AS w0, (6 + range % 4) AS h0
  FROM range(64) WHERE range % 3 = 0
), cells AS (
  SELECT a, ed.ed, gi.range AS gi, gj.range AS gj,
         CASE WHEN ed.ed = 'orig' THEN (gj.range * w0) // 4
              ELSE (((gj.range * 16) // 4) * w0) // 16 END AS sx,
         CASE WHEN ed.ed = 'orig' THEN (gi.range * h0) // 4
              ELSE (((gi.range * 12) // 4) * h0) // 12 END AS sy
  FROM assets,
       (SELECT 'orig' AS ed UNION ALL SELECT 'up16') ed,
       range(4) gi, range(4) gj
), grays AS (
  SELECT a, ed, gi, gj,
         (((a*7 + sx*13 + sy*31) % 256)
          + ((a*11 + sx*17 + sy*5) % 256)
          + ((a*3 + sx*29 + sy*23) % 256)) // 3 AS g
  FROM cells
), tot AS (
  SELECT a, ed, sum(g) AS total FROM grays GROUP BY a, ed
), hashes AS (
  SELECT grays.a, grays.ed,
         CAST(sum(CASE WHEN 16 * g >= total
                       THEN 1 << (gi * 4 + gj) ELSE 0 END) AS BIGINT)
           AS phash
  FROM grays JOIN tot ON grays.a = tot.a AND grays.ed = tot.ed
  GROUP BY grays.a, grays.ed
)
SELECT phash, CAST(count(*) AS BIGINT) AS n_editions,
       CAST(count(DISTINCT a) AS BIGINT) AS n_assets,
       CAST(min(a) AS BIGINT) AS canonical_asset
FROM hashes GROUP BY phash ORDER BY phash
"""
    # st27 folds a21's (metric, bin) count monoid per arriving batch —
    # the drained scoreboard equals the batch monitor exactly
    d["st27_drift_stream"] = d["a21_drift_psi"]
    # Shared NB train+score CTE chain (x100 scores, x104 calibrates)
    nb_cte = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_pos,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
), toks AS (
  SELECT doc_id, is_pos, unnest(toks) AS term FROM base
), tc AS (
  SELECT term,
         CAST(sum(is_pos) AS BIGINT) AS c_pos,
         CAST(sum(1 - is_pos) AS BIGINT) AS c_neg
  FROM toks GROUP BY term
), tot AS (
  SELECT CAST(sum(c_pos) AS BIGINT) AS n_pos,
         CAST(sum(c_neg) AS BIGINT) AS n_neg,
         CAST(count(*) AS BIGINT) AS v
  FROM tc
), wts AS (
  SELECT term,
         CAST(floor((ln((c_pos + 1.0) / (n_pos + v))
                     - ln((c_neg + 1.0) / (n_neg + v)))
                    * 1000000.0 + 0.5) AS BIGINT) AS w_units
  FROM tc, tot
), prior AS (
  SELECT CAST(floor(ln((sum(is_pos) + 1.0)
                       / (count(*) - sum(is_pos) + 1.0))
                    * 1000000.0 + 0.5) AS BIGINT) AS prior_units
  FROM base
), scored AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(w_units) AS BIGINT) AS units
  FROM toks JOIN wts USING (term)
  GROUP BY doc_id
), scored_u AS (
  SELECT doc_id, n_tokens,
         CAST(units + prior_units AS BIGINT) AS units_total
  FROM scored, prior
)"""
    d["x100_nb_quality_classifier"] = nb_cte + """
SELECT doc_id, n_tokens,
       (CAST(units_total AS DOUBLE) / 1000000.0 + 0.0) AS nb_score,
       CAST(CASE WHEN units_total > 0 THEN 1 ELSE 0 END AS INT)
         AS predicted_pos
FROM scored_u
"""
    d["x104_classifier_calibration"] = nb_cte + f"""
, labs AS (
  SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_pos
  FROM documents
), ranked AS (
  SELECT s.doc_id, l.is_pos,
         row_number() OVER (ORDER BY s.units_total DESC, s.doc_id ASC)
           AS rn,
         count(*) OVER () AS n_all
  FROM scored_u s JOIN labs l USING (doc_id)
), per AS (
  SELECT ((rn - 1) * 10) // n_all AS decile,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(is_pos) AS BIGINT) AS n_pos
  FROM ranked GROUP BY 1
), ptot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS total_pos FROM per)
SELECT CAST(decile AS INT) AS decile, n_docs, n_pos,
       {W.round_half_up_sql("CAST(n_pos AS DOUBLE) / n_docs", 6)}
         AS precision_at,
       {W.round_half_up_sql(
           "CAST(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED "
           "PRECEDING AND CURRENT ROW) AS DOUBLE) / total_pos", 6
       )} AS cum_recall
FROM per, ptot
"""
    # st29 scores the replayed corpus under the frozen x100 model —
    # stateless per doc, so the drained union == batch x100 exactly
    d["st29_nb_deploy_stream"] = d["x100_nb_quality_classifier"]
    d["x102_crossdoc_span_dedup"] = f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, i AS start, array_to_string(list_slice(t, i, i + 7), ' ') AS gram
  FROM toked, LATERAL unnest(generate_series(1, len(t) - 7)) AS g(i)
  WHERE len(t) >= 8
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT doc_id, start FROM grams JOIN dup USING (gram)
), cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS covered_tokens FROM (
    SELECT DISTINCT doc_id, p
    FROM hits, LATERAL unnest(generate_series(start, start + 7)) AS s(p)
  ) GROUP BY doc_id
), dupg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
  FROM hits GROUP BY doc_id
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(covered_tokens, 0) AS BIGINT) AS covered_tokens,
       {W.round_half_up_sql(
           "CAST(COALESCE(covered_tokens, 0) AS DOUBLE) / len(t)", 6
       )} AS dup_fraction
FROM toked
LEFT JOIN cov USING (doc_id)
LEFT JOIN dupg USING (doc_id)
"""
    # st30 finalizes the streamed span index through the same census
    # tail — drained scoreboard == batch x102 exactly
