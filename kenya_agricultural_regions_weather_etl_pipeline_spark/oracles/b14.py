"""Oracle family block 14: assignments from st30_span_index_stream.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    SMP = ns.SMP
    T = ns.T
    W = ns.W
    a22_exact_quantiles_distributed = ns.a22_exact_quantiles_distributed
    agro1_growing_degree_days = ns.agro1_growing_degree_days
    e2e_weather_sim = ns.e2e_weather_sim
    io9_schema_evolution = ns.io9_schema_evolution
    mm10_audio_perceptual_dedup = ns.mm10_audio_perceptual_dedup
    mm11_video_perceptual_dedup = ns.mm11_video_perceptual_dedup
    st28_token_budget_stream = ns.st28_token_budget_stream
    st30_span_index_stream = ns.st30_span_index_stream
    st31_quantile_stream = ns.st31_quantile_stream
    x102_crossdoc_span_dedup = ns.x102_crossdoc_span_dedup
    x103_mixture_materializer = ns.x103_mixture_materializer
    x106_dedup_threshold_curve = ns.x106_dedup_threshold_curve
    x107_retrieval_ndcg = ns.x107_retrieval_ndcg
    x108_span_trimming = ns.x108_span_trimming
    x109_equidepth_histogram = ns.x109_equidepth_histogram
    x110_maxsim_retrieval = ns.x110_maxsim_retrieval
    jacc_toks = (
        "list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), "
        "'\\s+', ' ', 'g')), ' '), t -> t <> '')"
    )

    d["st30_span_index_stream"] = d["x102_crossdoc_span_dedup"]
    d["x108_span_trimming"] = """
WITH toked AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, i AS start,
         array_to_string(list_slice(t, i, i + 7), ' ') AS gram
  FROM toked, LATERAL unnest(generate_series(1, len(t) - 7)) AS g(i)
  WHERE len(t) >= 8
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), covered AS (
  SELECT DISTINCT doc_id, p
  FROM grams JOIN dup USING (gram),
       LATERAL unnest(generate_series(start, start + 7)) AS s(p)
), positions AS (
  SELECT doc_id, len(t) AS n_tokens, i AS pos, t[i] AS tok
  FROM toked, LATERAL unnest(generate_series(1, len(t))) AS g(i)
), kept AS (
  SELECT po.doc_id, po.pos, po.tok
  FROM positions po
  LEFT JOIN covered cv ON cv.doc_id = po.doc_id AND cv.p = po.pos
  WHERE cv.doc_id IS NULL
), rebuilt AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS kept_tokens,
         string_agg(tok, ' ' ORDER BY pos) AS trimmed
  FROM kept GROUP BY doc_id
)
SELECT td.doc_id,
       CAST(len(td.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       md5(COALESCE(r.trimmed, '')) AS trimmed_md5
FROM toked td LEFT JOIN rebuilt r USING (doc_id)
"""

    d["x106_dedup_threshold_curve"] = f"""
WITH toks AS (
  SELECT doc_id, {jacc_toks} AS l FROM documents
), sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
         ELSE list_transform(range(1, len(l) - 1),
                             i -> array_to_string(l[i:i+2], ' '))
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
), pairs AS (
  SELECT id_a, id_b,
         round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), 6) >= 0.2
), th AS (
  SELECT unnest([0.2, 0.3, 0.4, 0.5, 0.6]) AS t
), j AS (
  SELECT t, id_a, id_b FROM pairs, th WHERE jaccard >= t
), per AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_pairs FROM j GROUP BY t
), ids AS (
  SELECT t, CAST(count(DISTINCT id) AS BIGINT) AS n_docs_with_dup
  FROM (SELECT t, unnest([id_a, id_b]) AS id FROM j) GROUP BY t
)
SELECT t,
       CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(n_docs_with_dup, 0) AS BIGINT) AS n_docs_with_dup
FROM th LEFT JOIN per USING (t) LEFT JOIN ids USING (t) ORDER BY t
"""
    d["x107_retrieval_ndcg"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv, label FROM embeddings
), scored AS (
  SELECT q.query_id, q.qlabel, c.vec_id, c.label,
         list_dot_product(cv, qv)
           / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)))
           AS sim
  FROM c CROSS JOIN q
), ranked AS (
  SELECT query_id, qlabel, vec_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
), hits AS (
  SELECT query_id, qlabel, label,
         row_number() OVER (PARTITION BY query_id ORDER BY rank) AS p
  FROM ranked WHERE vec_id <> query_id AND rank <= 11
), gains AS (
  SELECT query_id, qlabel,
         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
         CAST(floor(1000000000.0 * ln(2.0) / ln(p + 1.0) + 0.5) AS BIGINT)
           AS w_units
  FROM hits WHERE p <= 10
), dcg AS (
  SELECT query_id, qlabel,
         CAST(sum(rel) AS BIGINT) AS n_rel_retrieved,
         CAST(sum(rel * w_units) AS BIGINT) AS dcg_units
  FROM gains GROUP BY query_id, qlabel
), lc AS (
  SELECT label, count(*) AS c FROM c GROUP BY label
), wtab AS (
  SELECT p,
         CAST(floor(1000000000.0 * ln(2.0) / ln(p + 1.0) + 0.5) AS BIGINT)
           AS w_units
  FROM (SELECT unnest(range(1, 11)) AS p)
), ideal AS (
  SELECT d.query_id, CAST(sum(w.w_units) AS BIGINT) AS idcg_units
  FROM dcg d JOIN lc ON lc.label = d.qlabel
  JOIN wtab w ON w.p <= least(10, lc.c - 1)
  GROUP BY d.query_id
)
SELECT d.query_id,
       CAST(d.qlabel AS INT) AS query_label,
       d.n_rel_retrieved,
       CASE WHEN COALESCE(i.idcg_units, 0) = 0 THEN 0.0
            ELSE {W.round_half_up_sql(
                "CAST(d.dcg_units AS DOUBLE) / i.idcg_units", 6)}
       END AS ndcg
FROM dcg d LEFT JOIN ideal i USING (query_id) ORDER BY d.query_id
"""
    # st28 admits the same prefix the batch window selects: positive
    # token counts make the cumulative strictly monotone, so streamed
    # admission == the global prefix-sum cutoff (integer-exact).
    d["st28_token_budget_stream"] = f"""
WITH scored AS (
  SELECT doc_id,
         CAST({T.token_count_sql('text')} AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT doc_id, n_tokens, cum_tokens FROM cum WHERE cum_tokens <= 10000
"""
    # x103: the oracle audits the materialized mixture CLOSED-FORM
    # (sum n_copies == exploded row count), proving planned == built.
    d["x103_mixture_materializer"] = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST({T.token_count_sql('text')} AS BIGINT) AS n_tok,
         {SMP.split_bucket_sql('text')} AS bucket
  FROM documents
), per_src AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS tokens_in
  FROM d GROUP BY source
), tot AS (
  SELECT CAST(sum(tokens_in) AS DOUBLE) AS _tot,
         sum(sqrt(CAST(tokens_in AS DOUBLE))) AS _z
  FROM per_src
), policy AS (
  SELECT source, tokens_in,
         sqrt(CAST(tokens_in AS DOUBLE)) / _z * _tot / tokens_in AS ef,
         CAST(floor(sqrt(CAST(tokens_in AS DOUBLE)) / _z * _tot + 0.5)
              AS BIGINT) AS target_tokens
  FROM per_src, tot
), cop AS (
  SELECT d.doc_id, d.source, d.n_tok, p.tokens_in, p.target_tokens,
         CAST(floor(ef) AS INT)
         + (CASE WHEN d.bucket < floor((ef - floor(ef)) * 1000.0 + 0.5)
                 THEN 1 ELSE 0 END) AS n_copies
  FROM d JOIN policy p USING (source)
)
SELECT source,
       CAST(max(tokens_in) AS BIGINT) AS tokens_in,
       CAST(max(target_tokens) AS BIGINT) AS target_tokens,
       CAST(count(DISTINCT CASE WHEN n_copies > 0 THEN doc_id END)
            AS BIGINT) AS n_docs_kept,
       CAST(sum(n_copies) AS BIGINT) AS n_rows_out,
       CAST(sum(n_copies * n_tok) AS BIGINT) AS tokens_out,
       {W.round_half_up_sql(
           "CAST(sum(n_copies * n_tok) AS BIGINT) / max(target_tokens)", 4
       )} AS achieved_ratio
FROM cop GROUP BY source HAVING sum(n_copies) > 0
"""
    # io9: the generation split + null-fill replayed closed-form from
    # the source table (gen1 predates the o_orderstatus column).
    d["io9_schema_evolution"] = """
WITH g AS (
  SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              THEN 1 ELSE 2 END AS gen,
         o_totalprice,
         CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
              THEN o_orderstatus END AS st
  FROM orders
)
SELECT CAST(gen AS INT) AS gen,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing_status,
       CAST(count(DISTINCT st) AS BIGINT) AS n_statuses,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM g GROUP BY gen
"""
    d["a22_exact_quantiles_distributed"] = """
WITH v AS (
  SELECT l_extendedprice AS value, l_orderkey, l_linenumber FROM lineitem
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows FROM v
), ks AS (
  SELECT p, n_rows,
         CAST(greatest(1, ceil(p * n_rows)) AS BIGINT) AS k
  FROM (SELECT unnest([0.5, 0.9, 0.99]) AS p), n
), r AS (
  SELECT value,
         row_number() OVER (ORDER BY value, l_orderkey, l_linenumber)
           AS rk
  FROM v
)
SELECT p, k AS rank_k, n_rows, value AS quantile_value
FROM ks JOIN r ON r.rk = ks.k ORDER BY p
"""
    # st31 drains to exactly the batch quantile result
    d["st31_quantile_stream"] = d["a22_exact_quantiles_distributed"]
    d["x109_equidepth_histogram"] = """
WITH v AS (
  SELECT l_extendedprice AS value, l_orderkey, l_linenumber FROM lineitem
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows FROM v
), ks AS (
  SELECT CAST(greatest(1, ceil(p * n_rows)) AS BIGINT) AS k
  FROM (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS p), n
), r AS (
  SELECT value,
         row_number() OVER (ORDER BY value, l_orderkey, l_linenumber) AS rk
  FROM v
), bounds AS (
  SELECT value AS boundary FROM ks JOIN r ON r.rk = ks.k
), binned AS (
  SELECT v.value, v.l_orderkey, v.l_linenumber,
         CAST(sum(CASE WHEN v.value > b.boundary THEN 1 ELSE 0 END)
              AS BIGINT) AS bin
  FROM v CROSS JOIN bounds b
  GROUP BY v.value, v.l_orderkey, v.l_linenumber
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM binned GROUP BY bin ORDER BY bin
"""
    # mm10: replay the synthetic sample formula, the 16-window energy
    # split (sample counts are multiples of 16, so i // (n//16) is the
    # exact window), the gain-2 edition (energies ×2), and the
    # sign-of-delta bit packing — all integer arithmetic.
    d["mm10_audio_perceptual_dedup"] = """
WITH aud AS (
  SELECT id AS asset_id, 512 + (id % 7) * 128 AS n
  FROM range(0, 64) t(id) WHERE id % 3 = 1
), sam AS (
  SELECT asset_id, n, unnest(range(0, n)) AS i FROM aud
), winsum AS (
  SELECT asset_id, least(i // (n // 16), 15) AS k,
         CAST(sum(abs(((asset_id * 7919 + i * 4409) % 9973) - 4986))
              AS BIGINT) AS e
  FROM sam GROUP BY asset_id, least(i // (n // 16), 15)
), eds AS (
  SELECT asset_id, 'orig' AS ed, k, e FROM winsum
  UNION ALL
  SELECT asset_id, 'gain2' AS ed, k, 2 * e FROM winsum
), tagged AS (
  SELECT asset_id, ed, k, e,
         lead(e) OVER (PARTITION BY asset_id, ed ORDER BY k) AS e_next
  FROM eds
), fp AS (
  SELECT asset_id, ed,
         CAST(coalesce(sum(CASE WHEN e_next > e THEN 1 << k ELSE 0 END), 0)
              AS BIGINT) AS afp
  FROM tagged WHERE k < 15 GROUP BY asset_id, ed
)
SELECT afp,
       CAST(count(*) AS BIGINT) AS n_editions,
       CAST(count(DISTINCT asset_id) AS BIGINT) AS n_assets,
       CAST(min(asset_id) AS BIGINT) AS canonical_asset
FROM fp GROUP BY afp ORDER BY afp
"""
    # mm11: replay the Y4M plane formula at the 4x4 grid reads
    # (3i, 4j), threshold, pack row-major, md5 the frame-ordered hash
    # sequence. The up2x edition's grid reads floor-compose to the SAME
    # source pixels (integer identity), so its fingerprint is this
    # arithmetic verbatim — the oracle replays both editions.
    d["mm11_video_perceptual_dedup"] = """
WITH vid AS (
  SELECT id AS asset_id, 2 + (id % 4) AS n_frames
  FROM range(0, 64) t(id) WHERE id % 3 = 2
), fr AS (
  SELECT asset_id, unnest(range(0, n_frames)) AS f FROM vid
), cell AS (
  SELECT asset_id, f, gi, gj,
         (asset_id * 3 + f * 7
          + ((gi * 12 // 4) * 16 + (gj * 16 // 4)) * 5) % 256 AS s
  FROM fr, LATERAL unnest(range(0, 4)) a(gi),
           LATERAL unnest(range(0, 4)) b(gj)
), tot AS (
  SELECT asset_id, f, CAST(sum(s) AS BIGINT) AS total
  FROM cell GROUP BY asset_id, f
), bits AS (
  SELECT c.asset_id, c.f,
         CAST(sum(CASE WHEN 16 * s >= total
                       THEN 1 << (gi * 4 + gj) ELSE 0 END) AS BIGINT)
           AS phash
  FROM cell c JOIN tot USING (asset_id, f)
  GROUP BY c.asset_id, c.f
), fp AS (
  SELECT asset_id,
         md5(string_agg(phash::VARCHAR, '-' ORDER BY f)) AS vfp
  FROM bits GROUP BY asset_id
), eds AS (
  SELECT asset_id, vfp FROM fp
  UNION ALL
  SELECT asset_id, vfp FROM fp
)
SELECT vfp,
       CAST(count(*) AS BIGINT) AS n_editions,
       CAST(count(DISTINCT asset_id) AS BIGINT) AS n_assets,
       CAST(min(asset_id) AS BIGINT) AS canonical_asset
FROM eds GROUP BY vfp ORDER BY vfp
"""
    # x110: same vec_id DIV 4 bagging, same per-query-vector max cosine
    # quantized to the int64 micro-grid before the cross-vector sum —
    # exact integer accumulation on both engines, one division at the end.
    d["x110_maxsim_retrieval"] = """
WITH v AS (
  SELECT CAST(vec_id // 4 AS BIGINT) AS doc_id, vec_id,
         embedding::DOUBLE[] AS v
  FROM embeddings
), q AS (
  SELECT doc_id AS query_doc, vec_id AS qvid, v AS qv
  FROM v WHERE doc_id < 2
), m AS (
  SELECT q.query_doc, q.qvid, c.doc_id AS cand_doc,
         max(list_dot_product(c.v, q.qv)
             / (sqrt(list_dot_product(c.v, c.v))
                * sqrt(list_dot_product(q.qv, q.qv)))) AS mx
  FROM v c CROSS JOIN q
  WHERE c.doc_id <> q.query_doc
  GROUP BY q.query_doc, q.qvid, c.doc_id
), s AS (
  SELECT query_doc, cand_doc,
         SUM(CAST(floor(mx * 1000000.0 + 0.5) AS BIGINT)) AS smq
  FROM m GROUP BY query_doc, cand_doc
)
SELECT query_doc, cand_doc,
       CAST(smq AS DOUBLE) / 1000000.0 AS maxsim,
       CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_doc
                                   ORDER BY smq DESC, cand_doc ASC) AS rank
      FROM s)
WHERE rank <= 5
"""
    # agro1: same pseudo-weather CTE as e2e_weather_sim, same integer
    # milli-degree GDD arithmetic — the running sum accumulates int64.
    d["agro1_growing_degree_days"] = """
WITH pseudo AS (
  SELECT 'R' || lpad((user_id % 15)::VARCHAR, 2, '0') AS region,
         round(-10 + (value - floor(value/70.0)*70.0), 2) AS temperature,
         CAST(ts AS DATE) AS date
  FROM events
), validated AS (
  SELECT * FROM pseudo WHERE temperature >= -5 AND temperature <= 50
), daily AS (
  SELECT region, date,
         CAST(floor(max(temperature) * 100.0 + 0.5) AS BIGINT) AS tmax_c,
         CAST(floor(min(temperature) * 100.0 + 0.5) AS BIGINT) AS tmin_c
  FROM validated GROUP BY region, date
), g AS (
  SELECT region, date,
         greatest(CAST(0 AS BIGINT),
                  least((tmax_c + tmin_c) * 5, CAST(30000 AS BIGINT))
                  - 10000) AS gdd_m
  FROM daily
)
SELECT region, strftime(date, '%Y-%m-%d') AS date,
       CAST(gdd_m AS DOUBLE) / 1000.0 AS gdd,
       CAST(sum(gdd_m) OVER (PARTITION BY region ORDER BY date)
            AS DOUBLE) / 1000.0 AS cum_gdd
FROM g
"""
    # agro2: same pseudo-rainfall, deci-mm integer day totals, islands
    # via epoch_day - row_number (int64 throughout).
