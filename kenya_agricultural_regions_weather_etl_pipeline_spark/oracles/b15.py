"""Oracle family block 15: assignments from agro2_dry_spells.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def _geo_labels_sql(V) -> str:
    """labs CTE chain (lv/lsums/lpooled/labs): GEOMETRY-correlated
    gold labels — each bag's pooled vector assigned to the nearest of
    the first-8 pooled docs (the x5d codebook on pooled vectors; twin
    of operators/retrieval.geometric_bag_labels). Shared by x116 (here)
    and x124 (b17)."""
    return f"""lv AS (
  SELECT CAST(vec_id // 4 AS BIGINT) AS doc_id,
         embedding::DOUBLE[] AS v
  FROM embeddings
), lsums AS (
  SELECT doc_id, pos,
         sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS sq,
         count(*) AS n
  FROM (SELECT doc_id, unnest(v) AS x,
               unnest(range(1, len(v) + 1)) AS pos
        FROM lv) e
  GROUP BY doc_id, pos
), lpooled AS (
  SELECT doc_id, list(p ORDER BY pos) AS pv
  FROM (SELECT doc_id, pos,
               CAST(sq AS DOUBLE) / n / 1000000.0 AS p
        FROM lsums) m
  GROUP BY doc_id
), labs AS (
  SELECT doc_id, CAST(centroid_id AS BIGINT) AS label FROM (
    SELECT p.doc_id, cent.centroid_id,
           row_number() OVER (PARTITION BY p.doc_id
               ORDER BY {V.cosine_sql('p.pv', 'cent.cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM lpooled p CROSS JOIN
         (SELECT doc_id AS centroid_id, pv AS cent_vec
          FROM lpooled WHERE doc_id < 8) cent
  ) WHERE rn = 1
)"""


def add(d, ns):
    agro1_growing_degree_days = ns.agro1_growing_degree_days
    agro2_dry_spells = ns.agro2_dry_spells
    agro3_reference_et0 = ns.agro3_reference_et0
    e2e_agro_report = ns.e2e_agro_report
    e2e_weather_sim = ns.e2e_weather_sim
    io11_snapshot_rollback = ns.io11_snapshot_rollback
    queries = ns.queries
    st32_maxsim_serve_stream = ns.st32_maxsim_serve_stream
    st33_late_data_audit = ns.st33_late_data_audit
    st34_unseen_mass_stream = ns.st34_unseen_mass_stream
    w25_cusum_drift = ns.w25_cusum_drift
    x110_maxsim_retrieval = ns.x110_maxsim_retrieval
    x111_source_quality_cutoff = ns.x111_source_quality_cutoff
    x112_embedding_anisotropy = ns.x112_embedding_anisotropy
    x113_unseen_mass = ns.x113_unseen_mass
    x114_split_leakage_audit = ns.x114_split_leakage_audit
    x115_pooled_retrieval = ns.x115_pooled_retrieval
    x116_retrieval_quality_compare = ns.x116_retrieval_quality_compare
    x2c_minhash_portable = ns.x2c_minhash_portable

    d["agro2_dry_spells"] = """
WITH pseudo AS (
  SELECT 'R' || lpad((user_id % 15)::VARCHAR, 2, '0') AS region,
         round(((value * 13.7) - floor((value * 13.7)/60.0)*60.0), 1)
           AS rainfall_1h,
         CAST(ts AS DATE) AS date
  FROM events
), daily AS (
  SELECT region, date,
         SUM(CAST(floor(rainfall_1h * 10.0 + 0.5) AS BIGINT)) AS rain_deci
  FROM pseudo GROUP BY region, date
), thresh AS (
  SELECT region, quantile_cont(rain_deci, 0.25) AS p25
  FROM daily GROUP BY region
), dry AS (
  SELECT d.region, d.date,
         date_diff('day', DATE '1970-01-01', d.date) AS epoch_day
  FROM daily d JOIN thresh t USING (region)
  WHERE d.rain_deci < t.p25
), islands AS (
  SELECT region, epoch_day,
         epoch_day - row_number() OVER (PARTITION BY region
                                        ORDER BY epoch_day) AS grp
  FROM dry
), spells AS (
  SELECT region, grp, CAST(count(*) AS BIGINT) AS spell_len
  FROM islands GROUP BY region, grp
)
SELECT region,
       CAST(sum(spell_len) AS BIGINT) AS n_dry_days,
       CAST(count(*) AS BIGINT) AS n_spells,
       CAST(max(spell_len) AS BIGINT) AS longest_spell,
       CAST(sum(spell_len) AS DOUBLE) / count(*) AS mean_spell
FROM spells GROUP BY region
"""
    # st32 drains to exactly the batch MaxSim result (one bag per
    # micro-batch; a bag's scores never read other queries)
    d["st32_maxsim_serve_stream"] = d["x110_maxsim_retrieval"]
    # io11: HEAD after rollback-to-v2 == the src0+src1 closed form;
    # version metadata are the known constants of the 4-commit script.
    d["io11_snapshot_rollback"] = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       CAST(4 AS INT) AS head_version,
       CAST(2 AS INT) AS restored_version
FROM documents
WHERE source IN ('src0', 'src1')
GROUP BY source
"""
    # x111: x7's exact score expression + per-source integer-rank
    # quartile cut (rn*4 <= n), learned cutoff = min selected score.
    d["x111_source_quality_cutoff"] = """
WITH scored AS (
  SELECT doc_id, source,
         round(0.4 * least(length(text)::DOUBLE/1000.0, 1.0)
               + 0.3 * (1.0 - length(regexp_replace(text,
                     '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                   / greatest(length(text)::DOUBLE, 1.0))
               + 0.3 * least((len(list_filter(list_filter(
                     regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> ''), t -> t IN ('the', 'and', 'of', 'to',
                     'in', 'is', 'with', 'for')))::DOUBLE
                   / greatest(len(list_filter(regexp_split_to_array(
                     lower(text), '\\s+'), t -> t <> '')), 1)) * 10.0,
                 1.0),
               6) AS q_score
  FROM documents
), ranked AS (
  SELECT doc_id, source, q_score,
         row_number() OVER (PARTITION BY source
                            ORDER BY q_score DESC, doc_id ASC) AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_docs
  FROM scored
), sel AS (
  SELECT source, q_score, n_docs, (rn * 4 <= n_docs) AS selected
  FROM ranked
)
SELECT source,
       max(n_docs) AS n_docs,
       CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       min(CASE WHEN selected THEN q_score END) AS cutoff_score,
       max(q_score) AS best_score,
       CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS DOUBLE)
         / max(n_docs) AS selection_rate
FROM sel GROUP BY source
"""
    # x112: unit-normalize, int64 micro-grid centroid (the lloyd
    # discipline), cosine-to-centroid quantized per vector before the
    # averaging sum — exact integer accumulation on both engines.
    d["x112_embedding_anisotropy"] = """
WITH v AS (
  SELECT label, vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[],
                               embedding::DOUBLE[])) AS nrm
  FROM embeddings
), unit AS (
  SELECT label, vec_id, list_transform(v, x -> x / nrm) AS u FROM v
), sums AS (
  SELECT label, pos,
         sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS sq,
         count(*) AS n
  FROM (SELECT label, unnest(u) AS x,
               unnest(range(1, len(u) + 1)) AS pos
        FROM unit) e
  GROUP BY label, pos
), mu AS (
  SELECT label, list(mu_i ORDER BY pos) AS mu
  FROM (SELECT label, pos, CAST(sq AS DOUBLE) / n / 1000000.0 AS mu_i
        FROM sums) m
  GROUP BY label
), mun AS (
  SELECT label, mu, sqrt(list_dot_product(mu, mu)) AS mu_nrm FROM mu
), scored AS (
  SELECT u.label, m.mu_nrm,
         CAST(floor(list_dot_product(u.u, m.mu) / m.mu_nrm
                    * 1000000.0 + 0.5) AS BIGINT) AS cq
  FROM unit u JOIN mun m USING (label)
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       (floor(max(mu_nrm) * 1000000.0 + 0.5) / 1000000.0 + 0.0)
         AS centroid_norm,
       CAST(sum(cq) AS DOUBLE) / count(*) / 1000000.0
         AS mean_cos_to_centroid
FROM scored GROUP BY label
"""
    # st33: the watermark replay closed-form, with the engine's REAL
    # one-extra-batch lag (verified empirically, the same lag st13's
    # two-sentinel flush exists for): the watermark FILTERING batch b
    # derives from data through batch b-2 — batch b-1's max event time
    # is folded in at its commit, which batch b's planning has already
    # passed. So batches 0 AND 1 always count; batch-2 rows count iff
    # window_end > max(ts over batch 0) - delay.
    d["st33_late_data_audit"] = """
WITH e AS (
  SELECT event_id, ts, event_id % 3 AS b FROM events
), wm0 AS (
  SELECT max(ts) - INTERVAL '121 hours' - INTERVAL '41 minutes' AS w
  FROM e WHERE b = 0
), acc AS (
  SELECT date_trunc('day', ts) AS ws FROM e WHERE b <= 1
  UNION ALL
  SELECT date_trunc('day', e.ts) FROM e, wm0
  WHERE e.b = 2
    AND date_trunc('day', e.ts) + INTERVAL '1 day' > wm0.w
)
SELECT strftime(ws, '%Y-%m-%d') AS window_day,
       CAST(count(*) AS BIGINT) AS n_events
FROM acc GROUP BY ws
"""
    # w25: the same prefix-sum/running-min CUSUM identity on the same
    # int64 cross-multiplied grid; windows replay the recurrence.
    d["w25_cusum_drift"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS xd
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), totals AS (
  SELECT event_type, SUM(xd) AS tot, CAST(count(*) AS BIGINT) AS nd
  FROM daily GROUP BY event_type
), d AS (
  SELECT daily.event_type, daily.day, totals.nd,
         SUM(xd) OVER (PARTITION BY daily.event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS p,
         CAST(row_number() OVER (PARTITION BY daily.event_type
                                 ORDER BY day) AS BIGINT) AS t,
         totals.tot
  FROM daily JOIN totals USING (event_type)
), c AS (
  SELECT event_type, day, nd, t,
         (nd * p - t * tot)
           - min(nd * p - t * tot)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS cusum_n
  FROM d
), pick AS (
  SELECT event_type, day, nd, cusum_n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cusum_n DESC, day ASC) AS rk,
         max(CASE WHEN t = nd THEN cusum_n END)
           OVER (PARTITION BY event_type) AS last_n
  FROM c
)
SELECT event_type,
       nd AS n_days,
       CAST(cusum_n AS DOUBLE) / nd / 1000.0 AS max_cusum,
       strftime(day, '%Y-%m-%d') AS onset_day,
       CAST(last_n AS DOUBLE) / nd / 1000.0 AS final_cusum
FROM pick WHERE rk = 1
"""
    # x113: same whitespace tokenizer as the x8/x13 family, integer
    # frequency-of-frequency rollup, one division per source.
    d["x113_unseen_mass"] = """
WITH toks AS (
  SELECT source, t AS term
  FROM (SELECT source,
               unnest(string_split_regex(lower(text), '\\s+')) AS t
        FROM documents)
  WHERE t <> ''
), tc AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, term
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n1_singletons,
       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n2_doubletons,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / sum(c)
         AS unseen_mass
FROM tc GROUP BY source
"""
    # x114: compose x2c's pair query (scoped as a subquery — its CTEs
    # stay inside the parens) with x11's split expression.
    d["x114_split_leakage_audit"] = (
        """
WITH s AS (
  SELECT doc_id,
         CASE WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 900
                THEN 'train'
              WHEN (('0x' || substr(md5(text), 1, 4))::INT % 1000) < 950
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       min(p.jaccard) AS min_jaccard,
       max(p.jaccard) AS max_jaccard
FROM ("""
        + d["x2c_minhash_portable"]
        + """) p
JOIN s sa ON sa.doc_id = p.id_a
JOIN s sb ON sb.doc_id = p.id_b
GROUP BY least(sa.split, sb.split), greatest(sa.split, sb.split)
"""
    )
    # st34 drains to exactly the batch coverage report (term counts are
    # additive across batch-disjoint documents; fof derived at drain)
    d["st34_unseen_mass_stream"] = d["x113_unseen_mass"]
    # e2e_agro_report: compose the agro1/agro2 oracles as scoped
    # subqueries + the e2e_weather_sim favorable-temp clause; verdict
    # CASE evaluates the UNrounded rate (as the Spark side does).
    d["e2e_agro_report"] = (
        """
WITH g AS (
  SELECT region,
         CAST(sum(CAST(floor(gdd * 1000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000.0 AS total_gdd
  FROM ("""
        + d["agro1_growing_degree_days"]
        + """) a1 GROUP BY region
), sp AS (
  SELECT region, n_dry_days, longest_spell FROM ("""
        + d["agro2_dry_spells"]
        + """) a2
), fav AS (
  SELECT region,
         CAST(sum(CASE WHEN temperature >= 18 AND temperature <= 28
                       THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
           AS favorable_rate
  FROM (
    SELECT 'R' || lpad((user_id % 15)::VARCHAR, 2, '0') AS region,
           round(-10 + (value - floor(value/70.0)*70.0), 2) AS temperature
    FROM events
  ) p
  WHERE temperature >= -5 AND temperature <= 50
  GROUP BY region
)
SELECT g.region, g.total_gdd, sp.n_dry_days, sp.longest_spell,
       (floor(fav.favorable_rate * 1000000.0 + 0.5) / 1000000.0 + 0.0)
         AS favorable_rate,
       CASE WHEN fav.favorable_rate >= 0.2 AND sp.longest_spell <= 3
              THEN 'plant'
            WHEN sp.longest_spell >= 5 THEN 'drought_risk'
            ELSE 'monitor' END AS verdict
FROM g JOIN sp USING (region) JOIN fav USING (region)
"""
    )
    # x115: int64-grid mean pooling (the x112 centroid discipline) +
    # x5's cosine/rank tail on the pooled table.
    d["x115_pooled_retrieval"] = """
WITH v AS (
  SELECT CAST(vec_id // 4 AS BIGINT) AS doc_id,
         embedding::DOUBLE[] AS v
  FROM embeddings
), sums AS (
  SELECT doc_id, pos,
         sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS sq,
         count(*) AS n
  FROM (SELECT doc_id, unnest(v) AS x,
               unnest(range(1, len(v) + 1)) AS pos
        FROM v) e
  GROUP BY doc_id, pos
), pooled AS (
  SELECT doc_id, list(p ORDER BY pos) AS pv
  FROM (SELECT doc_id, pos,
               CAST(sq AS DOUBLE) / n / 1000000.0 AS p
        FROM sums) m
  GROUP BY doc_id
), q AS (
  SELECT doc_id AS query_doc, pv AS qv FROM pooled WHERE doc_id < 2
), scored AS (
  SELECT q.query_doc, c.doc_id AS cand_doc,
         round(list_dot_product(c.pv, q.qv)
               / (sqrt(list_dot_product(c.pv, c.pv))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
  FROM pooled c CROSS JOIN q
  WHERE c.doc_id <> q.query_doc
)
SELECT query_doc, cand_doc, cos_sim, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_doc
                                   ORDER BY cos_sim DESC, cand_doc ASC)
               AS rank
      FROM scored)
WHERE rank <= 5
"""
    # x116: union the two retrieval oracles (scoped subqueries), grade
    # by GEOMETRIC label consistency (r8: derived pooled-cell gold —
    # the stored label column is geometry-independent and graded at
    # chance), integer hit counts.
    d["x116_retrieval_quality_compare"] = (
        "\nWITH "
        + _geo_labels_sql(ns.V)
        + """, runs AS (
  SELECT query_doc, cand_doc, rank, 'late_interaction' AS system
  FROM ("""
        + d["x110_maxsim_retrieval"]
        + """) li
  UNION ALL
  SELECT query_doc, cand_doc, rank, 'pooled' AS system
  FROM ("""
        + d["x115_pooled_retrieval"]
        + """) po
), hits AS (
  SELECT r.system, r.query_doc, r.rank,
         CASE WHEN ql.label = cl.label THEN 1 ELSE 0 END AS hit
  FROM runs r
  JOIN labs ql ON ql.doc_id = r.query_doc
  JOIN labs cl ON cl.doc_id = r.cand_doc
)
SELECT system,
       CAST(count(DISTINCT query_doc) AS BIGINT) AS n_queries,
       CAST(sum(hit) AS BIGINT) AS n_hits,
       CAST(sum(CASE WHEN rank = 1 THEN hit ELSE 0 END) AS BIGINT)
         AS hits_at_1,
       CAST(sum(hit) AS DOUBLE) / count(*) AS precision_at_5
FROM hits GROUP BY system
"""
    )
    # agro3: same centi-int daily extremes, identical Hargreaves
    # product chain, 1e-6 quantize before the monthly sum.
    d["agro3_reference_et0"] = """
WITH pseudo AS (
  SELECT 'R' || lpad((user_id % 15)::VARCHAR, 2, '0') AS region,
         CAST(user_id % 15 AS BIGINT) AS ridx,
         round(-10 + (value - floor(value/70.0)*70.0), 2) AS temperature,
         CAST(ts AS DATE) AS date
  FROM events
), validated AS (
  SELECT * FROM pseudo WHERE temperature >= -5 AND temperature <= 50
), daily AS (
  SELECT region, ridx, date,
         CAST(floor(max(temperature) * 100.0 + 0.5) AS BIGINT) AS tmax_c,
         CAST(floor(min(temperature) * 100.0 + 0.5) AS BIGINT) AS tmin_c
  FROM validated GROUP BY region, ridx, date
), et AS (
  SELECT region, date,
         CAST(floor(
           0.0023 * (20.0 + CAST(ridx % 10 AS DOUBLE))
                  * (CAST(tmax_c + tmin_c AS DOUBLE) / 200.0 + 17.8)
                  * sqrt(CAST(tmax_c - tmin_c AS DOUBLE) / 100.0)
           * 1000000.0 + 0.5) AS BIGINT) AS et0_q
  FROM daily
)
SELECT region, strftime(date, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(et0_q) AS DOUBLE) / count(*) / 1000000.0 AS mean_et0,
       CAST(sum(et0_q) AS DOUBLE) / 1000000.0 AS total_et0
FROM et GROUP BY region, strftime(date, '%Y-%m')
"""
    # x110b: x5d's deterministic IVF replay (first-16 codebook, top-2
    # probes per query vector) gates WHICH docs score; the MaxSim tail
    # is x110's verbatim, restricted to candidate pairs.
