"""Oracle family block 16: assignments from x110b_maxsim_pruned.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    x110b_maxsim_pruned = ns.x110b_maxsim_pruned
    x117_containment_dedup = ns.x117_containment_dedup
    x118_l_diversity = ns.x118_l_diversity
    x119_t_closeness = ns.x119_t_closeness
    jacc_toks = (
        "list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), "
        "'\\s+', ' ', 'g')), ' '), t -> t <> '')"
    )

    d["x110b_maxsim_pruned"] = """
WITH v AS (
  SELECT CAST(vec_id // 4 AS BIGINT) AS doc_id, vec_id,
         embedding::DOUBLE[] AS v
  FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, doc_id, centroid_id AS cell FROM (
    SELECT c.vec_id, c.doc_id, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY (list_dot_product(c.v, cent_vec)
                         / (sqrt(list_dot_product(c.v, c.v))
                            * sqrt(list_dot_product(cent_vec, cent_vec))))
                        DESC, cent.centroid_id ASC) AS rn
    FROM v c CROSS JOIN cent) WHERE rn = 1
), qv AS (
  SELECT doc_id AS query_doc, vec_id AS qvid, v AS qv
  FROM v WHERE doc_id < 2
), probes AS (
  SELECT query_doc, qvid, centroid_id AS cell FROM (
    SELECT q.query_doc, q.qvid, cent.centroid_id,
           row_number() OVER (PARTITION BY q.qvid
               ORDER BY (list_dot_product(q.qv, cent_vec)
                         / (sqrt(list_dot_product(q.qv, q.qv))
                            * sqrt(list_dot_product(cent_vec, cent_vec))))
                        DESC, cent.centroid_id ASC) AS rn
    FROM qv q CROSS JOIN cent) WHERE rn <= 2
), cand AS (
  SELECT DISTINCT p.query_doc, a.doc_id AS cand_doc
  FROM probes p JOIN assigned a USING (cell)
  WHERE a.doc_id <> p.query_doc
), m AS (
  SELECT cd.query_doc, q.qvid, cd.cand_doc,
         max(list_dot_product(c.v, q.qv)
             / (sqrt(list_dot_product(c.v, c.v))
                * sqrt(list_dot_product(q.qv, q.qv)))) AS mx
  FROM cand cd
  JOIN v c ON c.doc_id = cd.cand_doc
  JOIN qv q ON q.query_doc = cd.query_doc
  GROUP BY cd.query_doc, q.qvid, cd.cand_doc
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
    d["x117_containment_dedup"] = f"""
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
), contain AS (
  SELECT id_a AS id_sub, id_b AS id_super,
         round(inter::DOUBLE / sa.n_sh, 6) AS containment
  FROM inter JOIN sizes sa ON sa.doc_id = id_a
  UNION ALL
  SELECT id_b AS id_sub, id_a AS id_super,
         round(inter::DOUBLE / sb.n_sh, 6) AS containment
  FROM inter JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_sub, id_super, containment FROM contain WHERE containment >= 0.5
"""
    d["x118_l_diversity"] = """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS group_size,
       CAST(count(DISTINCT CAST(least(4, greatest(0,
             floor((c_acctbal + 1000.0) / 2200.0))) AS INT)) AS BIGINT)
         AS l_distinct,
       (count(DISTINCT CAST(least(4, greatest(0,
             floor((c_acctbal + 1000.0) / 2200.0))) AS INT)) < 3)::INT
         AS at_risk
FROM customer GROUP BY c_nationkey, c_mktsegment
"""
    d["x119_t_closeness"] = """
WITH banded AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(least(4, greatest(0,
              floor((c_acctbal + 1000.0) / 2200.0))) AS INT) AS bal_band
  FROM customer
), grp AS (
  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n_g
  FROM banded GROUP BY 1, 2
), gbc AS (
  SELECT c_nationkey, c_mktsegment, bal_band, count(*)::BIGINT AS n_gb
  FROM banded GROUP BY 1, 2, 3
), gdist AS (
  SELECT bal_band, count(*)::BIGINT AS n_b FROM banded GROUP BY 1
), ttot AS (SELECT count(*)::BIGINT AS n_tot FROM banded
), grid AS (
  SELECT g.c_nationkey, g.c_mktsegment,
         CAST(b.range AS INT) AS bal_band, g.n_g, t.n_tot,
         coalesce(x.n_gb, 0)::BIGINT AS n_gb,
         coalesce(gl.n_b, 0)::BIGINT AS n_b
  FROM grp g CROSS JOIN range(0, 5) b CROSS JOIN ttot t
  LEFT JOIN gbc x ON x.c_nationkey = g.c_nationkey
                 AND x.c_mktsegment = g.c_mktsegment
                 AND x.bal_band = b.range
  LEFT JOIN gdist gl ON gl.bal_band = b.range
), terms AS (
  SELECT c_nationkey, c_mktsegment, n_g, n_tot, bal_band,
         abs(sum(n_gb) OVER w * n_tot - sum(n_b) OVER w * n_g) AS num
  FROM grid
  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY bal_band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT c_nationkey, c_mktsegment,
       CAST(any_value(n_g) AS BIGINT) AS group_size,
       round(sum(num)::DOUBLE
             / (4.0 * any_value(n_g) * any_value(n_tot)), 6) AS t_emd,
       (round(sum(num)::DOUBLE
              / (4.0 * any_value(n_g) * any_value(n_tot)), 6) > 0.2)::INT
         AS at_risk
FROM terms WHERE bal_band < 4
GROUP BY c_nationkey, c_mktsegment
"""
    # st35 composes x117's pair query as a scoped subquery (the x114
    # pattern): drop doc iff some SMALLER-id doc contains it at >= 0.5,
    # then roll up survivors per source — one oracle for the batch
    # detector and its streaming deployment.
    d["st35_containment_ingest"] = f"""
WITH pairs AS (
  SELECT id_sub, id_super, containment
  FROM ({d["x117_containment_dedup"].strip()}) AS p
), dropped AS (
  SELECT DISTINCT id_sub AS doc_id FROM pairs WHERE id_super < id_sub
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_survivors,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
GROUP BY source
"""
    d["a23_weighted_quantiles"] = """
WITH base AS (
  SELECT l_extendedprice AS value,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey, l_linenumber
  FROM lineitem
), ttot AS (
  SELECT sum(w)::BIGINT AS w_total FROM base
), ks AS (
  SELECT p, w_total,
         greatest(1, CAST(ceil(p * w_total) AS BIGINT)) AS wk
  FROM (VALUES (0.5), (0.9), (0.99)) AS ps(p) CROSS JOIN ttot
), ranked AS (
  SELECT value, w,
         sum(w) OVER (ORDER BY value ASC, l_orderkey ASC,
                      l_linenumber ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum_w
  FROM base
)
SELECT k.p,
       k.wk AS target_weight,
       k.w_total AS total_weight,
       r.value AS quantile_value
FROM ranked r JOIN ks k
  ON r.cum_w >= k.wk AND r.cum_w - r.w < k.wk
ORDER BY p
"""
