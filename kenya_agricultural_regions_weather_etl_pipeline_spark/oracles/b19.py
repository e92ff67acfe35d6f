"""Oracle family block 19: round-9 additions (streaming graph erasure
completing the erasure quartet, and backfill execution).

Same contract as b01–b18: ``add(d, ns)`` only ADDS keys; ``ns`` is
the __spark_entry__ module for any name-scope bindings.
"""

from .b12 import _x86_graph_sql


def add(d, ns):
    V = ns.V

    # st44 drains to the batch x128 audit row-for-row (the st41/st42/
    # st43 pattern, graph edition — one oracle covers the audit and
    # its streaming deployment, completing the symmetric quartet).
    d["st44_graph_erasure_stream"] = d["x128_erasure_graph_repair"]

    # x132: the backfill x128 flags, EXECUTED — flagged survivors
    # (post-drop degree < 5) take k − new_degree new neighbors from
    # their 2-hop surviving neighborhood (NN-descent's candidate
    # rule), ranked by the x86 cosine discipline (raw-double sim DESC,
    # candidate id ASC), existing/deleted neighbors anti-joined away
    # before scoring. Composes b12's graph CTE — the SAME graph the
    # build/maintain/serve/erase family shares.
    d["x132_graph_backfill_repair"] = (
        _x86_graph_sql(V)
        + f"""
, del AS (
  SELECT vec_id FROM embeddings WHERE (vec_id // 4) % 17 = 3
), dropped AS (
  SELECT g.src_id, CAST(count(*) AS BIGINT) AS n_dropped
  FROM graph g
  JOIN del ON g.nbr_id = del.vec_id
  LEFT JOIN del sd ON g.src_id = sd.vec_id
  WHERE sd.vec_id IS NULL
  GROUP BY g.src_id
), deg AS (
  SELECT src_id, CAST(count(*) AS BIGINT) AS old_degree
  FROM graph GROUP BY src_id
), nb AS (
  SELECT d.src_id,
         CAST(5 - (deg.old_degree - d.n_dropped) AS BIGINT) AS needed
  FROM dropped d JOIN deg ON deg.src_id = d.src_id
  WHERE deg.old_degree - d.n_dropped < 5
), sedges AS (
  SELECT g.src_id, g.nbr_id
  FROM graph g
  LEFT JOIN del d1 ON g.src_id = d1.vec_id
  LEFT JOIN del d2 ON g.nbr_id = d2.vec_id
  WHERE d1.vec_id IS NULL AND d2.vec_id IS NULL
), cand AS (
  SELECT DISTINCT e1.src_id, e2.nbr_id AS cand_id
  FROM nb
  JOIN sedges e1 ON e1.src_id = nb.src_id
  JOIN sedges e2 ON e2.src_id = e1.nbr_id
  LEFT JOIN sedges ex
    ON ex.src_id = e1.src_id AND ex.nbr_id = e2.nbr_id
  WHERE e2.nbr_id <> e1.src_id AND ex.src_id IS NULL
), cscored AS (
  SELECT cand.src_id, cand.cand_id,
         {V.cosine_sql('sv.cvec', 'cv.cvec')} AS sim
  FROM cand
  JOIN c sv ON sv.vec_id = cand.src_id
  JOIN c cv ON cv.vec_id = cand.cand_id
), cranked AS (
  SELECT src_id, cand_id, sim,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY sim DESC, cand_id ASC) AS fill_rank
  FROM cscored
)
SELECT r.src_id, r.cand_id AS new_nbr_id,
       round(r.sim, 6) AS backfill_sim,
       CAST(r.fill_rank AS INT) AS fill_rank
FROM cranked r JOIN nb ON nb.src_id = r.src_id
WHERE r.fill_rank <= nb.needed
"""
    )


    # x133: repair-vs-rebuild quality — the repaired adjacency
    # (surviving edges ∪ x132 fills) of each flagged node intersected
    # with a GROUND-TRUTH rebuild (the same x86 machinery over only
    # the surviving vectors — src_table parameterization of b12's
    # CTE; √N and the codebook re-derive from the filtered corpus).
    # Nested WITH scopes (each leg a parenthesized subquery) keep the
    # CTE names collision-free.
    _surv_table = (
        "(SELECT * FROM embeddings WHERE (vec_id // 4) % 17 <> 3)"
    )
    d["x133_repair_quality_audit"] = f"""
WITH audit AS (
  SELECT src_id
  FROM ({d["x128_erasure_graph_repair"].strip()}) a
  WHERE needs_backfill
), fills AS (
  SELECT src_id, new_nbr_id AS nbr_id
  FROM ({d["x132_graph_backfill_repair"].strip()}) f
), fullg AS (
  SELECT src_id, nbr_id
  FROM ({(_x86_graph_sql(V) + chr(10) + "SELECT src_id, nbr_id FROM graph").strip()}) g
), del AS (
  SELECT vec_id FROM embeddings WHERE (vec_id // 4) % 17 = 3
), surv AS (
  SELECT g.src_id, g.nbr_id
  FROM fullg g
  JOIN audit ON audit.src_id = g.src_id
  LEFT JOIN del d2 ON g.nbr_id = d2.vec_id
  WHERE d2.vec_id IS NULL
), repaired AS (
  SELECT src_id, nbr_id FROM surv
  UNION ALL
  SELECT src_id, nbr_id FROM fills
), rebuild AS (
  SELECT r.src_id, r.nbr_id
  FROM ({(_x86_graph_sql(V, src_table=_surv_table) + chr(10) + "SELECT src_id, nbr_id FROM graph").strip()}) r
  JOIN audit ON audit.src_id = r.src_id
), reb AS (
  SELECT src_id, CAST(count(*) AS BIGINT) AS n_rebuild
  FROM rebuild GROUP BY src_id
), rep AS (
  SELECT src_id, CAST(count(*) AS BIGINT) AS n_repaired
  FROM repaired GROUP BY src_id
), ov AS (
  SELECT p.src_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM repaired p JOIN rebuild r
    ON r.src_id = p.src_id AND r.nbr_id = p.nbr_id
  GROUP BY p.src_id
)
SELECT a.src_id,
       CAST(coalesce(rep.n_repaired, 0) AS BIGINT) AS n_repaired,
       reb.n_rebuild,
       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(coalesce(ov.n_overlap, 0)::DOUBLE / reb.n_rebuild, 6)
         AS repair_recall
FROM audit a
JOIN reb ON reb.src_id = a.src_id
LEFT JOIN rep ON rep.src_id = a.src_id
LEFT JOIN ov ON ov.src_id = a.src_id
"""

    # st45 drains to the batch x132 fills row-for-row (recompute-on-
    # touch converges to the full-deletion answer — the 2-hop locality
    # law): one oracle covers the backfill and its deployment.
    d["st45_backfill_stream"] = d["x132_graph_backfill_repair"]
