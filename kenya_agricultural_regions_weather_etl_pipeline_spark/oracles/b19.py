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
