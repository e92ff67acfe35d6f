"""Oracle family block 18: round-8 additions (pruned hybrid serving).

Same contract as b01–b17: ``add(d, ns)`` only ADDS keys; ``ns`` is
the __spark_entry__ module for any name-scope bindings.
"""

from .b12 import _x86_graph_sql
from .b17 import _bm25_sql, _hybrid_sql


def add(d, ns):
    V = ns.V

    toks = (
        "list_filter(regexp_split_to_array(lower(text), '\\s+'), "
        "t -> t <> '')"
    )

    # st38b: x121's fusion with the dense leg IVF-RESTRICTED — the
    # x5d deterministic-codebook discipline lifted to pooled vectors:
    # codebook = pooled docs 0..15, every candidate (doc_id >= 5)
    # assigned to its nearest centroid (raw-double cosine, centroid_id
    # tiebreak — identical doubles on both engines, the x5d proof),
    # each query probes its 4 nearest cells, and only probed cells'
    # members are scored (6-dp half-up cosine, x121's dense ranking
    # convention). Sparse leg, pooling, RRF fuse, and rounding come
    # from b17's _hybrid_sql builder (ADVICE r8: only the dense-leg
    # CTE segment is specific to the pruned twin, so a future change
    # to x121's fusion conventions propagates here by construction).
    ivf_dense_leg = f""", cent AS (
  SELECT doc_id AS centroid_id, pv AS cent_vec
  FROM pooled WHERE doc_id < 16
), assigned AS (
  SELECT doc_id, pv, centroid_id AS cell FROM (
    SELECT c.doc_id, c.pv, cent.centroid_id,
           row_number() OVER (PARTITION BY c.doc_id
               ORDER BY {V.cosine_sql('c.pv', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM pooled c CROSS JOIN cent WHERE c.doc_id >= 5) WHERE rn = 1
), qd AS (
  SELECT doc_id AS query_id, pv AS qv FROM pooled WHERE doc_id < 5
), probes AS (
  SELECT query_id, qv, centroid_id AS cell FROM (
    SELECT qd.query_id, qd.qv, cent.centroid_id,
           row_number() OVER (PARTITION BY qd.query_id
               ORDER BY {V.cosine_sql('qd.qv', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM qd CROSS JOIN cent) WHERE rn <= 4
), dscored AS (
  SELECT p.query_id, a.doc_id,
         (floor({V.cosine_sql('a.pv', 'p.qv')}
                * 1000000.0 + 0.5) / 1000000.0 + 0.0) AS cos_sim
  FROM assigned a JOIN probes p USING (cell)
  WHERE a.doc_id <> p.query_id
)"""
    d["st38b_hybrid_serve_pruned"] = _hybrid_sql(
        toks, dense_leg=ivf_dense_leg
    )

    # x127: erasure repair of the IVF vector store — x5d's assignment
    # CTE (first-16 codebook, raw-double cosine, centroid_id tiebreak)
    # + the x126 join discipline: the deleted slice's per-cell counts
    # joined to the standing cell-size artifact (recomputed here as
    # its in-query stand-in). Deletion set = x125's doc rule lifted
    # through the bag convention (vec_id // 4).
    d["x127_erasure_cell_repair"] = f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT c.vec_id, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), sizes AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS old_members
  FROM assigned GROUP BY cell
), delta AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS dropped_vecs
  FROM assigned WHERE (vec_id // 4) % 17 = 3 GROUP BY cell
)
SELECT CAST(d.cell AS BIGINT) AS cell,
       s.old_members,
       CAST(s.old_members - d.dropped_vecs AS BIGINT) AS new_members,
       d.dropped_vecs,
       (s.old_members = d.dropped_vecs) AS cell_vanishes
FROM delta d JOIN sizes s USING (cell)
"""

    # x128: the x86 graph CTE (b12, the SAME graph the build/maintain/
    # ingest family shares) + the erasure audit tail — surviving
    # sources' dropped-neighbor counts from ONE nbr-keyed join against
    # the deletion set (delta-only), degrees from the edge list.
    d["x128_erasure_graph_repair"] = (
        _x86_graph_sql(ns.V)
        + """
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
)
SELECT d.src_id, deg.old_degree,
       CAST(deg.old_degree - d.n_dropped AS BIGINT) AS new_degree,
       d.n_dropped,
       (deg.old_degree - d.n_dropped < 5) AS needs_backfill
FROM dropped d JOIN deg ON deg.src_id = d.src_id
"""
    )

    # st41 drains to the batch x125 audit row-for-row (the st37==x120
    # pattern, erasure edition): one oracle covers the audit and its
    # streaming deployment.
    d["st41_erasure_request_stream"] = d["x125_erasure_propagation"]

    # st42 drains to the batch x126 audit row-for-row (same law, the
    # index artifact): one oracle for the audit and its deployment.
    d["st42_index_erasure_stream"] = d["x126_erasure_index_repair"]

    # st43 drains to the batch x127 audit row-for-row (same law, the
    # vector-store artifact): one oracle for the audit and its
    # deployment — the erasure triple is fully symmetric.
    d["st43_cell_erasure_stream"] = d["x127_erasure_cell_repair"]

    # x121b: the JOIN-pruned batch twin of st38b's directory-pruned
    # serving — identical rows, two physical strategies, one oracle
    # (the x5d/x5f pattern lifted to the hybrid ranker).
    d["x121b_hybrid_pruned"] = d["st38b_hybrid_serve_pruned"]

    # x130: x124's grading frame + the pruned hybrid as a fifth
    # system — labs CTE from b15, the five legs as scoped subqueries
    # (the pruned leg IS st38b's SQL).
    from .b15 import _geo_labels_sql

    d["x130_retrieval_quality_pruned"] = f"""
WITH {_geo_labels_sql(ns.V)}, runs AS (
  SELECT query_doc, cand_doc, rank, 'late_interaction' AS system
  FROM ({d["x110_maxsim_retrieval"].strip()}) li
  UNION ALL
  SELECT query_doc, cand_doc, rank, 'pooled' AS system
  FROM ({d["x115_pooled_retrieval"].strip()}) po
  UNION ALL
  SELECT query_id AS query_doc, doc_id AS cand_doc, rank,
         'bm25' AS system
  FROM ({d["x120_bm25_topk"].strip()}) bm
  WHERE query_id < 2 AND rank <= 5
  UNION ALL
  SELECT query_id AS query_doc, doc_id AS cand_doc, rank,
         'hybrid_rrf' AS system
  FROM ({d["x121_hybrid_rrf"].strip()}) hy
  WHERE query_id < 2 AND rank <= 5
  UNION ALL
  SELECT query_id AS query_doc, doc_id AS cand_doc, rank,
         'hybrid_pruned' AS system
  FROM ({d["st38b_hybrid_serve_pruned"].strip()}) hp
  WHERE query_id < 2 AND rank <= 5
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

    # x129: both hybrid runs from b17's parameterized builder — the
    # pre leg is byte-identical to x121's SQL, the post leg excludes
    # the deletion set from corpus, dense candidates, and queries —
    # full-outer-joined into the serving-delta frame.
    d["x129_post_erasure_serving"] = f"""
WITH oldrun AS (
  SELECT query_id, doc_id, rank AS old_rank
  FROM ({_hybrid_sql(toks).strip()}) o
), newrun AS (
  SELECT query_id, doc_id, rank AS new_rank
  FROM ({_hybrid_sql(
      toks,
      corpus_pred="doc_id >= 5 AND doc_id % 17 <> 3",
      query_pred="doc_id < 5 AND doc_id % 17 <> 3",
      dense_corpus_pred="c.doc_id >= 5 AND c.doc_id % 17 <> 3",
  ).strip()}) n
)
SELECT query_id, doc_id,
       CAST(old_rank AS INTEGER) AS old_rank,
       CAST(new_rank AS INTEGER) AS new_rank,
       CASE WHEN old_rank IS NOT NULL AND query_id % 17 = 3
              THEN 'query_erased'
            WHEN old_rank IS NOT NULL AND doc_id % 17 = 3
              THEN 'result_erased'
            WHEN old_rank IS NULL THEN 'entered'
            WHEN new_rank IS NULL THEN 'displaced'
            WHEN old_rank = new_rank THEN 'unchanged'
            ELSE 'moved' END AS status
FROM oldrun FULL OUTER JOIN newrun USING (query_id, doc_id)
"""

    # x131: the one-row erasure certificate — every audit's SQL as a
    # scoped subquery, aggregated to the counts a compliance filing
    # is made of; serving_clean proves the x129 guarantee by
    # measurement.
    d["x131_erasure_certificate"] = f"""
WITH reqs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs_requested
  FROM documents WHERE doc_id % 17 = 3
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups_repaired,
         CAST(coalesce(sum(CASE WHEN new_canonical IS NULL
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_groups_vanished
  FROM ({d["x125_erasure_propagation"].strip()}) ga
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms_repaired,
         CAST(coalesce(sum(CASE WHEN term_vanishes
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_terms_vanished
  FROM ({d["x126_erasure_index_repair"].strip()}) ta
), c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells_repaired,
         CAST(coalesce(sum(CASE WHEN cell_vanishes
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_cells_vanished
  FROM ({d["x127_erasure_cell_repair"].strip()}) ca
), gr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_graph_nodes_repaired,
         CAST(coalesce(sum(CASE WHEN needs_backfill
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_backfill_nodes
  FROM ({d["x128_erasure_graph_repair"].strip()}) gra
), sv AS (
  SELECT CAST(coalesce(sum(CASE WHEN new_rank IS NOT NULL
                                 AND (doc_id % 17 = 3
                                      OR query_id % 17 = 3)
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_serving_violations
  FROM ({d["x129_post_erasure_serving"].strip()}) sva
)
SELECT reqs.n_docs_requested,
       g.n_groups_repaired, g.n_groups_vanished,
       t.n_terms_repaired, t.n_terms_vanished,
       c.n_cells_repaired, c.n_cells_vanished,
       gr.n_graph_nodes_repaired, gr.n_backfill_nodes,
       sv.n_serving_violations,
       (sv.n_serving_violations = 0) AS serving_clean
FROM reqs, g, t, c, gr, sv
"""
