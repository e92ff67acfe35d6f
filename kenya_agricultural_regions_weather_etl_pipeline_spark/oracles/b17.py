"""Oracle family block 17: round-7 additions (BM25 lexical
retrieval, grouped weighted median, weighted-quantile stream).

Same contract as b01–b16: ``add(d, ns)`` only ADDS keys; ``ns`` is
the __spark_entry__ module for any name-scope bindings.
"""


def _bm25_sql(
    toks: str,
    rank_limit: int,
    corpus_pred: str = "doc_id >= 5",
    query_pred: str = "doc_id < 5",
) -> str:
    """Okapi BM25 ranked list to ``rank_limit`` — per-term score
    quantized to integer 1e-9 units before the per-(query, doc) fold
    (the x107 exactness discipline), identical double expression order
    on both engines. Shared by x120 (5) and x121's sparse leg (20);
    the corpus/query predicates are parameters (default emission
    byte-identical) so x129's post-erasure twin can exclude the
    deletion set."""
    return f"""
WITH toksc AS (
  SELECT doc_id, unnest({toks}) AS term
  FROM documents WHERE {corpus_pred}
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toksc GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
), dfc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_tok
  FROM dl
), qterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT doc_id AS query_id, unnest({toks}) AS term
    FROM documents WHERE {query_pred}
  )
), scored AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(floor(
           1000000000.0
           * ln(1.0 + (s.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75
                 * (dl.dl / (CAST(s.total_tok AS DOUBLE) / s.n_docs)))))
           + 0.5) AS BIGINT) AS s_units
  FROM qterms qt
  JOIN tf  ON tf.term = qt.term
  JOIN dfc ON dfc.term = qt.term
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
), agg AS (
  SELECT query_id, doc_id, CAST(sum(s_units) AS BIGINT) AS units
  FROM scored GROUP BY query_id, doc_id
), ranked AS (
  SELECT query_id, doc_id, units,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY units DESC, doc_id ASC) AS rank
  FROM agg
)
SELECT query_id, doc_id,
       (floor((units / 1000000000.0) * 1000000.0 + 0.5)
        / 1000000.0 + 0.0) AS bm25,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {rank_limit}
"""


def _hybrid_sql(
    toks: str,
    corpus_pred: str = "doc_id >= 5",
    query_pred: str = "doc_id < 5",
    dense_corpus_pred: str = "c.doc_id >= 5",
    dense_leg: str | None = None,
) -> str:
    """x121's full hybrid-RRF SQL, with the corpus/query predicates as
    parameters (default emission byte-identical to the r7 literal) —
    x129's post-erasure twin passes deletion-excluding predicates.

    ``dense_leg`` (ADVICE r8): the CTE segment between ``pooled`` and
    ``dense`` — everything that produces the per-(query, doc)
    ``dscored`` frame. Default is x121's exhaustive cross-scan; st38b
    (b18) injects its IVF cent/assigned/probes restriction here, so a
    future change to the sparse leg, pooling, fusion, or rounding
    conventions propagates to the pruned twin automatically instead of
    relying on the pytest equality law to catch a divergence. The
    segment must define ``dscored(query_id, doc_id, cos_sim)`` and
    start with ``, `` (it is spliced after the pooled CTE's ``)``)."""
    if dense_leg is None:
        dense_leg = f""", qd AS (
  SELECT doc_id AS query_id, pv AS qv FROM pooled WHERE {query_pred}
), dscored AS (
  SELECT qd.query_id, c.doc_id,
         (floor((list_dot_product(c.pv, qd.qv)
                 / (sqrt(list_dot_product(c.pv, c.pv))
                    * sqrt(list_dot_product(qd.qv, qd.qv))))
                * 1000000.0 + 0.5) / 1000000.0 + 0.0) AS cos_sim
  FROM pooled c CROSS JOIN qd
  WHERE {dense_corpus_pred} AND c.doc_id <> qd.query_id
)"""
    return f"""
WITH sparse AS (
  SELECT query_id, doc_id, rank AS rank_s
  FROM ({_bm25_sql(toks, 20, corpus_pred, query_pred).strip()}) s
), v AS (
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
){dense_leg}, dense AS (
  SELECT query_id, doc_id, rank_d FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, doc_id ASC)
               AS rank_d
    FROM dscored)
  WHERE rank_d <= 20
), fused AS (
  SELECT query_id, doc_id, rank_s, rank_d,
         (coalesce(1.0 / (60.0 + rank_s), 0.0)
          + coalesce(1.0 / (60.0 + rank_d), 0.0)) AS rrf
  FROM sparse FULL OUTER JOIN dense USING (query_id, doc_id)
)
SELECT query_id, doc_id,
       (floor(rrf * 1000000.0 + 0.5) / 1000000.0 + 0.0) AS rrf_score,
       CAST(rank AS INTEGER) AS rank,
       CAST(rank_s AS INTEGER) AS sparse_rank,
       CAST(rank_d AS INTEGER) AS dense_rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id ASC)
             AS rank
      FROM fused)
WHERE rank <= 10
"""


def add(d, ns):
    # Shared whitespace tokenizer twin (functions/text.py tokens():
    # split on \s+, drop empty strings) applied to lowercased text.
    toks = (
        "list_filter(regexp_split_to_array(lower(text), '\\s+'), "
        "t -> t <> '')"
    )

    d["x120_bm25_topk"] = _bm25_sql(toks, 5)

    # st37 drains to the batch x120 answer row-for-row (the st24==x93 /
    # st35==x117 pattern): one oracle covers the batch scorer and the
    # streamed index it serves from.
    d["st37_bm25_index_ingest"] = d["x120_bm25_topk"]

    # x121: reciprocal-rank fusion of BM25 top-20 (the sparse leg,
    # scoped subquery of the same builder) with the pooled bi-encoder
    # cosine top-20 (x115's int64 micro-grid pooling; rank on the 6-dp
    # half-up-rounded cosine so ordering is engine-independent). The
    # two reciprocal terms are added in a FIXED order (sparse + dense)
    # on identical doubles.
    d["x121_hybrid_rrf"] = _hybrid_sql(toks)

    # x122: positional-intersection phrase search — the index CTE is
    # the x102 layout at gram size 1; phrase = query tokens 2..4.
    d["x122_phrase_search"] = f"""
WITH idx AS (
  SELECT doc_id, pos, term FROM (
    SELECT doc_id,
           unnest({toks}) AS term,
           unnest(range(1, len({toks}) + 1)) AS pos
    FROM documents WHERE doc_id >= 5
  )
), ph AS (
  SELECT query_id, t[2] AS t1, t[3] AS t2, t[4] AS t3 FROM (
    SELECT doc_id AS query_id, {toks} AS t
    FROM documents WHERE doc_id < 5
  ) WHERE len(t) >= 4
), m1 AS (
  SELECT ph.query_id, idx.doc_id, idx.pos, ph.t2, ph.t3
  FROM idx JOIN ph ON idx.term = ph.t1
), m2 AS (
  SELECT m1.query_id, m1.doc_id, m1.pos, m1.t3
  FROM m1 JOIN idx i2
    ON i2.doc_id = m1.doc_id AND i2.pos = m1.pos + 1
   AND i2.term = m1.t2
), m3 AS (
  SELECT m2.query_id, m2.doc_id, m2.pos
  FROM m2 JOIN idx i3
    ON i3.doc_id = m2.doc_id AND i3.pos = m2.pos + 2
   AND i3.term = m2.t3
)
SELECT query_id, doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM m3 GROUP BY query_id, doc_id
"""

    # x123: PRF expansion — BM25 top-5 feedback (the same builder,
    # scoped), expansion terms voted by summed tf over feedback docs,
    # original query terms anti-joined away.
    d["x123_prf_expansion"] = f"""
WITH fb AS (
  SELECT query_id, doc_id FROM ({_bm25_sql(toks, 5).strip()}) b
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({toks}) AS term
        FROM documents WHERE doc_id >= 5)
  GROUP BY doc_id, term
), qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT doc_id AS query_id, unnest({toks}) AS term
    FROM documents WHERE doc_id < 5
  )
), cand AS (
  SELECT f.query_id, tf.term, CAST(sum(tf.tf) AS BIGINT) AS weight
  FROM fb f JOIN tf ON tf.doc_id = f.doc_id
  GROUP BY f.query_id, tf.term
), filt AS (
  SELECT c.query_id, c.term, c.weight
  FROM cand c LEFT JOIN qt
    ON qt.query_id = c.query_id AND qt.term = c.term
  WHERE qt.term IS NULL
)
SELECT query_id, term, weight, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY weight DESC, term ASC)
             AS rank
      FROM filt)
WHERE rank <= 10
"""

    # st38 drains to the batch x121 answer row-for-row (the st37==x120
    # pattern, hybrid edition): one oracle covers the fused ranker and
    # its serving deployment.
    d["st38_hybrid_serve_stream"] = d["x121_hybrid_rrf"]

    # st39: mm9's decode-replay CTE chain (b13) with the survivor
    # window on top — kept = the (asset, edition)-minimum of each
    # perceptual-hash group, n_suppressed = group size − 1.
    d["st39_media_dedup_ingest"] = """
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
), ranked AS (
  SELECT phash, a, ed,
         row_number() OVER (PARTITION BY phash
                            ORDER BY a ASC, ed ASC) AS rn,
         count(*) OVER (PARTITION BY phash) AS cnt
  FROM hashes
)
SELECT phash,
       CAST(a AS BIGINT) AS kept_asset,
       ed AS kept_edition,
       CAST(cnt - 1 AS BIGINT) AS n_suppressed
FROM ranked WHERE rn = 1
"""

    # x124: x116's grading tail over FOUR systems — the two dense
    # oracles (b15) plus the two r7 sparse/hybrid oracles, all cut to
    # depth 5 on the shared query set (bags doc_id < 2). r8: graded
    # on the derived GEOMETRIC gold (b15._geo_labels_sql) instead of
    # the geometry-independent stored labels.
    from .b15 import _geo_labels_sql

    d["x124_retrieval_quality_hybrid"] = f"""
WITH {_geo_labels_sql(ns.V)}, runs AS (
  SELECT query_doc, cand_doc, rank, 'late_interaction' AS system
  FROM ({d["x110_maxsim_retrieval"].strip()}) li
  UNION ALL
  SELECT query_doc, cand_doc, rank, 'pooled' AS system
  FROM ({d["x115_pooled_retrieval"].strip()}) po
  UNION ALL
  SELECT query_id AS query_doc, doc_id AS cand_doc, rank,
         'bm25' AS system
  FROM ({d["x120_bm25_topk"].strip()}) bm WHERE query_id < 2
  UNION ALL
  SELECT query_id AS query_doc, doc_id AS cand_doc, rank,
         'hybrid_rrf' AS system
  FROM ({d["x121_hybrid_rrf"].strip()}) hy
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

    # st40: the st39 image window UNION the mm10 audio-fingerprint
    # window, each tagged with its modality — one decode-replay SQL
    # per payload formula, the same kept/suppressed rule.
    d["st40_mixed_media_dedup_ingest"] = """
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
), ihashes AS (
  SELECT grays.a, grays.ed,
         CAST(sum(CASE WHEN 16 * g >= total
                       THEN 1 << (gi * 4 + gj) ELSE 0 END) AS BIGINT)
           AS fp
  FROM grays JOIN tot ON grays.a = tot.a AND grays.ed = tot.ed
  GROUP BY grays.a, grays.ed
), aud AS (
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
), ahashes AS (
  SELECT asset_id AS a, ed,
         CAST(coalesce(sum(CASE WHEN e_next > e THEN 1 << k ELSE 0 END), 0)
              AS BIGINT) AS fp
  FROM tagged WHERE k < 15 GROUP BY asset_id, ed
), allfp AS (
  SELECT 'image' AS media_type, a, ed, fp FROM ihashes
  UNION ALL
  SELECT 'audio' AS media_type, a, ed, fp FROM ahashes
), ranked AS (
  SELECT media_type, fp, a, ed,
         row_number() OVER (PARTITION BY media_type, fp
                            ORDER BY a ASC, ed ASC) AS rn,
         count(*) OVER (PARTITION BY media_type, fp) AS cnt
  FROM allfp
)
SELECT media_type, fp,
       CAST(a AS BIGINT) AS kept_asset,
       ed AS kept_edition,
       CAST(cnt - 1 AS BIGINT) AS n_suppressed
FROM ranked WHERE rn = 1
"""

    # x125: erasure propagation through the exact-dedup groups —
    # conditional min/count aggregates over the md5 fingerprint
    # groups, affected groups only.
    d["x125_erasure_propagation"] = """
WITH g AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END AS deleted
  FROM documents
), agg AS (
  SELECT fp,
         min(doc_id) AS old_canonical,
         min(CASE WHEN deleted = 0 THEN doc_id END) AS new_canonical,
         CAST(sum(deleted) AS BIGINT) AS n_deleted,
         CAST(sum(1 - deleted) AS BIGINT) AS n_remaining
  FROM g GROUP BY fp
)
SELECT fp, old_canonical, new_canonical,
       (new_canonical IS NOT NULL
        AND new_canonical <> old_canonical) AS canonical_changed,
       n_deleted, n_remaining
FROM agg WHERE n_deleted > 0
"""

    # x126: index repair for the same deletion set — delta-only df
    # decrement derived from the deleted docs' postings alone.
    d["x126_erasure_index_repair"] = f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
         CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END AS deleted
  FROM (SELECT doc_id, unnest({toks}) AS term
        FROM documents WHERE doc_id >= 5)
  GROUP BY doc_id, term
), dfc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS old_df FROM tf GROUP BY term
), delta AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS dropped_postings,
         CAST(sum(tf) AS BIGINT) AS dropped_tokens
  FROM tf WHERE deleted = 1 GROUP BY term
)
SELECT d.term, dfc.old_df,
       CAST(dfc.old_df - d.dropped_postings AS BIGINT) AS new_df,
       d.dropped_postings, d.dropped_tokens,
       (dfc.old_df = d.dropped_postings) AS term_vanishes
FROM delta d JOIN dfc ON dfc.term = d.term
"""

    # e2e_retrieval_eval: the three retrieval oracles composed as
    # scoped subqueries (the e2e_training_prep idiom) — left joins
    # keep queries whose phrase never occurs in the corpus.
    d["e2e_retrieval_eval"] = f"""
WITH top1 AS (
  SELECT query_id, doc_id AS top1_doc, rrf_score AS top1_rrf
  FROM ({d["x121_hybrid_rrf"].strip()}) h WHERE rank = 1
), exp1 AS (
  SELECT query_id, term AS top_expansion_term,
         weight AS expansion_weight
  FROM ({d["x123_prf_expansion"].strip()}) e WHERE rank = 1
), ph AS (
  SELECT query_id,
         CAST(count(*) AS BIGINT) AS n_phrase_docs,
         CAST(sum(n_matches) AS BIGINT) AS n_phrase_hits
  FROM ({d["x122_phrase_search"].strip()}) p
  GROUP BY query_id
)
SELECT t.query_id, t.top1_doc, t.top1_rrf,
       e.top_expansion_term, e.expansion_weight,
       CAST(coalesce(ph.n_phrase_docs, 0) AS BIGINT) AS n_phrase_docs,
       CAST(coalesce(ph.n_phrase_hits, 0) AS BIGINT) AS n_phrase_hits
FROM top1 t
LEFT JOIN exp1 e ON e.query_id = t.query_id
LEFT JOIN ph ON ph.query_id = t.query_id
"""

    # a24: per-group exact weighted median — a23's crossing rule with
    # a grouping dimension; everything integer until the output value.
    d["a24_grouped_weighted_median"] = """
WITH base AS (
  SELECT l_returnflag, l_extendedprice AS value,
         CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
  FROM lineitem
), ks AS (
  SELECT l_returnflag, w_total,
         greatest(1, CAST(ceil(0.5 * w_total) AS BIGINT)) AS wk
  FROM (SELECT l_returnflag, sum(w)::BIGINT AS w_total
        FROM base GROUP BY l_returnflag)
), ranked AS (
  SELECT l_returnflag, value, w,
         sum(w) OVER (PARTITION BY l_returnflag
                      ORDER BY value ASC, l_orderkey ASC,
                               l_linenumber ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum_w
  FROM base
)
SELECT r.l_returnflag,
       k.wk AS target_weight,
       k.w_total AS total_weight,
       r.value AS median_value
FROM ranked r JOIN ks k ON r.l_returnflag = k.l_returnflag
WHERE r.cum_w >= k.wk AND r.cum_w - r.w < k.wk
ORDER BY r.l_returnflag
"""

    # st36 drains to the batch a23 answer row-for-row (the st30==x102 /
    # st35==x117 pattern): one oracle covers the batch operator and
    # its streaming deployment.
    d["st36_weighted_quantile_stream"] = d["a23_weighted_quantiles"]
