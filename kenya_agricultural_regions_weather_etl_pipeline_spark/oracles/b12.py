"""Oracle family block 12: assignments from st10_weather_stream.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def _x86_graph_sql(V, src_table: str = "embeddings") -> str:
    """The x86 kNN-graph CTE chain (c/nc/cent/assigned/probes/scored/
    graph) — √N deterministic codebook, 2-probe cells, top-5 per node.
    Module-level (r8) so b18's erasure-graph audit can compose the
    SAME graph the build/maintain/ingest family shares; the emitted
    SQL is byte-identical to the pre-r8 inline `_x86_graph`.
    ``src_table`` (r9) lets b19's x133 rebuild the graph over the
    SURVIVING subset (a parenthesized subquery) with the identical
    machinery — √N and the codebook then derive from the filtered
    corpus on both engines; default emission byte-identical."""
    return f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM {src_table}
), nc AS (
  SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS n FROM {src_table}
), cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
  FROM {src_table} WHERE vec_id < (SELECT n FROM nc)
), assigned AS (
  SELECT vec_id, cvec, centroid_id AS cell FROM (
    SELECT c.vec_id, c.cvec, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), probes AS (
  SELECT query_id, qvec, centroid_id AS cell FROM (
    SELECT c.vec_id AS query_id, c.cvec AS qvec, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('c.cvec', 'cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn <= 2
), scored AS (
  SELECT query_id, vec_id, {V.cosine_sql('cvec', 'qvec')} AS sim
  FROM assigned JOIN probes USING (cell)
  WHERE vec_id <> query_id
), graph AS (
  SELECT query_id AS src_id, vec_id AS nbr_id,
         round(sim, 6) AS cos_sim, CAST(rank AS INT) AS rank
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, vec_id ASC) AS rank
    FROM scored) WHERE rank <= 5
)"""


def add(d, ns):
    V = ns.V
    W = ns.W
    _e2e_pipeline_oracle = ns._e2e_pipeline_oracle
    _st10_oracle = ns._st10_oracle
    a19_join_skew_audit = ns.a19_join_skew_audit
    io7_export_manifest = ns.io7_export_manifest
    io8_sync_plan = ns.io8_sync_plan
    sql3_top_supplier_sql = ns.sql3_top_supplier_sql
    sql4_windowed_sql = ns.sql4_windowed_sql
    st10_weather_stream = ns.st10_weather_stream
    st11_weather_stream_etl = ns.st11_weather_stream_etl
    st12_dedup_ingest = ns.st12_dedup_ingest
    st21_knn_graph_ingest = ns.st21_knn_graph_ingest
    st23_export_manifest_stream = ns.st23_export_manifest_stream
    st24_graph_serve_stream = ns.st24_graph_serve_stream
    x86_knn_graph = ns.x86_knn_graph
    x86b_mutual_knn_edges = ns.x86b_mutual_knn_edges
    x88_nn_descent_round = ns.x88_nn_descent_round
    x90_pagerank_knn = ns.x90_pagerank_knn
    x92_incremental_knn_upsert = ns.x92_incremental_knn_upsert
    x93_graph_beam_search = ns.x93_graph_beam_search
    x94_hierarchical_ivf = ns.x94_hierarchical_ivf
    x95_refined_graph_search = ns.x95_refined_graph_search
    x96_lsh_parameter_plan = ns.x96_lsh_parameter_plan
    x97_bpe_merge_train = ns.x97_bpe_merge_train
    x98_graph_triangle_audit = ns.x98_graph_triangle_audit
    x99_bpe_fertility_trained = ns.x99_bpe_fertility_trained

    d["st10_weather_stream"] = _st10_oracle()
    # st11's merged table equals the batch pipeline output exactly
    d["st11_weather_stream_etl"] = _e2e_pipeline_oracle()
    d["st12_dedup_ingest"] = """
WITH d AS (
  SELECT doc_id, source, md5(text) AS fp FROM documents
), surv AS (
  SELECT fp, min(doc_id) AS doc_id FROM d GROUP BY fp
), s AS (
  SELECT d.source, d.doc_id FROM surv JOIN d USING (doc_id)
)
SELECT source, count(*) AS n_unique,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM s GROUP BY source
"""
    d["sql4_windowed_sql"] = """
SELECT n_name, c_custkey, spend, spend_rank
FROM (
  SELECT n.n_name, c.c_custkey,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
         rank() OVER (
           PARTITION BY n.n_name
           ORDER BY sum(CAST(o.o_totalprice AS DECIMAL(18,2))) DESC,
                    c.c_custkey ASC) AS spend_rank
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, c.c_custkey
)
WHERE spend_rank <= 3
"""
    d["sql3_top_supplier_sql"] = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS total_revenue
  FROM lineitem
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""
    # x86's graph CTE is shared verbatim by x86b so the symmetrization
    # oracle can never drift from the graph oracle. n_centroids =
    # ceil(sqrt(count(*))) replays the Spark-side sizing at any SF.
    _x86_graph = _x86_graph_sql(V)
    d["x86_knn_graph"] = _x86_graph + "\nSELECT * FROM graph"
    # the incremental upsert and the streaming ingest must equal the
    # batch rebuild exactly — one oracle, three physical strategies
    # (build vs maintain vs continuous ingest)
    d["x92_incremental_knn_upsert"] = d["x86_knn_graph"]
    d["st21_knn_graph_ingest"] = d["x86_knn_graph"]
    d["x86b_mutual_knn_edges"] = (
        _x86_graph
        + """
SELECT f.src_id AS id_a, f.nbr_id AS id_b, f.cos_sim
FROM graph f JOIN graph r
  ON f.src_id = r.nbr_id AND f.nbr_id = r.src_id
WHERE f.src_id < f.nbr_id
"""
    )
    d["x98_graph_triangle_audit"] = (
        _x86_graph
        + f"""
, me AS (
  SELECT f.src_id AS id_a, f.nbr_id AS id_b
  FROM graph f JOIN graph r
    ON f.src_id = r.nbr_id AND f.nbr_id = r.src_id
  WHERE f.src_id < f.nbr_id
), tri AS (
  SELECT 1 AS one
  FROM me e1
  JOIN me e2 ON e1.id_b = e2.id_a
  JOIN me e3 ON e1.id_a = e3.id_a AND e2.id_b = e3.id_b
), deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT id_a AS v FROM me UNION ALL SELECT id_b AS v FROM me)
  GROUP BY v
), tots AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM me) AS n_edges,
    (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
    (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges
)
SELECT n_edges, n_triangles, n_wedges,
       {W.round_half_up_sql(
           '3.0 * n_triangles / greatest(n_wedges, 1)', 6)} AS global_clustering
FROM tots
"""
    )
    # Beam search unrolled as CTEs over ANY edge-list CTE (x93 walks
    # the seed graph, x95 walks the NN-descent-refined one). Entry =
    # the query's own assigned cell (assignment rank-1 == probe
    # rank-1: identical ordering over the same codebook), then each
    # hop is two CTEs — candidates (beam ∪ graph neighbors, distinct)
    # and the re-scored top-10 beam. beam == k == 10, so the final
    # beam IS the answer.
    def _beam_search_sql(graph_cte: str) -> str:
        cos = V.cosine_sql("cc.cvec", "qa.qvec")
        s = f"""
, qa AS (
  SELECT vec_id AS query_id, cvec AS qvec, cell
  FROM assigned WHERE vec_id < 8
), b0 AS (
  SELECT query_id, node, sim FROM (
    SELECT qa.query_id, cc.vec_id AS node, {cos} AS sim,
           row_number() OVER (PARTITION BY qa.query_id
               ORDER BY {cos} DESC, cc.vec_id ASC) AS rn
    FROM qa JOIN assigned cc ON cc.cell = qa.cell) WHERE rn <= 10
)"""
        for h in range(1, 4):
            s += f"""
, c{h} AS (
  SELECT DISTINCT query_id, node FROM (
    SELECT query_id, node FROM b{h - 1}
    UNION ALL
    SELECT b.query_id, g.nbr_id AS node
    FROM b{h - 1} b JOIN {graph_cte} g ON b.node = g.src_id)
), b{h} AS (
  SELECT query_id, node, sim FROM (
    SELECT cd.query_id, cd.node, {cos} AS sim,
           row_number() OVER (PARTITION BY cd.query_id
               ORDER BY {cos} DESC, cd.node ASC) AS rn
    FROM c{h} cd JOIN c cc ON cc.vec_id = cd.node
                  JOIN qa ON qa.query_id = cd.query_id) WHERE rn <= 10
)"""
        return s + """
SELECT query_id, node AS vec_id, round(sim, 6) AS cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, node ASC) AS INT) AS rank
FROM b3
"""

    d["x93_graph_beam_search"] = _x86_graph + _beam_search_sql("graph")
    # x95: x88's one refinement round re-expressed as a CTE, then the
    # same beam walk over the refined edge list — one oracle covering
    # the full production chain build -> refine -> search
    _refined_cte = f"""
, bu AS (
  SELECT src_id, nbr_id FROM graph
  UNION
  SELECT nbr_id AS src_id, src_id AS nbr_id FROM graph
), rcand AS (
  SELECT g1.src_id AS src_id, g2.nbr_id AS cand_id
  FROM bu g1 JOIN bu g2 ON g1.nbr_id = g2.src_id
  WHERE g1.src_id <> g2.nbr_id
  UNION
  SELECT src_id, nbr_id AS cand_id FROM graph
), rsc AS (
  SELECT rcand.src_id, rcand.cand_id,
         {V.cosine_sql('e1.cvec', 'e2.cvec')} AS sim
  FROM rcand JOIN c e1 ON rcand.src_id = e1.vec_id
             JOIN c e2 ON rcand.cand_id = e2.vec_id
), refined AS (
  SELECT src_id, cand_id AS nbr_id
  FROM (
    SELECT *, row_number() OVER (PARTITION BY src_id
                                 ORDER BY sim DESC, cand_id ASC) AS rk
    FROM rsc) WHERE rk <= 5
)"""
    d["x95_refined_graph_search"] = (
        _x86_graph + _refined_cte + _beam_search_sql("refined")
    )
    # st24 serves the same query set by the same walk from deployed
    # state in streaming batches — drained union == the batch search
    d["st24_graph_serve_stream"] = d["x93_graph_beam_search"]
    # x96: pure 5-row planner math; rounding half-up 6dp absorbs any
    # cross-libm pow ulp
    _x96_ps = "".join(
        f""",
       {W.round_half_up_sql(
           f'1.0 - pow(1.0 - pow({s}, rows_per_band), n_bands)', 6)}
         AS p_at_{str(s).replace('.', '')}"""
        for s in (0.3, 0.5, 0.7, 0.9)
    )
    d["x96_lsh_parameter_plan"] = f"""
WITH plans AS (
  SELECT n_bands, CAST(16 / n_bands AS INT) AS rows_per_band
  FROM (VALUES (1), (2), (4), (8), (16)) AS t(n_bands)
), scored AS (
  SELECT n_bands, rows_per_band,
       {W.round_half_up_sql(
           'pow(1.0 / n_bands, n_bands / 16.0)', 6)} AS est_threshold{_x96_ps}
  FROM plans
)
SELECT n_bands, rows_per_band, est_threshold,
       p_at_03, p_at_05, p_at_07, p_at_09,
       (row_number() OVER (
          ORDER BY abs(est_threshold - 0.5) ASC, n_bands ASC) = 1)
         AS chosen
FROM scored
"""
    # x97: the BPE merge loop unrolled — round i's CTE trio (pair
    # counts p{i} over v{i-1}, arg-max rule b{i}, rewritten vocab
    # v{i}) chains off round i-1; the list_reduce fold is the same
    # string-encoded greedy rewrite operators/tokenizer.py runs, so
    # the full training trajectory replays, not just final counts
    _x97_round = """
, p{i} AS (
  SELECT pr.l AS l, pr.r AS r, CAST(sum(wf) AS BIGINT) AS pair_count
  FROM (SELECT string_split(s, chr(31)) AS a, wf FROM v{j}) t,
       LATERAL unnest(list_transform(range(1, len(a)),
                                     k -> {{'l': a[k], 'r': a[k+1]}})) AS u(pr)
  GROUP BY 1, 2
), b{i} AS (
  SELECT {i} AS merge_round, l, r, l || r AS m, pair_count FROM p{i}
  ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1
), v{i} AS (
  SELECT w, list_reduce(string_split(s, chr(31)),
           (acc, x) -> CASE
              WHEN (acc = b{i}.l OR ends_with(acc, chr(31) || b{i}.l))
                   AND x = b{i}.r
                THEN left(acc, length(acc) - length(b{i}.l)) || b{i}.m
              ELSE acc || chr(31) || x END) AS s, wf
  FROM v{j}, b{i}
)"""
    d["x97_bpe_merge_train"] = (
        """
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wf FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS w
    FROM documents)
  GROUP BY w
), v0 AS (
  SELECT w, left(regexp_replace(w, '(.)', '\\1' || chr(31), 'g'),
              length(regexp_replace(w, '(.)', '\\1' || chr(31), 'g')) - 1)
           AS s, wf
  FROM words
)"""
        + "".join(_x97_round.format(i=i, j=i - 1) for i in range(1, 6))
        + """
SELECT merge_round, l AS left_sym, r AS right_sym, m AS merged, pair_count
FROM ("""
        + " UNION ALL ".join(f"SELECT * FROM b{i}" for i in range(1, 6))
        + """)
ORDER BY merge_round
"""
    )
    # x99 replays x97's training chain (identical rule CTEs) and joins
    # the FINAL vocabulary segmentation v5 back to per-source word
    # counts — trained-tokenizer fertility, the x56 statistic under
    # the corpus' own tokenizer instead of the fixed regex proxy
    d["x99_bpe_fertility_trained"] = (
        d["x97_bpe_merge_train"].split("SELECT merge_round,")[0]
        + f"""
, words_src AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS wfs FROM (
    SELECT source,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS w
    FROM documents)
  GROUP BY source, w
)
SELECT ws.source,
       CAST(sum(ws.wfs) AS BIGINT) AS n_words,
       CAST(sum(ws.wfs * len(string_split(v5.s, chr(31)))) AS BIGINT)
         AS n_tokens,
       {W.round_half_up_sql(
           '1.0 * sum(ws.wfs * len(string_split(v5.s, chr(31))))'
           ' / sum(ws.wfs)', 6)} AS fertility
FROM words_src ws JOIN v5 ON ws.w = v5.w
GROUP BY ws.source
"""
    )
    # io7: content-hash sharding (x11's md5 bucket) + order-independent
    # modular fingerprint (x9b's rolling hash summed mod p)
    d["io7_export_manifest"] = """
WITH d AS (
  SELECT (('0x' || substr(md5(text), 1, 4))::INT % 1000) % 8 AS shard,
         n_chars,
         list_reduce(
           [0::BIGINT] || list_transform(
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ''),
             c -> ascii(c)::BIGINT),
           (acc, x) -> (acc * 257 + x) % 1000000007) AS fp
  FROM documents
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(fp) % 1000000007 AS BIGINT) AS fingerprint
FROM d GROUP BY shard
"""
    # st23 folds io7's monoid partials per batch — drained head == io7
    d["st23_export_manifest_stream"] = d["io7_export_manifest"]
    d["io8_sync_plan"] = """
WITH d AS (
  SELECT (('0x' || substr(md5(text), 1, 4))::INT % 1000) % 8 AS shard,
         n_chars,
         list_reduce(
           [0::BIGINT] || list_transform(
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ''),
             c -> ascii(c)::BIGINT),
           (acc, x) -> (acc * 257 + x) % 1000000007) AS fp,
         CASE WHEN source <> 'src0' THEN 1 ELSE 0 END AS is_old
  FROM documents
), m AS (
  SELECT shard,
         CAST(sum(is_old) AS BIGINT) AS docs_old,
         CAST(count(*) AS BIGINT) AS docs_new,
         CAST(sum(n_chars) AS BIGINT) AS chars_new,
         CAST(sum(fp * is_old) % 1000000007 AS BIGINT) AS fingerprint_old,
         CAST(sum(fp) % 1000000007 AS BIGINT) AS fingerprint_new
  FROM d GROUP BY shard
)
SELECT shard,
       CASE WHEN docs_old = 0 THEN 'added'
            WHEN fingerprint_old = fingerprint_new AND docs_old = docs_new
              THEN 'unchanged'
            ELSE 'changed' END AS status,
       docs_old, docs_new, chars_new, fingerprint_old, fingerprint_new
FROM m ORDER BY shard
"""
    # a19: the hot-key test is pure integer arithmetic; only the two
    # 6dp ratios touch floats (same half-up formula both engines)
    d["a19_join_skew_audit"] = f"""
WITH counts AS (
  SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY user_id
), t AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM counts
), h AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hot_keys
  FROM counts, t WHERE cnt * n_keys > 2 * n_rows
), tk AS (
  SELECT k AS top_key FROM counts ORDER BY cnt DESC, k ASC LIMIT 1
)
SELECT n_rows, n_keys, max_cnt,
       {W.round_half_up_sql('n_rows::DOUBLE / n_keys', 6)} AS mean_cnt,
       {W.round_half_up_sql(
           'max_cnt::DOUBLE * n_keys / n_rows', 6)} AS hotspot_factor,
       n_hot_keys, top_key
FROM t, h, tk
"""
    # x94: two-level assignment replayed with nested rank-1 CTEs;
    # n_super = ceil(sqrt(sqrt(N))) — two IEEE sqrts, never pow(x,.25)
    d["x94_hierarchical_ivf"] = f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cvec FROM embeddings
), nc AS (
  SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS n FROM embeddings
), ns AS (
  SELECT CAST(ceil(sqrt(sqrt(count(*)))) AS BIGINT) AS n FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, cvec AS cent_vec
  FROM c WHERE vec_id < (SELECT n FROM nc)
), sup AS (
  SELECT centroid_id AS super_id, cent_vec AS super_vec
  FROM cent WHERE centroid_id < (SELECT n FROM ns)
), cent_super AS (
  SELECT centroid_id, cent_vec, super_id FROM (
    SELECT cent.centroid_id, cent.cent_vec, sup.super_id,
           row_number() OVER (PARTITION BY cent.centroid_id
               ORDER BY {V.cosine_sql('cent.cent_vec', 'sup.super_vec')} DESC,
                        sup.super_id ASC) AS rn
    FROM cent CROSS JOIN sup) WHERE rn = 1
), vec_super AS (
  SELECT vec_id, cvec, super_id FROM (
    SELECT c.vec_id, c.cvec, sup.super_id,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('c.cvec', 'sup.super_vec')} DESC,
                        sup.super_id ASC) AS rn
    FROM c CROSS JOIN sup) WHERE rn = 1
), hier AS (
  SELECT vec_id, super_id, cell FROM (
    SELECT v.vec_id, v.super_id, cs.centroid_id AS cell,
           row_number() OVER (PARTITION BY v.vec_id
               ORDER BY {V.cosine_sql('v.cvec', 'cs.cent_vec')} DESC,
                        cs.centroid_id ASC) AS rn
    FROM vec_super v JOIN cent_super cs USING (super_id)) WHERE rn = 1
), flat AS (
  SELECT vec_id, flat_cell FROM (
    SELECT c.vec_id, cent.centroid_id AS flat_cell,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY {V.cosine_sql('c.cvec', 'cent.cent_vec')} DESC,
                        cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN h.cell = f.flat_cell THEN 1 ELSE 0 END)
            AS BIGINT) AS n_agree,
       {W.round_half_up_sql(
           'sum(CASE WHEN h.cell = f.flat_cell THEN 1 ELSE 0 END)'
           '::DOUBLE / count(*)', 6)} AS agreement_rate,
       CAST(count(DISTINCT h.super_id) AS BIGINT) AS n_super_used
FROM hier h JOIN flat f USING (vec_id)
"""
    d["x88_nn_descent_round"] = (
        _x86_graph
        + f"""
, b AS (
  SELECT src_id, nbr_id FROM graph
  UNION
  SELECT nbr_id AS src_id, src_id AS nbr_id FROM graph
), cand AS (
  SELECT g1.src_id AS src_id, g2.nbr_id AS cand_id
  FROM b g1 JOIN b g2 ON g1.nbr_id = g2.src_id
  WHERE g1.src_id <> g2.nbr_id
  UNION
  SELECT src_id, nbr_id AS cand_id FROM graph
), sc AS (
  SELECT cand.src_id, cand.cand_id,
         {V.cosine_sql('e1.cvec', 'e2.cvec')} AS sim
  FROM cand JOIN c e1 ON cand.src_id = e1.vec_id
            JOIN c e2 ON cand.cand_id = e2.vec_id
)
SELECT src_id, cand_id AS nbr_id,
       round(sim, 6) AS cos_sim, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY src_id
                               ORDER BY sim DESC, cand_id ASC) AS rank
  FROM sc) WHERE rank <= 5
"""
    )
    # x90: the x86 graph CTE + mutual edges + 3 unrolled PageRank
    # rounds; contributions quantized to the int64 1e-12 grid before
    # each sum, so the trajectory is order-independent (Lloyd pattern)
    _pr_iters = "".join(
        f"""
, c{i} AS (
  SELECT dst AS id,
         sum(CAST(floor(r / deg * 1000000000000 + 0.5) AS BIGINT)) AS qsum
  FROM ej JOIN r{i - 1} ON ej.src = r{i - 1}.id
  GROUP BY dst
), r{i} AS (
  SELECT nodes.id,
         0.15 / (SELECT n FROM nn)
           + 0.85 * (CAST(COALESCE(qsum, 0) AS DOUBLE) / 1000000000000.0)
           AS r
  FROM nodes LEFT JOIN c{i} USING (id)
)"""
        for i in (1, 2, 3)
    )
    d["x90_pagerank_knn"] = (
        _x86_graph
        + f"""
, me AS (
  SELECT f.src_id AS src, f.nbr_id AS dst
  FROM graph f JOIN graph g2
    ON f.src_id = g2.nbr_id AND f.nbr_id = g2.src_id
), nodes AS (
  SELECT vec_id AS id FROM embeddings
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM me GROUP BY src
), ej AS (
  SELECT me.src, me.dst, deg.deg FROM me JOIN deg USING (src)
), r0 AS (
  SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes
){_pr_iters}
SELECT id AS vec_id, {W.round_half_up_sql('r', 12)} AS rank FROM r3
"""
    )
