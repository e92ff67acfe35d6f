"""Oracle family block 06: assignments from # x5e composes the exact (x5) and IVF (x.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    AGRICULTURAL_REGIONS = ns.AGRICULTURAL_REGIONS
    DataFrame = ns.DataFrame
    T = ns.T
    W = ns.W
    X5_ORACLE = ns.X5_ORACLE
    e2e_dedup_survivors = ns.e2e_dedup_survivors
    e2e_semantic_curation = ns.e2e_semantic_curation
    io1_orc_roundtrip = ns.io1_orc_roundtrip
    io2_python_sink_roundtrip = ns.io2_python_sink_roundtrip
    j5_scd2_pointintime = ns.j5_scd2_pointintime
    j7_nearest_region_assignment = ns.j7_nearest_region_assignment
    q17_small_quantity_revenue = ns.q17_small_quantity_revenue
    q32_stale_stock = ns.q32_stale_stock
    r4_scd2_dimension = ns.r4_scd2_dimension
    r7_incremental_join_view = ns.r7_incremental_join_view
    sql5_recursive_cte = ns.sql5_recursive_cte
    w11_cumulative_distinct = ns.w11_cumulative_distinct
    w12_sessionize = ns.w12_sessionize
    w13_event_transitions = ns.w13_event_transitions
    x105_quality_canonicalization = ns.x105_quality_canonicalization
    x14_dedup_clusters = ns.x14_dedup_clusters
    x3_ngram_jaccard_pairs = ns.x3_ngram_jaccard_pairs
    x40b_semantic_dedup_adaptive = ns.x40b_semantic_dedup_adaptive
    x43_oov_rate = ns.x43_oov_rate
    x46_grouped_agg_udaf = ns.x46_grouped_agg_udaf
    x47_zorder_layout = ns.x47_zorder_layout
    x48_capped_dedup = ns.x48_capped_dedup
    x5d_cosine_topk_ivf = ns.x5d_cosine_topk_ivf
    x5e_ivf_recall = ns.x5e_ivf_recall
    x5f_ivf_partitioned_layout = ns.x5f_ivf_partitioned_layout
    x79_quality_survivors = ns.x79_quality_survivors
    x81_source_dup_rate = ns.x81_source_dup_rate

    # x5e composes the exact (x5) and IVF (x5d) oracles the same way the
    # Spark query composes the two DataFrame lineages.
    # x5f is x5d against a physically partitioned cell layout — two
    # physical strategies, identical rows, ONE oracle
    d["x5f_ivf_partitioned_layout"] = d["x5d_cosine_topk_ivf"]
    d["x5e_ivf_recall"] = f"""
WITH exact AS ({X5_ORACLE}),
approx AS ({d["x5d_cosine_topk_ivf"].strip()}),
hit AS (
  SELECT e.query_id, e.vec_id FROM exact e
  JOIN approx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
)
SELECT (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM hit) AS n_hit,
       round((SELECT count(*) FROM hit)::DOUBLE
             / (SELECT count(*) FROM exact), 4) AS recall
"""
    # x14 clusters the exact pair set x3 emits: its oracle embeds x3's SQL
    # as the edge list and takes the transitive closure recursively.
    d["q32_stale_stock"] = """
WITH last_sale AS (
  SELECT l_partkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1
), anchor AS (SELECT max(l_shipdate) AS anchor FROM lineitem)
SELECT p_partkey, p_brand, last_ship,
       CAST(date_diff('day', last_ship, anchor) AS BIGINT) AS days_idle,
       p_retailprice AS retail_price
FROM last_sale
JOIN part ON p_partkey = l_partkey
CROSS JOIN anchor
ORDER BY days_idle DESC, p_partkey ASC
LIMIT 20
"""
    d["x81_source_dup_rate"] = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({d["x3_ngram_jaccard_pairs"].strip()}) AS p
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), clustered AS (
  SELECT DISTINCT s AS doc_id FROM edges
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum((clustered.doc_id IS NOT NULL)::INT) AS BIGINT)
         AS n_near_dup,
       {W.round_half_up_sql(
           "sum((clustered.doc_id IS NOT NULL)::INT)::DOUBLE / count(*)", 6)}
         AS dup_rate
FROM documents LEFT JOIN clustered ON clustered.doc_id = documents.doc_id
GROUP BY source
"""
    d["x79_quality_survivors"] = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({d["x3_ngram_jaccard_pairs"].strip()}) AS p
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), nodes AS (
  SELECT DISTINCT s AS id FROM edges
), reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.d AS id, r.lbl FROM reach r JOIN edges e ON e.s = r.id
), cc AS (
  SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
), scored AS (
  SELECT component, cc.doc_id, {T.quality_score_sql('text')} AS q,
         row_number() OVER (PARTITION BY component
           ORDER BY {T.quality_score_sql('text')} DESC, cc.doc_id ASC) AS rn
  FROM cc JOIN documents ON documents.doc_id = cc.doc_id
)
SELECT component, CAST(count(*) AS BIGINT) AS cluster_size,
       max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
       {W.round_half_up_sql("max(CASE WHEN rn = 1 THEN q END)", 6)}
         AS survivor_quality
FROM scored GROUP BY component
"""
    d["x14_dedup_clusters"] = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({d["x3_ngram_jaccard_pairs"].strip()}) AS p
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), nodes AS (
  SELECT DISTINCT s AS id FROM edges
), reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.d AS id, r.lbl FROM reach r JOIN edges e ON e.s = r.id
)
SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
"""
    # the semantic curation verdict: recursive closure over the
    # scale-adaptive x40b pairs (r4: flagship path off pinned-k)
    d["e2e_semantic_curation"] = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({d["x40b_semantic_dedup_adaptive"].strip()}) AS p
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), nodes AS (
  SELECT DISTINCT s AS id FROM edges
), reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.d AS id, r.lbl FROM reach r JOIN edges e ON e.s = r.id
), cc AS (
  SELECT id, min(lbl) AS component FROM reach GROUP BY id
), t AS (SELECT count(*) AS n_vecs FROM embeddings),
c AS (SELECT count(*) AS n_grouped,
             count(DISTINCT component) AS n_groups FROM cc)
SELECT n_vecs, n_grouped, n_groups,
       CAST(n_vecs - n_grouped + n_groups AS BIGINT) AS n_survivors
FROM t CROSS JOIN c
"""
    d["x105_quality_canonicalization"] = f"""
WITH cc AS ({d["x14_dedup_clusters"].strip()}),
scored AS (
  SELECT doc_id AS id, {T.quality_score_sql('text')} AS q FROM documents
), m AS (
  SELECT c.doc_id AS id, c.component AS lbl, s.q
  FROM cc c JOIN scored s ON s.id = c.doc_id
), best AS (
  SELECT lbl, id AS canonical_doc, q AS q_canon,
         row_number() OVER (PARTITION BY lbl ORDER BY q DESC, id ASC) AS rn
  FROM m
), naive AS (
  SELECT lbl, CAST(min(id) AS BIGINT) AS naive_doc,
         CAST(count(*) AS BIGINT) AS n_members
  FROM m GROUP BY lbl
)
SELECT CAST(b.lbl AS BIGINT) AS component,
       n.n_members,
       CAST(b.canonical_doc AS BIGINT) AS canonical_doc,
       n.naive_doc,
       CAST(CASE WHEN b.canonical_doc <> n.naive_doc THEN 1 ELSE 0 END AS INT)
         AS changed,
       {W.round_half_up_sql("b.q_canon - s2.q", 6)} AS quality_gain
FROM best b
JOIN naive n USING (lbl)
JOIN scored s2 ON s2.id = n.naive_doc
WHERE b.rn = 1
"""
    # the dedup decision composes x14's closure with the corpus total
    d["e2e_dedup_survivors"] = f"""
WITH cc AS ({d["x14_dedup_clusters"].strip()}),
t AS (SELECT count(*) AS n_docs FROM documents),
c AS (SELECT count(*) AS n_clustered,
             count(DISTINCT component) AS n_clusters FROM cc)
SELECT n_docs, n_clustered, n_clusters,
       CAST(n_docs - n_clustered + n_clusters AS BIGINT) AS n_survivors
FROM t CROSS JOIN c
"""
    d["r4_scd2_dimension"] = """
WITH runs AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC)
         - row_number() OVER (PARTITION BY o_custkey, o_orderpriority
                              ORDER BY o_orderdate ASC, o_orderkey ASC)
           AS island
  FROM orders
), islands AS (
  SELECT o_custkey, o_orderpriority, island,
         min(o_orderdate) AS vf, min(o_orderkey) AS k0,
         count(*) AS n_changes
  FROM runs GROUP BY o_custkey, o_orderpriority, island
)
SELECT o_custkey,
       o_orderpriority AS attr_value,
       strftime(vf, '%Y-%m-%d') AS valid_from,
       strftime(lead(vf) OVER (PARTITION BY o_custkey
                               ORDER BY vf ASC, k0 ASC),
                '%Y-%m-%d') AS valid_to,
       n_changes,
       lead(vf) OVER (PARTITION BY o_custkey
                      ORDER BY vf ASC, k0 ASC) IS NULL AS is_current
FROM islands
"""
    # j5 wraps r4's SCD build as a CTE and resolves probes with DuckDB's
    # NATIVE ASOF JOIN — an independent as-of implementation as oracle.
    d["j5_scd2_pointintime"] = f"""
WITH dim0 AS ({d["r4_scd2_dimension"].strip()}),
dim AS (
  -- zero-length regimes (same-day flips) are never in effect
  SELECT * FROM dim0 WHERE valid_to IS NULL OR valid_to > valid_from
),
probes AS (
  SELECT o_custkey, o_orderkey AS probe_id,
         CAST(o_orderdate AS DATE) + 40 AS t
  FROM orders
)
SELECT d.attr_value,
       count(*) AS n_probes,
       count(DISTINCT p.o_custkey) AS n_keys
FROM probes p
ASOF JOIN dim d
  ON p.o_custkey = d.o_custkey AND p.t >= CAST(d.valid_from AS DATE)
GROUP BY d.attr_value
"""
    d["w11_cumulative_distinct"] = """
WITH first_seen AS (
  SELECT user_id, min(date_trunc('day', ts)) AS d0
  FROM events GROUP BY user_id
), per_day AS (
  SELECT d0, count(*) AS new_users FROM first_seen GROUP BY d0
)
SELECT strftime(d0, '%Y-%m-%d') AS day,
       new_users,
       CAST(sum(new_users) OVER (ORDER BY d0
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM per_day
"""
    d["w12_sessionize"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
), g AS (
  SELECT user_id, event_id, t,
         CASE WHEN lag(t) OVER (PARTITION BY user_id
                                ORDER BY t, event_id) IS NULL
                OR t - lag(t) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e
), s AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g
), per_session AS (
  SELECT user_id, sess, count(*) AS n_ev FROM s GROUP BY user_id, sess
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_ev) AS BIGINT) AS longest_session_events,
       CAST(sum(n_ev) AS BIGINT) AS total_events
FROM per_session GROUP BY user_id
"""
    d["q17_small_quantity_revenue"] = """
WITH aq AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       (floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 + 0.0)
         AS small_qty_revenue,
       count(*) AS n_small
FROM lineitem
JOIN aq USING (l_partkey)
JOIN part ON l_partkey = p_partkey
WHERE l_quantity < 0.5 * avg_qty
GROUP BY p_brand
"""
    # io1's oracle aggregates the ORIGINAL parquet — equality proves the
    # Spark ORC write->read roundtrip is lossless.
    d["io1_orc_roundtrip"] = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM documents GROUP BY source
"""
    d["x43_oov_rate"] = """
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
), freq AS (
  SELECT term, count(*) AS n FROM toks GROUP BY term
), vocab AS (
  SELECT term FROM freq ORDER BY n DESC, term ASC LIMIT 500
)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       (floor((CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        + 0.0) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.source
"""
    d["io2_python_sink_roundtrip"] = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM documents GROUP BY source
"""
    region_values = ",\n    ".join(
        f"('{name}', CAST(floor({c['lat']!r}*1000000.0+0.5) AS BIGINT), "
        f"CAST(floor({c['lon']!r}*1000000.0+0.5) AS BIGINT))"
        for name, c in AGRICULTURAL_REGIONS.items()
    )
    d["j7_nearest_region_assignment"] = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
pts AS (
  SELECT user_id,
         -4500000 + (user_id % 900) * 10000 AS plat_u,
         34000000 + (user_id % 800) * 10000 AS plon_u
  FROM users
), regions(region, rlat_u, rlon_u) AS (
  VALUES {region_values}
), cand AS (
  SELECT user_id, region,
         (plat_u - rlat_u) * (plat_u - rlat_u)
         + (plon_u - rlon_u) * (plon_u - rlon_u) AS d2
  FROM pts, regions
), best AS (
  SELECT user_id, region, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY d2, region) AS rn
    FROM cand) t WHERE rn = 1
)
SELECT region, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(d2) AS BIGINT) AS sum_d2_u
FROM best GROUP BY region
"""
    d["x47_zorder_layout"] = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       min(l_partkey) AS min_part,
       max(l_partkey) AS max_part
FROM lineitem WHERE l_suppkey >= 10 AND l_suppkey < 20
"""
    d["x48_capped_dedup"] = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY {T.fingerprint_md5_sql('text')}
                            ORDER BY doc_id ASC) AS rn
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked GROUP BY source
"""
    d["x46_grouped_agg_udaf"] = """
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
  FROM documents
)
SELECT source,
       CAST(max(cnt) AS BIGINT) AS n_docs,
       CAST(max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN n_chars END)
            AS BIGINT) AS median_chars
FROM ranked GROUP BY source
"""
    d["r7_incremental_join_view"] = """
SELECT c_mktsegment, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
"""
    d["sql5_recursive_cte"] = """
WITH RECURSIVE anc(p_partkey, anc_key, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 256
  UNION ALL
  SELECT a.p_partkey, a.anc_key // 2, a.depth + 1
  FROM anc a WHERE a.anc_key > 1
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(anc_key) AS BIGINT) AS sum_keys
FROM anc GROUP BY depth
"""
    d["w13_event_transitions"] = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS from_type
  FROM events
), cnt AS (
  SELECT from_type, event_type AS to_type, count(*) AS n
  FROM ordered WHERE from_type IS NOT NULL
  GROUP BY from_type, event_type
), tot AS (
  SELECT from_type, sum(n) AS t FROM cnt GROUP BY from_type
)
SELECT c.from_type, c.to_type,
       CAST(c.n AS BIGINT) AS n_transitions,
       {W.round_half_up_sql("CAST(c.n AS DOUBLE) / t", 6)} AS p
FROM cnt c JOIN tot USING (from_type)
"""
