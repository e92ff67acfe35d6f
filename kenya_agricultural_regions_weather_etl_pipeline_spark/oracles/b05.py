"""Oracle family block 05: multimodal + corpus composites.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    F = ns.F
    T = ns.T
    W = ns.W
    _e2e_corpus_oracle = ns._e2e_corpus_oracle
    _e2e_oracle = ns._e2e_oracle
    a6b_unpivot = ns.a6b_unpivot
    e2e_corpus_clean = ns.e2e_corpus_clean
    e2e_corpus_report = ns.e2e_corpus_report
    e2e_weather_sim = ns.e2e_weather_sim
    j3_fuzzy_join = ns.j3_fuzzy_join
    j4_interval_overlap_join = ns.j4_interval_overlap_join
    j6_nearest_event_join = ns.j6_nearest_event_join
    mm1_multimodal_features = ns.mm1_multimodal_features
    mm3_audio_segments = ns.mm3_audio_segments
    mm4_media_dedup = ns.mm4_media_dedup
    mm5_resize_images = ns.mm5_resize_images
    q9_returned_revenue = ns.q9_returned_revenue
    r3_table_diff = ns.r3_table_diff
    s3_map_props = ns.s3_map_props
    set5_except_all = ns.set5_except_all
    set6_intersect_all = ns.set6_intersect_all
    sql2_star_join_sql = ns.sql2_star_join_sql
    st8_jsonl_ingest = ns.st8_jsonl_ingest
    u2_union_by_name = ns.u2_union_by_name
    w7_time_range_window = ns.w7_time_range_window
    w8_forward_fill = ns.w8_forward_fill
    x26_bigram_lm_score = ns.x26_bigram_lm_score

    d.update({
        "w8_forward_fill": """
WITH gappy AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id, user_id,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id
         ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM gappy
""",
        "r3_table_diff": """
WITH old AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 9
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice
  FROM orders
), j AS (
  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old a FULL OUTER JOIN new b ON a.o_orderkey = b.o_orderkey
)
SELECT status, count(*) AS n_keys FROM j GROUP BY status
""",
        "e2e_corpus_report": f"""
WITH enriched AS (
  SELECT doc_id, source, lang,
         {T.fingerprint_md5_sql("text")} AS fp,
         {T.quality_score_sql("text")} AS q,
         {T.token_count_sql("text")} AS tok
  FROM documents
), fpc AS (
  SELECT fp, count(*) AS n_fp FROM enriched GROUP BY fp
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       {W.round_half_up_sql(
           "CAST(sum(CAST(floor(q * 1000000.0 + 0.5) AS BIGINT))"
           " AS DOUBLE) / (1000000.0 * count(*))", 4)} AS avg_quality,
       CAST(sum(tok) AS BIGINT) AS sum_tokens,
       count(DISTINCT lang) AS n_langs
FROM enriched JOIN fpc USING (fp)
GROUP BY source
""",
        "x26_bigram_lm_score": f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t), 1)),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
), bgw AS (
  SELECT doc_id, bg, regexp_split_to_array(bg, ' ')[1] AS w1 FROM bg
), cbg AS (
  SELECT bg, count(*) AS c_bg FROM bgw GROUP BY bg
), uni AS (
  SELECT unnest(t) AS w1 FROM toks
), cw AS (
  SELECT w1, count(*) AS c_w1 FROM uni GROUP BY w1
)
SELECT doc_id, count(*) AS n_bigrams,
       {W.round_half_up_sql("avg(ln(c_bg::DOUBLE / c_w1))", 4)}
         AS avg_bigram_logprob
FROM bgw JOIN cbg USING (bg) JOIN cw USING (w1)
GROUP BY doc_id
""",
        "s3_map_props": """
WITH kv AS (
  SELECT unnest(list_transform(json_keys(props),
           k -> {'k': k,
                 'v': CAST(json_extract_string(props, '$.' || k) AS INT)}))
           AS e
  FROM events
)
SELECT e.k AS key, count(*) AS n,
       CAST(sum(e.v) AS BIGINT) AS sum_val,
       min(e.v) AS min_val,
       max(e.v) AS max_val
FROM kv GROUP BY e.k
""",
        "a6b_unpivot": """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'F' AS status, n_f AS n FROM wide
UNION ALL
SELECT o_orderpriority, 'O' AS status, n_o AS n FROM wide
UNION ALL
SELECT o_orderpriority, 'P' AS status, n_p AS n FROM wide
""",
        "sql2_star_join_sql": """
SELECT n.n_name,
       count(DISTINCT s.s_suppkey) AS n_suppliers,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
""",
        "u2_union_by_name": """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice, 'v1' AS feed_version, NULL AS priority
  FROM orders WHERE o_orderkey % 2 = 0
), v2 AS (
  SELECT o_orderkey, o_totalprice, 'v2' AS feed_version,
         o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 2 = 1
), u AS (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2
)
SELECT feed_version, count(*) AS n_rows,
       CAST(sum(CASE WHEN priority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_priority,
       (floor(sum(o_totalprice) * 100 + 0.5) / 100 + 0.0) AS sum_total
FROM u GROUP BY feed_version
""",
        "j3_fuzzy_join": """
WITH vals AS (
  SELECT DISTINCT p_name AS v FROM part
), blocked AS (
  SELECT v, regexp_split_to_array(v, '\\s+')[1] AS blk FROM vals
)
SELECT a.v AS name_a, b.v AS name_b, levenshtein(a.v, b.v) AS dist
FROM blocked a JOIN blocked b USING (blk)
WHERE a.v < b.v AND levenshtein(a.v, b.v) <= 2
""",
        "j6_nearest_event_join": """
WITH c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), v AS (
  SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT c.event_id, c.ts, vp.ts AS pt
  FROM c ASOF LEFT JOIN v vp
    ON c.user_id = vp.user_id AND c.ts >= vp.ts
), n AS (
  SELECT c.event_id, vn.ts AS nt
  FROM c ASOF LEFT JOIN v vn
    ON c.user_id = vn.user_id AND c.ts <= vn.ts
)
SELECT p.event_id,
       epoch_us(p.ts) - epoch_us(p.pt) AS gap_prior_us,
       epoch_us(n.nt) - epoch_us(p.ts) AS gap_next_us,
       least(epoch_us(p.ts) - epoch_us(p.pt),
             epoch_us(n.nt) - epoch_us(p.ts)) AS nearest_us
FROM p JOIN n USING (event_id)
""",
        "j4_interval_overlap_join": """
WITH iv AS (
  -- epoch_us // 1e6 truncates like Spark's integer div
  -- (epoch(ts)::BIGINT would ROUND the fractional second)
  SELECT user_id, event_id AS id,
         epoch_us(ts) // 1000000 AS s,
         epoch_us(ts) // 1000000 + 60 + event_id % 3600 AS e
  FROM events
), a AS (SELECT * FROM iv WHERE id % 2 = 0),
   b AS (SELECT * FROM iv WHERE id % 2 = 1)
SELECT a.user_id, a.id AS a_id, b.id AS b_id,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_sec
FROM a JOIN b ON a.user_id = b.user_id
WHERE a.s <= b.e AND b.s <= a.e
""",
        "set6_intersect_all": """
WITH y95 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
), y96 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
), kept AS (
  SELECT o_custkey FROM y95 INTERSECT ALL SELECT o_custkey FROM y96
)
SELECT o_custkey, count(*) AS n_retained_slots
FROM kept GROUP BY o_custkey
""",
        "set5_except_all": """
WITH y95 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
), y96 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
), diff AS (
  SELECT o_custkey FROM y95 EXCEPT ALL SELECT o_custkey FROM y96
)
SELECT o_custkey, count(*) AS n_lost_slots
FROM diff GROUP BY o_custkey
""",
        "q9_returned_revenue": f"""
SELECT c_custkey, c_name, n_name,
       {W.round_half_up_sql("sum(l_extendedprice * (1 - l_discount))", 2)}
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
        "w7_time_range_window": f"""
SELECT event_id, user_id,
       count(*) OVER w AS n_last_hour,
       {W.round_half_up_sql("sum(value) OVER w", 4)} AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
        "st8_jsonl_ingest": """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
""",
        "mm3_audio_segments": """
WITH a AS (
  SELECT range AS asset_id, (range * 40)::INT AS duration_ms
  FROM range(64) WHERE range % 3 = 1
), s AS (
  SELECT asset_id, duration_ms,
         CAST(unnest(range(greatest((duration_ms + 299) // 300, 1))) AS INT)
           AS segment_idx
  FROM a
)
SELECT asset_id, segment_idx,
       (segment_idx * 300)::INT AS start_ms,
       least(segment_idx * 300 + 400, duration_ms)::INT AS end_ms,
       (18 + length(segment_idx::VARCHAR))::INT AS segment_bytes
FROM s
""",
        "mm1_multimodal_features": """
WITH media AS (
  SELECT range AS asset_id,
         ['image','audio','video'][(range % 3 + 1)::INT] AS media_type,
         'BLOB:' || lpad(range::VARCHAR, 12, '0') AS payload
  FROM range(64)
), cp AS (
  SELECT asset_id, media_type, payload,
         list_transform(regexp_split_to_array(payload, ''),
                        c -> unicode(c)::BIGINT) AS b
  FROM media
), acc AS (
  -- FNV-1a fold, replicating operators/multimodal._stub_decode
  SELECT asset_id, media_type, payload,
         list_reduce(list_prepend(2166136261::BIGINT, b),
                     (a, x) -> (xor(a, x) * 16777619) % 4294967296) AS h
  FROM cp
), f AS (
  SELECT asset_id, media_type, payload,
         list_transform(range(8), i -> ((h >> (i % 24)) & 255) / 255.0)
           AS feats
  FROM acc
)
SELECT asset_id, media_type,
       length(payload)::INT AS payload_bytes,
       len(feats)::INT AS feature_dim,
       printf('%.6f', sqrt(list_sum(list_transform(feats, x -> x*x))))
         AS feature_norm
FROM f
""",
        # replays the synthetic pixel formula + the nearest-neighbor
        # floor-division mapping (sx = x*w0 // 64) of the REAL BMP
        # codec path; payload_bytes = 54-byte header + 64 rows of
        # stride 192 (64*3, already 4-byte aligned) = 12342
        "mm5_resize_images": """
WITH assets AS (
  SELECT range AS a, (8 + range % 5) AS w0, (6 + range % 4) AS h0
  FROM range(64) WHERE range % 3 = 0
), px AS (
  SELECT a,
         ( (a*7  + ((x.range * w0) // 64) * 13 + ((y.range * h0) // 64) * 31) % 256
         + (a*11 + ((x.range * w0) // 64) * 17 + ((y.range * h0) // 64) * 5 ) % 256
         + (a*3  + ((x.range * w0) // 64) * 29 + ((y.range * h0) // 64) * 23) % 256
         ) AS s
  FROM assets, range(64) x, range(64) y
)
SELECT a AS asset_id, 64 AS width, 64 AS height,
       12342 AS payload_bytes,
       CAST(sum(s) AS BIGINT) AS pixel_sum
FROM px GROUP BY a
""",
        "mm4_media_dedup": """
WITH media AS (
  SELECT range AS asset_id,
         md5('BLOB:' || lpad((range % 64)::VARCHAR, 12, '0'))
           AS content_key,
         (5 + 12)::INT AS payload_bytes
  FROM range(96)
)
SELECT content_key,
       min(asset_id) AS canonical_asset_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       max(payload_bytes) AS payload_bytes
FROM media GROUP BY content_key
""",
        "e2e_weather_sim": _e2e_oracle(),
        "e2e_corpus_clean": _e2e_corpus_oracle(),
    })
