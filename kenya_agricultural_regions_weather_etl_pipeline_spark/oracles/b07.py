"""Oracle family block 07: assignments from io3_snapshot_time_travel.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    W = ns.W
    e2e_multimodal_curation = ns.e2e_multimodal_curation
    io3_snapshot_time_travel = ns.io3_snapshot_time_travel
    io4_streaming_sink_commit_log = ns.io4_streaming_sink_commit_log
    mm6_image_channel_stats = ns.mm6_image_channel_stats
    mm7_audio_segment_features = ns.mm7_audio_segment_features
    mm8_video_frame_stats = ns.mm8_video_frame_stats
    p14_string_surface = ns.p14_string_surface
    p15_date_surface = ns.p15_date_surface
    q13_order_count_distribution = ns.q13_order_count_distribution
    q16_supplier_variety = ns.q16_supplier_variety
    q18_large_volume_orders = ns.q18_large_volume_orders
    q19_disjunctive_revenue = ns.q19_disjunctive_revenue
    q20_relational_division = ns.q20_relational_division
    q21_sole_late_supplier = ns.q21_sole_late_supplier
    q22_dormant_highvalue = ns.q22_dormant_highvalue
    q4_priority_check = ns.q4_priority_check
    s6_variant_access = ns.s6_variant_access
    s7_xml_roundtrip = ns.s7_xml_roundtrip
    w14_ratio_to_report = ns.w14_ratio_to_report
    w15_high_watermark = ns.w15_high_watermark
    x44_product_quantization = ns.x44_product_quantization
    x45_textrank_keywords = ns.x45_textrank_keywords

    d["io3_snapshot_time_travel"] = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM documents WHERE source IN ('src0', 'src1')
GROUP BY source
"""
    d["s7_xml_roundtrip"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(user_id) AS BIGINT) AS sum_users,
       min(event_id) AS min_ev,
       max(event_id) AS max_ev
FROM events GROUP BY event_type
"""
    d["p14_string_surface"] = """
SELECT c_custkey,
       upper(c_name) AS up,
       reverse(c_name) AS rev,
       translate(c_name, 'aeiou', '#####') AS tr,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
       split_part(c_name, '#', 1) AS stem,
       substr(c_name, 2, 5) AS mid,
       left(c_name, 3) AS l3,
       right(c_name, 3) AS r3,
       regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked,
       CAST(length(c_name) AS INT) AS len
FROM customer
"""
    d["io4_streaming_sink_commit_log"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       min(event_id) AS min_ev,
       max(event_id) AS max_ev
FROM events GROUP BY event_type
"""
    d["p15_date_surface"] = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       CAST(dayofweek(o_orderdate) AS INT) AS dow_sun0
FROM orders
"""
    d["q4_priority_check"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""
    d["q13_order_count_distribution"] = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust GROUP BY c_count
"""
    d["q16_supplier_variety"] = """
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""
    d["q18_large_volume_orders"] = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       o_totalprice,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""
    d["q19_disjunctive_revenue"] = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""
    d["q20_relational_division"] = """
WITH np AS (
  SELECT count(DISTINCT o_orderpriority) AS np FROM orders
), per_cust AS (
  SELECT o_custkey, count(DISTINCT o_orderpriority) AS covered
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name, c_mktsegment
FROM customer
JOIN per_cust ON c_custkey = o_custkey
JOIN np ON covered = np
"""
    d["w14_ratio_to_report"] = f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       {W.round_half_up_sql(
           "o_totalprice / CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))"
           " OVER (PARTITION BY o_custkey) AS DOUBLE)", 6)} AS share
FROM orders
"""
    d["q21_sole_late_supplier"] = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
           AS n_late_supp
  FROM lines GROUP BY l_orderkey
), blame AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lines l JOIN per_order p USING (l_orderkey)
  WHERE l.is_late AND p.n_supp >= 2 AND p.n_late_supp = 1
)
SELECT s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS n_blamed_orders
FROM blame JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY n_blamed_orders DESC, s_suppkey ASC LIMIT 10
"""
    d["q22_dormant_highvalue"] = """
WITH thr AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
), dormant AS (
  SELECT c.c_nationkey, c.c_acctbal
  FROM customer c, thr
  WHERE c.c_acctbal > thr.avg_bal
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_dormant,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS dormant_balance
FROM dormant JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""
    d["mm7_audio_segment_features"] = """
WITH aud AS (
  SELECT id AS asset_id, 512 + (id % 7) * 128 AS n
  FROM range(0, 64) t(id) WHERE id % 3 = 1
), seg AS (
  SELECT asset_id, n,
         unnest(range(0, greatest((n + 239) // 240, 1))) AS k
  FROM aud
), sam AS (
  SELECT asset_id, k, n,
         unnest(range(k * 240, least(k * 240 + 320, n))) AS i
  FROM seg
)
SELECT asset_id,
       CAST(k AS INT) AS segment_idx,
       CAST((k * 240) // 8 AS INT) AS start_ms,
       CAST(least(k * 240 + 320, n) // 8 AS INT) AS end_ms,
       CAST(least(k * 240 + 320, n) - k * 240 AS INT) AS n_samples,
       CAST(sum(abs(((asset_id * 7919 + i * 4409) % 9973) - 4986))
            AS BIGINT) AS sum_abs
FROM sam GROUP BY asset_id, k, n
"""
    d["w15_high_watermark"] = f"""
WITH w AS (
  SELECT user_id, event_id, value,
         max(value) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS pk
  FROM events
)
SELECT user_id, event_id,
       {W.round_half_up_sql("value", 4)} AS value,
       {W.round_half_up_sql("pk", 4)} AS peak,
       value >= pk AS is_record,
       {W.round_half_up_sql("pk - value", 4)} AS drawdown
FROM w
"""
    d["e2e_multimodal_curation"] = """
WITH img AS (
  SELECT id AS asset_id, 8 + (id % 5) AS w, 6 + (id % 4) AS h
  FROM range(0, 64) t(id) WHERE id % 3 = 0
), img_px AS (
  SELECT asset_id, w, h,
         unnest(range(0, w * h)) AS p
  FROM img
), img_feat AS (
  SELECT asset_id,
         CAST(max(54 + ((w * 3 + 3) // 4 * 4) * h) AS INT) AS payload_bytes,
         CAST(sum((asset_id * 7 + (p % w) * 13 + (p // w) * 31) % 256
                + (asset_id * 11 + (p % w) * 17 + (p // w) * 5) % 256
                + (asset_id * 3 + (p % w) * 29 + (p // w) * 23) % 256)
              AS BIGINT) AS feature_sum
  FROM img_px GROUP BY asset_id
), aud AS (
  SELECT id AS asset_id, 512 + (id % 7) * 128 AS n
  FROM range(0, 64) t(id) WHERE id % 3 = 1
), aud_px AS (
  SELECT asset_id, n, unnest(range(0, n)) AS i FROM aud
), aud_feat AS (
  SELECT asset_id,
         CAST(max(44 + 2 * n) AS INT) AS payload_bytes,
         CAST(sum(abs(((asset_id * 7919 + i * 4409) % 9973) - 4986))
              AS BIGINT) AS feature_sum
  FROM aud_px GROUP BY asset_id
), vid AS (
  SELECT id AS asset_id, 2 + (id % 4) AS nf
  FROM range(0, 64) t(id) WHERE id % 3 = 2
), vid_px AS (
  SELECT asset_id, nf,
         unnest(range(0, nf)) AS f
  FROM vid
), vid_px2 AS (
  SELECT asset_id, nf, f, unnest(range(0, 192)) AS i FROM vid_px
), vid_feat AS (
  SELECT asset_id,
         CAST(max(41 + nf * 294) AS INT) AS payload_bytes,
         CAST(sum((asset_id * 3 + f * 7 + i * 5) % 256) AS BIGINT)
           AS feature_sum
  FROM vid_px2 GROUP BY asset_id
), census AS (
  SELECT asset_id, 'image' AS media_type, payload_bytes, feature_sum
  FROM img_feat
  UNION ALL
  SELECT asset_id, 'audio', payload_bytes, feature_sum FROM aud_feat
  UNION ALL
  SELECT asset_id, 'video', payload_bytes, feature_sum FROM vid_feat
)
SELECT media_type,
       CAST(count(*) AS BIGINT) AS n_assets,
       CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(feature_sum) AS BIGINT) AS total_feature,
       min(asset_id) AS min_id,
       max(asset_id) AS max_id
FROM census GROUP BY media_type
"""
    d["mm8_video_frame_stats"] = """
WITH vid AS (
  SELECT id AS asset_id, 2 + (id % 4) AS n_frames
  FROM range(0, 64) t(id) WHERE id % 3 = 2
), fr AS (
  SELECT asset_id, unnest(range(0, n_frames)) AS f FROM vid
), px AS (
  SELECT asset_id, f, unnest(range(0, 192)) AS i FROM fr
), luma AS (
  SELECT asset_id, f,
         sum((asset_id * 3 + f * 7 + i * 5) % 256) AS s
  FROM px GROUP BY asset_id, f
), cpx AS (
  SELECT asset_id, f, unnest(range(0, 48)) AS i FROM fr
), cb AS (
  SELECT asset_id, f,
         sum((asset_id * 5 + f * 11 + i * 13) % 256) AS s
  FROM cpx GROUP BY asset_id, f
), cr AS (
  SELECT asset_id, f,
         sum((asset_id * 7 + f * 15 + i * 21) % 256) AS s
  FROM cpx GROUP BY asset_id, f
)
SELECT l.asset_id,
       CAST(l.f AS INT) AS frame_idx,
       CAST(l.s AS BIGINT) AS luma_sum,
       CAST(cb.s AS BIGINT) AS cb_sum,
       CAST(cr.s AS BIGINT) AS cr_sum
FROM luma l
JOIN cb ON l.asset_id = cb.asset_id AND l.f = cb.f
JOIN cr ON l.asset_id = cr.asset_id AND l.f = cr.f
"""
    d["x45_textrank_keywords"] = """
WITH toks AS (
  SELECT string_split_regex(lower(text), '\\s+') AS t FROM documents
), pr AS (
  SELECT t[i] AS a, t[i+1] AS b
  FROM toks, unnest(range(1, len(t))) AS u(i)
), pairs AS (
  SELECT a AS src, b AS dst FROM pr WHERE a <> b
  UNION ALL
  SELECT b AS src, a AS dst FROM pr WHERE a <> b
), edges AS (
  SELECT src, dst, count(*) AS w FROM pairs GROUP BY src, dst
), wdeg AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS wd FROM edges GROUP BY src
), e2 AS (
  SELECT e.src, e.dst, e.w, d.wd FROM edges e JOIN wdeg d USING (src)
), r0 AS (
  SELECT src, CAST(1000000 AS BIGINT) AS r FROM wdeg
), r1 AS (
  SELECT e2.dst AS src,
         150000 + (85 * sum((r0.r * e2.w) // e2.wd)) // 100 AS r
  FROM e2 JOIN r0 USING (src) GROUP BY e2.dst
), r2 AS (
  SELECT e2.dst AS src,
         150000 + (85 * sum((r1.r * e2.w) // e2.wd)) // 100 AS r
  FROM e2 JOIN r1 USING (src) GROUP BY e2.dst
), r3 AS (
  SELECT e2.dst AS src,
         150000 + (85 * sum((r2.r * e2.w) // e2.wd)) // 100 AS r
  FROM e2 JOIN r2 USING (src) GROUP BY e2.dst
)
SELECT src AS term, CAST(r AS BIGINT) AS rank_u FROM r3
ORDER BY rank_u DESC, term ASC LIMIT 20
"""
    d["x44_product_quantization"] = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x*1000000.0+0.5) AS BIGINT)) AS qv
  FROM embeddings
), m_ids AS (
  SELECT CAST(unnest(range(0,8)) AS INT) AS m
), cent_sub AS (
  SELECT CAST(vec_id AS INT) AS cid, m,
         qv[m*8+1 : m*8+8] AS cv
  FROM q, m_ids WHERE vec_id < 4
), data_sub AS (
  SELECT vec_id, m, qv[m*8+1 : m*8+8] AS dv
  FROM q, m_ids
), cand AS (
  SELECT d.vec_id, d.m, c.cid,
         list_sum(list_transform(range(1,9),
           i -> (d.dv[i]-c.cv[i])*(d.dv[i]-c.cv[i]))) AS d2
  FROM data_sub d JOIN cent_sub c ON d.m = c.m
), assigned AS (
  SELECT vec_id, m, cid AS code, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d2, cid) AS rn
    FROM cand) t WHERE rn = 1
)
SELECT CAST(m AS INT) AS m, CAST(code AS INT) AS code,
       CAST(count(*) AS BIGINT) AS n_assigned,
       CAST(sum(d2) AS BIGINT) AS total_sq_err_u
FROM assigned GROUP BY m, code
"""
    d["s6_variant_access"] = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
         AS sum_k,
       min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""
    # per-channel closed-form sums over the synthetic source pixels
    # (source dims, not resized — mm6 decodes the fixtures directly)
    d["mm6_image_channel_stats"] = """
WITH assets AS (
  SELECT range AS a, (8 + range % 5) AS w0, (6 + range % 4) AS h0
  FROM range(64) WHERE range % 3 = 0
), px AS (
  SELECT a, w0, h0,
         (a*7  + x.range * 13 + y.range * 31) % 256 AS b,
         (a*11 + x.range * 17 + y.range * 5 ) % 256 AS g,
         (a*3  + x.range * 29 + y.range * 23) % 256 AS r
  FROM assets, range(12) x, range(9) y
  WHERE x.range < w0 AND y.range < h0
)
SELECT a AS asset_id, CAST(w0 AS INT) AS width, CAST(h0 AS INT) AS height,
       CAST(sum(b) AS BIGINT) AS sum_b,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(r) AS BIGINT) AS sum_r
FROM px GROUP BY a, w0, h0
"""
    # w10's oracle uses the window (row_number) formulation — a
    # different algorithm than the struct-argmin aggregation.
