"""Oracle family block 01: core scans, filters, projections, pricing.

Auto-split from __spark_entry__.oracle_sql() (round 6) — a PURE
refactor: the emitted SQL is byte-identical to the pre-split
builder (pinned by tests/test_oracle_refactor.py). `ns` is the
__spark_entry__ module; the explicit bindings below restore the
moved code's original name scope.
"""


def add(d, ns):
    F = ns.F
    Q1_ORACLE = ns.Q1_ORACLE
    W = ns.W
    _p1_oracle = ns._p1_oracle
    a14_mad_robust = ns.a14_mad_robust
    a1_count_distinct = ns.a1_count_distinct
    a2_null_counts = ns.a2_null_counts
    a3_min_max = ns.a3_min_max
    a4_group_counts = ns.a4_group_counts
    a6_pivot = ns.a6_pivot
    a7_quantiles = ns.a7_quantiles
    b1_broadcast_join = ns.b1_broadcast_join
    b2_salted_join = ns.b2_salted_join
    f1_range_filter = ns.f1_range_filter
    f3_date_filter = ns.f3_date_filter
    j1_asof_join = ns.j1_asof_join
    j2_range_join = ns.j2_range_join
    p1_agronomic_derivations = ns.p1_agronomic_derivations
    p5_quantity_binning = ns.p5_quantity_binning
    p6_date_parts = ns.p6_date_parts
    p7_epoch_conversion = ns.p7_epoch_conversion
    p8_rounding = ns.p8_rounding
    q1_pricing_summary = ns.q1_pricing_summary
    q2_brand_revenue = ns.q2_brand_revenue
    q3_top_revenue_orders = ns.q3_top_revenue_orders
    q5_regional_revenue = ns.q5_regional_revenue
    q6_scalar_subquery = ns.q6_scalar_subquery
    r1_dedup_keep_first = ns.r1_dedup_keep_first
    r2_upsert_last_write_wins = ns.r2_upsert_last_write_wins
    s2_json_access = ns.s2_json_access

    d.update({
        "q1_pricing_summary": Q1_ORACLE,
        "f1_range_filter": """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity >= 5 AND l_quantity <= 45
  AND l_discount >= 0.02 AND l_discount <= 0.08
""",
        "f3_date_filter": """
SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
""",
        "p1_agronomic_derivations": _p1_oracle(),
        "p5_quantity_binning": f"""
SELECT {W.rainfall_category_sql('l_quantity')} AS bin, count(*) AS n
FROM lineitem GROUP BY 1
""",
        "p6_date_parts": """
SELECT l_orderkey, l_linenumber,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
       CAST(hour(l_shipdate) AS INT) AS ship_hour,
       CAST(month(l_shipdate) AS INT) AS ship_month,
       CAST(year(l_shipdate) AS INT) AS ship_year
FROM lineitem
""",
        "p7_epoch_conversion": """
SELECT event_id, epoch_us(ts) AS ts_us, date_trunc('second', ts) AS ts_sec
FROM events
""",
        "p8_rounding": f"""
SELECT l_orderkey, l_linenumber,
       {W.round_half_up_sql('l_extendedprice * (1 - l_discount)', 2)} AS disc_price_2,
       {W.round_half_up_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS charged_4
FROM lineitem
""",
        "r1_dedup_keep_first": """
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
  FROM events) WHERE rn = 1
""",
        "r2_upsert_last_write_wins": """
WITH unioned AS (
  SELECT *, 0 AS src FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT *, 1 AS src FROM events WHERE event_id % 2 = 1
)
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, src DESC) AS rn
  FROM unioned) WHERE rn = 1
""",
        "a1_count_distinct": """
SELECT count(DISTINCT l_suppkey) AS unique_suppliers,
       count(DISTINCT l_partkey) AS unique_parts
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
""",
        "a2_null_counts": """
WITH d AS (
  SELECT CASE WHEN value < 10 THEN NULL ELSE value END AS v,
         CASE WHEN event_type = 'view' THEN NULL ELSE event_type END AS p
  FROM events)
SELECT CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
       CAST(sum(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_type,
       count(*) AS total
FROM d
""",
        "a3_min_max": """
SELECT min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
       strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
FROM lineitem
""",
        "a4_group_counts": """
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders GROUP BY o_orderstatus
""",
        "a14_mad_robust": f"""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       {W.round_half_up_sql(
           "quantile_cont(abs(l.l_extendedprice - m.med), 0.5)", 4)} AS mad,
       count(*) AS n
FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag
""",
        "a7_quantiles": f"""
SELECT l_returnflag,
       {W.round_half_up_sql('quantile_cont(l_extendedprice, 0.5)', 4)} AS p50,
       {W.round_half_up_sql('quantile_cont(l_extendedprice, 0.9)', 4)} AS p90,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
        "s2_json_access": """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod, count(*) AS n
FROM events GROUP BY 1
""",
        "q2_brand_revenue": f"""
SELECT p_brand,
       {W.round_half_up_sql('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
        "q3_top_revenue_orders": """
SELECT o_orderkey, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
        "q5_regional_revenue": """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
        "b1_broadcast_join": """
SELECT n_name, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
        "j1_asof_join": """
SELECT c.event_id, c.user_id, c.ts,
       (SELECT max(v.ts) FROM events v
        WHERE v.event_type = 'view' AND v.user_id = c.user_id
          AND v.ts <= c.ts) AS asof_view_ts
FROM events c WHERE c.event_type = 'click'
""",
        "j2_range_join": """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT c.event_id, c.user_id, c.ts,
       CAST((SELECT count(*) FROM v
             WHERE v.user_id = c.user_id
               AND abs(CAST(floor(epoch(v.ts)) AS BIGINT)
                       - CAST(floor(epoch(c.ts)) AS BIGINT)) <= 1800) AS BIGINT)
         AS n_nearby_views
FROM c
""",
        "a6_pivot": """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
""",
        "b2_salted_join": f"""
SELECT o_orderstatus, count(*) AS n_items,
       {W.round_half_up_sql('sum(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
        "q6_scalar_subquery": """
SELECT o_orderpriority, count(*) AS n_above
FROM orders
WHERE o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders)
GROUP BY o_orderpriority
""",
    })
