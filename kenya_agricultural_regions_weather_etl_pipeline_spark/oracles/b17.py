"""Oracle family block 17: round-7 additions (BM25 lexical
retrieval, grouped weighted median, weighted-quantile stream).

Same contract as b01–b16: ``add(d, ns)`` only ADDS keys; ``ns`` is
the __spark_entry__ module for any name-scope bindings.
"""


def add(d, ns):
    # Shared whitespace tokenizer twin (functions/text.py tokens():
    # split on \s+, drop empty strings) applied to lowercased text.
    toks = (
        "list_filter(regexp_split_to_array(lower(text), '\\s+'), "
        "t -> t <> '')"
    )

    # x120: Okapi BM25 top-5 — per-term score quantized to integer
    # 1e-9 units before the per-(query, doc) fold (the x107 exactness
    # discipline), identical double expression order on both engines.
    d["x120_bm25_topk"] = f"""
WITH toksc AS (
  SELECT doc_id, unnest({toks}) AS term
  FROM documents WHERE doc_id >= 5
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
    FROM documents WHERE doc_id < 5
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
FROM ranked WHERE rank <= 5
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
