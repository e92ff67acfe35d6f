"""Oracle family block 20: round-9 second-window additions — the
curation family (semantic decontamination audit x134 + removal x135,
preference pairs x136, UniMax allocation x137 + its execution x139,
the seeded shard plan x138) and the st46/st47 streaming aliases.

Same contract as b01–b19: ``add(d, ns)`` only ADDS keys; ``ns`` is
the __spark_entry__ module for any name-scope bindings.
"""

from ..functions.text import quality_score_sql, token_count_sql
from ..plans.curation import (
    DECONTAM_COSINE_THRESHOLD,
    DECONTAM_EVAL_MAX_ID,
    N_EXPORT_SHARDS,
    PREFERENCE_PAIR_DEPTH,
    UNIMAX_BUDGET_MULTIPLE,
    UNIMAX_EPOCH_CAP,
    doc_hash_sql,
)


def _decontam_cte() -> str:
    """The e → ev/tr split + per-pair 6dp cosine ``p`` CTE prefix —
    shared byte-identically by x134 (the audit) and x135 (the
    removal), mirroring the Spark side's shared decontam_pairs
    builder so audit and execution can never drift."""
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), ev AS (
  SELECT vec_id AS eval_id, v FROM e
  WHERE vec_id % 10 = 0 AND vec_id < {DECONTAM_EVAL_MAX_ID}
), tr AS (
  SELECT vec_id AS train_id, v FROM e
  WHERE NOT (vec_id % 10 = 0 AND vec_id < {DECONTAM_EVAL_MAX_ID})
), p AS (
  SELECT ev.eval_id, tr.train_id,
         round(list_dot_product(tr.v, ev.v)
               / (sqrt(list_dot_product(tr.v, tr.v))
                  * sqrt(list_dot_product(ev.v, ev.v))), 6) AS c
  FROM ev CROSS JOIN tr
)"""


def _unimax_cte() -> str:
    """The WITH RECURSIVE prefix replaying the x137 UniMax fold —
    counts → tot → sorted sources → the sequential budget recurrence
    ``r``. Shared by x137 (the plan) and x139 (its execution) so the
    two can never drift (the b17 parameterized-builder discipline)."""
    cap = UNIMAX_EPOCH_CAP
    mult = UNIMAX_BUDGET_MULTIPLE
    tok = token_count_sql("text")
    return f"""
WITH RECURSIVE counts AS (
  SELECT source, CAST(sum({tok}) AS BIGINT) AS sz
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST({mult} * sum(sz) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM counts
), s AS (
  SELECT source, sz, row_number() OVER (ORDER BY sz, source) AS rn
  FROM counts
), r AS (
  SELECT CAST(0 AS BIGINT) AS rn, (SELECT b FROM tot) AS remaining,
         CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS sz,
         CAST(NULL AS BIGINT) AS alloc
  UNION ALL
  SELECT s.rn,
         r.remaining - least({cap} * s.sz,
                             r.remaining // ((SELECT n FROM tot) - r.rn)),
         s.source, s.sz,
         least({cap} * s.sz,
               r.remaining // ((SELECT n FROM tot) - r.rn))
  FROM r JOIN s ON s.rn = r.rn + 1
)"""


def add(d, ns):
    # x134: eval = vec_id % 10 = 0, train = rest; per-eval hit count +
    # max 6dp cosine + nearest train id (ties on the rounded cosine
    # break to the SMALLEST train_id — the Spark side's
    # max(struct(c, -train_id)) ordering). The per-pair round happens
    # BEFORE the max/compare on both engines, so fold order is moot.
    tau = DECONTAM_COSINE_THRESHOLD
    d["x134_semantic_decontamination"] = (
        _decontam_cte()
        + f""", ranked AS (
  SELECT eval_id, train_id, c,
         row_number() OVER (PARTITION BY eval_id
                            ORDER BY c DESC, train_id ASC) AS rn
  FROM p
), agg AS (
  SELECT eval_id,
         CAST(count(*) FILTER (WHERE c >= {tau}) AS BIGINT) AS n_contaminated
  FROM p GROUP BY eval_id
)
SELECT a.eval_id, a.n_contaminated, r.c AS max_cos,
       CAST(r.train_id AS BIGINT) AS nearest_train_id,
       CAST(a.n_contaminated > 0 AS INT) AS contaminated
FROM agg a JOIN ranked r ON r.eval_id = a.eval_id AND r.rn = 1
"""
    )

    # st46 drains to the batch x134 verdict row-for-row (the st19
    # deploy-the-artifact pattern with ASSOCIATIVE partials: sum/max
    # merge exactly under any train-slice batching) — one oracle
    # covers the audit and its streaming deployment.
    d["st46_decontamination_ingest"] = d["x134_semantic_decontamination"]

    # x135: x134 executed corpus-side — leak docs (any eval hit at the
    # same threshold) leave; per-source kept/removed ledger. vec_id =
    # doc_id is the established hybrid-retrieval identification.
    d["x135_decontamination_removal"] = (
        _decontam_cte()
        + f""", leaks AS (
  SELECT DISTINCT train_id AS doc_id FROM p WHERE c >= {tau}
), corpus AS (
  SELECT source, doc_id, {token_count_sql('text')} AS n_tok
  FROM documents
  WHERE NOT (doc_id % 10 = 0 AND doc_id < {DECONTAM_EVAL_MAX_ID})
), tagged AS (
  SELECT c.source, c.n_tok, l.doc_id IS NOT NULL AS leak
  FROM corpus c LEFT JOIN leaks l ON l.doc_id = c.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE leak) AS BIGINT) AS n_removed,
       CAST(count(*) FILTER (WHERE NOT leak) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN leak THEN 0 ELSE n_tok END) AS BIGINT)
         AS tokens_kept,
       CAST(sum(CASE WHEN leak THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_removed,
       round(count(*) FILTER (WHERE leak)::DOUBLE / count(*), 6)
         AS removal_rate
FROM tagged GROUP BY source
"""
    )

    # x136: rank by the x7 quality score inside (lang, source); the
    # worst ranking is the exact mirror of (q DESC, doc_id ASC), so
    # n - rn + 1 IS the rank from the bottom; zero-margin pairs drop.
    k = PREFERENCE_PAIR_DEPTH
    q = quality_score_sql("text")
    d["x136_preference_pairs"] = f"""
WITH scored AS (
  SELECT lang, source, doc_id, {q} AS q FROM documents
), ranked AS (
  SELECT lang, source, doc_id, q,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY q DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY lang, source) AS n
  FROM scored
), best AS (
  SELECT lang, source, CAST(rn AS INT) AS pair_rank,
         doc_id AS chosen_id, q AS chosen_q
  FROM ranked WHERE rn <= {k} AND 2 * rn <= n
), worst AS (
  SELECT lang, source, CAST(n - rn + 1 AS INT) AS pair_rank,
         doc_id AS rejected_id, q AS rejected_q
  FROM ranked WHERE rn > n - {k} AND 2 * (n - rn + 1) <= n
)
SELECT b.lang, b.source, b.pair_rank, b.chosen_id, w.rejected_id,
       b.chosen_q, w.rejected_q,
       round(b.chosen_q - w.rejected_q, 6) AS margin
FROM best b
JOIN worst w ON w.lang = b.lang AND w.source = b.source
            AND w.pair_rank = b.pair_rank
WHERE round(b.chosen_q - w.rejected_q, 6) > 0
"""

    # st47 drains to the batch x136 pairs row-for-row (recompute-on-
    # touch: cohort pairs depend only on cohort membership, so the
    # last re-mine of every cohort sees its full final membership).
    d["st47_preference_pair_stream"] = d["x136_preference_pairs"]

    # x137: the UniMax fold replayed as a recursive CTE — BIGINT `//`
    # mirrors the Spark side's `div` exactly (both truncate; every
    # operand is non-negative); the single float division is the final
    # epochs ratio, rounded once to 6dp on both engines. The CTE
    # prefix is shared byte-identically with x139, which EXECUTES the
    # allocation this query plans (the b17 _hybrid_sql reuse pattern).
    cap = UNIMAX_EPOCH_CAP
    d["x137_unimax_allocation"] = (
        _unimax_cte()
        + f"""
SELECT source, sz AS sz_tokens, alloc AS alloc_tokens,
       round(alloc::DOUBLE / sz, 6) AS epochs,
       CAST(alloc = {cap} * sz AS INT) AS capped
FROM r WHERE rn > 0
"""
    )

    _add_export_family(d)


def _add_export_family(d):
    """x138 shard plan + x139 epoch materialization (appended by
    ``add``; split out only to keep the function readable)."""
    from ..functions.text import token_count_sql as _tok

    tok = _tok("text")
    h = doc_hash_sql("doc_id")
    n = N_EXPORT_SHARDS
    # x138: portable seeded shard assignment (h ≥ 0, so plain % is
    # pmod on both engines) + the integer-ppm balance audit.
    d["x138_shard_export_plan"] = f"""
WITH docs AS (
  SELECT doc_id, {tok} AS n_tok, ({h}) % {n} AS shard FROM documents
), per AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
         min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
  FROM docs GROUP BY shard
), tot AS (
  SELECT CAST(sum(shard_tokens) AS BIGINT) AS total_tokens FROM per
)
SELECT CAST(shard AS INT) AS shard, n_docs, shard_tokens,
       min_doc_id, max_doc_id,
       CAST(shard_tokens * 1000000 // total_tokens AS BIGINT)
         AS token_share_ppm
FROM per, tot
"""

    # st48 drains to the batch x138 audit row-for-row (stateless
    # per-row shard assignment + a full-store drain aggregation are
    # trivially batching-invariant) — one oracle for the plan and the
    # shard writer.
    d["st48_shard_export_stream"] = d["x138_shard_export_plan"]

    # x139: the x137 allocation EXECUTED — whole epochs = alloc // sz
    # per doc, the remainder filled greedily in portable-hash order
    # (ties → doc_id) while the running token sum fits. Composes the
    # SAME _unimax_cte prefix as x137 byte-identically.
    d["x139_epoch_materialization"] = (
        _unimax_cte()
        + f""", alloc AS (
  SELECT source, sz, alloc FROM r WHERE rn > 0
), d2 AS (
  SELECT d.source, d.doc_id, {tok} AS n_tok, ({h}) AS h
  FROM documents d
), j AS (
  SELECT d2.source, d2.doc_id, d2.n_tok, d2.h,
         a.sz AS sz_tokens, a.alloc AS alloc_tokens,
         a.alloc // a.sz AS n_full, a.alloc % a.sz AS remainder
  FROM d2 JOIN alloc a ON a.source = d2.source
), ranked AS (
  SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM j
), extra AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_extra_docs,
         CAST(sum(n_tok) AS BIGINT) AS extra_tokens
  FROM ranked WHERE cum_tok <= remainder GROUP BY source
), base AS (
  SELECT source, sz_tokens, alloc_tokens, n_full,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM j GROUP BY source, sz_tokens, alloc_tokens, n_full
)
SELECT b.source, b.n_docs,
       CAST(b.n_full AS BIGINT) AS n_full_copies,
       CAST(coalesce(e.n_extra_docs, 0) AS BIGINT) AS n_extra_docs,
       CAST(coalesce(e.extra_tokens, 0) AS BIGINT) AS extra_tokens,
       CAST(b.n_full * b.sz_tokens + coalesce(e.extra_tokens, 0)
            AS BIGINT) AS realized_tokens,
       CAST(CASE WHEN b.alloc_tokens = 0 THEN 1000000
            ELSE (b.n_full * b.sz_tokens + coalesce(e.extra_tokens, 0))
                 * 1000000 // b.alloc_tokens END AS BIGINT)
         AS fidelity_ppm
FROM base b LEFT JOIN extra e ON e.source = b.source
"""
    )
