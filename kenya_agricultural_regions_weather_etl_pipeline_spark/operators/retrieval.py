"""Lexical + hybrid retrieval operators (BM25, reciprocal-rank
fusion) — the sparse complement of the dense stack in
:mod:`operators.similarity`.

A training-data pipeline greps its corpus constantly (decontamination
probes, eval-set leakage audits, targeted subset pulls); BM25 is the
standard lexical ranker for that, and its inverted-index shape is the
same term-keyed join the dedup family already uses. RRF is the
standard way those lexical lists are merged with a dense retriever's.
Capability parity: the reference repo stores flat weather rows only
(`daily_weather_etl_kenya.py` has no text path); this is §2.8
training-data extension surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

# Okapi BM25 constants — written as the exact decimal literals the
# DuckDB oracle uses, so both engines bind identical doubles.
K1 = 1.2
B = 0.75


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Okapi BM25 top-``k``: score every query (bag of distinct
    lowercase whitespace tokens) against the corpus and keep the ``k``
    best docs per query.

    Per (query, term, doc) with the term in both:

        idf    = ln(1 + (N - df + 0.5) / (df + 0.5))
        tfpart = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
        s      = idf · tfpart

    Exactness discipline (the x107 idiom): every per-term score is
    QUANTIZED to integer 1e-9 units — idf/tfpart are identical doubles
    on both engines (same integer inputs, same literal constants, same
    operation order) — and the per-(query, doc) fold SUMS int64
    exactly, so ranking and the 6-dp score are order-free and
    oracle-replayable.

    Scale shape: the scoring join is term-keyed against the tf
    inverted index (posting-list join — candidates are docs sharing
    ≥1 query term, never the full corpus per query); df/dl are
    term-/doc-keyed aggregates of the same index; the only broadcast
    is the 1-row corpus-stats frame; top-k is a per-query
    window-group-limit, no global sort.
    """
    tf = doc_postings(corpus, id_col, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dfc = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tok"),
    )
    qterms = query_terms(queries, query_id_col, text_col)
    return bm25_score_index(qterms, tf, dfc, dl, stats, k)


def doc_postings(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) — the posting rows of the inverted index.
    Batch-disjoint docs make this an append-only monoid: a doc's rows
    are complete within the batch that carries it (st37's state law)."""
    return (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def query_terms(
    queries: DataFrame,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, term): the distinct lowercase bag per query."""
    return queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col(text_col))))
        ).alias("term"),
    )


def bm25_score_index(
    qterms: DataFrame,
    tf: DataFrame,
    dfc: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    k: int,
) -> DataFrame:
    """Score queries against a MATERIALIZED index — the serving half
    of :func:`bm25_topk`, shared verbatim by the batch operator and
    st37's drained streaming index so the double expression order is
    identical by construction. Inputs: (query_id, term) bags, postings
    (doc_id, term, tf), term dictionary (term, df), doc lengths
    (doc_id, dl), 1-row (n_docs, total_tok)."""
    scored = (
        qterms.join(tf, "term")
        .join(dfc, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl",
            F.col("total_tok").cast("double") / F.col("n_docs"),
        )
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "tfpart",
            (F.col("tf") * F.lit(2.2))
            / (
                F.col("tf")
                + F.lit(1.2)
                * (
                    F.lit(0.25)
                    + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))
                )
            ),
        )
        .withColumn(
            "s_units",
            F.floor(
                F.lit(1_000_000_000.0) * F.col("idf") * F.col("tfpart")
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("s_units").cast("long").alias("units")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("units").desc(), F.col("doc_id").asc()
    )
    from ..functions.weather import round_half_up

    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            round_half_up(
                F.col("units") / F.lit(1_000_000_000.0), 6
            ).alias("bm25"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    k: int = 10,
    k_const: float = 60.0,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists (the
    Cormack/Clarke/Buettcher combiner every hybrid-search stack ships):
    per (query_id, doc_id), ``rrf = Σ_legs 1/(k_const + rank)`` with a
    missing leg contributing 0, then top-``k`` per query by
    (rrf desc, doc_id asc).

    Determinism: both legs' ranks are exact integers, the two
    reciprocal terms are computed in a FIXED order (sparse + dense) on
    identical doubles, and ties (e.g. sparse-only rank r vs dense-only
    rank r) break on doc_id — so the fused ranking replays exactly in
    any engine.

    Scale shape: one equi-join of two (Q·leg_k)-row frames — both
    sides bounded by the legs' top-k, never corpus-sized — and a
    per-query window-group-limit.
    """
    from ..functions.weather import round_half_up

    s = sparse.select(
        "query_id", "doc_id", F.col("rank").alias("rank_s")
    )
    d = dense.select(
        "query_id", "doc_id", F.col("rank").alias("rank_d")
    )
    fused = s.join(d, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf",
        F.coalesce(
            F.lit(1.0) / (F.lit(k_const) + F.col("rank_s")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(k_const) + F.col("rank_d")), F.lit(0.0)
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            round_half_up(F.col("rrf"), 6).alias("rrf_score"),
            F.col("rank").cast("int").alias("rank"),
            F.col("rank_s").cast("int").alias("sparse_rank"),
            F.col("rank_d").cast("int").alias("dense_rank"),
        )
    )


def phrase_match(
    corpus: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact PHRASE search over a positional term index — the query
    class BM25's bag-of-words structurally cannot answer ("foo bar
    baz" as consecutive tokens, not three floating terms).

    ``phrases``: (query_id, t1, t2, t3) — a 3-term phrase per query.
    The corpus is indexed once as positional postings (doc_id, pos,
    term) — one narrow explode, the x102/st30 layout at gram size 1 —
    and a phrase hit is the classic positional-intersection: t1's
    postings equi-join t2's at pos+1, then t3's at pos+2. Every join
    is hash-keyed on (term, doc_id, adjacent position); candidate rows
    after the first join are bounded by the RAREST term's posting
    list, never the corpus.

    Returns (query_id, doc_id, n_matches, first_pos): documents
    containing the phrase, with occurrence count and the earliest
    1-based token position.
    """
    idx = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(F.lower(F.col(text_col)))).alias(
                "idx", "term"
            ),
        )
        .select("doc_id", (F.col("idx") + 1).alias("pos"), "term")
    )
    m1 = idx.join(
        phrases.select("query_id", "t1", "t2", "t3"),
        F.col("term") == F.col("t1"),
    ).select("query_id", "doc_id", "pos", "t2", "t3")
    i2 = idx.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("term").alias("term2"),
    )
    m2 = m1.join(
        i2,
        (F.col("doc_id") == F.col("d2"))
        & (F.col("p2") == F.col("pos") + 1)
        & (F.col("term2") == F.col("t2")),
    ).select("query_id", "doc_id", "pos", "t3")
    i3 = idx.select(
        F.col("doc_id").alias("d3"),
        F.col("pos").alias("p3"),
        F.col("term").alias("term3"),
    )
    m3 = m2.join(
        i3,
        (F.col("doc_id") == F.col("d3"))
        & (F.col("p3") == F.col("pos") + 2)
        & (F.col("term3") == F.col("t3")),
    ).select("query_id", "doc_id", "pos")
    return m3.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
    )


def prf_expansion(
    corpus: DataFrame,
    queries: DataFrame,
    fb_k: int = 5,
    n_terms: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Pseudo-relevance-feedback query EXPANSION (the RM1/RM3 family's
    deterministic core): take each query's BM25 top-``fb_k`` feedback
    docs, score every term they contain by its summed term frequency
    across the feedback set (exact int64 — no probability smoothing,
    so the ranking replays in SQL), drop the original query terms, and
    keep the ``n_terms`` best per query by (weight desc, term asc).

    Scale shape: feedback sets are Q·fb_k rows; the expansion join
    touches only the feedback DOCS' postings (doc-keyed join against
    the tf index), never the corpus vocabulary.
    """
    tf = doc_postings(corpus, id_col, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dfc = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tok"),
    )
    qterms = query_terms(queries, query_id_col, text_col)
    return prf_expansion_from_index(
        qterms, tf, dfc, dl, stats, fb_k, n_terms
    )


def prf_expansion_from_index(
    qterms: DataFrame,
    tf: DataFrame,
    dfc: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    fb_k: int = 5,
    n_terms: int = 10,
) -> DataFrame:
    """:func:`prf_expansion`'s scoring tail against an ALREADY-BUILT
    inverted index — split out (r9) so a composite eval
    (e2e_retrieval_eval) can feed one shared tf/df/dl/stats pass to
    both its hybrid and PRF legs instead of tokenizing the corpus once
    per leg. Semantics identical to :func:`prf_expansion`."""
    fb = bm25_score_index(qterms, tf, dfc, dl, stats, fb_k).select(
        "query_id", "doc_id"
    )
    cand = (
        fb.join(tf, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").cast("long").alias("weight"))
        .join(qterms, ["query_id", "term"], "left_anti")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("weight").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_terms)
        .select(
            "query_id",
            "term",
            "weight",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def mean_pooled_bags(
    emb: DataFrame,
    bag_size: int = 4,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(doc_id, pv): each ``bag_size``-vector embedding bag mean-pooled
    into ONE doc vector with coordinates averaged on the int64
    micro-grid (the x112 centroid discipline — quantize each coordinate
    to 1e-6 units, sum exactly, divide once), so the pooled vector is
    partition-order-free and bit-identical in any engine. Shared by
    x115 (pooled retrieval), x121's dense leg, and st38's serving store.
    One dim-bounded posexplode rollup; nothing wider than (doc, pos)
    ever shuffles.

    The bag convention (``vec_id DIV bag_size``) is a parameter, not a
    baked-in fixture fact (ADVICE r7): a caller with a different bag
    layout passes its own size/columns instead of silently mis-pooling.
    """
    # Validate + backtick the identifier before SQL interpolation
    # (ADVICE r8): a non-identifier column name must fail loudly here,
    # not produce broken/unintended SQL. `DIV` (truncating integer
    # division) is kept — floor() on a double quotient would diverge
    # for negative ids.
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", vec_id_col):
        raise ValueError(
            f"vec_id_col must be a plain identifier, got {vec_id_col!r}"
        )
    vecs = emb.select(
        F.expr(
            f"CAST(`{vec_id_col}` DIV {int(bag_size)} AS BIGINT)"
        ).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return _micro_grid_pool(vecs)


def _micro_grid_pool(vecs: DataFrame) -> DataFrame:
    """The (doc_id, v) → (doc_id, pv) rollup behind
    :func:`mean_pooled_bags`: posexplode, 1e-6 quantize, exact int64
    sum per coordinate, one division, re-assemble ordered by pos."""
    return (
        vecs.select("doc_id", F.posexplode("v").alias("pos", "x"))
        .withColumn(
            "q", F.expr("CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)")
        )
        .groupBy("doc_id", "pos")
        .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "p",
            F.col("sq").cast("double") / F.col("n") / F.lit(1000000.0),
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "p"))),
                lambda s: s["p"],
            ).alias("pv")
        )
    )


def pooled_cosine_topk_ivf(
    cands: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF-pruned pooled cosine top-``k`` — :func:`pooled_cosine_topk`
    with the x5d candidate restriction: candidates assign once to the
    nearest of the first-``n_centroids`` pooled docs, each query
    scores ONLY its ``n_probe`` nearest cells' members. This is the
    JOIN-pruned batch twin of st38b's directory-pruned serving leg —
    identical rows, two physical strategies, one oracle (the x5d/x5f
    pair lifted to pooled vectors).

    ``cands``: (doc_id, pv); ``queries``: (query_id, qv);
    ``codebook``: the (centroid_id, cent_vec) frame to assign against
    (default: the first n_centroids of ``cands`` — pass the FULL
    pooled table's codebook when candidates are a filtered slice, so
    cells match a store deployed before the filter)."""
    from .similarity import _ivf_assign, _ivf_codebook, _ivf_probes
    from ..functions.vectors import cosine_given_norms, norm
    from ..functions.weather import round_half_up

    cent = (
        codebook
        if codebook is not None
        else _ivf_codebook(cands, "doc_id", "pv", n_centroids)
    )
    assigned = _ivf_assign(cands, cent, "doc_id", "pv").withColumn(
        "cnrm", norm(F.col("cvec"))
    )
    probes = _ivf_probes(
        queries.select("query_id", F.col("qv").alias("pv")),
        cent,
        "query_id",
        "pv",
        n_probe,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        assigned.join(
            F.broadcast(probes.withColumn("qnrm", norm(F.col("qvec")))),
            "cell",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            round_half_up(
                cosine_given_norms(
                    F.col("cvec"),
                    F.col("qvec"),
                    F.col("cnrm"),
                    F.col("qnrm"),
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def grade_runs(runs: DataFrame, labels: DataFrame) -> DataFrame:
    """The retrieval-eval grading tail shared by x116/x124/x130: per
    ``system``, label-consistency precision@depth over a
    (system, query_doc, cand_doc, rank) runs frame — integer hit
    counts, one division, labels broadcast twice (query side and
    candidate side). The label join is inner: candidates outside the
    label universe drop identically for every system."""
    ql = labels.select(
        F.col("doc_id").alias("query_doc"), F.col("label").alias("qlab")
    )
    cl = labels.select(
        F.col("doc_id").alias("cand_doc"), F.col("label").alias("clab")
    )
    hits = (
        runs.join(F.broadcast(ql), "query_doc")
        .join(F.broadcast(cl), "cand_doc")
        .withColumn("hit", (F.col("qlab") == F.col("clab")).cast("long"))
    )
    return hits.groupBy("system").agg(
        F.countDistinct("query_doc").cast("long").alias("n_queries"),
        F.sum("hit").cast("long").alias("n_hits"),
        F.sum(
            F.when(F.col("rank") == 1, F.col("hit")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("hits_at_1"),
        (
            F.sum("hit").cast("double") / F.count(F.lit(1))
        ).alias("precision_at_5"),
    )


def geometric_bag_labels(emb: DataFrame, n_cells: int = 8) -> DataFrame:
    """(doc_id, label): a GEOMETRY-CORRELATED gold label per doc bag —
    the bag's pooled vector assigned to the nearest of the first
    ``n_cells`` pooled docs (x5d's deterministic codebook, raw-double
    cosine, centroid-id tiebreak), so label similarity IS embedding
    similarity by construction.

    This is the label fixture the retrieval evals (x116/x124) grade
    against (VERDICT r7 #6): the corpus's stored ``label`` column is
    generated independently of both text and geometry, so every system
    graded on it reads chance — a comparison that decides nothing. The
    derived geometric gold makes the four-way comparison adjudicate
    what it structurally can: systems that rank by embedding geometry
    (pooled, late interaction, and the dense half of the hybrid) grade
    far above chance, a text-only ranker (BM25) stays at chance — the
    measured gap is the dense legs' serving value on this corpus. One
    bounded broadcast-codebook pass; exactly replayable in SQL."""
    from .similarity import _ivf_assign, _ivf_codebook

    pooled = mean_pooled_bags(emb)
    cent = _ivf_codebook(pooled, "doc_id", "pv", n_cells)
    return _ivf_assign(pooled, cent, "doc_id", "pv").select(
        F.col("vec_id").alias("doc_id"),
        F.col("cell").cast("long").alias("label"),
    )


def pooled_cosine_topk(
    cands: DataFrame,
    queries: DataFrame,
    k: int,
    score_round: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Exact cosine top-``k`` of pooled QUERY vectors against a pooled
    candidate store — the dense leg shared by x115 (pooled retrieval),
    x121 (hybrid RRF), and st38's serving loop, extracted here so the
    ranking expression exists exactly once (VERDICT r7 #4).

    ``cands``: (doc_id, pv[, cnrm]); ``queries``: (query_id,
    qv[, qnrm]) — norms are computed with :func:`functions.vectors.norm`
    when absent, so callers that precompute them (st38's frozen store)
    keep their plan. ``score_round`` maps the raw cosine Column to the
    ranked score (default: 6-dp half-up — rank on the ROUNDED value so
    ordering is engine-independent; x115 passes its legacy
    ``F.round`` twin).

    Scale shape: the query frame is broadcast (Q rows), the candidate
    store streams once per ranking, self-pairs are excluded, and top-k
    is a per-query window-group-limit — no global sort, nothing
    super-linear in the corpus.
    """
    from ..functions.vectors import cosine_given_norms, norm
    from ..functions.weather import round_half_up

    if score_round is None:
        def score_round(c: Column) -> Column:
            return round_half_up(c, 6)

    if "cnrm" not in cands.columns:
        cands = cands.withColumn("cnrm", norm(F.col("pv")))
    if "qnrm" not in queries.columns:
        queries = queries.withColumn("qnrm", norm(F.col("qv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc()
    )
    return (
        cands.join(
            F.broadcast(queries), F.col("doc_id") != F.col("query_id")
        )
        .withColumn(
            "cos_sim",
            score_round(
                cosine_given_norms(
                    F.col("pv"),
                    F.col("qv"),
                    F.col("cnrm"),
                    F.col("qnrm"),
                )
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )
