"""Retrieval plan compositions that live package-side (r8 hygiene:
the entry module only registers them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.retrieval import (
    bm25_topk,
    mean_pooled_bags,
    pooled_cosine_topk,
    pooled_cosine_topk_ivf,
    rrf_fuse,
)
from ..functions.weather import round_half_up
from ..operators.similarity import _ivf_codebook, cosine_topk_bruteforce
from ..sources.tables import load_table


def x121b_hybrid_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH twin of st38b (r8) — the JOIN-pruned physical strategy of
    the same pruned hybrid: BM25 top-20 fused with the IVF-restricted
    pooled cosine top-20 (operators/retrieval.pooled_cosine_topk_ivf —
    candidates assign once against the full pooled table's first-16
    codebook, each query scores only its 4 probed cells' members).
    Returns EXACTLY st38b's rows: two physical strategies — join-pruned
    batch and directory-pruned serving — agree against ONE oracle (the
    x5d/x5f pattern lifted to the hybrid ranker; equality pinned by
    pytest)."""
    docs = load_table(spark, sf_dir, "documents")
    sparse = bm25_topk(
        docs.filter(F.col("doc_id") >= 5).select("doc_id", "text"),
        docs.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id"), "text"
        ),
        k=20,
    )
    # materialize the pooled store once — codebook, candidates, and
    # queries all read it (three recomputes of the pooling rollup
    # otherwise; in a deployment this IS the stored pooled table)
    pooled = mean_pooled_bags(
        load_table(spark, sf_dir, "embeddings")
    ).localCheckpoint(eager=True)
    dense = pooled_cosine_topk_ivf(
        pooled.filter(F.col("doc_id") >= 5),
        pooled.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id"), F.col("pv").alias("qv")
        ),
        k=20,
        codebook=_ivf_codebook(pooled, "doc_id", "pv", 16),
    ).select("query_id", "doc_id", "rank")
    return rrf_fuse(sparse, dense, k=10)


def x115_pooled_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POOLED (bi-encoder) retrieval over the same doc bags as x110 —
    the comparison every retrieval team runs: mean-pool each 4-vector
    bag into ONE doc vector (coordinates averaged on the int64
    micro-grid — the x112 centroid discipline, partition-order-free),
    then exact cosine top-5 between pooled query docs and pooled corpus
    docs. Completes the retrieval triptych: bi-encoder (THIS — one
    vector per doc, cheapest to serve), late interaction (x110 — every
    query vector keeps its own best match), and the IVF-pruned scale
    path (x110b); ranking disagreements between x115 and x110 are
    precisely the pairs where pooling loses token-level signal.
    Pooling is one dim-bounded posexplode rollup; search is the x5
    broadcast-query shape on a 4×-smaller table."""
    pooled = mean_pooled_bags(load_table(spark, sf_dir, "embeddings"))
    return pooled_cosine_topk(
        pooled,
        pooled.filter(F.col("doc_id") < 2).select(
            F.col("doc_id").alias("query_id"), F.col("pv").alias("qv")
        ),
        k=5,
        # legacy x115 rounding twin (oracle uses DuckDB round()):
        score_round=lambda c: F.round(c, 6),
    ).select(
        F.col("query_id").alias("query_doc"),
        F.col("doc_id").alias("cand_doc"),
        "cos_sim",
        "rank",
    )


def x107_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality EVAL for the vector stack — nDCG@10 of exact
    cosine retrieval against label relevance (the metric that grades
    x5/x5d/x93 beyond hit-counting recall: position matters). Per
    query (the x5 query set): top-11 exact neighbors, self-hit
    excluded, relevance = label match, DCG = Σ rel_p/log₂(p+1) with
    each positional gain QUANTIZED to integer 1e-9 units before the
    fold (the a21/x100 order-free discipline — ln-based weights are
    identical doubles on both engines, the sum is exact int64), and
    IDCG from the label's corpus population (min(10, |label|−1) ideal
    hits). Cost shape: the x5 broadcast-query scan + two label-keyed
    bounded joins + a 10-row weight table; the eval adds nothing
    super-linear to the search it grades."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ret = cosine_topk_bruteforce(emb, q, k=11).filter(
        F.col("vec_id") != F.col("query_id")
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    hits = ret.withColumn("p", F.row_number().over(wp)).filter(
        F.col("p") <= 10
    )
    labels = emb.select("vec_id", "label")
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    w_units = F.floor(
        F.lit(1_000_000_000.0) * F.log(F.lit(2.0)) / F.log(F.col("p") + 1.0)
        + F.lit(0.5)
    ).cast("long")
    gains = (
        hits.join(labels, "vec_id")
        .join(F.broadcast(qlab), "query_id")
        .select(
            "query_id",
            "qlabel",
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
            w_units.alias("w_units"),
        )
    )
    dcg = gains.groupBy("query_id", "qlabel").agg(
        F.sum("rel").cast("long").alias("n_rel_retrieved"),
        F.sum(F.col("rel") * F.col("w_units")).cast("long").alias("dcg_units"),
    )
    lc = emb.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    wtab = spark.range(1, 11).select(
        F.col("id").alias("p"),
        F.floor(
            F.lit(1_000_000_000.0)
            * F.log(F.lit(2.0))
            / F.log(F.col("id") + 1.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w_units"),
    )
    ideal = (
        dcg.join(lc, dcg.qlabel == lc.label)
        .join(
            F.broadcast(wtab),
            F.col("p") <= F.least(F.lit(10), F.col("c") - 1),
        )
        .groupBy("query_id")
        .agg(F.sum("w_units").cast("long").alias("idcg_units"))
    )
    return (
        dcg.join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.col("qlabel").cast("int").alias("query_label"),
            "n_rel_retrieved",
            F.when(
                F.coalesce(F.col("idcg_units"), F.lit(0)) == 0, F.lit(0.0)
            )
            .otherwise(
                round_half_up(
                    F.col("dcg_units").cast("double") / F.col("idcg_units"),
                    6,
                )
            )
            .alias("ndcg"),
        )
        .orderBy("query_id")
    )
