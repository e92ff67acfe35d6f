"""Retrieval plan compositions that live package-side (r8 hygiene:
the entry module only registers them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import (
    bm25_topk,
    mean_pooled_bags,
    pooled_cosine_topk,
    pooled_cosine_topk_ivf,
    rrf_fuse,
)
from ..operators.similarity import _ivf_codebook
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
