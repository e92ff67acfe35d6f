"""Round-5 operator invariants: st31's bucket width is an
implementation knob (results must be invariant under it), maxsim's
cand_pairs gate must be a pure restriction (all-pairs gate == no gate),
and knn_graph's shared-ranked-pass hook must be bit-identical to the
internal derivation."""

from __future__ import annotations

import pyspark.sql.functions as F

from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.similarity import (
    _ivf_codebook,
    _ivf_rank_cells,
    knn_graph,
    maxsim_topk,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
    load_table,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
    run_quantile_stream,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_st31_bucket_width_invariance(spark, sf001):
    """The exact quantiles cannot depend on the histogram bucket width —
    a coarser store changes directory fan-out and within-bucket rank
    arithmetic, never the answer."""
    a = _rows(run_quantile_stream(spark, sf001, bucket_width=2000.0))
    b = _rows(run_quantile_stream(spark, sf001, bucket_width=500.0))
    assert a == b


def test_maxsim_allpairs_gate_is_identity(spark, sf001):
    """cand_pairs covering every (query, candidate) pair must reproduce
    the ungated result exactly — the gate only restricts, never
    rescores."""
    emb = load_table(spark, sf001, "embeddings")
    vecs = emb.select(
        F.expr("CAST(vec_id DIV 4 AS BIGINT)").alias("doc_id"),
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    q = vecs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_doc"),
        F.col("vec_id").alias("qvid"),
        F.col("v").alias("qv"),
    )
    all_pairs = (
        q.select("query_doc")
        .distinct()
        .crossJoin(vecs.select(F.col("doc_id").alias("cand_doc")).distinct())
        .filter(F.col("query_doc") != F.col("cand_doc"))
    )
    ungated = _rows(maxsim_topk(vecs, q, k=5))
    gated = _rows(maxsim_topk(vecs, q, k=5, cand_pairs=all_pairs))
    assert ungated == gated


def test_knn_graph_shared_ranked_pass_identical(spark, sf001):
    """knn_graph(ranked=precomputed) must equal the internal derivation
    bit-for-bit — st24's deploy relies on it."""
    emb = load_table(spark, sf001, "embeddings")
    cent = _ivf_codebook(emb, "vec_id", "embedding", 8)
    internal = _rows(knn_graph(emb, k=3, n_probe=2, cent=cent))
    ranked = _ivf_rank_cells(emb, cent, "vec_id", "embedding", 2)
    shared = _rows(knn_graph(emb, k=3, n_probe=2, cent=cent, ranked=ranked))
    assert internal == shared
