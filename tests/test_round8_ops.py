"""Round-8 operator invariants: st38b's pruned dense serving leg
(partition-pruned cell reads + the probe-everything ⇒ x121 equality
law) and the erasure-propagation extensions."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_st38b_cell_layout_read_is_partition_pruned(spark, sf001):
    """The pruned-serving claim, physically: the per-batch dense read
    must carry PartitionFilters on the cell directory column (reading
    only the probed cells' directories), and the probed cell set must
    stay bounded by |batch|·n_probe — driver-side metadata, not data."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.retrieval import (
        mean_pooled_bags,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.similarity import (
        _ivf_assign,
        _ivf_codebook,
        _ivf_probes,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions.vectors import (
        norm,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    pooled = mean_pooled_bags(load_table(spark, sf001, "embeddings"))
    cent = _ivf_codebook(pooled, "doc_id", "pv", 16)
    with tempfile.TemporaryDirectory(prefix="st38b_cells_") as d:
        cells_path = os.path.join(d, "cells")
        (
            _ivf_assign(
                pooled.filter(F.col("doc_id") >= 5), cent, "doc_id", "pv"
            )
            .withColumn("cnrm", norm(F.col("cvec")))
            .write.partitionBy("cell")
            .parquet(cells_path)
        )
        qv = pooled.filter(F.col("doc_id") < 2).select(
            F.col("doc_id").alias("query_id"), "pv"
        )
        probes = _ivf_probes(qv, cent, "query_id", "pv", 4)
        cells = [r[0] for r in probes.select("cell").distinct().collect()]
        assert 0 < len(cells) <= 2 * 4  # |batch|=2 queries x n_probe=4
        layout = spark.read.parquet(cells_path).filter(
            F.col("cell").isin(cells)
        )
        jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = layout._jdf.queryExecution().explainString(jvm_mode)
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf, plan
        assert any("cell" in ln and " IN (" in ln for ln in pf), pf


def test_st38b_probe_everything_equals_x121(spark, sf001):
    """The equivalence law that isolates st38b's ONLY approximation to
    the probe restriction: with n_probe == n_centroids every query
    probes every cell, the dense leg sees the full candidate store,
    and the fused output must equal the exact batch x121 row-for-row
    (same ranks, same 6-dp scores)."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_hybrid_serve_pruned,
    )

    pruned = run_hybrid_serve_pruned(
        spark, sf001, n_batches=2, n_centroids=16, n_probe=16
    )
    exact = entrymod.queries()["x121_hybrid_rrf"](spark, sf001)
    assert _rows(pruned) == _rows(exact)


def test_mean_pooled_bags_bag_size_parameter(spark):
    """ADVICE r7: the bag convention is a parameter, not a baked-in
    fixture fact — pooling 2-vector bags with bag_size=2 must average
    pairs on the 1e-6 grid, and the default stays the 4-vector
    fixture layout."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.retrieval import (
        mean_pooled_bags,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 3.0]),
            (1, [2.0, 5.0]),
            (2, [10.0, 0.0]),
            (3, [0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["doc_id"]: r["pv"]
        for r in mean_pooled_bags(emb, bag_size=2).collect()
    }
    assert got == {0: [1.5, 4.0], 1: [5.0, 0.0]}
    got4 = {
        r["doc_id"]: r["pv"] for r in mean_pooled_bags(emb).collect()
    }
    assert got4 == {0: [3.25, 2.0]}


def test_x127_erasure_cell_repair_semantics(spark, sf001):
    """Conservation laws of the vector-store repair: every reported
    cell lost >= 1 member, new = old - dropped, vanishes iff new == 0,
    and the summed drops equal the deletion set's size exactly (no
    deleted vector escapes its cell, none is counted twice)."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = entrymod.queries()["x127_erasure_cell_repair"](
        spark, sf001
    ).collect()
    assert rows
    for r in rows:
        assert r["dropped_vecs"] >= 1
        assert r["new_members"] == r["old_members"] - r["dropped_vecs"]
        assert r["cell_vanishes"] == (r["new_members"] == 0)
    n_deleted = (
        load_table(spark, sf001, "embeddings")
        .filter(F.expr("CAST(vec_id DIV 4 AS BIGINT) % 17 = 3"))
        .count()
    )
    assert sum(r["dropped_vecs"] for r in rows) == n_deleted


def test_x124_geometric_gold_separates_systems(spark, sf001):
    """The r8 label fix must make the four-way eval DECIDE something:
    on the derived geometric gold (pooled-cell labels), every
    geometry-respecting system grades clearly above the text-only
    ranker — measured 0.5-0.8 vs 0.0 at both bench SFs; the margins
    here leave room for testdata regeneration."""
    import __spark_entry__ as entrymod

    p = {
        r["system"]: r["precision_at_5"]
        for r in entrymod.queries()["x124_retrieval_quality_hybrid"](
            spark, sf001
        ).collect()
    }
    # bm25 may legitimately have ZERO graded rows (no query-term
    # overlap survives the label universe — observed at sf0.1);
    # an absent text-only leg grades as chance-free 0.0
    bm25 = p.get("bm25", 0.0)
    assert {"pooled", "late_interaction", "hybrid_rrf"} <= set(p)
    for dense in ("pooled", "late_interaction", "hybrid_rrf"):
        assert p[dense] > bm25, (dense, p)
    assert p["pooled"] - bm25 >= 0.2, p
    assert p["pooled"] >= 0.3, p


def test_x128_erasure_graph_repair_semantics(spark, sf001):
    """Graph-repair conservation: every affected node survives the
    deletion itself, lost >= 1 neighbor, new = old - dropped,
    needs_backfill iff the list fell under k=5 — and the summed drops
    equal the exact count of survivor→deleted edges in the deployed
    graph (no edge missed, none double-counted)."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators import (
        graph_index as GI,
    )

    rows = entrymod.queries()["x128_erasure_graph_repair"](
        spark, sf001
    ).collect()
    assert rows
    deleted = set()
    art = GI.deployed_graph_index(spark, sf001, k=5, n_probe=2)
    graph = GI.read_graph(spark, art).collect()
    for r in graph:
        if (r["nbr_id"] // 4) % 17 == 3:
            deleted.add(r["nbr_id"])
    want = sum(
        1
        for r in graph
        if (r["nbr_id"] // 4) % 17 == 3 and (r["src_id"] // 4) % 17 != 3
    )
    for r in rows:
        assert (r["src_id"] // 4) % 17 != 3  # survivors only
        assert r["n_dropped"] >= 1
        assert r["new_degree"] == r["old_degree"] - r["n_dropped"]
        assert r["needs_backfill"] == (r["new_degree"] < 5)
    assert sum(r["n_dropped"] for r in rows) == want


def test_x121b_join_pruned_equals_st38b_directory_pruned(spark, sf001):
    """Two physical strategies, one result (the x5d/x5f law lifted to
    the hybrid ranker): the JOIN-pruned batch x121b and st38b's
    directory-pruned serving must return identical rows."""
    import __spark_entry__ as entrymod

    batch = entrymod.queries()["x121b_hybrid_pruned"](spark, sf001)
    served = entrymod.queries()["st38b_hybrid_serve_pruned"](spark, sf001)
    assert _rows(batch) == _rows(served)


def test_st41_erasure_stream_equals_batch_audit_any_batching(spark, sf001):
    """st41's drained repair state must equal the batch x125 audit
    REGARDLESS of how the request feed is batched — run with 5
    micro-batches (not the default 3 the oracle sweep exercises): the
    per-group recompute reads the full tombstone set for its group, so
    splitting the deletion set across batches cannot change the final
    state."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_erasure_request_stream,
    )

    streamed = run_erasure_request_stream(spark, sf001, n_batches=5)
    batch = entrymod.queries()["x125_erasure_propagation"](spark, sf001)
    assert _rows(streamed) == _rows(batch)


def test_x129_post_erasure_serving_compliance(spark, sf001):
    """The compliance property the delta frame exists to prove: NO
    post-erasure result references a deleted doc or a deleted query;
    every pre-erasure slot held by a deleted doc reads result_erased;
    the deleted query's rows all read query_erased; and statuses
    partition the join correctly."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["x129_post_erasure_serving"](
        spark, sf001
    ).collect()
    assert rows
    seen_statuses = set()
    for r in rows:
        seen_statuses.add(r["status"])
        if r["new_rank"] is not None:
            assert r["doc_id"] % 17 != 3, r
            assert r["query_id"] % 17 != 3, r
        if r["query_id"] % 17 == 3:
            assert r["status"] == "query_erased", r
            assert r["new_rank"] is None, r
        elif r["old_rank"] is not None and r["doc_id"] % 17 == 3:
            assert r["status"] == "result_erased", r
            assert r["new_rank"] is None, r
    assert "query_erased" in seen_statuses  # query 3 is in the set
    assert "result_erased" in seen_statuses or "moved" in seen_statuses


def test_st42_index_erasure_stream_equals_batch_audit_any_batching(
    spark, sf001
):
    """st42's drained dictionary-repair audit must equal the batch
    x126 frame REGARDLESS of request batching (df decrements are
    additive) — run with 5 micro-batches instead of the oracle
    sweep's 3."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_index_erasure_stream,
    )

    streamed = run_index_erasure_stream(spark, sf001, n_batches=5)
    batch = entrymod.queries()["x126_erasure_index_repair"](spark, sf001)
    assert _rows(streamed) == _rows(batch)


def test_st43_cell_erasure_stream_equals_batch_audit_any_batching(
    spark, sf001
):
    """st43's drained cell-repair audit must equal the batch x127
    frame REGARDLESS of request batching (size decrements are
    additive) — run with 5 micro-batches instead of the oracle
    sweep's 3."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_cell_erasure_stream,
    )

    streamed = run_cell_erasure_stream(spark, sf001, n_batches=5)
    batch = entrymod.queries()["x127_erasure_cell_repair"](spark, sf001)
    assert _rows(streamed) == _rows(batch)


def test_st38b_default_probe_overlaps_exact_topk(spark, sf001):
    """Recall receipt at the default geometry (probe 4 of 16): the
    pruned top-10 per query must share a non-trivial prefix with the
    exact x121 top-10 — the sparse leg is identical, so total
    divergence would mean the dense pruning broke fusion."""
    import __spark_entry__ as entrymod

    pruned = entrymod.queries()["st38b_hybrid_serve_pruned"](spark, sf001)
    exact = entrymod.queries()["x121_hybrid_rrf"](spark, sf001)
    p = {(r["query_id"], r["doc_id"]) for r in pruned.collect()}
    e = {(r["query_id"], r["doc_id"]) for r in exact.collect()}
    assert len(p & e) >= int(0.5 * len(e))
