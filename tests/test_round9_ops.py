"""Round-9 operator invariants: st44 (streaming graph erasure
completing the quartet) and x132 (backfill execution of what x128
flags)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_st44_graph_erasure_stream_equals_batch_audit_any_batching(
    spark, sf001
):
    """st44's drained repair state must equal the batch x128 audit
    REGARDLESS of how the request feed is batched — run with 5
    micro-batches (not the default 3 the oracle sweep exercises):
    per-source drop decrements are additive across batches and each
    source is deleted by exactly one batch (doc_id-range requests), so
    the version-chained degree table converges to the same state."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_graph_erasure_stream,
    )

    streamed = run_graph_erasure_stream(spark, sf001, n_batches=5)
    batch = entrymod.queries()["x128_erasure_graph_repair"](spark, sf001)
    assert _rows(streamed) == _rows(batch)


def test_x132_backfill_repairs_exactly_what_x128_flags(spark, sf001):
    """The repair-execution contract: (a) every backfilled source was
    flagged needs_backfill by the x128 audit; (b) each source receives
    AT MOST its quota (k − new_degree) of new edges, with contiguous
    fill_ranks from 1; (c) no new neighbor is deleted, the source
    itself, or an existing surviving neighbor of that source."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators import (
        graph_index as GI,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    fills = entrymod.queries()["x132_graph_backfill_repair"](
        spark, sf001
    ).localCheckpoint(eager=True)
    audit = entrymod.queries()["x128_erasure_graph_repair"](
        spark, sf001
    ).localCheckpoint(eager=True)
    flagged = {
        r["src_id"]: 5 - r["new_degree"]
        for r in audit.collect()
        if r["needs_backfill"]
    }
    assert flagged, "fixture regression: no flagged sources at sf0.001"
    got = fills.collect()
    assert got, "backfill produced no edges for flagged sources"
    per_src: dict[int, list[int]] = {}
    for r in got:
        assert r["src_id"] in flagged, "backfilled an unflagged source"
        assert r["new_nbr_id"] != r["src_id"]
        per_src.setdefault(r["src_id"], []).append(r["fill_rank"])
    for src_id, ranks in per_src.items():
        assert len(ranks) <= flagged[src_id], (
            f"src {src_id} got {len(ranks)} fills > quota "
            f"{flagged[src_id]}"
        )
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # (c): new neighbors are surviving non-neighbors
    deleted = {
        r[0]
        for r in load_table(spark, sf001, "embeddings")
        .select("vec_id")
        .filter(F.expr("CAST(vec_id DIV 4 AS BIGINT) % 17 = 3"))
        .collect()
    }
    art = GI.deployed_graph_index(spark, sf001, k=5, n_probe=2)
    existing = {
        (r["src_id"], r["nbr_id"])
        for r in GI.read_graph(spark, art)
        .select("src_id", "nbr_id")
        .collect()
    }
    for r in got:
        assert r["new_nbr_id"] not in deleted, "backfilled a deleted id"
        assert (r["src_id"], r["new_nbr_id"]) not in existing, (
            "backfilled an edge the graph already has"
        )


def test_x132_fills_rank_by_exact_cosine(spark, sf001):
    """Rank-1 fill must be the candidate with the highest exact cosine
    to its source among that source's emitted fills (the x86 tiebreak
    discipline carried through the repair)."""
    import __spark_entry__ as entrymod

    fills = entrymod.queries()["x132_graph_backfill_repair"](
        spark, sf001
    ).collect()
    best: dict[int, tuple] = {}
    for r in fills:
        cur = best.get(r["src_id"])
        key = (-r["backfill_sim"], r["new_nbr_id"])
        if cur is None or key < cur[0]:
            best[r["src_id"]] = (key, r["fill_rank"])
    for src_id, (_, rank) in best.items():
        assert rank == 1, f"src {src_id}: best-cosine fill is not rank 1"


def test_x133_repair_recall_laws(spark, sf001):
    """The audit's internal conservation laws: overlap can exceed
    neither side, recall = overlap/rebuild at 6 dp, and every flagged
    source is audited exactly once."""
    import __spark_entry__ as entrymod

    audit = entrymod.queries()["x133_repair_quality_audit"](
        spark, sf001
    ).collect()
    flagged = [
        r
        for r in entrymod.queries()["x128_erasure_graph_repair"](
            spark, sf001
        ).collect()
        if r["needs_backfill"]
    ]
    assert len(audit) == len(flagged)
    assert len({r["src_id"] for r in audit}) == len(audit)
    for r in audit:
        assert 0 <= r["n_overlap"] <= min(r["n_repaired"], r["n_rebuild"])
        expected = round(r["n_overlap"] / r["n_rebuild"] + 1e-12, 6)
        assert abs(r["repair_recall"] - expected) < 1e-9


def test_x133_edge_legs_unique(spark, sf001):
    """Precondition of x133's single full-outer rewrite (ADVICE r10):
    BOTH edge legs must be unique on (src_id, nbr_id) — a duplicate
    from either producer would multiply rows in the join and skew all
    three membership counts. Reconstructs the legs exactly as the
    query builds them and asserts zero duplicate keys."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators import (
        graph_index as GI,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.similarity import (
        knn_graph,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    art = GI.deployed_graph_index(spark, sf001, k=5, n_probe=2)
    graph = GI.read_graph(spark, art).select("src_id", "nbr_id")
    emb = load_table(spark, sf001, "embeddings")
    deleted = emb.select("vec_id").filter(
        F.expr("CAST(vec_id DIV 4 AS BIGINT) % 17 = 3")
    )
    audit = (
        entrymod.queries()["x128_erasure_graph_repair"](spark, sf001)
        .filter(F.col("needs_backfill"))
        .select("src_id")
    )
    fills = entrymod.queries()["x132_graph_backfill_repair"](
        spark, sf001
    ).select("src_id", F.col("new_nbr_id").alias("nbr_id"))
    surv = (
        graph.join(audit, "src_id")
        .join(
            deleted.withColumnRenamed("vec_id", "nbr_id"),
            "nbr_id",
            "left_anti",
        )
        .select("src_id", "nbr_id")
    )
    repaired = surv.unionByName(fills)
    surviving_emb = emb.join(deleted, "vec_id", "left_anti")
    rebuild = (
        knn_graph(surviving_emb, k=5, n_probe=2)
        .select("src_id", "nbr_id")
        .join(audit, "src_id")
    )
    for name, leg in (("repaired", repaired), ("rebuild", rebuild)):
        dups = (
            leg.groupBy("src_id", "nbr_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dups == 0, f"{name} leg has duplicate (src_id, nbr_id)"


def test_st45_backfill_stream_equals_batch_fills_any_batching(
    spark, sf001
):
    """st45's drained fills must equal the batch x132 run REGARDLESS
    of batching (5 micro-batches vs the oracle sweep's 3): recompute-
    on-touch re-derives a source whenever a batch deletion enters its
    2-hop neighborhood, and a source never touched again already holds
    the full-deletion answer — so the version chain converges to the
    same fills."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_backfill_stream,
    )

    streamed = run_backfill_stream(spark, sf001, n_batches=5)
    batch = entrymod.queries()["x132_graph_backfill_repair"](spark, sf001)
    assert _rows(streamed) == _rows(batch)
