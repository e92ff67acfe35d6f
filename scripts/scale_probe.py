"""Scale probe (SURVEY §9 evidence): re-run the heaviest queries on a
locally synthesized M× corpus (default 3×; ``--mult 10`` for the decade
probe) and compare wall-clock against sf0.1.

The M× corpus is built by union-with-shifted-ids from sf0.1:
- documents: M copies, doc_id shifted by 10M per copy, text alphabet-
  rotated per copy so shingle spaces are DISJOINT across copies (each
  copy contributes an independent near-dup graph — the honest "more
  independent data" scaling; identical-text copies would instead multiply
  every doc's duplicate count and measure a different workload).
- embeddings: M copies, vec_id shifted, coordinates cyclically ROTATED
  per copy (same norm/distribution, decorrelated — genuinely
  independent vectors; see build_probe_dir).
- every other table: symlinked from sf0.1 (unused by the probed set).

st11 scales on its own axis — micro-batch count (days 3 → 3M) — since
its source is the simulated day-per-batch weather stream, not sf_dir.

Usage: python scripts/scale_probe.py [--mult M]   # writes JSON to stdout
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_probe_dir(spark, probe_dir: str, mult: int) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(probe_dir):
        shutil.rmtree(probe_dir)
    os.makedirs(probe_dir)
    for t in (
        "region", "nation", "supplier", "part",
        "orders",
    ):
        os.symlink(f"{BASE}/{t}.parquet", f"{probe_dir}/{t}.parquet")

    # customer ×M: custkeys disjoint per copy, all value columns
    # untouched — the x119 axis (per-(nation, segment) quasi-groups
    # gain M× members with the same band distribution; the probe must
    # show the groups×bands grid flat while input volume grows M×).
    # No probed query joins customer to orders, so the dangling new
    # custkeys are inert.
    cust = spark.read.parquet(f"{BASE}/customer.parquet")
    ccopies = [
        cust.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(c * 1_000_000_000)
        )
        for c in range(mult)
    ]
    cout = ccopies[0]
    for c in ccopies[1:]:
        cout = cout.unionByName(c)
    cout.write.mode("overwrite").parquet(f"{probe_dir}/customer.parquet")

    # lineitem ×M: orderkeys disjoint per copy, values untouched — the
    # st31 axis (same value range, M× rows per histogram bucket: the
    # probe must show dir/state count flat while volume grows M×)
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    lcopies = [
        li.withColumn(
            "l_orderkey",
            (F.col("l_orderkey") + F.lit(c * 1_000_000_000)).alias(
                "l_orderkey"
            ),
        )
        for c in range(mult)
    ]
    lout = lcopies[0]
    for c in lcopies[1:]:
        lout = lout.unionByName(c)
    lout.write.mode("overwrite").parquet(f"{probe_dir}/lineitem.parquet")

    # events ×M: ids/users disjoint per copy and ts shifted by 40 days
    # per copy, so per-user event-time join pairs (st13) and per-user
    # transition chains (w13) stay WITHIN copies — output cardinality
    # scales exactly M×, the honest independent-data axis.
    # write MICROS (not the INT96 default) so the footer-unit detection
    # in sources/tables.py sees the same physical unit as the generator
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    vcopies = []
    for c in range(mult):
        vcopies.append(
            ev.select(
                (F.col("event_id") + c * 100_000_000).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {40 * c} DAYS")).alias("ts"),
                (F.col("user_id") + c * 10_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    vout = vcopies[0]
    for c in vcopies[1:]:
        vout = vout.unionByName(c)
    vout.write.mode("overwrite").parquet(f"{probe_dir}/events.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = []
    for c in range(mult):
        rot = ALPHA[c:] + ALPHA[:c]
        copies.append(
            docs.select(
                (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                *[
                    F.translate(F.col("text"), ALPHA, rot).alias("text")
                    if f == "text"
                    else F.col(f)
                    for f in docs.columns
                    if f != "doc_id"
                ],
            ).select(*docs.columns)
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{probe_dir}/documents.parquet")

    # embeddings ×M: copies get a per-copy cyclic COORDINATE ROTATION
    # (not a constant jitter — jittered copies are near-exact twins of
    # their originals, which silently turns the probe corpus into a
    # duplication workload: every vector gains M-1 cosine≈1 partners
    # and near-dup pair counts explode for any method). Rotating the
    # coordinates preserves the norm and the marginal distribution but
    # decorrelates copies, so the M× corpus is genuinely "M× more
    # independent vectors" — the axis the probe claims to scale.
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    ecopies = []
    for c in range(mult):
        shift = (7 * c) % dim
        rotated = (
            F.col("embedding")
            if shift == 0
            else F.concat(
                F.slice(F.col("embedding"), shift + 1, dim - shift),
                F.slice(F.col("embedding"), 1, shift),
            )
        )
        ecopies.append(
            emb.select(
                (F.col("vec_id") + c * 10_000_000).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.write.mode("overwrite").parquet(f"{probe_dir}/embeddings.parquet")


def timed(label, fn, results):
    t0 = time.perf_counter()
    df = fn()
    # Force FULL evaluation (bench.py's noop discipline): a bare
    # .count() lets Catalyst prune aggregate/projection expressions
    # that no filter depends on — x134's cosine folds measured as
    # free under count() while costing 100× the wall under real
    # evaluation. Rows via a cheap second action on the (tiny,
    # checkpoint-or-result-sized) frame afterwards.
    df.write.format("noop").mode("overwrite").save()
    # dt is recorded at the noop write: the row count below is display
    # metadata, and for lazy batch plans count() RE-EXECUTES the
    # (expression-pruned) pipeline — timing it inflated absolute floors
    # by a plan-dependent second pass (ADVICE r9 #2).
    dt = round(time.perf_counter() - t0, 2)
    n = df.count()
    results[label] = {"sec": dt, "rows": n}
    print(f"[probe] {label}: {dt}s ({n} rows)", file=sys.stderr)
    # block-leak hygiene shared with bench.py (measured 7× inflation on
    # x2c@10× when st20's Lloyd training ran just before it)
    from kenya_agricultural_regions_weather_etl_pipeline_spark.session import (
        release_leaked_blocks,
    )

    release_leaked_blocks(df.sparkSession)


PROBED_QUERIES = (
    "x3_ngram_jaccard_pairs",
    "x14_dedup_clusters",
    "e2e_training_prep",
    "x40_semantic_dedup_pairs",
    "x40b_semantic_dedup_adaptive",
    "x40c_semantic_dedup_balanced",
    "st13_stream_outer_join",
    "st14_streaming_near_dedup",
    "st20_semantic_dedup_ingest",
    "w13_event_transitions",
    "x2c_minhash_portable",
    "x5h_ivfpq_search",
    "x54_dsir_importance",
    "x55_fuzzy_decontamination",
    "x59_line_dedup",
    "x86_knn_graph",
    "x88_nn_descent_round",
    "x90_pagerank_knn",
    "x92_incremental_knn_upsert",
    "x93_graph_beam_search",
    "st21_knn_graph_ingest",
    "x94_hierarchical_ivf",
    "x95_refined_graph_search",
    "st22_vector_serve_stream",
    "st24_graph_serve_stream",
    "x97_bpe_merge_train",
    "x98_graph_triangle_audit",
    "x99_bpe_fertility_trained",
    "st25_bpe_stats_stream",
    "x100_nb_quality_classifier",
    "x102_crossdoc_span_dedup",
    "st28_token_budget_stream",
    "x103_mixture_materializer",
    "x104_classifier_calibration",
    "st29_nb_deploy_stream",
    "st30_span_index_stream",
    "x106_dedup_threshold_curve",
    "x108_span_trimming",
    "st31_quantile_stream",
    "x110_maxsim_retrieval",
    "x110b_maxsim_pruned",
    "st32_maxsim_serve_stream",
    "agro1_growing_degree_days",
    "agro2_dry_spells",
    "x111_source_quality_cutoff",
    "x112_embedding_anisotropy",
    "st33_late_data_audit",
    "w25_cusum_drift",
    "x113_unseen_mass",
    "x114_split_leakage_audit",
    "io11_snapshot_rollback",
    "st34_unseen_mass_stream",
    "e2e_agro_report",
    "x115_pooled_retrieval",
    "x116_retrieval_quality_compare",
    "agro3_reference_et0",
    "x117_containment_dedup",
    "st35_containment_ingest",
    "x119_t_closeness",
    "x120_bm25_topk",
    "x121_hybrid_rrf",
    "a24_grouped_weighted_median",
    "st36_weighted_quantile_stream",
    "st37_bm25_index_ingest",
    "x122_phrase_search",
    "x123_prf_expansion",
    "x124_retrieval_quality_hybrid",
    "e2e_retrieval_eval",
    "st38_hybrid_serve_stream",
    "st38b_hybrid_serve_pruned",
    "x125_erasure_propagation",
    "x126_erasure_index_repair",
    "x127_erasure_cell_repair",
    "x128_erasure_graph_repair",
    "st41_erasure_request_stream",
    "x129_post_erasure_serving",
    "x121b_hybrid_pruned",
    "x130_retrieval_quality_pruned",
    "st42_index_erasure_stream",
    "st43_cell_erasure_stream",
    "x131_erasure_certificate",
    "st44_graph_erasure_stream",
    "x132_graph_backfill_repair",
    "x133_repair_quality_audit",
    "st45_backfill_stream",
    "x134_semantic_decontamination",
    "x135_decontamination_removal",
    "x136_preference_pairs",
    "x137_unimax_allocation",
    "st46_decontamination_ingest",
    "st47_preference_pair_stream",
    "x138_shard_export_plan",
    "x139_epoch_materialization",
    "st48_shard_export_stream",
)


def main() -> int:
    import __spark_entry__ as E
    from kenya_agricultural_regions_weather_etl_pipeline_spark.session import get_spark
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_weather_stream_etl,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=3, help="corpus multiplier")
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="probe only these query names (skips st11 unless listed)",
    )
    args = ap.parse_args()
    mult = args.mult
    probe_dir = f"/tmp/sfprobe/sf0.{mult}x"

    spark = get_spark("scale-probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    build_probe_dir(spark, probe_dir, mult)
    q = E.queries()
    probed = (
        PROBED_QUERIES
        if args.only is None
        else tuple(n for n in PROBED_QUERIES if n in args.only)
    )
    results: dict[str, dict] = {}
    for name in probed:
        if name == "st21_knn_graph_ingest":
            # PRODUCTION-SHAPE probe (VERDICT r6 #4): hold |batch|
            # FIXED and grow batch COUNT with the corpus, so the probe
            # measures the per-arrival law (|batch|·√N amortized) a
            # deployment actually pays — the old fixed-count probe
            # grew batch SIZE M×, conflating batch volume with
            # standing-state growth (it reported 38.5× at 30×).
            # Compare per-arrival: (t_Mx / M) / t_base; expected ≈ √M
            # damped by the constant per-batch commit overhead.
            from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (  # noqa: E501
                run_knn_graph_ingest,
            )

            timed(
                f"{name}@sf0.1",
                lambda: run_knn_graph_ingest(spark, BASE, n_batches=4),
                results,
            )
            timed(
                f"{name}@{mult}x-bounded-batch",
                lambda: run_knn_graph_ingest(
                    spark, probe_dir, n_batches=4 * mult
                ),
                results,
            )
            continue
        timed(f"{name}@sf0.1", lambda: q[name](spark, BASE), results)
        timed(f"{name}@{mult}x", lambda: q[name](spark, probe_dir), results)
    if args.only is None or "st11" in args.only:
        timed(
            "st11@days=3", lambda: run_weather_stream_etl(spark, days=3), results
        )
        timed(
            f"st11@days={3 * mult}",
            lambda: run_weather_stream_etl(spark, days=3 * mult),
            results,
        )
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
