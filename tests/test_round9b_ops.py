"""Round-9 second-window operator invariants: the curation trio
(x134 semantic decontamination, x136 preference pairs, x137 UniMax
allocation) and the st46 streaming deployment of x134."""

from __future__ import annotations

import pyspark.sql.functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_st46_decontamination_equals_batch_audit_any_batching(
    spark, sf001
):
    """st46's drained merge must equal the batch x134 audit REGARDLESS
    of how the train stream is batched — run with 3 micro-batches (not
    the default 4 the oracle sweep exercises): both partial aggregates
    (hit-count sum, max-ordered cosine struct) are associative and
    commutative over train slices and the per-pair cosine is rounded
    before any compare, so no batching can flip a verdict."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_decontamination_ingest,
    )

    streamed = run_decontamination_ingest(spark, sf001, n_batches=3)
    batch = entrymod.queries()["x134_semantic_decontamination"](
        spark, sf001
    )
    assert _rows(streamed) == _rows(batch)


def test_x134_verdicts_are_internally_consistent(spark, sf001):
    """Per-row laws of the contamination audit: the flag is exactly
    n_contaminated > 0; a contaminated row's max_cos clears the
    threshold and a clean row's does not; every eval vector appears
    exactly once; the nearest train id is a real train-side id."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.plans.curation import (
        DECONTAM_COSINE_THRESHOLD,
        DECONTAM_EVAL_MAX_ID,
    )

    def is_eval(i):
        return i % 10 == 0 and i < DECONTAM_EVAL_MAX_ID

    rows = (
        entrymod.queries()["x134_semantic_decontamination"](spark, sf001)
        .collect()
    )
    assert rows, "fixture regression: empty eval slice at sf0.001"
    seen = set()
    for r in rows:
        assert is_eval(r["eval_id"]) and r["eval_id"] not in seen
        seen.add(r["eval_id"])
        assert r["contaminated"] == int(r["n_contaminated"] > 0)
        if r["contaminated"]:
            assert r["max_cos"] >= DECONTAM_COSINE_THRESHOLD
        else:
            assert r["max_cos"] < DECONTAM_COSINE_THRESHOLD
        assert not is_eval(r["nearest_train_id"])


def test_x135_removal_executes_the_x134_audit(spark, sf001):
    """Audit→execute symmetry (the x128→x132 pattern): the corpus-side
    removal ledger must be consistent with the eval-side audit — (a)
    total pair hits Σ n_contaminated ≥ total docs removed (each leak
    doc has ≥1 hit); (b) a corpus with ≥1 contaminated eval vector
    removes ≥1 doc and vice versa; (c) per-source ledgers conserve:
    n_kept + n_removed = n_docs and every doc is a train doc."""
    import __spark_entry__ as entrymod

    audit = entrymod.queries()["x134_semantic_decontamination"](
        spark, sf001
    ).collect()
    ledger = entrymod.queries()["x135_decontamination_removal"](
        spark, sf001
    ).collect()
    total_hits = sum(r["n_contaminated"] for r in audit)
    total_removed = sum(r["n_removed"] for r in ledger)
    assert total_hits >= total_removed
    assert (total_hits > 0) == (total_removed > 0)
    assert total_removed > 0, "fixture regression: no leaks at sf0.001"
    for r in ledger:
        assert r["n_kept"] + r["n_removed"] == r["n_docs"]
        assert r["tokens_kept"] >= 0 and r["tokens_removed"] >= 0
        assert r["removal_rate"] == round(r["n_removed"] / r["n_docs"], 6)


def test_x136_preference_pair_laws(spark, sf001):
    """Pair-mining contract: chosen and rejected are distinct docs of
    the SAME (lang, source) cohort; margin is strictly positive and
    equals the score gap; pair_rank 2 exists only where rank 1 does;
    no document is both chosen and rejected within one cohort."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["x136_preference_pairs"](
        spark, sf001
    ).collect()
    assert rows, "fixture regression: no preference pairs at sf0.001"
    by_cohort = {}
    for r in rows:
        assert r["chosen_id"] != r["rejected_id"]
        assert r["margin"] > 0
        assert abs(r["chosen_q"] - r["rejected_q"] - r["margin"]) < 1e-9
        by_cohort.setdefault((r["lang"], r["source"]), {})[
            r["pair_rank"]
        ] = r
    for cohort, ranks in by_cohort.items():
        assert set(ranks) in ({1}, {1, 2}), (
            f"{cohort}: pair_rank 2 without pair_rank 1"
        )
        chosen = {r["chosen_id"] for r in ranks.values()}
        rejected = {r["rejected_id"] for r in ranks.values()}
        assert not (chosen & rejected), f"{cohort}: doc on both sides"


def test_st47_preference_pairs_equal_batch_mining_any_batching(
    spark, sf001
):
    """st47's drained pair artifact must equal the batch x136 mining
    REGARDLESS of how documents are batched — run with 3 micro-batches
    (not the default 4 the oracle sweep exercises): a cohort's last
    re-mine sees its full final membership, and untouched cohorts'
    carried pairs are final by the locality law."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_preference_pair_stream,
    )

    streamed = run_preference_pair_stream(spark, sf001, n_batches=3)
    batch = entrymod.queries()["x136_preference_pairs"](spark, sf001)
    assert _rows(streamed) == _rows(batch)


def test_x138_shard_plan_partitions_the_corpus(spark, sf001):
    """Shard-plan laws: every document lands in exactly one shard
    (Σ n_docs == |corpus|), shard ids sit in [0, N), and the integer
    ppm shares sum to ≤ 1e6 with at most N floor-loss below it."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.plans.curation import (
        N_EXPORT_SHARDS,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = entrymod.queries()["x138_shard_export_plan"](
        spark, sf001
    ).collect()
    assert rows, "fixture regression: empty shard plan"
    n_corpus = load_table(spark, sf001, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_corpus
    assert all(0 <= r["shard"] < N_EXPORT_SHARDS for r in rows)
    assert len({r["shard"] for r in rows}) == len(rows)
    share = sum(r["token_share_ppm"] for r in rows)
    assert 1_000_000 - N_EXPORT_SHARDS <= share <= 1_000_000


def test_st48_shard_stream_equals_batch_plan_any_batching(spark, sf001):
    """st48's drained balance audit must equal the batch x138 plan
    REGARDLESS of document batching — run with 3 micro-batches (not
    the default 4 the oracle sweep exercises): assignment is
    stateless per row and the audit derives from the full
    accumulated store."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_shard_export_stream,
    )

    streamed = run_shard_export_stream(spark, sf001, n_batches=3)
    batch = entrymod.queries()["x138_shard_export_plan"](spark, sf001)
    assert _rows(streamed) == _rows(batch)


def test_x139_materialization_executes_the_x137_plan(spark, sf001):
    """Execution laws vs the x137 allocation: per source, whole copies
    = alloc div size; realized tokens never exceed the allocation; the
    greedy remainder fill never exceeds the remainder; fidelity is the
    integer ppm of realized/alloc and is ≤ 1e6."""
    import __spark_entry__ as entrymod

    alloc = {
        r["source"]: r
        for r in entrymod.queries()["x137_unimax_allocation"](
            spark, sf001
        ).collect()
    }
    rows = entrymod.queries()["x139_epoch_materialization"](
        spark, sf001
    ).collect()
    assert rows and set(alloc) == {r["source"] for r in rows}
    for r in rows:
        a = alloc[r["source"]]
        sz, al = a["sz_tokens"], a["alloc_tokens"]
        assert r["n_full_copies"] == al // sz
        remainder = al % sz
        assert r["extra_tokens"] <= remainder
        assert r["realized_tokens"] == r["n_full_copies"] * sz + r["extra_tokens"]
        assert r["realized_tokens"] <= al
        assert r["n_extra_docs"] <= r["n_docs"]
        expected_ppm = (
            1_000_000 if al == 0 else r["realized_tokens"] * 1_000_000 // al
        )
        assert r["fidelity_ppm"] == expected_ppm <= 1_000_000


def test_x139_two_phase_remainder_fill_equals_direct_window_on_skew(
    spark, tmp_path
):
    """The r10 two-phase prefix sum (bucket histogram + crossing-bucket
    window, guide §2.5) must admit EXACTLY the rows the direct
    source-partitioned running-sum window admits — proven on a
    deliberately skewed corpus (one source = 90% of documents, the
    case the two-phase shape exists for) by recomputing the remainder
    fill with the direct window and comparing n_extra_docs /
    extra_tokens per source."""
    import __spark_entry__ as entrymod
    from pyspark.sql import Window
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions import (
        text as T,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.plans.curation import (
        doc_hash,
    )

    # skewed synthetic corpus: 900 docs in 'dominant', 50+50 elsewhere
    rows = [
        (i, "dominant" if i < 900 else ("tail_a" if i < 950 else "tail_b"),
         "tok " * (1 + i % 7))
        for i in range(1000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sf = str(tmp_path / "skewsf")
    import os as _os

    _os.makedirs(sf)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        r["source"]: r
        for r in entrymod.queries()["x139_epoch_materialization"](
            spark, sf
        ).collect()
    }
    # direct-window recompute (the pre-r10 shape == the oracle's shape)
    alloc = entrymod.queries()["x137_unimax_allocation"](spark, sf).select(
        "source", "sz_tokens", "alloc_tokens"
    )
    j = (
        docs.select(
            "source",
            "doc_id",
            T.token_count(F.col("text")).alias("n_tok"),
            doc_hash("doc_id").alias("h"),
        )
        .join(F.broadcast(alloc), "source")
        .withColumn("remainder", F.col("alloc_tokens") % F.col("sz_tokens"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    direct = {
        r["source"]: r
        for r in j.withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") <= F.col("remainder"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_extra_docs"),
            F.sum("n_tok").alias("extra_tokens"),
        )
        .collect()
    }
    assert set(out) >= set(direct)
    for src, r in out.items():
        d = direct.get(src)
        assert r["n_extra_docs"] == (d["n_extra_docs"] if d else 0), src
        assert r["extra_tokens"] == (d["extra_tokens"] if d else 0), src


def test_x137_unimax_conservation_and_cap_laws(spark, sf001):
    """UniMax allocation laws: (a) no source exceeds the epoch cap;
    (b) every allocation is non-negative; (c) total allocated ≤ the
    budget (2× corpus tokens) with any shortfall only possible when
    EVERY source capped out; (d) smallest-first fairness — an uncapped
    source's allocation is ≥ every smaller source's allocation."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.plans.curation import (
        UNIMAX_BUDGET_MULTIPLE,
        UNIMAX_EPOCH_CAP,
    )

    rows = entrymod.queries()["x137_unimax_allocation"](
        spark, sf001
    ).collect()
    assert rows, "fixture regression: no sources at sf0.001"
    total_sz = sum(r["sz_tokens"] for r in rows)
    budget = UNIMAX_BUDGET_MULTIPLE * total_sz
    allocated = sum(r["alloc_tokens"] for r in rows)
    assert allocated <= budget
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= UNIMAX_EPOCH_CAP * r["sz_tokens"]
        assert r["capped"] == int(
            r["alloc_tokens"] == UNIMAX_EPOCH_CAP * r["sz_tokens"]
        )
        assert abs(r["epochs"] - round(r["alloc_tokens"] / r["sz_tokens"], 6)) < 1e-12
    if allocated < budget - len(rows):  # more than rounding residue
        assert all(r["capped"] for r in rows), (
            "budget left unspent while some source was uncapped"
        )
    ordered = sorted(rows, key=lambda r: (r["sz_tokens"], r["source"]))
    for earlier, later in zip(ordered, ordered[1:]):
        if not later["capped"]:
            assert later["alloc_tokens"] >= earlier["alloc_tokens"], (
                "smallest-first fairness violated"
            )
