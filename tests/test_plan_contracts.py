"""Physical-plan contracts: the properties that make these queries
scale-safe at 100 TB must actually show up in the optimized plan —
pushed filters, pruned scans, broadcast joins on bounded dims, top-k
without full sort, window-group-limit pushdown. Guards against silent
plan regressions (a correct-but-full-scan query is a perf bug).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _plan(spark, sf01, name: str, mode: str = "formatted") -> str:
    df = entrymod.queries()[name](spark, sf01)
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jvm_mode)


def test_f1_filter_pushed_to_scan(spark, sf01):
    plan = _plan(spark, sf01, "f1_range_filter")
    assert "PushedFilters: [" in plan
    # the range predicates reach the parquet reader
    assert "GreaterThanOrEqual(l_quantity" in plan


def test_f3_scan_prunes_columns(spark, sf01):
    plan = _plan(spark, sf01, "f3_date_filter")
    # projection needs 3 columns; the scan must not read the other 13
    rs = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert rs, plan
    assert "l_extendedprice" not in rs[0]
    assert "l_comment" not in rs[0]
    assert "l_shipdate" in rs[0]


def test_q1_scan_prunes_columns(spark, sf01):
    plan = _plan(spark, sf01, "q1_pricing_summary")
    rs = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert rs and "l_comment" not in rs[0]


def test_q3_topk_avoids_full_sort(spark, sf01):
    plan = _plan(spark, sf01, "q3_top_revenue_orders")
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_bounded_dims(spark, sf01):
    plan = _plan(spark, sf01, "q5_regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region


def test_b1_broadcasts_only_the_bounded_dim(spark, sf01):
    plan = _plan(spark, sf01, "b1_broadcast_join")
    assert "BroadcastHashJoin" in plan


def test_w1_window_group_limit_pushdown(spark, sf01):
    plan = _plan(spark, sf01, "w1_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_x3_hot_shingle_filter_precedes_self_join(spark, sf01):
    plan = _plan(spark, sf01, "x3_ngram_jaccard_pairs")
    # the df-cap exclusion is a broadcast anti join, not a shuffle
    assert "BroadcastHashJoin LeftAnti" in plan


def test_x5_broadcasts_query_side(spark, sf01):
    plan = _plan(spark, sf01, "x5_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_x5g_adaptive_probe_broadcasts_metadata(spark, sf01):
    """x5g's probe decision must stay metadata-sized: the codebook, the
    cell-size profile, and the probe list are all broadcast — no
    SortMergeJoin anywhere (a shuffled join on any of those sides means
    the 'bounded metadata' claim silently broke)."""
    plan = _plan(spark, sf01, "x5g_ivf_adaptive_probe")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_x5i_filter_pushed_to_vector_scan(spark, sf01):
    """Filtered vector search must push the metadata predicate into the
    parquet scan of the searched corpus — a post-scan filter would read
    every vector's 256 bytes to keep ~10%."""
    plan = _plan(spark, sf01, "x5i_filtered_search")
    assert "PushedFilters: [" in plan
    assert "EqualTo(label,3)" in plan.replace(" ", ""), plan


def test_no_cartesian_products_anywhere(spark, sf01):
    """No query may plan an unbroadcast cartesian product."""
    for name in entrymod.queries():
        if name.startswith(("st", "mm")) or name.startswith("e2e") or name == "qv1_quality_verdict":
            continue  # streaming/materializing queries execute on build
        plan = _plan(spark, sf01, name)
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name", ["p1_agronomic_derivations", "p8_rounding", "x6_lang_id"])
def test_scalar_derivations_stay_in_codegen(spark, sf01, name):
    """Scalar hot paths must not plan Python evaluation."""
    plan = _plan(spark, sf01, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bucketed_join_avoids_shuffle(spark, sf01, tmp_path):
    """Bucketing both join sides on the key co-locates them: the join
    plan must contain NO shuffle exchange (the 100 TB pattern for
    repeated large-x-large joins on a stable key)."""
    import pyspark.sql.functions as F

    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")
        (
            load_table(spark, sf01, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / f"b_{name}"))
            .saveAsTable(f"b_{name}")
        )
    try:
        li, o = spark.table("b_lineitem"), spark.table("b_orders")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the answer is still right
        n = joined.agg(F.sum("n")).collect()[0][0]
        assert n == load_table(spark, sf01, "lineitem").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_partitioned_write_prunes_on_read(spark, sf01, tmp_path):
    """S4: date-partitioned parquet + a partition-column predicate must
    prune at planning time (PartitionFilters on the scan, only matching
    partition dirs read) — the replacement for the reference's b-tree
    indexes (/root/reference/daily_weather_etl_kenya.py:116-119)."""
    import pyspark.sql.functions as F

    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    path = str(tmp_path / "li_part")
    li = load_table(spark, sf01, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    li.write.partitionBy("ship_year").parquet(path)
    df = spark.read.parquet(path).filter(F.col("ship_year") == 1995)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ship_year" in plan
    assert df.count() == li.filter(F.col("ship_year") == 1995).count() > 0


def test_q1_whole_stage_codegen(spark, sf01):
    """The flagship agg must run inside WholeStageCodegen spans (scalar
    exprs fused into generated loops, no interpreted hot path). AQE only
    finalizes (and codegen-wraps) the plan on execution, so run it
    first; the final plan marks codegen stages with '*(n)'."""
    df = entrymod.queries()["q1_pricing_summary"](spark, sf01)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan and "*(1)" in plan


def test_x12_topk_avoids_full_sort(spark, sf01):
    """x12's top-50 must compile to TakeOrderedAndProject, and its
    aggregation must have a partial (map-side) phase before the shuffle."""
    plan = _plan(spark, sf01, "x12_top_bigrams")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_q6_scalar_subquery_is_not_a_join(spark, sf01):
    """The scalar subquery must inject a literal, not join the two scans."""
    plan = _plan(spark, sf01, "q6_scalar_subquery")
    assert "Join" not in plan
    assert "Subquery" in plan or "scalar-subquery" in plan


def test_w3_single_window_exchange(spark, sf01):
    """Both LAG columns share one (partition, order) spec: exactly one
    shuffle exchange and one Window node, not two."""
    plan = _plan(spark, sf01, "w3_lag_delta")
    # tree lines are "NodeName (id)": exactly one shuffle, one Window node
    assert plan.count("Exchange (") == 1
    assert plan.count("Window (") == 1
    assert "hashpartitioning(o_custkey" in plan


def test_a9_sketch_has_partial_aggregation(spark, sf01):
    """HLL sketches merge map-side: a partial aggregate phase must exist
    (the shuffle carries fixed-size sketches, not rows)."""
    plan = _plan(spark, sf01, "a9_approx_distinct")
    assert "partial" in plan.lower()


def test_x15_sample_filter_is_map_side(spark, sf01):
    """Stratified sampling must plan as scan+filter: no Exchange, no
    Python eval — the predicate composes with pushdown at scale."""
    plan = _plan(spark, sf01, "x15_stratified_sample")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_x16_chunking_is_narrow(spark, sf01):
    """Chunking is a pure map stage: generate/explode but NO shuffle."""
    plan = _plan(spark, sf01, "x16_doc_chunks")
    assert "Generate" in plan  # posexplode
    assert "Exchange" not in plan


def test_x17_packing_single_shuffle(spark, sf01):
    """Sequence packing shuffles exactly once (the per-key window), and
    the token count is projected before the window (not evaluated twice)."""
    plan = _plan(spark, sf01, "x17_sequence_packing", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert plan.count("split(text") == 1


def test_x18_redaction_stays_in_codegen(spark, sf01):
    """Regex redaction is JVM-side, no Python eval, no shuffle."""
    plan = _plan(spark, sf01, "x18_pii_redaction")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # formatted mode marks codegen'd nodes with a leading '*'
    assert "* Project" in plan


def test_x19_quantization_is_narrow(spark, sf01):
    plan = _plan(spark, sf01, "x19_embedding_quantize")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q8_not_exists_plans_as_anti_join(spark, sf01):
    plan = _plan(spark, sf01, "q8_not_exists")
    # Catalyst must decorrelate NOT EXISTS into a left-anti join, not a
    # per-row subquery; any join strategy is fine as long as it's anti
    assert "LeftAnti" in plan


def test_x23_mixture_explode_is_narrow(spark, sf01):
    plan = _plan(spark, sf01, "x23_domain_mixture")
    # the epoch repetition (Generate/explode) must run before any
    # exchange — no shuffle feeds the explode itself. Formatted-plan
    # node ids are post-order: lower id = earlier in the dataflow.
    import re

    gen = re.search(r"Generate \((\d+)\)", plan)
    exchanges = [int(m) for m in re.findall(r"Exchange \((\d+)\)", plan)]
    assert gen and exchanges
    assert int(gen.group(1)) < min(exchanges), plan


def test_x24_flags_stay_in_codegen(spark, sf01):
    plan = _plan(spark, sf01, "x24_c4_filters")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q9_broadcasts_nation_and_takeordered(spark, sf01):
    plan = _plan(spark, sf01, "q9_returned_revenue")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # the SF-scaling sides must NOT broadcast
    import re

    for m in re.finditer(r"BroadcastExchange[^\n]*\n((?:.+\n)*?)\n", plan):
        blob = m.group(0)
        assert "lineitem" not in blob and "orders.parquet" not in blob


@pytest.mark.parametrize(
    "name", ["w5_rank_functions", "w6_value_windows", "w7_time_range_window"]
)
def test_window_queries_single_exchange(spark, sf01, name):
    """All window columns in each query share one (partition, order,
    frame) spec family: one shuffle exchange, no duplicated Window
    scans."""
    plan = _plan(spark, sf01, name)
    assert plan.count("Exchange (") == 1, plan


def test_no_python_eval_on_any_scalar_path(spark, sf01):
    """Blanket guarantee: every batch query plans with ZERO Python
    evaluation. Python appears only where it is the point — multimodal
    decode (mm*), the stateful st4 operator, the e2e pipelines'
    simulated HTTP DataSource, and the UDTF surface demo (x42, whose
    entire purpose is the Python table-function path) — all excluded
    here by the same prefixes the cartesian check uses."""
    for name in entrymod.queries():
        if name.startswith(("st", "mm", "e2e")) or name in (
            "qv1_quality_verdict",
            "x42_sentence_split_udtf",  # the UDTF path IS the point
            "x46_grouped_agg_udaf",  # the pandas-UDAF path IS the point
            # the per-partition Misra-Gries fold is deliberately
            # imperative (bounded k-state sketch, zero shuffle) — the
            # one place Python-on-executors is the design, like st15's
            # streaming twin; the exact counting pass it guards is
            # native and pinned by test_a17_candidates_broadcast_no_vocab_exchange
            "a17_heavy_hitters",
        ):
            continue
        plan = _plan(spark, sf01, name)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow"):
            assert marker not in plan, (name, marker)


def test_w10_ohlc_is_windowless_single_exchange(spark, sf01):
    """w10's whole point: open/close via struct-argmin inside ONE hash
    aggregation — no Window operator, one exchange, partial aggregation
    present (map-side combine before the shuffle)."""
    plan = _plan(spark, sf01, "w10_ohlc_bars")
    assert "Window" not in plan
    # formatted mode prints each node in the tree AND a detail section
    assert plan.count("+- Exchange") == 1
    assert "partial_min" in plan or "HashAggregate" in plan


def test_x32_span_removal_is_shuffle_free(spark, sf01):
    """x32 is a pure per-row array transform: zero exchanges."""
    plan = _plan(spark, sf01, "x32_remove_repeated_spans")
    assert "Exchange" not in plan


def test_j4_interval_join_is_not_cartesian(spark, sf01):
    """j4's banding must plan as an equi-join on (key, band) — never a
    cartesian/broadcast-nested-loop over the interval sets."""
    plan = _plan(spark, sf01, "j4_interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sql4_rank_filter_plans_as_window_group_limit(spark, sf01):
    """sql4's QUALIFY-style rank<=3 filter must push into the window
    sort (WindowGroupLimit), not rank everything then filter."""
    plan = _plan(spark, sf01, "sql4_windowed_sql")
    assert "WindowGroupLimit" in plan


def test_w12_stacked_windows_share_one_exchange(spark, sf01):
    """Both session windows AND both rollup aggregations must reuse the
    single user_id hash exchange — a second exchange would re-shuffle
    the corpus per analytic step at 100 TB."""
    plan = _plan(spark, sf01, "w12_sessionize")
    assert plan.count("hashpartitioning(") == 1, plan
    assert "SinglePartition" not in plan


def test_q17_scans_prune_to_join_columns(spark, sf01):
    """Both lineitem scans (per-part average + revenue side) must prune
    to the 3 needed columns."""
    plan = _plan(spark, sf01, "q17_small_quantity_revenue")
    for line in plan.splitlines():
        if "ReadSchema" in line and "l_partkey" in line:
            assert "l_returnflag" not in line
            assert "l_shipdate" not in line


def test_x43_broadcasts_bounded_vocab_and_topk_without_sort(spark, sf01):
    """The 500-row vocab is the one justified broadcast of a derived
    frame; the top-500 itself must plan as TakeOrderedAndProject, not a
    full global sort."""
    plan = _plan(spark, sf01, "x43_oov_rate")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q19_disjunction_splits_per_column_to_both_scans(spark, sf01):
    """The Q19 rewrite: each column's envelope AND the per-column OR
    residual must reach its parquet scan — rejected row groups never
    pay the join."""
    plan = _plan(spark, sf01, "q19_disjunctive_revenue")
    assert "LessThanOrEqual(l_quantity,30.0)" in plan
    assert "LessThanOrEqual(p_size,15)" in plan
    # Catalyst splits the cross-table OR into per-column residuals
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    for ln in rs:
        assert "l_shipdate" not in ln and "p_name" not in ln


def test_q16_blocklist_plans_as_anti_join(spark, sf01):
    """NOT IN over the non-null supplier key must become a (runtime-
    broadcast) left-anti hash join, never a per-row subquery."""
    plan = _plan(spark, sf01, "q16_supplier_variety")
    assert "LeftAnti" in plan


def test_q22_anti_join_and_bounded_broadcasts(spark, sf01):
    """The urgent-order NOT EXISTS is an anti join; the 1-row threshold
    and 25-row nation dim broadcast; customer itself is never built."""
    plan = _plan(spark, sf01, "q22_dormant_highvalue")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row threshold frame
    assert "BroadcastHashJoin" in plan  # nation dim


def test_x44_centroid_frame_broadcasts(spark, sf01):
    """The 32-row centroid-subvector frame must broadcast into the
    assignment join — shuffling the full vector side against it would
    be the scale bug."""
    plan = _plan(spark, sf01, "x44_product_quantization")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_x5f_probe_is_partition_pruned_read(spark, sf01):
    """The IVF layout claim, physically: the probe scan must carry
    PartitionFilters on the cell directory column — reading only the
    probed cells, not filtering after a full scan."""
    plan = _plan(spark, sf01, "x5f_ivf_partitioned_layout")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert any("cell" in ln and " IN (" in ln for ln in pf), pf


def test_q23_dims_reduced_and_broadcast_before_fact(spark, sf01):
    """Q7 shape: the two-nation supplier/customer sides must reach the
    600k-row fact as broadcasts (dim-first reduction), never a shuffle
    join of lineitem against full dims."""
    plan = _plan(spark, sf01, "q23_bilateral_trade")
    assert plan.count("BroadcastHashJoin") >= 3  # nation x2 sides + supp + cust


def test_q24_single_pass_share_aggregation(spark, sf01):
    """Q8 shape: numerator and denominator come out of ONE hash
    aggregation (no second pass over the join), and part/nation/region
    are broadcast."""
    plan = _plan(spark, sf01, "q24_market_share")
    assert plan.count("HashAggregate") <= 4  # partial+final, plus dim-prep aggs only
    assert "BroadcastHashJoin" in plan


def test_q25_part_dim_broadcasts_and_scan_prunes(spark, sf01):
    plan = _plan(spark, sf01, "q25_promo_revenue")
    assert "BroadcastHashJoin" in plan
    rs = [line for line in plan.splitlines() if "ReadSchema" in line]
    # part scan reads only (p_partkey, p_type)
    part_rs = [line for line in rs if "p_partkey" in line]
    assert part_rs and "p_retailprice" not in part_rs[0]


def test_a17_candidates_broadcast_no_vocab_exchange(spark, sf01):
    """Heavy hitters: the candidate set and the 1-row total must arrive
    as broadcasts; the only Exchange keys on the (bounded) candidate
    tokens, never the full vocabulary. The MG pass itself is mapInPandas
    with no shuffle at all."""
    plan = _plan(spark, sf01, "a17_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row total join
    # 3 shuffle Exchanges, every one on bounded data: candidate dedup,
    # candidate counts, the 1-row total (the full vocab never shuffles)
    import re

    assert len(re.findall(r"\+- Exchange ", plan)) <= 3
    assert "MapInPandas" in plan  # the MG pass, upstream of any Exchange


def test_w16_profile_broadcasts_back(spark, sf01):
    """The (type x 24)-row median/MAD profile must broadcast back to the
    event scan, not shuffle the events twice more."""
    plan = _plan(spark, sf01, "w16_seasonal_anomaly")
    assert plan.count("BroadcastHashJoin") >= 2


def test_x49_edges_filtered_before_triangle_joins(spark, sf01):
    """Triangle enumeration must run over the support-thresholded edge
    list: the >=2 filter sits on the aggregated pair counts BEFORE the
    two triangle joins (plan shows the filter between the pair agg and
    the joins, and no cartesian anywhere)."""
    plan = _plan(spark, sf01, "x49_triangle_cooccurrence")
    assert "CartesianProduct" not in plan
    assert "(support" in plan or "support#" in plan


def test_b3_bloom_probe_broadcasts_and_exact_semi_join(spark, sf01):
    """The 1-row bloom array must arrive as a broadcast, the probe must
    be pure JVM bit arithmetic (no Python eval), and the exactness
    backstop is a LeftSemi join after the probe."""
    plan = _plan(spark, sf01, "b3_bloom_filter_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan


def test_x51_postings_filter_pushed_and_topk_without_sort(spark, sf01):
    """BM25: the 4-term IN filter must reach the scan side of the
    postings (inverted-index probe, not score-everything), and top-20
    must plan as TakeOrderedAndProject."""
    plan = _plan(spark, sf01, "x51_bm25_retrieval")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_x53_gopher_audit_is_single_exchange(spark, sf01):
    """x53's five Gopher flags are narrow expressions on the scan; the
    per-source rollup must be the ONLY shuffle (map-side partial
    aggregation present)."""
    plan = _plan(spark, sf01, "x53_gopher_rules")
    assert plan.count("Exchange (") == 1, plan
    assert "HashAggregate" in plan


def test_x54_hashed_lm_broadcasts_no_term_shuffle_join(spark, sf01):
    """DSIR's point at scale: the hashed 64-bucket LM rides to the
    per-token join as a BROADCAST — no SortMergeJoin anywhere (contrast
    x20, whose unhashed vocab join must shuffle on term)."""
    plan = _plan(spark, sf01, "x54_dsir_importance")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_x55_hot_shingle_cap_is_broadcast_anti_join(spark, sf01):
    """x55's train-side df cap must exclude hot shingles via a broadcast
    anti-join on BOTH index sides (x3's discipline, cross-corpus)."""
    plan = _plan(spark, sf01, "x55_fuzzy_decontamination")
    assert plan.count("BroadcastHashJoin LeftAnti") >= 2 or (
        plan.count("LeftAnti") >= 2 and "BroadcastHashJoin" in plan
    ), plan


def test_x68_doc_window_is_bucket_partitioned(spark, sf01):
    """x68's whole point: the per-document cumulative runs in a window
    PARTITIONED BY bucket (100-way parallel), and the only unpartitioned
    window in the plan operates on the 100-row bucket-totals frame —
    the corpus never flows through a single-partition global sort."""
    plan = _plan(spark, sf01, "x68_token_budget_select")
    assert "windowspecdefinition(bucket" in plan, plan[:2000]


def test_w22_windows_share_one_order_partitioning(spark, sf01):
    """w22's three window passes (div/mod shares, base-sum leftover,
    remainder rank) all key on l_orderkey: they must REUSE one
    partitioning — at most 2 exchanges total (the join's), never one
    per window."""
    plan = _plan(spark, sf01, "w22_prorata_allocation")
    assert plan.count("Window (") == 3
    assert plan.count("Exchange (") <= 2, plan[:1500]


def test_x87_corpus_touched_once_topk_without_sort(spark, sf01):
    """x87's scale claim: the corpus scan happens exactly once (the word
    vocabulary pass — the pair explosion runs over the vocab frame, not
    the corpus), the global top-50 compiles to TakeOrderedAndProject
    (never a total sort), and no Python anywhere."""
    plan = _plan(spark, sf01, "x87_bpe_pair_counts")
    # formatted explain lists each node twice (tree + detail); count
    # detail headers "(n) Scan parquet" = distinct scan nodes
    import re as _re

    scans = _re.findall(r"^\(\d+\) Scan parquet", plan, _re.MULTILINE)
    assert len(scans) == 1, plan[:2000]
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_x86_graph_has_no_forced_broadcast_of_corpus_side(spark, sf01):
    """x86's candidate join is cell-keyed with BOTH sides corpus-sized:
    the library must not HINT a broadcast there (Catalyst may still
    choose one at this tiny SF from size stats — that's its call and
    reverses at scale; a hard-coded hint would not). Codebook joins stay
    broadcast, and nothing plans a cartesian product or Python eval."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators import (
        similarity as S,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf01, "embeddings")
    with _autobroadcast_off(spark):
        plan_df = S.knn_graph(emb, k=5, n_probe=2)
        jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = plan_df._jdf.queryExecution().explainString(jvm_mode)
    # with auto-broadcast disabled, only the explicit codebook
    # broadcasts survive; the cell join must fall back to a shuffle join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


class _autobroadcast_off:
    """Temporarily disable size-based auto-broadcast so the plan shows
    the join strategy the library actually encodes (what a 100 TB-sized
    side would get).

    Also clears the session cache: earlier tests may have materialized
    lazily-persisted library frames (e.g. knn_graph's ranked pass), and
    the CacheManager substitutes InMemoryRelation for any plan-identical
    subtree — hiding the very join nodes these contracts assert on
    (observed: the x86 SortMergeJoin vanished when a prior test had
    collected the same graph). Cache reuse is desirable in production;
    here the contract is about the COLD plan."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.spark.catalog.clearCache()
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_x89_zorder_no_global_sort_or_window(spark, sf01):
    """x89's layout math must be pure aggregation: no window function,
    no global sort, no Python — the writer twin is repartitionByRange +
    sortWithinPartitions, so the audit itself must not smuggle in a
    single-partition operator."""
    plan = _plan(spark, sf01, "x89_zorder_locality")
    assert "Window (" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_x93_beam_side_broadcasts_by_hint_not_stats(spark, sf01):
    """x93's per-hop joins put the Q·beam frame against the edge list
    and the vector table — the library must HINT those broadcasts (the
    beam is structurally tiny at ANY corpus size), so they survive
    with size-stat auto-broadcast disabled; and nothing may plan a
    cartesian product or Python eval. The graph-build subtree keeps
    its cell-keyed shuffle join (x86's own contract)."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators import (
        similarity as S,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf01, "embeddings")
    with _autobroadcast_off(spark):
        graph = S.knn_graph(emb, k=5, n_probe=2)
        q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
            "vec_id", "query_id"
        )
        plan_df = S.graph_beam_search(
            emb, graph, q, k=10, beam=10, hops=3, truncate_lineage=False
        )
        jvm_mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plan = plan_df._jdf.queryExecution().explainString(jvm_mode)
    # the final hop alone hints beam->edges, cand->vectors, qframe:
    # at least those explicit broadcasts must survive stats-off
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_x99_apply_path_has_no_joins_after_training(spark, sf01):
    """x99's scale claim: the tokenizer APPLY is one chained map
    expression — the segmentation of the vocabulary must introduce no
    join and no Python eval (the trained rules are inlined literals,
    not a joined table). Training runs eagerly inside the callable
    (checkpointed), so the returned plan shows only the fertility
    derivation: words_src agg + segged map + one join back on the word
    key — the 'Join' allowance is exactly that single equi-join."""
    plan = _plan(spark, sf01, "x99_bpe_fertility_trained")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    import re as _re

    joins = _re.findall(r"^\(\d+\) [A-Za-z]*Join", plan, _re.MULTILINE)
    assert len(joins) == 1, f"expected exactly the words_src⋈segged join: {joins}"


def test_a20_contract_is_two_scans_of_orders_no_python(spark, sf01):
    """a20's scale claim: however many expectations the contract
    carries, orders is scanned exactly twice (the fused wide agg + the
    referential anti-join) and customer once; no Python eval; the
    1-row combine is the scalar-broadcast pattern (BroadcastNestedLoop
    over single-row aggregates), never a real cartesian blow-up."""
    plan = _plan(spark, sf01, "a20_data_contract")
    import re as _re

    scans = _re.findall(r"^\(\d+\) Scan parquet", plan, _re.MULTILINE)
    assert len(scans) == 3, scans
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_x100_vocab_join_shuffles_on_term(spark, sf01):
    """x100's scale rule (same as x20/x25): the NB weight table is
    vocabulary-sized, so the scoring join must NOT be broadcast by the
    LIBRARY — with size-stat auto-broadcast off it must plan as a
    term-keyed shuffle join (at tiny SFs AQE may legitimately broadcast
    from stats; the contract is that no hint forces the vocab
    broadcast). The frames that DO broadcast by hint are the 1-row
    class totals and prior, which survive stats-off."""
    with _autobroadcast_off(spark):
        plan = _plan(spark, sf01, "x100_nb_quality_classifier")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan


def test_x104_rank_window_is_bucket_partitioned(spark, sf01):
    """x104's global decile rank must run as x68's distributed
    prefix-sum: the per-document row_number window PARTITIONED BY
    BUCKET, with only bucket-sized frames in unpartitioned windows —
    the corpus never flows through one global sort."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf01, "x104_classifier_calibration")
    assert "windowspecdefinition(bucket" in plan, plan[:2000]


def test_a22_rank_window_is_bucket_partitioned(spark, sf01):
    """a22's exact-quantile claim: the per-row rank window must be
    PARTITIONED BY BUCKET (x68's distributed prefix-sum), and the plan
    must not contain Spark's buffering exact percentile aggregate —
    the two operators this query exists to avoid."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf01, "a22_exact_quantiles_distributed")
    assert "windowspecdefinition(bucket" in plan, plan[:2000]
    assert "percentile" not in plan.lower()


def test_a23_weighted_quantiles_plan_shape(spark, sf01):
    """a23's weighted-quantile claim: the cumulative-weight window must
    be PARTITIONED BY BUCKET (no global sort of the data), the plan
    must not contain Spark's buffering percentile aggregate, and the
    3-row target frame must arrive by broadcast."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf01, "a23_weighted_quantiles")
    assert "windowspecdefinition(bucket" in plan, plan[:2000]
    assert "percentile" not in plan.lower()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_x110_query_bags_broadcast_no_cartesian(spark, sf01):
    """x110's scoring join must be a BROADCAST nested-loop of the tiny
    query-bag side (the NEQ predicate rules out an equi-join), never a
    CartesianProduct, and the per-query-vector max must partial-
    aggregate before the shuffle (HashAggregate both sides of the
    Exchange)."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf01, "x110_maxsim_retrieval")
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    # partial max before the (query_doc, qvid, cand_doc) shuffle
    assert "partial_max" in plan or "HashAggregate" in plan


def test_x110b_gate_is_candidate_keyed_equi_join(spark, sf01):
    """x110b's pruning claim: the candidate gate joins doc vectors on
    cand_doc (an EQUI key — hash/sort-merge or broadcast, never a
    nested loop against the corpus), so scoring rows scale with
    Σ_pairs |bag|, not N×Q."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf01, "x110b_maxsim_pruned")
    assert "CartesianProduct" not in plan
    assert "cand_doc" in plan


def test_hot_shingle_anti_join_is_hint_free(spark, sf01):
    """VERDICT r6 #5: the df-capped hot-shingle exclusion must NOT
    force-broadcast the hot list. It is tiny by Zipf at any fixed df
    cap, but its CARDINALITY grows with corpus vocabulary — a hint
    would pin an unbounded frame to the driver at 100 TB. With
    size-based auto-broadcast disabled (simulating a 100 TB-sized hot
    list) the anti-join must fall back to a shuffle join; in
    production AQE re-picks broadcast from runtime stats when the
    list really is small. Same idiom at every hot site
    (ngram_jaccard_pairs, shingle_containment_pairs,
    cross_corpus_contamination, st35's featurize)."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators import (
        dedup as D,
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf01, "documents").select("doc_id", "text")
    with _autobroadcast_off(spark):
        df = D.ngram_jaccard_pairs(docs, max_shingle_df=50)
        jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(jvm_mode)
    assert "LeftAnti" in plan, plan[:2000]
    assert "BroadcastHashJoin" not in plan, (
        "hot-shingle list must not be hint-forced to broadcast"
    )
