"""Round-7 operator invariants: BM25's posting-list shape and
hand-computed scores, a24's per-group crossing rule vs a brute-force
weighted median, and st36's bucket-width invariance (the st31 law
generalized to weights)."""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F

from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.retrieval import (
    bm25_topk,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
    run_weighted_quantile_stream,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bm25_hand_computed_tiny_corpus(spark):
    """3-doc corpus, 1 query — scores recomputed in pure Python with
    the same formula must match to the 6-dp output exactly."""
    corpus = spark.createDataFrame(
        [
            (10, "maize rain rain soil"),
            (11, "maize drought"),
            (12, "tea leaves wet soil soil soil"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "rain soil")], "query_id long, text string"
    )
    out = {
        (r["query_id"], r["doc_id"]): (r["bm25"], r["rank"])
        for r in bm25_topk(corpus, q, k=5).collect()
    }
    # corpus stats: N=3, dl = {10:4, 11:2, 12:6}, avgdl = 4.0
    # df: rain=1, soil=2
    def score(tf, df_, dl):
        idf = math.log(1.0 + (3 - df_ + 0.5) / (df_ + 0.5))
        tfp = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 4.0)))
        return math.floor(1e9 * idf * tfp + 0.5)

    exp10 = score(2, 1, 4) + score(1, 2, 4)  # rain + soil in doc 10
    exp12 = score(3, 2, 6)  # soil only in doc 12
    assert out[(1, 10)][0] == math.floor((exp10 / 1e9) * 1e6 + 0.5) / 1e6
    assert out[(1, 12)][0] == math.floor((exp12 / 1e9) * 1e6 + 0.5) / 1e6
    assert (1, 11) not in out  # no shared term -> never a candidate
    assert out[(1, 10)][1] == 1 and out[(1, 12)][1] == 2


def test_bm25_candidates_are_posting_list_only(spark, sf001):
    """The scoring join is term-keyed: no CartesianProduct / no
    nested-loop of corpus x queries in the plan, and top-k comes from
    a rank filter (window per query), not a global sort."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf001, "documents")
    q = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    c = docs.filter(F.col("doc_id") >= 5).select("doc_id", "text")
    df = bm25_topk(c, q, k=5)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    # the ONLY non-equi join is the broadcast of the 1-row stats frame
    # (one tree line "... Cross BuildRight" + its numbered detail block)
    assert plan.count("BroadcastNestedLoopJoin Cross BuildRight") == 1
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "windowspecdefinition(query_id" in plan, plan[:2000]


def test_a24_matches_bruteforce_weighted_median(spark, sf001):
    """Per-group crossing rule == expand-by-weight brute force (the
    w-th repetition of each value, pick element ceil(W/2)) on sf0.001."""
    import __spark_entry__ as entrymod

    got = {
        r["l_returnflag"]: (
            r["target_weight"],
            r["total_weight"],
            r["median_value"],
        )
        for r in entrymod.queries()["a24_grouped_weighted_median"](
            spark, sf001
        ).collect()
    }
    li = (
        spark.read.parquet(f"{sf001}/lineitem.parquet")
        .select(
            "l_returnflag",
            "l_extendedprice",
            F.col("l_quantity").cast("long").alias("w"),
            "l_orderkey",
            "l_linenumber",
        )
        .collect()
    )
    groups = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], r["w"], r["l_orderkey"], r["l_linenumber"])
        )
    for g, rows in groups.items():
        rows.sort()
        w_total = sum(w for _, w, _, _ in rows)
        wk = max(1, math.ceil(0.5 * w_total))
        cum = 0
        for v, w, _, _ in rows:
            cum += w
            if cum >= wk:
                assert got[g] == (wk, w_total, v), g
                break


def test_st36_bucket_width_invariance(spark, sf001):
    """Exact weighted quantiles cannot depend on the histogram bucket
    width — coarser state changes fan-out, never the answer."""
    a = _rows(run_weighted_quantile_stream(spark, sf001, bucket_width=2000.0))
    b = _rows(run_weighted_quantile_stream(spark, sf001, bucket_width=500.0))
    assert a == b


def test_a24_plan_shape(spark, sf01):
    """a24's scale claim: the cumulative window partitions by
    (l_returnflag, bucket) — never a per-group global sort — no
    buffering percentile aggregate, broadcast target frame."""
    import __spark_entry__ as entrymod

    spark.catalog.clearCache()
    df = entrymod.queries()["a24_grouped_weighted_median"](spark, sf01)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "windowspecdefinition(l_returnflag" in plan, plan[:2000]
    assert re.search(r"windowspecdefinition\(l_returnflag#\d+, bucket#\d+", plan)
    assert "percentile" not in plan.lower()
    assert "BroadcastHashJoin" in plan


def test_rrf_fuse_hand_computed(spark):
    """Fusion on tiny hand-built lists: doc in both legs, docs in one
    leg only, and the equal-score tie (sparse-only rank 2 vs dense-only
    rank 2) breaking on doc_id."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.retrieval import (
        rrf_fuse,
    )

    sparse = spark.createDataFrame(
        [(1, 100, 1), (1, 102, 2)], "query_id long, doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2)], "query_id long, doc_id long, rank int"
    )
    rows = {
        r["doc_id"]: r for r in rrf_fuse(sparse, dense, k=10).collect()
    }
    both = 1.0 / 61.0 + 1.0 / 61.0
    one = 1.0 / 62.0
    assert rows[100]["rank"] == 1
    assert rows[100]["rrf_score"] == math.floor(both * 1e6 + 0.5) / 1e6
    # 101 and 102 tie at 1/62 -> doc_id asc breaks it
    assert rows[101]["rank"] == 2 and rows[102]["rank"] == 3
    assert rows[101]["rrf_score"] == math.floor(one * 1e6 + 0.5) / 1e6
    assert rows[102]["sparse_rank"] == 2 and rows[102]["dense_rank"] is None
    assert rows[101]["sparse_rank"] is None and rows[101]["dense_rank"] == 2


def test_st37_batch_count_invariance(spark, sf001):
    """The drained BM25 scores cannot depend on how the corpus was
    micro-batched — 2 vs 4 arrival files, same index, same answer."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_bm25_index_ingest,
    )

    a = _rows(run_bm25_index_ingest(spark, sf001, n_batches=4))
    b = _rows(run_bm25_index_ingest(spark, sf001, n_batches=2))
    assert a == b and len(a) > 0


def test_x121_no_cartesian(spark, sf01):
    """The fusion and both legs stay bounded: no CartesianProduct
    anywhere in the physical plan (the dense leg's NEQ join and the
    stats frame must both be broadcast nested loops)."""
    import __spark_entry__ as entrymod

    spark.catalog.clearCache()
    df = entrymod.queries()["x121_hybrid_rrf"](spark, sf01)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan


def test_phrase_match_hand_computed(spark):
    """Phrase 'rain in may' occurs twice in doc 20 (pos 1 and 5),
    once in doc 21, zero in doc 22 (words present, order broken)."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.retrieval import (
        phrase_match,
    )

    corpus = spark.createDataFrame(
        [
            (20, "rain in may then rain in may again"),
            (21, "expect rain in may soon"),
            (22, "may in rain order is broken"),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(1, "rain", "in", "may")],
        "query_id long, t1 string, t2 string, t3 string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(corpus, phrases).collect()
    }
    assert got == {20: (2, 1), 21: (1, 2)}


def test_prf_expansion_excludes_query_terms(spark, sf001):
    """No expansion term may be an original query term (the anti-join
    contract), ranks are 1..n dense per query, weights positive."""
    import __spark_entry__ as entrymod
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.retrieval import (
        query_terms,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    qt = {
        (r["query_id"], r["term"])
        for r in query_terms(
            docs.filter(F.col("doc_id") < 5).select(
                F.col("doc_id").alias("query_id"), "text"
            )
        ).collect()
    }
    rows = entrymod.queries()["x123_prf_expansion"](spark, sf001).collect()
    assert rows, "expansion produced nothing at sf0.001"
    by_q = {}
    for r in rows:
        assert (r["query_id"], r["term"]) not in qt
        assert r["weight"] > 0
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_x122_plan_all_equi_joins(spark, sf01):
    """The positional intersection must be hash-keyed end to end: no
    CartesianProduct, no nested loop anywhere."""
    import __spark_entry__ as entrymod

    spark.catalog.clearCache()
    df = entrymod.queries()["x122_phrase_search"](spark, sf01)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_st38_batch_count_invariance(spark, sf001):
    """Hybrid serving cannot depend on how queries were batched — 3 vs
    2 arrival files against the same frozen two-leg index, same fused
    answers."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_hybrid_serve_stream,
    )

    a = _rows(run_hybrid_serve_stream(spark, sf001, n_batches=3))
    b = _rows(run_hybrid_serve_stream(spark, sf001, n_batches=2))
    assert a == b and len(a) > 0


def test_st39_batch_count_invariance(spark, sf001):
    """Media dedup on ingest cannot depend on arrival batching — 4 vs
    2 asset-range files, same holder evolution, same drained rollup
    (22 hash groups at n_assets=64: each asset's 2 editions collapse,
    plus any cross-asset collisions)."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_media_dedup_ingest,
    )

    a = _rows(run_media_dedup_ingest(spark, sf001, n_batches=4))
    b = _rows(run_media_dedup_ingest(spark, sf001, n_batches=2))
    assert a == b and len(a) > 0
    # every group holds at least its own second edition
    assert all(r[3] >= 1 for r in a)


# ---- property tests: pure-Python models vs the Spark operators ------
# (oracle-independent leg — hypothesis drives random tiny corpora)

from hypothesis import given, settings
from hypothesis import strategies as hst

_word = hst.sampled_from(["rain", "maize", "soil", "dry", "tea", "wet"])
_doc = hst.lists(_word, min_size=1, max_size=8).map(" ".join)


def _bm25_py(corpus, queries, k):
    """Reference BM25 in pure Python — same formula, same quantize."""
    tf, dl = {}, {}
    for d, text in corpus:
        toks = text.lower().split()
        dl[d] = len(toks)
        for t in toks:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfc = {}
    for (d, t) in tf:
        dfc[t] = dfc.get(t, 0) + 1
    n_docs = len(dl)
    avgdl = float(sum(dl.values())) / n_docs
    out = {}
    for q, text in queries:
        units = {}
        for t in sorted(set(text.lower().split())):
            if t not in dfc:
                continue
            idf = math.log(
                1.0 + (n_docs - dfc[t] + 0.5) / (dfc[t] + 0.5)
            )
            for d in dl:
                if (d, t) in tf:
                    f = tf[(d, t)]
                    tfp = (f * 2.2) / (
                        f + 1.2 * (0.25 + 0.75 * (dl[d] / avgdl))
                    )
                    units[d] = units.get(d, 0) + math.floor(
                        1e9 * idf * tfp + 0.5
                    )
        ranked = sorted(units.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (d, u) in enumerate(ranked[:k], 1):
            out[(q, d)] = (
                math.floor((u / 1e9) * 1e6 + 0.5) / 1e6,
                r,
            )
    return out


@settings(max_examples=8, deadline=None)
@given(hst.lists(_doc, min_size=2, max_size=6), _doc)
def test_bm25_matches_python_model(spark, corpus_texts, qtext):
    corpus = [(10 + i, t) for i, t in enumerate(corpus_texts)]
    queries = [(1, qtext)]
    got = {
        (r["query_id"], r["doc_id"]): (r["bm25"], r["rank"])
        for r in bm25_topk(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(
                queries, "query_id long, text string"
            ),
            k=4,
        ).collect()
    }
    assert got == _bm25_py(corpus, queries, 4)


@settings(max_examples=8, deadline=None)
@given(
    hst.lists(hst.lists(_word, min_size=3, max_size=10), min_size=1, max_size=5),
    hst.tuples(_word, _word, _word),
)
def test_phrase_match_matches_python_model(spark, docs_toks, phrase):
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.retrieval import (
        phrase_match,
    )

    corpus = [(20 + i, " ".join(t)) for i, t in enumerate(docs_toks)]
    expect = {}
    for d, text in corpus:
        toks = text.split()
        hits = [
            i + 1
            for i in range(len(toks) - 2)
            if tuple(toks[i : i + 3]) == phrase
        ]
        if hits:
            expect[(1, d)] = (len(hits), hits[0])
    got = {
        (r["query_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_match(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(
                [(1, *phrase)],
                "query_id long, t1 string, t2 string, t3 string",
            ),
        ).collect()
    }
    assert got == expect


def test_x120_scan_prunes_to_id_and_text(spark, sf01):
    """BM25 needs 2 of documents' 5 columns; the parquet scan must not
    read lang/source/n_chars (column pruning reaching the reader)."""
    import __spark_entry__ as entrymod

    spark.catalog.clearCache()
    df = entrymod.queries()["x120_bm25_topk"](spark, sf01)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs, plan[:1500]
    for ln in rs:
        if "doc_id" in ln:
            assert "n_chars" not in ln and "lang" not in ln, ln
    # and the doc_id range predicates reach the reader
    assert "PushedFilters: [" in plan


def test_st40_batch_count_invariance(spark, sf001):
    """Mixed-modality dedup cannot depend on arrival batching; both
    modalities present in the drained rollup, suppressed >= 1
    everywhere (each asset ships 2 editions)."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
        run_mixed_media_dedup_ingest,
    )

    a = _rows(run_mixed_media_dedup_ingest(spark, sf001, n_batches=4))
    b = _rows(run_mixed_media_dedup_ingest(spark, sf001, n_batches=2))
    assert a == b and len(a) > 0
    mts = {r[0] for r in a}
    assert mts == {"image", "audio"}
    assert all(r[4] >= 1 for r in a)


def test_x125_erasure_semantics(spark, sf001):
    """Canonical handoff: wherever the old canonical was deleted and
    survivors remain, new_canonical is a surviving member > old; fully
    erased groups carry NULL; untouched groups never appear."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["x125_erasure_propagation"](
        spark, sf001
    ).collect()
    assert rows
    for r in rows:
        assert r["n_deleted"] >= 1
        if r["n_remaining"] == 0:
            assert r["new_canonical"] is None
            assert not r["canonical_changed"]
        else:
            assert r["new_canonical"] is not None
            if r["old_canonical"] % 17 == 3:  # canonical was deleted
                assert r["new_canonical"] > r["old_canonical"]
                assert r["canonical_changed"]
            else:
                assert r["new_canonical"] == r["old_canonical"]
                assert not r["canonical_changed"]
