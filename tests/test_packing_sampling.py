"""Invariant tests for the training-pipeline preprocessing operators:
chunking (coverage + overlap), sequence packing (budget property),
stratified sampling (determinism + rate), int8 quantization (error
bound), PII redaction (idempotence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kenya_agricultural_regions_weather_etl_pipeline_spark.functions import (
    redact as R,
    vectors as V,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.sampling import (
    stratified_hash_sample,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
    load_table,
)


def test_chunks_cover_every_token_in_order(spark):
    """De-overlapped chunk concat reconstructs the original token stream."""
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(137))), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, chunk_size=50, overlap=10).toPandas()
    for doc_id, grp in chunks.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        rebuilt: list[str] = []
        for _, row in grp.iterrows():
            toks = row.chunk_text.split(" ") if row.chunk_text else []
            assert len(toks) == row.n_tokens
            # all but the first chunk repeat the previous chunk's 10-token tail
            rebuilt.extend(toks if not rebuilt else toks[10:])
        original = df.filter(F.col("doc_id") == doc_id).head().text.split(" ")
        assert rebuilt == original


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=10, overlap=10)


def test_packing_budget_property(spark, sf01):
    """Every pack except a key's last holds ≥ budget tokens only when a
    single doc overflows it; pack ids are dense from 0 per key."""
    docs = load_table(spark, sf01, "documents")
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions.text import (
        token_count,
    )

    packed = pack_sequences(
        docs, token_count(F.col("text")), budget=256, partition_col="lang"
    ).toPandas()
    for lang, grp in packed.groupby("lang"):
        sums = grp.groupby("pack_id").n_tokens.sum().sort_index()
        assert sums.index[0] == 0
        assert list(sums.index) == list(range(len(sums)))
        # cumulative bucketing: every non-final pack crosses its budget
        # boundary with its last doc, so it holds > budget - max_doc tokens
        max_doc = grp.n_tokens.max()
        for pack_id, total in sums.items():
            if pack_id != sums.index[-1]:
                assert total > 256 - max_doc


def test_stratified_sample_rate_and_determinism(spark, sf01):
    docs = load_table(spark, sf01, "documents")
    rates = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.25}
    a = stratified_hash_sample(docs, F.col("text"), "lang", rates, 0.1)
    b = stratified_hash_sample(
        docs.repartition(7), F.col("text"), "lang", rates, 0.1
    )
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # stable under re-partitioning
    kept = a.groupBy("lang").count().toPandas().set_index("lang")["count"]
    total = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, rate in rates.items():
        frac = kept.get(lang, 0) / total[lang]
        assert abs(frac - rate) < 0.2, f"{lang}: {frac} vs {rate}"


def test_stratified_sample_rejects_bad_rate(spark):
    df = spark.createDataFrame([(1, "x", "en")], "id long, text string, lang string")
    with pytest.raises(ValueError):
        stratified_hash_sample(df, F.col("text"), "lang", {"en": 1.5})


def test_quantize_int8_error_bound(spark, sf01):
    """Dequantized values lie within scale/2 of the original (half-up
    rounding bound), and codes stay in [-127, 127]."""
    emb = load_table(spark, sf01, "embeddings").limit(200)
    codes, scale = V.quantize_int8(V.to_double_array(F.col("embedding")))
    checked = emb.select(
        F.array_max(
            F.zip_with(
                F.transform(codes, lambda c: c.cast("double") * scale),
                V.to_double_array(F.col("embedding")),
                lambda dq, x: F.abs(dq - x),
            )
        ).alias("max_err"),
        scale.alias("scale"),
        F.array_max(F.transform(codes, lambda c: F.abs(c))).alias("max_code"),
    ).toPandas()
    assert (checked.max_err <= checked.scale / 2 + 1e-12).all()
    assert (checked.max_code <= 127).all()


def test_redaction_idempotent_and_masks(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.io or 12-345-678-9012 acct 1234567"),
            (2, "no pii here"),
        ],
        "id long, text string",
    )
    once = df.select(R.redact_text(F.col("text")).alias("t"))
    twice = once.select(R.redact_text(F.col("t")).alias("t"))
    assert [r.t for r in once.collect()] == [r.t for r in twice.collect()]
    cleaned = once.head().t
    assert "<EMAIL>" in cleaned and "<PHONE>" in cleaned and "<NUM>" in cleaned
    assert "9012" not in cleaned and "corp.io" not in cleaned
    masked = df.select(R.mask_keep_last(F.col("text"), 4).alias("m")).collect()
    assert masked[1].m == "*******here"


def test_domain_mixture_deterministic_and_bounded(spark, sf01):
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.sampling import (
        domain_mixture,
    )

    docs = load_table(spark, sf01, "documents").select("doc_id", "source", "text")
    mixed = domain_mixture(
        docs, F.col("text"), "source", {"src0": 2.5, "src1": 0.0}, 1.0
    )
    a = mixed.groupBy("source").count().collect()
    b = domain_mixture(
        docs.repartition(13), F.col("text"), "source", {"src0": 2.5, "src1": 0.0}, 1.0
    ).groupBy("source").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # re-shard stable
    rows = {r["source"]: r["count"] for r in a}
    n0 = docs.filter(F.col("source") == "src0").count()
    assert "src1" not in rows  # weight 0 drops the domain entirely
    assert 2 * n0 <= rows["src0"] <= 3 * n0  # 2.5x within floor/ceil bounds
    # epochs are 0..n_copies-1 per doc
    epochs = (
        mixed.filter(F.col("source") == "src0")
        .groupBy("doc_id")
        .agg(F.min("epoch").alias("lo"), F.max("epoch").alias("hi"),
             F.count(F.lit(1)).alias("n"))
    )
    bad = epochs.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    assert bad.count() == 0


def test_domain_mixture_rejects_negative_weight(spark):
    import pytest as _pytest

    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.sampling import (
        domain_mixture,
    )

    df = spark.range(1).select(F.col("id"), F.lit("a").alias("d"))
    with _pytest.raises(ValueError):
        domain_mixture(df, F.col("id").cast("string"), "d", {"a": -1.0})


def test_c4_flags_edge_cases(spark):
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions.text import (
        c4_filter_flags,
    )

    df = spark.createDataFrame(
        [("", ), ("word " * 20,), ("a " * 30,), ("supercalifragilistic " * 20,)],
        ["text"],
    )
    flags = c4_filter_flags(F.col("text"))
    rows = df.select(
        flags["flag_too_short"].alias("s"),
        flags["flag_bad_word_len"].alias("b"),
        flags["keep"].alias("k"),
    ).collect()
    empty, normal, short_words, long_words = rows
    assert empty["s"] and not empty["k"]          # empty doc: too short
    assert normal["k"]                            # 20x 4-char words: keep
    assert short_words["b"] and not short_words["k"]   # mean len 1 < 3
    assert long_words["b"] and not long_words["k"]     # mean len 20 > 10


def test_misra_gries_superset_guarantee_and_bounded_state(spark):
    """MG candidates: on a skewed stream split across partitions, every
    item with global count > N/(k+1) MUST survive (pigeonhole across
    per-partition summaries), and the candidate set stays <= k * n_partitions."""
    import pyspark.sql.functions as F

    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.topk import (
        heavy_hitters_exact,
        misra_gries_candidates,
    )

    k = 9
    # 3 heavy items (>N/(k+1)) drowned in a long tail, scattered over 8 partitions
    rows = (
        [("hot_a",)] * 400 + [("hot_b",)] * 300 + [("hot_c",)] * 200
        + [(f"tail_{i}",) for i in range(1500)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    n = len(rows)
    cands = {r.item for r in misra_gries_candidates(df, "item", k).collect()}
    # N/(k+1) = 240: hot_a (400) and hot_b (300) are guaranteed to
    # survive the sketch; hot_c (200) sits below the bound and may or
    # may not appear among candidates — the exact pass decides.
    assert {"hot_a", "hot_b"} <= cands
    assert len(cands) <= k * 8       # bounded state per partition
    exact = heavy_hitters_exact(df, "item", k).collect()
    got = {(r.item, r.cnt) for r in exact}
    assert got == {("hot_a", 400), ("hot_b", 300)}
    assert all(r.total_items == n for r in exact)
