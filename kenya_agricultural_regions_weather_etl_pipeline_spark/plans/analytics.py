"""Extended analytics surface — the r7 corpus-quality / curation
family (x50-x81: entropy, Gopher rules, DSIR, decontamination,
tokenizer fertility, split repair, dataset cards, dedup policy
economics), the portable dedup twins (x2c MinHash / x4b SimHash), and
the SQL-mart extension queries (q23-q32 business marts, w16-w25
window analytics, a17/a19-a21 aggregate surfaces, x49 triangles,
r8 bitemporal as-of).

Moved VERBATIM from ``__spark_entry__`` (VERDICT r8 #2 hygiene: the
entry module was within 1% of its 11k-line guard; query families live
in the package, the entry module only registers them — the same split
plans/agro.py, plans/retrieval.py, and plans/compliance.py got in
r7/r8). Bodies are byte-for-byte the driver-green implementations;
the DuckDB oracles in ``oracles/`` are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import weather as W
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import topk as K
from ..operators.retrieval import B as BM25_B
from ..operators.retrieval import K1 as BM25_K1
from ..operators.similarity import _hyperplane
from ..sources.tables import load_table



def x50_char_entropy(spark, sf_dir):
    """Per-document character-entropy quality signal — the standard
    gibberish/binary/compressed-blob detector in LLM corpus filtering
    (near-zero entropy = repeated filler, near-log|alphabet| = random
    noise; natural text sits in a narrow band). Shannon entropy in nats
    via the single-log form H = ln(n) − (Σ n_c·ln n_c)/n over per-doc
    character counts: one (doc, char)-keyed hash aggregation (partial
    combine collapses each partition's chars first) + one per-doc
    rollup — two bounded shuffles, no Python. Rounded 4dp with x20's
    ln-parity discipline."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("nc")
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("nc").alias("n"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            F.sum(F.col("nc") * F.log("nc")).alias("_s"),
        )
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_chars2"),
            F.col("n_distinct_chars").cast("bigint").alias("n_distinct_chars"),
            W.round_half_up(
                F.log("n") - F.col("_s") / F.col("n"), 4
            ).alias("entropy_nats"),
        )
    )


def x53_gopher_rules(spark, sf_dir):
    """Gopher rule-based document filter audit (Rae et al. 2021 App. A —
    the second public rule family beyond x24's C4 gates): token-count
    band, mean-word-length band, symbol-to-word ratio, alphabetic-word
    fraction, and the >=2-required-stopwords rule, rolled up per source.
    Every flag is a pure narrow expression on the scan (one regex
    tokenize reused across signals, no Python, no join); the per-source
    rollup is the only shuffle — at 100 TB this is a map-side gate like
    x24, and the audit costs one pass."""
    docs = load_table(spark, sf_dir, "documents")
    flags = T.gopher_filter_flags(F.col("text"), min_tokens=20)
    flag_names = (
        "flag_token_count",
        "flag_word_len",
        "flag_symbol",
        "flag_alpha",
        "flag_stopword",
        "keep",
    )
    return (
        docs.select(
            "source",
            *[flags[k].cast("int").alias(k) for k in flag_names],
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(k).cast("bigint").alias(f"n_{k}")
                for k in flag_names
            ],
        )
    )


def x54_dsir_importance(spark, sf_dir):
    """DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document importance
    weight = mean hashed-unigram log-likelihood ratio between a target
    domain (here lang='en') and the raw corpus, with add-1 smoothing.
    The point of HASHED n-gram features at 100 TB: both LMs collapse to
    a fixed 64-bucket table regardless of vocabulary size, so the model
    rides to every executor as a broadcast — the per-token join never
    shuffles (contrast x20, whose unhashed vocab join must shuffle on
    term). Buckets use the portable polynomial rolling hash so the
    DuckDB twin reproduces bucket assignment bit-for-bit; the weight is
    rounded 4dp under x20's ln-parity discipline. ``selected`` is the
    deterministic resampling decision (weight above the neutral 0)."""
    B = 64
    docs = load_table(spark, sf_dir, "documents")
    tb = docs.select(
        "doc_id",
        "lang",
        F.explode(T.tokens(F.lower(F.col("text")))).alias("term"),
    ).select(
        "doc_id", "lang", (T.rolling_hash(F.col("term")) % B).alias("b")
    )
    raw = tb.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        tb.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    lm = raw.join(F.broadcast(tgt), "b", "left").select(
        "b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")
    )
    totals = lm.agg(
        F.sum("cr").alias("r_total"), F.sum("ct").alias("t_total")
    )
    ratio = F.log(
        (F.col("ct") + 1).cast("double") / (F.col("t_total") + B)
    ) - F.log((F.col("cr") + 1).cast("double") / (F.col("r_total") + B))
    return (
        tb.join(F.broadcast(lm), "b")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            W.round_half_up(F.avg(ratio), 4).alias("dsir_logratio"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "dsir_logratio",
            (F.col("dsir_logratio") > 0).cast("int").alias("selected"),
        )
    )


def x55_fuzzy_decontamination(spark, sf_dir):
    """Fuzzy benchmark decontamination: (train, eval) pairs over the
    x11 content-addressed split whose word-3-shingle Jaccard reaches
    0.2, rolled up to the contaminated-train-doc verdict (n matching
    eval docs + max similarity). Catches the paraphrased/reformatted
    eval leakage that x22's exact 5-gram hit test misses. The pair
    search is operators/dedup.py:cross_corpus_jaccard — inverted-index
    join keyed by shingle with the train-side df cap, so candidates
    scale with shared-shingle co-occurrence, never |train|×|eval|."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.sampling import (
        hash_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    s = hash_split(docs, F.col("text"), {"train": 0.9, "val": 0.05, "test": 0.05})
    train = s.filter(F.col("split") == "train")
    test = s.filter(F.col("split") != "train")
    pairs = D.cross_corpus_jaccard(
        train, test, k_shingle=3, threshold=0.2, max_shingle_df=50
    )
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )


def x56_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility / compression statistics per language — the
    standard multilingual-tokenizer health check (fertility = subword
    tokens per whitespace word; chars per subword token): languages a
    BPE vocabulary serves poorly show high fertility, which inflates
    their effective sequence length and training cost. Uses the
    deterministic BPE-ish regex proxy (x8b's tokenizer); all three
    ratios are integer-sum divisions rounded 6dp, so the rollup is
    exact on both engines. One narrow scan + one bounded per-lang
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        T.bpe_ish_token_count(F.col("text")).alias("bpe"),
        T.token_count(F.col("text")).alias("ws"),
        F.length("text").alias("chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe").cast("bigint").alias("sum_bpe_tokens"),
        F.sum("ws").cast("bigint").alias("sum_ws_tokens"),
        W.round_half_up(
            F.sum("bpe").cast("double") / F.greatest(F.sum("ws"), F.lit(1)), 6
        ).alias("fertility"),
        W.round_half_up(
            F.sum("chars").cast("double") / F.greatest(F.sum("bpe"), F.lit(1)),
            6,
        ).alias("chars_per_token"),
    )


def x57_hard_negatives(spark, sf_dir):
    """Contrastive-training hard-negative mining: per query vector, the
    top-5 most-similar corpus vectors inside the [0.3, 0.8) cosine
    band (informative negatives, excluding the near-duplicate zone and
    the query itself) — operators/similarity.hard_negatives, x5's
    broadcast-query exact shape with the band as a pre-rank filter."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    return S.hard_negatives(emb, q, k=5, lo=0.3, hi=0.8)


def w17_yoy_compare(spark, sf_dir):
    """Year-over-year comparison window: monthly revenue vs the same
    month one year earlier (lag 12 over the month series) — the
    standard seasonality-aware KPI delta. Revenue sums in
    DECIMAL(18,4) (reduction-order-independent, q23's discipline); the
    month series after aggregation is bounded (#months, ~80 rows), so
    the unpartitioned ordered window is a deliberate tiny-series
    exception to the no-global-window rule — at any SF the frame the
    window sees is months, never rows."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.col("o_totalprice").cast("decimal(18,4)").alias("p"),
        )
        .groupBy("y", "m")
        .agg(F.sum("p").alias("rev"))
    )
    w = Window.orderBy("y", "m")
    prev = F.lag("rev", 12).over(w)
    return monthly.select(
        "y",
        "m",
        F.col("rev").cast("double").alias("revenue"),
        prev.cast("double").alias("revenue_prev_year"),
        W.round_half_up(
            (F.col("rev") - prev).cast("double")
            / prev.cast("double")
            * 100,
            4,
        ).alias("yoy_pct"),
    )


def a19_group_mode(spark, sf_dir):
    """Exact statistical mode per group with a deterministic tiebreak
    (most frequent l_quantity per return flag; lowest value wins ties):
    the two-level count-then-rank idiom — first a (group, value) hash
    aggregation with map-side combine, then a per-group window over the
    DISTINCT-VALUE frame (bounded by |distinct values|, never by rows).
    The generic form of 'most common category' profiling at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("modal_quantity"),
            F.col("n").cast("bigint").alias("n_occurrences"),
        )
    )


def x58_zipf_slope(spark, sf_dir):
    """Corpus Zipf-law fit: OLS slope/intercept of ln(freq) on ln(rank)
    over the top-200 terms — the classic corpus-health diagnostic
    (natural corpora sit near slope -1; scraped boilerplate and
    synthetic spam bend the curve). The top-200 selection is
    TakeOrdered (never a full vocab sort through one partition); the
    regression runs over those 200 rows with the slope written as
    explicit Σ-sums — identical arithmetic on both engines, no
    engine-internal regr_slope formula differences — rounded 4dp."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = tf.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(200)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("term").asc())
        ),
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_terms"),
        W.round_half_up(slope, 4).alias("zipf_slope"),
        W.round_half_up(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 4
        ).alias("zipf_intercept"),
    )


def q26_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape — late-shipment risk: lineitems shipped in 1996
    MORE than 60 days after their order date, with urgent vs non-urgent
    order counts per line status (the testdata schema has no
    shipmode/commitdate, so lateness is shipdate - orderdate and the
    category is l_linestatus — same conditional-count-after-date-
    predicates plan shape as Q12). The ship-year predicate pushes to
    the lineitem scan; the lateness predicate is a residual on the
    joined row (it references both sides); the SUM(CASE) pair sits in
    ONE hash aggregation after one orderkey-keyed shuffle join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q27_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape — forecasting revenue change: the pure
    scan-filter-aggregate query (no join at all). Every predicate
    (year band, discount band, quantity cap) pushes to the parquet
    reader; the single DECIMAL(18,4) product-sum is
    reduction-order-independent, so one number comes back from a scan
    that never shuffles more than one row per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


def x59_line_dedup(spark, sf_dir):
    """Sub-document (sentence-level) deduplication — the CCNet /
    RefinedWeb line-wise pass that document-level dedup cannot do:
    boilerplate sentences repeated ACROSS documents (cookie banners,
    headers, license blurbs) are dropped everywhere except their
    globally-first occurrence (min (doc_id, position), a deterministic
    tiebreak), then each document is reassembled in original sentence
    order. One shuffle keyed by the sentence fingerprint (the dedup
    decision), one keyed by doc_id (the reassembly) — both linear; the
    fingerprint shuffle carries md5+position, never the sentence text
    twice. Docs whose every sentence was dropped vanish (consistent on
    both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    sents = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"\.\s+")).alias("pos0", "s"),
        )
        .filter(F.col("s") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "s")
    )
    fp = T.fingerprint_md5(F.col("s"))
    w = Window.partitionBy(fp).orderBy(F.col("doc_id").asc(), F.col("pos").asc())
    survivors = (
        sents.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return survivors.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda x: x["s"],
            ),
            ". ",
        ).alias("clean_text"),
    )


def x2c_minhash_portable(spark, sf_dir):
    """MinHash-LSH near-dup pairs with ENGINE-PORTABLE hashing
    (operators/dedup.minhash_portable_pairs): the exact-oracled upgrade
    of the xxhash64 x2/x2b sketches — signatures, banded buckets,
    candidates and the exact-Jaccard verify all replay bit-identically
    in DuckDB, so the whole LSH pipeline gets a hard hash-match gate
    instead of a rows-only check. 16 hashes × 4 bands, verify at
    Jaccard ≥ 0.5; one signature shuffle, one band-keyed candidate
    join, never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_portable_pairs(
        docs, k_shingle=3, n_hashes=16, n_bands=4, threshold=0.5
    )


def x2_minhash_lsh_pairs(spark, sf_dir):
    """Banded MinHash-LSH CANDIDATE pairs — the raw bucket-join output
    BEFORE exact-Jaccard verification, the frame a verify stage (x2b)
    or a standing streaming bucket index (st14) consumes.

    Re-pointed in r9 (VERDICT r8 #4) from the xxhash64 production
    sketch onto the engine-portable hash family, so the candidate
    stage itself carries an exact DuckDB oracle instead of a rows-only
    check; the xxhash64 path stays available as
    ``operators/dedup.minhash_lsh_pairs`` with its own pytest. Same
    plan shape either way: one signature shuffle, one band-keyed
    self-join — never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_portable_pairs(
        docs, k_shingle=3, n_hashes=16, n_bands=4, candidates_only=True
    )


def x2b_minhash_verified(spark, sf_dir):
    """The 100 TB dedup pipeline at the LOOSER policy point: portable
    MinHash-LSH candidates → exact-Jaccard verification at ≥ 0.4
    (x2c verifies the same machinery at ≥ 0.5 — together the two
    registry points pin the threshold sensitivity of one pipeline).
    Re-pointed in r9 from the xxhash64 sketch (VERDICT r8 #4) so the
    verify output is exact-oracled; the xxhash64 candidates + the
    standalone ``ngram_jaccard_verify`` stage keep their own
    pytests."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_portable_pairs(
        docs, k_shingle=3, n_hashes=16, n_bands=4, threshold=0.4
    )


def x4_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs at the TIGHTER hamming ≤ 2 policy point
    (x4b is ≤ 3; pigeonhole over 4 blocks stays exact for both).
    Re-pointed in r9 from the xxhash64 fingerprint (VERDICT r8 #4)
    onto the portable 48-bit universal-hash family so the pair set is
    exact-oracled; ``operators/dedup.simhash_pairs`` (xxhash64,
    64-bit) remains the production alternative with its own
    locality-separation pytest."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_portable_pairs(docs, max_hamming=2, n_blocks=4)


def x60_knn_label_accuracy(spark, sf_dir):
    """Embedding-quality evaluation by 1-NN label agreement: for a
    64-query probe set, predict each query's label from its nearest
    cosine neighbor (excluding itself) and roll up accuracy per true
    label — the standard leave-one-out probe for 'do my embeddings
    cluster by class'. Exercises the previously-unused ``label`` column
    as ground truth. Broadcast probe side ⋈ corpus (x5's exact shape);
    the argmax-per-query is a window over the probe partition; the
    per-label rollup is bounded by |labels|."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    # hard_negatives with an all-covering band IS "1-NN excluding self"
    # (the self-pair exclusion applies before ranking, so an exact
    # duplicate of the query can never displace the true neighbor)
    best = S.hard_negatives(
        emb,
        q.select("query_id", F.col("qv").alias("embedding")),
        k=1,
        lo=-2.0,
        hi=2.0,
    ).select("query_id", F.col("vec_id").alias("nn_id"))
    labels = emb.select(
        F.col("vec_id").alias("nn_id"), F.col("label").alias("pred_label")
    )
    return (
        best.join(q.select("query_id", "true_label"), "query_id")
        .join(labels, "nn_id")
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("int")
            )
            .cast("bigint")
            .alias("n_correct"),
        )
    )


def x61_matryoshka_fidelity(spark, sf_dir):
    """Matryoshka/truncation fidelity: how much of the exact top-5
    neighbor set survives when embeddings are truncated from 64 to the
    first 16 dimensions — the dimension-reduction memory/recall
    trade-off probe (truncate-and-renormalize retrieval). Both ANN
    passes are x5's broadcast-exact shape; the overlap is a semi-join
    count per query. Output: per-query overlap@5."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    full = S.cosine_topk_bruteforce(emb, q, k=5).select(
        "query_id", "vec_id"
    )
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    q16 = q.select("query_id", F.slice("embedding", 1, 16).alias("embedding"))
    trunc = S.cosine_topk_bruteforce(emb16, q16, k=5).select(
        "query_id", F.col("vec_id").alias("t_vec_id")
    )
    return (
        full.join(
            trunc,
            (full.query_id == trunc.query_id)
            & (F.col("vec_id") == F.col("t_vec_id")),
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_at_5"))
    )


def x62_source_divergence(spark, sf_dir):
    """Pairwise Jensen–Shannon divergence between per-source unigram
    language models over x54's hashed 64-bucket feature space — the
    corpus-mixture diversity matrix (which sources are near-duplicates
    of each other's distribution, which add genuine diversity; the
    signal behind mixture reweighting decisions). Hashing fixes the LM
    width at 64 buckets regardless of vocabulary, so the dense
    per-source distributions are |sources|×64 rows (bounded metadata),
    the pair expansion is bucket-keyed, and nothing about the
    computation grows with corpus size except the one token-counting
    pass. Add-1 smoothing keeps every bucket positive; the JS sum is
    32-ln-term arithmetic written identically on both engines, rounded
    6dp."""
    B = 64
    docs = load_table(spark, sf_dir, "documents")
    tb = docs.select(
        "source",
        F.explode(T.tokens(F.lower(F.col("text")))).alias("term"),
    ).select("source", (T.rolling_hash(F.col("term")) % B).alias("b"))
    counts = tb.groupBy("source", "b").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    buckets = spark.range(B).select(F.col("id").cast("long").alias("b"))
    dense = (
        totals.crossJoin(F.broadcast(buckets))
        .join(counts, ["source", "b"], "left")
        .select(
            "source",
            "b",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("t") + B)
            ).alias("p"),
        )
    )
    a, bb = dense.alias("a"), dense.alias("b")
    pairs = a.join(
        bb,
        (F.col("a.b") == F.col("b.b"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.p").alias("p"),
        F.col("b.p").alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    term = 0.5 * F.col("p") * F.log(F.col("p") / m) + 0.5 * F.col(
        "q"
    ) * F.log(F.col("q") / m)
    return pairs.groupBy("source_a", "source_b").agg(
        W.round_half_up(F.sum(term), 6).alias("js_divergence")
    )


def x63_rag_self_retrieval(spark, sf_dir):
    """RAG retrieval EVALUATION by self-retrieval: take the first 8
    tokens of every 50th document as a query and measure where BM25
    ranks the query's own parent document — the standard
    retrieval-quality probe (parent rank, reciprocal rank) when no
    labeled relevance data exists. Multi-query form of x51: the query
    side is a (query_id, term) relation joined into the postings by
    TERM (an inverted-index probe — only postings matching some query
    term flow; nothing vocabulary-sized shuffles; df/dl/avgdl ride as
    broadcasts). Ranking key is the 6dp-rounded score with doc_id
    tiebreak (x25/x51 discipline). At 100 TB the per-query candidate
    set is bounded by the query terms' document frequencies — the
    WAND-style pruning surface."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("_toks"), F.count(F.lit(1)).alias("_n")
    )
    qterms = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.slice(T.tokens(F.lower(F.col("text"))), 1, 8)
            ).alias("term"),
        )
        .distinct()
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qterms.join(tf, "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    (F.col("_n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (
                        1
                        - BM25_B
                        + BM25_B
                        * F.col("dl")
                        / (F.col("_toks") / F.col("_n"))
                    )
                )
            ).alias("term_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(W.round_half_up(F.sum("term_score"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    return ranked.filter(F.col("doc_id") == F.col("query_id")).select(
        "query_id",
        F.col("rnk").cast("bigint").alias("parent_rank"),
        W.round_half_up(F.lit(1.0) / F.col("rnk"), 6).alias(
            "reciprocal_rank"
        ),
    )


def w18_pareto_concentration(spark, sf_dir):
    """Revenue concentration (Pareto/ABC curve): the top-100 parts by
    revenue with each part's cumulative share of TOTAL revenue — the
    'what fraction of revenue do the top N SKUs carry' analytic.
    Scale discipline: the global ordered window never sees the corpus —
    candidates are TakeOrdered-ed to 100 rows FIRST, the total rides in
    as a broadcast 1-row frame, and only the 100-row survivor frame is
    windowed. Revenue in DECIMAL(18,4) end-to-end (cumsum included), so
    shares are exact-then-rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev")
        )
    )
    total = rev.agg(F.sum("rev").alias("total_rev"))
    top = rev.orderBy(F.col("rev").desc(), F.col("l_partkey").asc()).limit(100)
    w = (
        Window.orderBy(F.col("rev").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("cum_rev", F.sum("rev").over(w))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("rev").desc(), F.col("l_partkey").asc()))
            .cast("bigint")
            .alias("rnk"),
            "l_partkey",
            F.col("rev").cast("double").alias("revenue"),
            W.round_half_up(
                F.col("cum_rev").cast("double")
                / F.col("total_rev").cast("double")
                * 100,
                6,
            ).alias("cum_share_pct"),
        )
    )


def a20_winsorized_mean(spark, sf_dir):
    """Winsorized (clipped-at-percentile) robust mean per group — the
    outlier-resistant average a monitoring dashboard actually wants:
    values below the group's p5 / above its p95 are clamped to those
    bounds before averaging. Two passes sharing one shuffle key: the
    exact-percentile pass (one percentile(col, array(...)) buffer, a7's
    discipline) broadcasts its |groups|-row bound table back onto the
    scan; the clip+mean is then a plain hash aggregation. At 100 TB the
    percentile pass swaps to approx_percentile; the join stays a
    broadcast because bounds are one row per group."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.05, 0.95))").alias("ps")
    ).select(
        "l_returnflag",
        F.col("ps")[0].alias("lo"),
        F.col("ps")[1].alias("hi"),
    )
    clipped = li.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        F.greatest(F.least(F.col("l_extendedprice"), F.col("hi")), F.col("lo")).alias(
            "v"
        ),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        W.round_half_up(F.avg("v"), 4).alias("winsorized_mean"),
    )


def x64_dup_growth_curve(spark, sf_dir):
    """Duplication growth curve — the dedup-economics question ('how
    fast does marginal data become redundant as the corpus grows'):
    treating doc_id order as arrival order, split the corpus into 10
    arrival deciles and count, per decile, how many documents are
    exact-duplicates of ANYTHING that arrived before them (fingerprint
    first seen at a smaller doc_id). One fingerprint-keyed min
    aggregation joined back on the same shuffle key, then a bounded
    10-row rollup. The curve bending upward is the diminishing-returns
    signal that prices further crawling."""
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.agg(F.count(F.lit(1)).alias("n")).select(
        (F.col("n") / 10).alias("decile_size")
    )
    fp = docs.select(
        "doc_id", T.fingerprint_md5(F.col("text")).alias("fp")
    )
    first = fp.groupBy("fp").agg(F.min("doc_id").alias("first_id"))
    return (
        fp.join(first, "fp")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.least(
                F.floor(
                    F.col("doc_id").cast("double") / F.col("decile_size")
                ).cast("bigint"),
                F.lit(9),
            ).alias("decile"),
            (F.col("doc_id") > F.col("first_id")).cast("int").alias("is_dup"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_dup").cast("bigint").alias("n_dups"),
        )
    )


def x65_split_repair(spark, sf_dir):
    """Decontamination REPAIR — the action after x22's detection: eval
    documents that share a 5-gram with any training document cannot
    measure generalization, so they are reassigned to train (keeping
    the eval set clean beats keeping its size). Emits the full
    corrected split assignment with an audit reason. Same two shuffle
    joins as x22 (shingle-keyed contamination probe, then a doc-keyed
    left join back); the repair itself is a coalesce — no extra pass.
    At 100 TB the output IS the new split manifest."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.sampling import (
        hash_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    s = hash_split(
        docs, F.col("text"), {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    train = s.filter(F.col("split") == "train")
    test = s.filter(F.col("split") != "train")
    contaminated = D.cross_corpus_contamination(
        train, test, k_shingle=5
    ).select("doc_id", F.lit(1).alias("_hit"))
    return (
        s.join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            F.col("split").alias("old_split"),
            F.when(F.col("_hit").isNotNull(), F.lit("train"))
            .otherwise(F.col("split"))
            .alias("new_split"),
            F.when(
                F.col("_hit").isNotNull(), F.lit("eval_contaminated")
            )
            .otherwise(F.lit("clean"))
            .alias("reason"),
        )
    )


def x66_code_switch_detect(spark, sf_dir):
    """Mixed-language (code-switching) detection: language-ID every
    SENTENCE (x59's split) and flag documents whose sentences disagree
    — the corpus-hygiene signal monolingual filters miss (a doc that is
    60%% English / 40%% Spanish passes a doc-level lang-id but poisons
    both language buckets). Per doc: sentence count, distinct predicted
    languages, the dominant language (count-then-rank mode, x66 shares
    a19's idiom), and the mixed flag. All narrow expressions + two
    doc-keyed shuffles; the lang-id is the same stopword-marker argmax
    as x6, applied per sentence."""
    docs = load_table(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\.\s+")).alias("pos0", "s"),
    ).filter(F.col("s") != "")
    langs = sents.select(
        "doc_id", T.lang_id(F.col("s")).alias("pred")
    )
    per_lang = langs.groupBy("doc_id", "pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n").desc(), F.col("pred").asc()
    )
    dominant = (
        per_lang.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", F.col("pred").alias("dominant_lang"))
    )
    stats = per_lang.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_sents"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    return stats.join(dominant, "doc_id").select(
        "doc_id",
        "n_sents",
        "n_langs",
        "dominant_lang",
        (F.col("n_langs") >= 2).cast("int").alias("is_mixed"),
    )


def q28_supplier_concentration(spark, sf_dir):
    """TPC-H Q11 spirit (no partsupp table in this corpus, so supplier
    account balance stands in for inventory value): nations whose
    suppliers hold more than 4%% of GLOBAL positive account balance,
    with their share. The global threshold is a scalar subquery — a
    broadcast 1-row frame, never a join — and both sums run in
    DECIMAL(18,4) inside one pass each; the nation dim broadcasts.
    The decorrelated shape (aggregate → cross-join threshold → filter)
    is what Catalyst produces from the Q11 HAVING form."""
    sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") > 0
    )
    nat = load_table(spark, sf_dir, "nation")
    per_nation = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("s_acctbal").cast("decimal(18,4)")).alias("bal"),
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        )
    )
    total = sup.agg(
        F.sum(F.col("s_acctbal").cast("decimal(18,4)")).alias("total_bal")
    )
    return (
        per_nation.crossJoin(F.broadcast(total))
        .withColumn(
            "share_pct",
            W.round_half_up(
                F.col("bal").cast("double")
                / F.col("total_bal").cast("double")
                * 100,
                6,
            ),
        )
        .filter(F.col("share_pct") > 4.0)
        .select(
            "n_name",
            F.col("bal").cast("double").alias("balance"),
            "n_suppliers",
            "share_pct",
        )
    )


def x4b_simhash_portable(spark, sf_dir):
    """SimHash near-dup pairs with ENGINE-PORTABLE hashing
    (operators/dedup.simhash_portable_pairs): 48 universal-hash bits
    over each token's polynomial rolling hash — all integer arithmetic,
    so the fingerprint matrix, the pigeonhole block join AND the final
    hamming filter replay bit-identically in DuckDB. Completes the
    portable-sketch pair with x2c: both LSH families now carry a hard
    hash-match oracle alongside their xxhash64 production twins
    (x2/x4, rows-only). Pigeonhole keeps it EXACT: hamming ≤ 3 over
    4 blocks guarantees a matching block key."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_portable_pairs(docs, max_hamming=3, n_blocks=4)


def w19_ewma(spark, sf_dir):
    """Exponentially-weighted moving average per user (α=0.2) — the
    smoothing stat behind rate monitoring and anomaly baselines. EWMA
    is inherently a SEQUENTIAL fold, which windows can't express
    natively; here it's one collect-sort-fold per user: events gather
    into a per-user array (bounded by events-per-user, the same state
    argument as w6), sort by event_id, and fold with
    acc = α·x + (1−α)·acc seeded by the first value. Both engines run
    the IDENTICAL float operation sequence (Spark F.aggregate vs DuckDB
    list_reduce, first element as seed); both engines then round the
    EWMA half-up to 6dp for a stable comparison surface."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("event_id", "value"))
        ).alias("seq")
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    return per_user.select(
        "user_id",
        F.size("seq").cast("bigint").alias("n_events"),
        W.round_half_up(ewma, 6).alias("ewma_value"),
    )


def a21_histogram(spark, sf_dir):
    """Equi-width histogram (10 bins over the observed [min, max]) of
    order totals — the profiling primitive behind every distribution
    dashboard. The global bounds are ONE 1-row aggregate broadcast back
    onto the scan (never a sort); bin assignment is pure arithmetic
    fused into the scan; the rollup shuffles 10 rows. Bin edges are
    derived identically on both engines from the same min/max, so
    counts are exact."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 10
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast(
                    "bigint"
                ),
                F.lit(9),
            ).alias("bin"),
            "lo",
            "hi",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            W.round_half_up(
                F.first("lo") + F.col("bin") * (F.first("hi") - F.first("lo")) / 10,
                4,
            ).alias("bin_lo"),
        )
    )


def x68_token_budget_select(spark, sf_dir):
    """Token-budget data selection — 'take the highest-quality documents
    until the training budget is spent' — computed as a DISTRIBUTED
    prefix sum, the pattern that makes a global cumulative cutoff
    100 TB-safe: a naive running total needs one global ordered window
    (every row through a single partition — the classic scale killer).
    Instead: quality scores bucket into 100 ranges (monotone in the
    ordering key, so bucket-desc + within-bucket order = the global
    order), per-bucket token totals aggregate to a 100-row frame whose
    running totals cost nothing, each bucket's prefix broadcasts back,
    and the per-doc cumulative is prefix + a window PARTITIONED BY
    BUCKET — 100-way parallel, never global. Result rows (and their
    cum_tokens) are IDENTICAL to the naive global-window form, which is
    exactly what the DuckDB oracle runs."""
    budget = 10_000
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("q"),
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).withColumn(
        "bucket",
        F.least(F.floor(F.col("q") * 100).cast("long"), F.lit(99)),
    )
    btot = scored.groupBy("bucket").agg(
        F.sum("n_tokens").alias("btoks")
    )
    wb = (
        Window.orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = btot.select(
        "bucket",
        F.coalesce(F.sum("btoks").over(wb), F.lit(0)).alias("prefix"),
    )
    wd = Window.partitionBy("bucket").orderBy(
        F.col("q").desc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        scored.join(F.broadcast(prefix), "bucket")
        .withColumn(
            "cum_tokens", (F.col("prefix") + F.sum("n_tokens").over(wd))
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(
            "doc_id",
            "q",
            "n_tokens",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


def x69_dataset_card(spark, sf_dir):
    """Dataset-card statistics in ONE query — the datasheet block every
    corpus release ships (counts, token/char volume, language and
    source spread, exact-duplicate rate, mean quality): three bounded
    aggregations (the full-scan rollup, the fingerprint distinct, the
    modal language) crossJoin-combined as 1-row broadcast frames. At
    100 TB this replaces a zoo of separate profiling jobs with one
    scan + two key-bounded shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        W.round_half_up(
            F.avg(T.quality_score(F.col("text"))), 4
        ).alias("mean_quality"),
    )
    dups = docs.agg(
        (
            F.count(F.lit(1))
            - F.countDistinct(T.fingerprint_md5(F.col("text")))
        )
        .cast("bigint")
        .alias("n_dup_docs")
    )
    top_lang = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    return base.crossJoin(F.broadcast(dups)).crossJoin(
        F.broadcast(top_lang)
    )


def x70_source_overlap(spark, sf_dir):
    """Cross-source BOILERPLATE overlap matrix: for every source pair,
    how many identical word 3-shingles they share — the crawl-dedup
    economics view (which feeds mirror each other's phrasing templates,
    which add unique material; the input to 'drop the mirror'
    decisions). Shingle granularity: whole documents and even whole
    sentences never cross sources in this corpus, but phrase templates
    constantly do — the overlap signal a crawl triage actually uses.
    Shape: distinct (shingle, source) index, then a SELF-JOIN ON
    SHINGLE — candidates only form where a shingle spans sources, so
    the join is overlap-bounded; at 100 TB the x3 df-cap composes here
    unchanged (drop web-ubiquitous shingles before the join)."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions.text import (
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        "source",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("fp"),
    ).distinct()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_docs"))
    )


def x71_embedding_qa(spark, sf_dir):
    """Vector-column data-quality audit — the checks an embedding store
    runs at ingest: per label, vector count, dimensionality consistency
    (min/max length), zero-vector count (unusable for cosine), and the
    norm band (4dp-rounded min/mean/max L2 norm). All from one scan +
    one bounded per-label rollup; the norm fold is the same sequential
    aggregate both engines run, so even the float bounds agree."""
    emb = load_table(spark, sf_dir, "embeddings")
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions.vectors import (
        norm,
        to_double_array,
    )

    v = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        norm(to_double_array(F.col("embedding"))).alias("nrm"),
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.min("dim").cast("bigint").alias("min_dim"),
        F.max("dim").cast("bigint").alias("max_dim"),
        F.sum((F.col("nrm") == 0.0).cast("int"))
        .cast("bigint")
        .alias("n_zero_vecs"),
        W.round_half_up(F.min("nrm"), 4).alias("min_norm"),
        W.round_half_up(F.avg("nrm"), 4).alias("mean_norm"),
        W.round_half_up(F.max("nrm"), 4).alias("max_norm"),
    )


def x72_dup_quality_interaction(spark, sf_dir):
    """Duplication × quality interaction — the question behind every
    dedup-policy choice ('are duplicated documents better or worse
    than unique ones?'): documents bucket by their exact-copy count
    (1 / 2 / 3+), each bucket reports its population and mean quality
    score. If duplicates skew high-quality, aggressive dedup costs
    quality mass and x48's capped policy wins; if they skew low, full
    dedup is free. One fingerprint-keyed count joined back on the same
    key, one bounded 3-row rollup."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        T.fingerprint_md5(F.col("text")).alias("fp"),
        T.quality_score(F.col("text")).alias("q"),
    )
    copies = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        fp.join(copies, "fp")
        .select(
            F.when(F.col("n_copies") >= 3, F.lit("3+"))
            .otherwise(F.col("n_copies").cast("string"))
            .alias("copy_bucket"),
            "q",
        )
        .groupBy("copy_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            W.round_half_up(F.avg("q"), 4).alias("mean_quality"),
        )
    )


def w20_funnel_latency(spark, sf_dir):
    """Funnel latency: per user, microseconds from the FIRST click to
    the first purchase AFTER it — the time-to-convert metric behind
    checkout optimization. Two keyed aggregations sharing the user_id
    shuffle key (first-click, then earliest qualifying purchase via a
    conditional min over the joined row) — no window, no self-join
    explosion: the purchase scan joins the 1-row-per-user click frame.
    Timestamps pinned to µs on both engines (ts_ns div 1000 vs
    epoch_us — the ADVICE-r2 precision discipline), so latencies are
    exact integers."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_click_us"))
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts_us") > F.col("first_click_us"))
        .groupBy("user_id")
        .agg(
            F.first("first_click_us").alias("first_click_us"),
            F.min("ts_us").alias("first_purchase_us"),
        )
        .select(
            "user_id",
            "first_click_us",
            "first_purchase_us",
            (F.col("first_purchase_us") - F.col("first_click_us")).alias(
                "latency_us"
            ),
        )
    )


def x73_declared_lang_audit(spark, sf_dir):
    """Metadata trust audit: the declared ``lang`` column versus what
    the content-based classifier (x6's stopword-marker argmax) actually
    sees — the confusion matrix that tells you whether upstream
    language tags can gate a 100 TB mixture or must be recomputed.
    Distinct from x36 (which compares two CLASSIFIERS): this audits
    the metadata itself. One narrow classification on the scan + one
    bounded (|langs|²) rollup with per-declared-language agreement
    counts."""
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        "lang", T.lang_id(F.col("text")).alias("pred_lang")
    )
    return pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )


def q29_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation (recency / frequency / monetary) — the
    classic CRM scoring query, built the scale-right way: per-customer
    aggregates in one pass, then quintile THRESHOLDS from a single
    percentile() aggregate broadcast back (1 row), each score = how
    many thresholds the value clears. The naive ntile() would route
    every customer through one global window partition; thresholds
    make scoring a narrow map. µs-free: recency is whole days from the
    corpus max order date (also a broadcast 1-row frame)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("monetary"),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    base = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff(F.col("anchor"), F.col("last_order"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        F.col("monetary").cast("double").alias("monetary"),
    )
    th = base.agg(
        F.expr(
            "percentile(recency_days, array(0.2, 0.4, 0.6, 0.8))"
        ).alias("rt"),
        F.expr("percentile(frequency, array(0.2, 0.4, 0.6, 0.8))").alias(
            "ft"
        ),
        F.expr("percentile(monetary, array(0.2, 0.4, 0.6, 0.8))").alias(
            "mt"
        ),
    )

    def score(v, t):
        return sum(
            ((v > t[i]).cast("int") for i in range(4)), F.lit(1)
        )

    scored = base.crossJoin(F.broadcast(th)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        # recency: LOWER is better, so invert the cleared-threshold count
        (F.lit(6) - score(F.col("recency_days"), F.col("rt")))
        .cast("int")
        .alias("r_score"),
        score(F.col("frequency"), F.col("ft")).cast("int").alias("f_score"),
        score(F.col("monetary"), F.col("mt")).cast("int").alias("m_score"),
    )
    return scored


def w21_standardize(spark, sf_dir):
    """Per-group z-score standardization — the feature-scaling
    preprocessing step every ML pipeline runs: each event's value
    centered and scaled by ITS TYPE's mean/stddev. Group stats are one
    hash aggregation broadcast back (bounded by |types|); the transform
    is a narrow map — never a window, never a second shuffle of the
    fact table. Rounded 4dp under a12's float-moment discipline."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            W.round_half_up(
                (F.col("value") - F.col("mu")) / F.col("sd"), 4
            ).alias("z_value"),
        )
    )


def x74_label_centroid_similarity(spark, sf_dir):
    """Inter-class embedding geometry: the pairwise cosine similarity
    of per-label CENTROIDS — the class-separability diagnostic behind
    x60's kNN accuracy (labels whose centroids nearly coincide will
    confuse any nearest-neighbor rule). Centroids come from one
    (label, dim)-keyed mean over exploded coordinates (map-side
    combined; output is |labels|×dim rows — bounded metadata),
    reassembled in dim order; the pair matrix is |labels|² and
    broadcast-sized. Cosines rounded 4dp (mean coordinates are float
    sums; a12's discipline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
    )
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions.vectors import (
        cosine_given_norms,
        norm,
    )

    a = cent.select(
        F.col("label").alias("label_a"),
        F.col("cvec").alias("va"),
        norm(F.col("cvec")).alias("na"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("cvec").alias("vb"),
        norm(F.col("cvec")).alias("nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            W.round_half_up(
                cosine_given_norms(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                4,
            ).alias("centroid_cosine"),
        )
    )


def q30_order_cadence(spark, sf_dir):
    """Purchase-cadence analysis: the distribution of days between a
    customer's consecutive orders, rolled up per market segment
    (median / p90 gap + repeat-customer counts) — the replenishment
    metric behind churn prediction. The lag window partitions by
    customer (bounded frames, parallel across customers — never a
    global sort); the segment dim joins in broadcast; the exact
    percentile rollup is bounded by |segments|."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    gaps = (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date"))
            .cast("long")
            .alias("gap_days"),
        )
    )
    return (
        gaps.join(F.broadcast(cust), gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            W.round_half_up(
                F.expr("percentile(gap_days, 0.5)"), 4
            ).alias("median_gap_days"),
            W.round_half_up(
                F.expr("percentile(gap_days, 0.9)"), 4
            ).alias("p90_gap_days"),
        )
    )


def x75_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary growth — x58's companion corpus
    diagnostic: how many NEW distinct terms each arrival decile
    contributes and the cumulative vocabulary curve (sublinear growth
    = natural text; linear = ID/noise injection; flat = template
    spam). Per term, the FIRST decile it appears in is one min
    aggregation keyed by term (the only vocabulary-sized shuffle);
    the census and the 10-row running total are bounded. Same
    arrival-decile axis as x64, so the two curves read together:
    duplication buys you nothing exactly where vocabulary stops
    growing."""
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.agg(F.count(F.lit(1)).alias("n")).select(
        (F.col("n") / 10).alias("decile_size")
    )
    # word BIGRAMS, not unigrams: the synthetic unigram vocabulary
    # saturates inside the first decile (one-row degenerate curve);
    # the combinatorial bigram space keeps growing — the same reason
    # real Heaps analyses run on n-grams
    toks = (
        docs.crossJoin(F.broadcast(n_total))
        .select(
            F.least(
                F.floor(
                    F.col("doc_id").cast("double") / F.col("decile_size")
                ).cast("bigint"),
                F.lit(9),
            ).alias("decile"),
            T.tokens(F.lower(F.col("text"))).alias("t"),
        )
        .filter(F.size("t") >= 2)
        .select(
            "decile",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (x, i) -> concat(x, ' ', t[i + 1]))"
                )
            ).alias("term"),
        )
    )
    first_seen = toks.groupBy("term").agg(
        F.min("decile").alias("first_decile")
    )
    census = first_seen.groupBy("first_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_terms")
    )
    w = Window.orderBy("first_decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return census.select(
        F.col("first_decile").alias("decile"),
        "n_new_terms",
        F.sum("n_new_terms").over(w).cast("bigint").alias("cum_vocab"),
    )


def w22_prorata_allocation(spark, sf_dir):
    """Pro-rata penny allocation with the LARGEST-REMAINDER method —
    the finance-engineering primitive behind invoice splitting and
    cost attribution: each order's 5%% shipping budget (in cents)
    distributes across its lineitems proportional to line value, and
    the rounding leftover goes to the lines with the largest integer
    remainders, so per-order allocations sum EXACTLY to the budget
    (the invariant float division can't give you). Everything is
    int64 arithmetic — cent weights, integer div/mod shares,
    remainder-ranked leftover — so both engines agree bit-for-bit.
    All three windows key on l_orderkey (bounded frames, parallel
    across orders)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 5 + 0.5)
        .cast("long")
        .alias("budget_c"),
    )
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "budget_c",
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("w_c"),
        )
    )
    wo = Window.partitionBy("l_orderkey")
    shares = base.select(
        "l_orderkey",
        "l_linenumber",
        "budget_c",
        F.expr("budget_c * w_c div sum(w_c) OVER (PARTITION BY l_orderkey)").alias(
            "base_c"
        ),
        F.expr("budget_c * w_c % sum(w_c) OVER (PARTITION BY l_orderkey)").alias(
            "rem"
        ),
    ).withColumn("leftover", F.col("budget_c") - F.sum("base_c").over(wo))
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.col("rem").desc(), F.col("l_linenumber").asc()
    )
    return shares.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base_c")
            + (F.row_number().over(wr) <= F.col("leftover")).cast("long")
        ).alias("alloc_cents"),
    )


def r8_bitemporal_asof(spark, sf_dir):
    """BITEMPORAL point-in-time query — the two-axis temporal read that
    separates 'what we believed then' (transaction time) from 'what
    was true then' (valid time): a version table where %13 keys get a
    price restatement recorded at tx 2 effective 30 days later, probed
    AS OF tx 1 and tx 2 at the same valid instant (order date + 45
    days). Correct semantics = filter transaction time FIRST (tx ≤ T:
    what the store contained), then the valid-time argmax (greatest
    valid_from ≤ V, latest tx breaking ties) — the order j5's
    single-axis SCD2 never has to care about. One key-partitioned
    window per probe; versions-per-key is bounded, so frames are too."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    v1 = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("valid_from"),
        F.lit(1).alias("tx"),
    )
    v2 = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * F.lit(1.02)).alias("price"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias(
            "valid_from"
        ),
        F.lit(2).alias("tx"),
    )
    versions = v1.unionByName(v2)
    probe_v = orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")).alias("v_at"),
    )

    def asof(tx_at: int, out: str):
        w = Window.partitionBy("o_orderkey").orderBy(
            F.col("valid_from").desc(), F.col("tx").desc()
        )
        return (
            versions.filter(F.col("tx") <= tx_at)
            .join(probe_v, "o_orderkey")
            .filter(F.col("valid_from") <= F.col("v_at"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderkey", F.col("price").alias(out))
        )

    return asof(1, "price_asof_tx1").join(
        asof(2, "price_asof_tx2"), "o_orderkey"
    ).select(
        "o_orderkey",
        "price_asof_tx1",
        "price_asof_tx2",
        (F.col("price_asof_tx1") != F.col("price_asof_tx2"))
        .cast("int")
        .alias("restated"),
    )


def x76_ngram_diversity(spark, sf_dir):
    """N-gram diversity per source — the mode-collapse detector for
    synthetic/generated data (low distinct-trigram ratio = the
    generator loops its templates; the corpus-level analogue of
    self-BLEU): per source, total word-trigram occurrences, distinct
    trigrams, and the diversity ratio. One explode + one
    (source, trigram)-keyed aggregation with map-side combine; the
    rollup is bounded by |sources|."""
    docs = load_table(spark, sf_dir, "documents")
    tris = (
        docs.select(
            "source", T.tokens(F.lower(F.col("text"))).alias("t")
        )
        .filter(F.size("t") >= 3)
        .select("source", F.explode(T.word_trigrams_of_t()).alias("tri"))
    )
    per = tris.groupBy("source", "tri").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_trigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        W.round_half_up(
            F.count(F.lit(1)).cast("double") / F.sum("n"), 6
        ).alias("diversity_ratio"),
    )


def x77_split_balance(spark, sf_dir):
    """Split-balance audit: are the content-addressed train/val/test
    splits DISTRIBUTIONALLY equivalent (doc counts, mean/std quality,
    mean token length)? The check that catches a biased split before a
    misleading eval does — a hash split should differ only by sampling
    noise; a significant quality gap between train and test means the
    split key leaked content signal. One scan, one |splits|-bounded
    rollup, a12's 4dp float-moment discipline."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.sampling import (
        hash_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    s = hash_split(
        docs, F.col("text"), {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        W.round_half_up(
            F.avg(T.quality_score(F.col("text"))), 4
        ).alias("mean_quality"),
        W.round_half_up(
            F.stddev_samp(T.quality_score(F.col("text"))), 4
        ).alias("sd_quality"),
        W.round_half_up(
            F.avg(T.token_count(F.col("text"))), 4
        ).alias("mean_tokens"),
    )


def w23_burstiness(spark, sf_dir):
    """Inter-arrival burstiness per user: the coefficient of variation
    (std/mean) of a user's event gaps — CV ≈ 1 is Poisson-random, ≫1 is
    bursty sessions, ≪1 is machine-regular (bot signal). Gap extraction
    is one user-partitioned lag window (µs-pinned); the per-user CV is
    a hash aggregation; users with <3 events (undefined CV) drop on
    both engines. Rounded 4dp under a12's float-moment discipline."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    gaps = (
        ev.withColumn("prev", F.lag("ts_us").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "user_id", (F.col("ts_us") - F.col("prev")).alias("gap_us")
        )
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.avg("gap_us").alias("mu"),
            F.stddev_samp("gap_us").alias("sd"),
        )
        .filter(F.col("n_gaps") >= 2)
        .select(
            "user_id",
            "n_gaps",
            W.round_half_up(F.col("sd") / F.col("mu"), 4).alias(
                "burstiness_cv"
            ),
        )
    )


def q31_brand_margin(spark, sf_dir):
    """Gross-margin analysis per brand: discounted line revenue minus
    cost-of-goods (retail price × quantity as the cost basis), with the
    margin percentage — the profitability cut every commercial
    dashboard leads with. One broadcast part-dim join (only
    p_partkey/p_brand/p_retailprice read — scan-pruned), revenue and
    cost both DECIMAL(18,4) partial sums in ONE aggregation, the pct a
    single rounded division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    cost = (F.col("p_retailprice") * F.col("l_quantity") * 0.8).cast(
        "decimal(18,4)"
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.sum(rev).alias("revenue_d"),
            F.sum(cost).alias("cost_d"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select(
            "p_brand",
            F.col("revenue_d").cast("double").alias("revenue"),
            F.col("cost_d").cast("double").alias("cost"),
            "n_lines",
            W.round_half_up(
                (F.col("revenue_d") - F.col("cost_d")).cast("double")
                / F.col("revenue_d").cast("double")
                * 100,
                4,
            ).alias("margin_pct"),
        )
    )


def x78_jl_projection(spark, sf_dir):
    """Johnson–Lindenstrauss random projection 64→16 with MEASURED
    distortion — the projection-based alternative to x61's truncation
    (JL preserves pairwise geometry with guarantees truncation lacks):
    project through the deterministic ±1 hyperplane matrix scaled by
    1/√16, then report each probe pair's Euclidean distance in both
    spaces and the distortion ratio. The projection is one narrow fold
    per vector (x5b's single-pass multi-plane accumulator); probe
    pairs are the 16-vector broadcast set — 120 rows of evidence,
    rounded 4dp."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_out, dim = 16, 64
    planes = F.array(
        *[
            F.array(
                *[
                    F.lit(_hyperplane(dim, b, n_out)[d])
                    for b in range(n_out)
                ]
            )
            for d in range(dim)
        ]
    )
    per_dim = F.zip_with(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        planes,
        lambda x, pl: F.transform(pl, lambda p: x * p),
    )
    proj = F.transform(
        F.aggregate(
            per_dim,
            F.array_repeat(F.lit(0.0), n_out),
            lambda acc, contrib: F.zip_with(
                acc, contrib, lambda s, x: s + x
            ),
        ),
        lambda s: s / F.lit(4.0),  # 1/sqrt(16)
    )
    probes = emb.filter(F.col("vec_id") < 16).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
        proj.alias("p"),
    )
    a, b = probes.alias("a"), probes.alias("b")

    def dist(x, y):
        return F.sqrt(
            F.aggregate(
                F.zip_with(x, y, lambda u, w: (u - w) * (u - w)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            W.round_half_up(
                dist(F.col("a.v"), F.col("b.v")), 4
            ).alias("d_orig"),
            W.round_half_up(
                dist(F.col("a.p"), F.col("b.p")), 4
            ).alias("d_proj"),
            W.round_half_up(
                dist(F.col("a.p"), F.col("b.p"))
                / dist(F.col("a.v"), F.col("b.v")),
                4,
            ).alias("distortion_ratio"),
        )
    )


def x79_quality_survivors(spark, sf_dir):
    """Quality-aware canonical selection: within each near-dup cluster
    (x3 pairs → x14's connected components), keep the HIGHEST-QUALITY
    member (tiebreak lowest doc_id) instead of e2e_dedup_survivors'
    min-id convention — dedup that preserves quality mass, the policy
    refinement x72's evidence motivates. Per cluster: size, the
    surviving doc, its quality. The quality join keys on doc_id (same
    shuffle key as the component assignment); the per-cluster argmax
    is a window over bounded cluster frames."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, k_shingle=3, threshold=0.4, max_shingle_df=50
    )
    cc = D.connected_components(pairs.select("id_a", "id_b")).select(
        F.col("id").alias("doc_id"), "lbl"
    )
    scored = cc.join(
        docs.select(
            F.col("doc_id"), T.quality_score(F.col("text")).alias("q")
        ),
        "doc_id",
    )
    w = Window.partitionBy("lbl").orderBy(
        F.col("q").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "survivor_id"
            ),
            W.round_half_up(
                F.max(F.when(F.col("rn") == 1, F.col("q"))), 6
            ).alias("survivor_quality"),
        )
        .select(
            F.col("lbl").alias("component"),
            "cluster_size",
            "survivor_id",
            "survivor_quality",
        )
    )


def x80_dedup_policy_budget(spark, sf_dir):
    """Effective training-token budget under each dedup policy — the
    one table a data lead actually decides from: total tokens if you
    keep everything, under x48's cap-2 policy, and under x1's full
    dedup (keep first). One fingerprint-keyed aggregation carrying
    per-copy token counts computes all three sums in a single pass
    (copies ranked inside the fingerprint group, policy = how many
    ranks count), then one 1-row rollup."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        T.fingerprint_md5(F.col("text")).alias("fp"),
        T.token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    ranked = fp.withColumn("rn", F.row_number().over(w))
    return ranked.agg(
        F.sum("n_tok").cast("bigint").alias("tokens_keep_all"),
        F.sum(F.when(F.col("rn") <= 2, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_cap2"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_full_dedup"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )


def w25_cusum_drift(spark, sf_dir):
    """CUSUM change-point detection per event_type — the drift-ONSET
    monitor a21's PSI can't give (PSI says distributions differ; CUSUM
    says WHEN the level shifted): classic one-sided CUSUM
    S_t = max(0, S_{t-1} + x_t − k) is a sequential recurrence no
    window function runs — but it equals
    (P_t − t·k) − min_{j≤t}(P_j − j·k) (prefix sum minus its running
    minimum), which IS two windows. With the allowance k learned as
    the type's own mean daily total, everything cross-multiplies into
    int64: D_t = n·P_t − t·T (daily totals in integer milli-units,
    n = day count, T = total) keeps the whole recurrence exact — no
    float accumulation anywhere until the final rescale. Reports per
    type the drift magnitude (max CUSUM), its onset day (argmax,
    earliest tie), and the final value. Scale shape: one (type, day)
    agg + two type-keyed ordered windows + a |types|-row rollup —
    the recurrence costs exactly what a running sum costs."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr(
                "CAST(floor(value * 1000.0 + 0.5) AS BIGINT)"
            ).alias("x_m"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("x_m").alias("xd"))
    )
    totals = daily.groupBy("event_type").agg(
        F.sum("xd").alias("tot"), F.count(F.lit(1)).alias("nd")
    )
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type").orderBy("day")
    d = (
        daily.join(F.broadcast(totals), "event_type")
        .withColumn("p", F.sum("xd").over(w_ord))
        .withColumn("t", F.row_number().over(wn).cast("long"))
        .withColumn("dt", F.col("nd") * F.col("p") - F.col("t") * F.col("tot"))
        .withColumn("runmin", F.min("dt").over(w_ord))
        .withColumn("cusum_n", F.col("dt") - F.col("runmin"))
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.col("cusum_n").desc(), F.col("day").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(w_peak))
        .withColumn(
            "last", F.max(F.when(F.col("t") == F.col("nd"), F.col("cusum_n"))).over(
                Window.partitionBy("event_type")
            )
        )
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("nd").cast("long").alias("n_days"),
            (
                F.col("cusum_n").cast("double")
                / F.col("nd")
                / F.lit(1000.0)
            ).alias("max_cusum"),
            F.date_format("day", "yyyy-MM-dd").alias("onset_day"),
            (
                F.col("last").cast("double") / F.col("nd") / F.lit(1000.0)
            ).alias("final_cusum"),
        )
    )


def w24_stickiness(spark, sf_dir):
    """DAU/MAU stickiness — the engagement ratio product teams track:
    average daily active users divided by the month's total active
    users. Daily distincts are one (day, user) dedup + per-day counts
    (bounded by days×users); the monthly distinct is one aggregate;
    the ratio is a single rounded division over two broadcast 1-row
    frames."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    )
    davg = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.avg("dau").alias("avg_dau"),
    )
    mau = ev.agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    return davg.crossJoin(F.broadcast(mau)).select(
        "n_days",
        W.round_half_up(F.col("avg_dau"), 4).alias("avg_dau"),
        "mau",
        W.round_half_up(
            F.col("avg_dau") / F.col("mau"), 4
        ).alias("stickiness"),
    )


def x81_source_dup_rate(spark, sf_dir):
    """Near-duplication rate PER SOURCE — which feeds are internally
    redundant (the per-source cut of e2e_dedup_survivors' corpus
    verdict, and the ranking that decides which crawl gets its budget
    cut): share of each source's documents that belong to any x3
    near-dup cluster. Component assignment joins back to the doc table
    on doc_id (same key), then one bounded per-source rollup with the
    rate as a rounded division."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, k_shingle=3, threshold=0.4, max_shingle_df=50
    )
    cc = D.connected_components(pairs.select("id_a", "id_b")).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("in_cluster")
    )
    return (
        docs.select("doc_id", "source")
        .join(cc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce("in_cluster", F.lit(0)))
            .cast("bigint")
            .alias("n_near_dup"),
            W.round_half_up(
                F.sum(F.coalesce("in_cluster", F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
    )


def q32_stale_stock(spark, sf_dir):
    """Stalest-stock report: the 20 parts whose most recent sale is
    OLDEST (every part in this corpus has sold at least once, so the
    clearance question is recency, not existence) — per part, last ship
    date, days idle against the corpus max date, and the retail price
    at risk. One (partkey)-keyed max aggregation, a broadcast part-dim
    join, a broadcast 1-row anchor, and a TakeOrdered top-20 — never a
    full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    last_sale = li.groupBy("l_partkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    anchor = li.agg(F.max("l_shipdate").alias("anchor"))
    return (
        last_sale.join(F.broadcast(part), last_sale.l_partkey == part.p_partkey)
        .crossJoin(F.broadcast(anchor))
        .select(
            "p_partkey",
            "p_brand",
            "last_ship",
            F.datediff(F.col("anchor"), F.col("last_ship"))
            .cast("long")
            .alias("days_idle"),
            F.col("p_retailprice").alias("retail_price"),
        )
        .orderBy(F.col("days_idle").desc(), F.col("p_partkey").asc())
        .limit(20)
    )


def x49_triangle_cooccurrence(spark, sf_dir):
    """Triangle enumeration over the part co-purchase graph — the graph
    analytic behind "frequently bought together" bundles and community
    seeds. Edge build is q15's inverted-index shape (self-join keyed on
    l_orderkey, candidates bounded by Σ basket², never |parts|²), then
    a min-support-2 filter — the df-cap analog that keeps the edge list
    sketch-sized before any graph work. Triangles come from two joins
    over the CANONICALLY ORIENTED (a<b) edge list, so each triangle is
    emitted exactly once with a<b<c and no dedup pass exists. At 100 TB
    the refinement is degree-based orientation (point each edge from
    low- to high-degree endpoint) to bound the join fan-out of hub
    nodes; with a support threshold the canonical orientation's fan-out
    is already support-bounded."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select("pa", "pb")
    )
    e1 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = edges.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    e3 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    return (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("z").alias("part_c"),
        )
    )


def w16_seasonal_anomaly(spark, sf_dir):
    """Seasonality-aware robust anomaly detection: an event is anomalous
    when its value deviates from its (event_type, hour-of-day) cohort's
    MEDIAN by more than 3× that cohort's MAD — the longitudinal version
    of the reference's static plausibility ranges
    (daily_weather_etl_kenya.py:436-447), with the threshold LEARNED
    from the data per seasonal slot instead of hardcoded, and
    median/MAD instead of mean/stddev so the outliers being hunted
    can't inflate the threshold that should catch them. Two exact-
    percentile aggregations build the (types×24)-row profile (a14's
    shape), the profile broadcasts back, and the flag predicate
    |value − med| > 3·mad is evaluated on raw doubles with the same
    operation order in both engines — no float accumulator anywhere."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hod"),
        "value",
    )
    med = base.groupBy("event_type", "hod").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    prof = (
        base.join(F.broadcast(med), ["event_type", "hod"])
        .groupBy("event_type", "hod")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    return (
        base.join(F.broadcast(prof), ["event_type", "hod"])
        .filter(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "hod",
            W.round_half_up(F.col("value"), 4).alias("value"),
            W.round_half_up(F.col("med"), 4).alias("cohort_median"),
            W.round_half_up(F.col("mad"), 4).alias("cohort_mad"),
        )
    )


def a17_heavy_hitters(spark, sf_dir):
    """Exact φ-heavy hitters (tokens with count > N/200) via the
    sketch-guided two-pass in ``operators.topk.heavy_hitters_exact``:
    per-partition Misra-Gries (k-bounded state, ZERO shuffle) proposes a
    guaranteed-superset candidate set; an exact second pass counts only
    the broadcast candidates. The vocabulary long tail — the thing that
    makes a naive token groupBy explode at 100 TB — never enters an
    Exchange, yet the result is bit-identical to the straight GROUP
    BY/HAVING the oracle runs (the MG superset guarantee is what makes
    a sketch produce an EXACT answer)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    )
    return K.heavy_hitters_exact(toks, "tok", 199)


def q23_bilateral_trade(spark, sf_dir):
    """TPC-H Q7 shape — bilateral trade volume: revenue shipped between
    two nations (either direction), broken out by (supplier nation,
    customer nation, ship year). The scale move is dim-first reduction:
    suppliers and customers are filtered to the two nations BEFORE
    touching the fact table, so the 600 k-row lineitem joins two tiny
    (≤2/25 of the dim) broadcast sides and never shuffles on the join
    key; the cross-nation filter (A→B or B→A) is a residual on the
    already-joined row. Revenue summed in DECIMAL(18,4) —
    reduction-order-independent."""
    na, nb = "NATION_1", "NATION_2"
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(na, nb)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def q24_market_share(spark, sf_dir):
    """TPC-H Q8 shape — national market share: of all PROMO-part revenue
    sold to ASIA-region customers, what fraction came from NATION_3
    suppliers, per order year. Both the numerator (conditional) and the
    denominator are DECIMAL(18,4) partial sums inside ONE hash
    aggregation — never two passes — and the share is a single double
    division rounded half-up, so it cannot depend on float reduction
    order. part/nation/region dims are broadcast; the only shuffles are
    the two fact-fact equi-joins (lineitem⋈orders on orderkey) which
    AQE plans off the same key."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    cust_asia = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg),
                    nat.n_regionkey == reg.r_regionkey,
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_asia, orders.o_custkey == cust_asia.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).alias("_num"),
            F.sum(rev).alias("_den"),
        )
    )
    return agg.select(
        "o_year",
        W.round_half_up(
            F.col("_num").cast("double") / F.col("_den").cast("double"), 6
        ).alias("mkt_share"),
        F.col("_den").cast("double").alias("total_revenue"),
    )


def q25_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape — promotion effect: percent of revenue carried by
    PROMO-type parts, per ship year. One broadcast dim join (20 k-row
    part ships once to every executor; lineitem streams), one hash
    aggregation computing conditional numerator + denominator together
    in DECIMAL(18,4), one rounded double division at the end. The
    percent never touches a float accumulator."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).alias("_promo"),
            F.sum(rev).alias("_total"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )
    return agg.select(
        "l_year",
        W.round_half_up(
            F.lit(100.0)
            * F.col("_promo").cast("double")
            / F.col("_total").cast("double"),
            6,
        ).alias("promo_share"),
        F.col("_total").cast("double").alias("total_revenue"),
        "n_items",
    )
