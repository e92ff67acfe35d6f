"""Training-data curation plans (round 9 extension surface): benchmark
decontamination at the embedding level, preference-pair mining, and
UniMax-style epoch allocation.

Capability parity note: the reference
(`/root/reference/daily_weather_etl_kenya.py`) has no corpus-curation
surface — these are §2.8 training-data extension operators a 100 TB
pretraining pipeline runs between ingest and shard export:

* **x134** closes the decontamination ladder begun by x22 (exact
  n-gram) and x55 (fuzzy n-gram): the leaks those two cannot see are
  paraphrases, which only survive in embedding space.
* **x136** is the preference-tuning data-mining step (DPO/RLHF pair
  construction): within each comparable cohort, pair the best-scored
  document with the worst as (chosen, rejected).
* **x137** is the multilingual sampling-rate step (UniMax, Chung et
  al. 2023): distribute a token budget across sources so low-resource
  sources are upsampled but never past an epoch cap.
* **x138/x139** close the loop to the trainer: a seeded deterministic
  shard plan (reproducible global shuffle) and the x137 allocation
  materialized as a sampling manifest.

Every plan is oracle-paired (``oracles/b20.py``) and keeps the repo's
exactness discipline: integer arithmetic wherever a fold reorders,
one rounded division at the end, deterministic (value, id) tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.vectors import cosine_given_norms, norm
from ..sources.tables import load_table

# Eval↔train cosine at or above this is a contamination hit (x134 /
# st46). Chosen against the synthetic embeddings' similarity profile
# (max eval↔train cosine ≈ 0.49, p99 ≈ 0.29) so the flag set is
# non-trivial at every SF; the oracle replays the same constant.
DECONTAM_COSINE_THRESHOLD = 0.35

# The benchmark set is FIXED, not corpus-proportional: eval vectors
# are the %10 slice BELOW this id ceiling, so growing the corpus adds
# train rows only and the eval↔train pair pass stays LINEAR in the
# corpus (a %-only split would make it quadratic — measured 49× wall
# at 10× before the cap). Every testdata SF's ids sit under the
# ceiling, so the driver gate and oracles see the identical slice;
# only genuinely-new corpus (scale-probe copies, production ingest)
# lands train-side. This is the real-world shape: benchmark suites
# are a fixed artifact, corpora grow.
DECONTAM_EVAL_MAX_ID = 5_000

# Preference-pair mining depth: pair the i-th best with the i-th worst
# for i = 1..2 (a group must hold 2i distinct docs to emit pair i).
PREFERENCE_PAIR_DEPTH = 2

# UniMax policy constants: epoch cap and budget multiple of the corpus
# token total. cap=3 with budget=2× total makes both regimes real on
# the synthetic corpus: small sources hit the 3-epoch cap, large ones
# split the remainder.
UNIMAX_EPOCH_CAP = 3
UNIMAX_BUDGET_MULTIPLE = 2

# Portable per-doc hash (x138 shard assignment / x139 fractional-epoch
# selection): h(id) = (KNUTH·id + seed) mod P — the same LCG-over-prime
# family the portable MinHash uses (operators/dedup.py MINHASH_P),
# expressible bit-identically in DuckDB BIGINT arithmetic. The id is
# reduced mod P BEFORE the multiply so the largest intermediate is
# (P−1)·KNUTH ≈ 2.6e18 < 2⁶³ — overflow-safe at ANY id magnitude
# (100 TB corpora carry 1e12+ ids; a raw id·KNUTH would wrap).
SHARD_HASH_P = 1_000_000_007
SHARD_HASH_A = 2_654_435_761
SHARD_HASH_SEED = 42
N_EXPORT_SHARDS = 16

# x139's two-phase remainder fill: hash-range buckets per source for
# the histogram phase (guide §2.5). The crossing-bucket window then
# holds ~|source|/REMAINDER_BUCKETS rows instead of |source| — the
# knob that keeps a dominant source from serializing one window task.
# Purely physical: any value ≥ 1 yields the identical admitted set.
REMAINDER_BUCKETS = 512


def _decontam_split(spark: SparkSession, sf_dir: str):
    """(eval, train) embedding frames for the decontamination family.

    The benchmark ("eval") side is the deterministic %10 slice BELOW
    the fixed id ceiling (``DECONTAM_EVAL_MAX_ID``) — the real-world
    shape where the eval suite is a FIXED, small vector set (1e4–1e5
    rows) while the train corpus is the 100 TB side that keeps
    growing. Norms are precomputed once per row so the pair
    expression is a single dot product.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    is_eval = (F.col("vec_id") % 10 == 0) & (
        F.col("vec_id") < DECONTAM_EVAL_MAX_ID
    )
    ev = emb.filter(is_eval).select(
        F.col("vec_id").alias("eval_id"),
        F.col("v").alias("ev_v"),
        norm(F.col("v")).alias("ev_nrm"),
    )
    tr = emb.filter(~is_eval).select(
        F.col("vec_id").alias("train_id"),
        F.col("v").alias("tr_v"),
        norm(F.col("v")).alias("tr_nrm"),
    )
    return ev, tr


def decontam_pairs(train: DataFrame, ev: DataFrame) -> DataFrame:
    """The eval×train pair frame with the per-pair 6dp cosine ``c`` —
    the ONE derivation both the audit aggregation (x134/st46 via
    :func:`decontam_partials`) and the removal leak-set (x135) build
    on, so the pair arithmetic can never drift between audit and
    execution (the b17 shared-builder discipline, Spark side)."""
    return train.crossJoin(F.broadcast(ev)).withColumn(
        "c",
        F.round(
            cosine_given_norms(
                F.col("tr_v"), F.col("ev_v"), F.col("tr_nrm"), F.col("ev_nrm")
            ),
            6,
        ),
    )


def decontam_partials(train: DataFrame, ev: DataFrame) -> DataFrame:
    """Per-eval contamination partials over ONE slice of the train
    corpus: ``(eval_id, n_hits, best)`` where ``best`` is the
    max-ordered struct (cos_6dp DESC, train_id ASC via negation).

    Both aggregates are associative+commutative over train slices, so
    partials from disjoint slices MERGE exactly (``merge_decontam``)
    — the property st46 deploys per micro-batch and the batch x134
    plan uses in one shot. The eval side broadcasts (it is the small,
    fixed benchmark set); the train side streams through a
    BroadcastNestedLoopJoin into a partial hash aggregate keyed by the
    ≤|eval| distinct eval_ids — map-side combine collapses each
    train partition to |eval| rows before the one tiny shuffle, so
    the pair grid is never materialized. Cosine is rounded to 6dp
    PER PAIR (before any max/compare) so fold order can never flip a
    boundary value — the repo's quantize-then-fold rule.
    """
    pairs = decontam_pairs(train, ev)
    return pairs.groupBy("eval_id").agg(
        F.sum(
            F.when(F.col("c") >= DECONTAM_COSINE_THRESHOLD, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hits"),
        F.max(
            F.struct(
                F.col("c").alias("c"),
                (-F.col("train_id")).alias("neg_id"),
            )
        ).alias("best"),
    )


def merge_decontam(partials: DataFrame) -> DataFrame:
    """Merge decontamination partials from disjoint train slices and
    present the audit verdict. Exact under any slicing (sum/max are
    the only combiners) — the batching-invariance st46 relies on."""
    merged = partials.groupBy("eval_id").agg(
        F.sum("n_hits").cast("bigint").alias("n_contaminated"),
        F.max("best").alias("best"),
    )
    return merged.select(
        "eval_id",
        "n_contaminated",
        F.col("best.c").alias("max_cos"),
        (-F.col("best.neg_id")).cast("bigint").alias("nearest_train_id"),
        (F.col("n_contaminated") > 0).cast("int").alias("contaminated"),
    )


def x134_semantic_decontamination(spark, sf_dir):
    """SEMANTIC benchmark decontamination — the third rung of the
    decontamination ladder (x22 exact n-gram → x55 fuzzy n-gram →
    embedding cosine): for every benchmark vector, scan the train
    corpus for embeddings with cosine ≥ 0.35 and report the
    contamination count, the maximum similarity, and the nearest
    train document (ties on the 6dp cosine break to the SMALLEST
    train_id). Output is |eval|-bounded — one row per benchmark
    vector — whatever the corpus size.

    Scale shape: broadcast the fixed eval set, one linear scan of the
    train side, partial-aggregated map-side (see
    :func:`decontam_partials`); no train×train pair ever exists. At
    100 TB the same plan holds because |eval| is policy-fixed; the
    IVF-pruned variant for a *huge* eval suite would reuse the x5d
    cell machinery, trading exactness for probe locality."""
    ev, tr = _decontam_split(spark, sf_dir)
    return merge_decontam(decontam_partials(tr, ev))


def x135_decontamination_removal(spark, sf_dir):
    """Decontamination EXECUTED — the corpus-side twin of x134 (the
    audit→execute symmetry the erasure family established: x128→x132):
    every train document whose embedding matches ANY benchmark vector
    at cosine ≥ 0.35 is a leak and leaves the corpus; the report is
    the per-source removal ledger (docs and tokens kept vs removed,
    removal rate) a release pipeline signs off on. Embeddings identify
    documents by vec_id = doc_id (the x121 hybrid-retrieval
    convention).

    Shape: the SAME broadcast-eval linear train scan as x134 but
    aggregated train-side (leak verdicts are per train doc, map-side
    combined); the leak set (leak-bounded, tiny) broadcast-joins back
    to the documents scan; one final source-keyed aggregation. Output
    is source-bounded; no train×train pair, no corpus re-scan."""
    ev, tr = _decontam_split(spark, sf_dir)
    leaks = (
        decontam_pairs(tr, ev)
        .filter(F.col("c") >= DECONTAM_COSINE_THRESHOLD)
        .groupBy("train_id")
        .agg(F.lit(1).alias("leak"))
        .select(F.col("train_id").alias("doc_id"), "leak")
    )
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(
            ~(
                (F.col("doc_id") % 10 == 0)
                & (F.col("doc_id") < DECONTAM_EVAL_MAX_ID)
            )
        )
        .select("source", "doc_id", T.token_count(F.col("text")).alias("n_tok"))
    )
    tagged = corpus.join(F.broadcast(leaks), "doc_id", "left")
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("leak"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.sum(
                F.when(F.col("leak").isNull(), F.col("n_tok")).otherwise(0)
            )
            .cast("bigint")
            .alias("tokens_kept"),
            F.sum(
                F.when(F.col("leak").isNotNull(), F.col("n_tok")).otherwise(0)
            )
            .cast("bigint")
            .alias("tokens_removed"),
        )
        .select(
            "source",
            "n_docs",
            "n_removed",
            (F.col("n_docs") - F.col("n_removed")).alias("n_kept"),
            "tokens_kept",
            "tokens_removed",
            F.round(F.col("n_removed") / F.col("n_docs"), 6).alias(
                "removal_rate"
            ),
        )
    )


def x136_preference_pairs(spark, sf_dir):
    """Preference-pair mining (the DPO/RLHF data-construction step):
    within each (lang, source) cohort, rank documents by the x7
    composite quality score and pair the i-th best with the i-th
    worst for i = 1..2 — (chosen, rejected) with a positive margin.
    Deterministic total order: (q_score DESC, doc_id ASC); the worst
    rank is its exact mirror, so rank i from each end never collides;
    pairs where the two ends tie on score (margin 0) are dropped —
    a tie teaches a preference model nothing.

    Shape: ONE shuffle on the cohort key feeds a single window pass
    (row_number + count over the same partitioning), then the two
    rank-slices join on (lang, source, pair_rank) — both inputs are
    ≤2 rows per cohort, reusing the window's exchange. Cost is one
    wide pass at any corpus size; output is cohort-bounded."""
    return mine_preference_pairs(load_table(spark, sf_dir, "documents"))


def mine_preference_pairs(documents: DataFrame) -> DataFrame:
    """The x136 pair-mining builder over any (lang, source, doc_id,
    text) frame — shared verbatim by the batch plan and st47's
    recompute-on-touch deployment (one code path, one arithmetic).
    A cohort's pairs depend ONLY on that cohort's member rows — the
    locality law that makes the mining streamable cohort-by-cohort."""
    return mine_scored_preference_pairs(
        documents.select(
            "lang",
            "source",
            "doc_id",
            T.quality_score(F.col("text")).alias("q"),
        )
    )


def mine_scored_preference_pairs(docs: DataFrame) -> DataFrame:
    """Pair mining over an already-scored (lang, source, doc_id, q)
    frame — the post-scoring core of :func:`mine_preference_pairs`,
    split out (r10) so st47's recompute-on-touch deployment can score
    each document ONCE on arrival and re-mine touched cohorts from the
    stored score instead of re-running the two full-text regexes of
    ``quality_score`` over the accumulated membership every batch
    (guide §8: re-shuffle the 8-byte proxy, never the text payload).
    ``quality_score`` is a deterministic 6-dp-rounded expression, so
    the stored double is bit-identical to a recompute."""
    w = Window.partitionBy("lang", "source").orderBy(
        F.col("q").desc(), F.col("doc_id").asc()
    )
    ranked = docs.select(
        "lang",
        "source",
        "doc_id",
        "q",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang", "source"))
        .alias("n"),
    )
    best = ranked.filter(
        (F.col("rn") <= PREFERENCE_PAIR_DEPTH) & (2 * F.col("rn") <= F.col("n"))
    ).select(
        "lang",
        "source",
        F.col("rn").alias("pair_rank"),
        F.col("doc_id").alias("chosen_id"),
        F.col("q").alias("chosen_q"),
    )
    worst = ranked.filter(
        (F.col("rn") > F.col("n") - PREFERENCE_PAIR_DEPTH)
        & (2 * (F.col("n") - F.col("rn") + 1) <= F.col("n"))
    ).select(
        "lang",
        "source",
        (F.col("n") - F.col("rn") + 1).cast("int").alias("pair_rank"),
        F.col("doc_id").alias("rejected_id"),
        F.col("q").alias("rejected_q"),
    )
    return (
        best.join(worst, ["lang", "source", "pair_rank"])
        .withColumn(
            "margin", F.round(F.col("chosen_q") - F.col("rejected_q"), 6)
        )
        .filter(F.col("margin") > 0)
        .select(
            "lang",
            "source",
            "pair_rank",
            "chosen_id",
            "rejected_id",
            "chosen_q",
            "rejected_q",
            "margin",
        )
    )


def x137_unimax_allocation(spark, sf_dir):
    """UniMax token-budget allocation across sources (Chung et al.
    2023, "UniMax: Fairer and More Effective Language Sampling"):
    give every source as equal a share of the training budget as
    possible WITHOUT repeating any source past the epoch cap.
    Process sources smallest-first; each takes
    ``min(cap·size, remaining // sources_left)`` — a source too small
    to use its equal share caps out, and its unused quota rolls
    forward to the larger sources.

    The recurrence is sequential, but over a frame bounded by the
    number of SOURCES (policy-bounded: tens to a few thousand — never
    corpus-bounded), so it runs as one JVM-side ``F.aggregate`` fold
    over the sorted per-source array in a single row: the corpus-scale
    work is exactly one token-count aggregation; the fold costs
    O(#sources) on one executor with zero Python on the path. The
    DuckDB twin replays the identical fold as a recursive CTE.
    Integer discipline: sizes/budget/quotas are all BIGINT with floor
    division; the ONLY float is the final epochs ratio, divided once
    and rounded to 6dp."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(T.token_count(F.col("text"))).cast("long").alias("sz")
    )
    one = counts.agg(
        F.sort_array(F.collect_list(F.struct("sz", "source"))).alias("arr"),
        (F.lit(UNIMAX_BUDGET_MULTIPLE) * F.sum("sz")).cast("long").alias("b"),
    )
    # The fold is written in SQL-lambda form so the per-step quota uses
    # the INTEGER `div` operator — bit-identical to the oracle's BIGINT
    # `//`, never a floored double division (which drifts past 2^53,
    # i.e. exactly at 100 TB token-budget magnitudes).
    cap = UNIMAX_EPOCH_CAP
    fold = f"""
      aggregate(
        arr,
        named_struct(
          'r', b, 'k', 0,
          'out', CAST(array() AS array<struct<source:string,sz:bigint,alloc:bigint>>)),
        (acc, x) -> named_struct(
          'r', acc.r - least({cap}L * x.sz, acc.r div CAST(size(arr) - acc.k AS BIGINT)),
          'k', acc.k + 1,
          'out', concat(acc.out, array(named_struct(
            'source', x.source, 'sz', x.sz,
            'alloc', least({cap}L * x.sz,
                           acc.r div CAST(size(arr) - acc.k AS BIGINT)))))),
        acc -> acc.out)
    """
    folded = one.select(F.explode(F.expr(fold)).alias("o"))
    return folded.select(
        F.col("o.source").alias("source"),
        F.col("o.sz").alias("sz_tokens"),
        F.col("o.alloc").alias("alloc_tokens"),
        F.round(F.col("o.alloc") / F.col("o.sz"), 6).alias("epochs"),
        (F.col("o.alloc") == F.lit(cap).cast("long") * F.col("o.sz"))
        .cast("int")
        .alias("capped"),
    )


def doc_hash(id_col):
    """Portable per-doc hash column: ((id mod P)·A + seed) mod P."""
    return (
        F.pmod(F.col(id_col), F.lit(SHARD_HASH_P))
        * F.lit(SHARD_HASH_A)
        + F.lit(SHARD_HASH_SEED)
    ) % F.lit(SHARD_HASH_P)


def doc_hash_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`doc_hash` — identical BIGINT arithmetic.

    DuckDB's ``%`` is sign-of-dividend (-7 % 5 = -2) while the Spark
    side uses ``pmod``, so the inner reduction is made sign-safe with
    the ((x % P) + P) % P idiom (ADVICE r9 #1). For non-negative ids
    (all current fixtures) the value is bit-identical to the previous
    single-% form; for negative ids both engines now agree and the
    result stays in [0, P) so downstream ``% 16`` shard math can never
    go negative either.
    """
    return (
        f"(((({id_expr}) % {SHARD_HASH_P}) + {SHARD_HASH_P}) "
        f"% {SHARD_HASH_P} * {SHARD_HASH_A} "
        f"+ {SHARD_HASH_SEED}) % {SHARD_HASH_P}"
    )


def x138_shard_export_plan(spark, sf_dir):
    """Deterministic SEEDED SHARD PLAN — the write-training-shards step
    between curation and the trainer: every document lands in one of
    N=16 shards by the portable seeded hash (a reproducible global
    shuffle: same seed ⇒ same shard layout on any engine, any run —
    what makes a training run restartable and a data bug bisectable),
    and the plan row per shard is the balance audit a shard writer
    signs off on: doc/token counts and the exact integer token share
    in ppm. Changing the seed re-deals the corpus without moving the
    machinery; changing N re-buckets it.

    Shape: shard assignment is a narrow codegen expression fused into
    the scan (no data movement — the actual shard WRITE would be
    ``partitionBy(shard)``, one shuffle); the audit is ONE hash
    aggregation on the 16-value key + a 1-row broadcast total. Integer
    discipline: shares are floor(tokens·1e6 / total) — no float until
    nothing is left to fold."""
    return shard_balance_audit(
        shard_assignments(load_table(spark, sf_dir, "documents"))
    )


def shard_assignments(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tok, shard) for any documents frame — the stateless
    narrow projection both the batch plan (x138) and the st48 shard
    writer apply, shared so assignment arithmetic can never drift."""
    return documents.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tok"),
        F.pmod(doc_hash("doc_id"), F.lit(N_EXPORT_SHARDS)).alias("shard"),
    )


def shard_balance_audit(assigned: DataFrame) -> DataFrame:
    """The per-shard balance report over an assignment frame — shared
    verbatim by x138 and st48's drain (one code path, one arithmetic:
    the audit→deployment discipline of the decontam family)."""
    per_shard = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("shard_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
    total = per_shard.agg(F.sum("shard_tokens").alias("total_tokens"))
    return (
        per_shard.crossJoin(F.broadcast(total))
        .select(
            F.col("shard").cast("int").alias("shard"),
            "n_docs",
            "shard_tokens",
            "min_doc_id",
            "max_doc_id",
            F.expr("shard_tokens * 1000000 div total_tokens")
            .cast("bigint")
            .alias("token_share_ppm"),
        )
    )


def x139_epoch_materialization(spark, sf_dir):
    """The UniMax plan EXECUTED — the audit→execute symmetry again
    (x134→x135, x128→x132): x137 allocates each source an integer
    token budget; this plan materializes it as a sampling manifest.
    Per source: every document repeats ``alloc div size`` times (the
    whole-epoch part — integer, no rounding drift), and the leftover
    budget ``alloc mod size`` is filled GREEDILY by hash order — docs
    ranked by the portable seeded hash (ties → doc_id), taken while
    the running token sum still fits. Hash-ranked selection is the
    deterministic stand-in for "sample the remainder uniformly":
    seed-reproducible, engine-portable, and stable under corpus
    repartitioning. The per-source fidelity_ppm row certifies how
    close the materialized token count lands to the allocation
    (shortfall = the tokens of the first doc that no longer fit).

    Shape: ONE doc-level pass (token count + hash, fused into the
    scan), a broadcast join against the #sources-bounded x137 frame,
    one source-keyed window for the greedy running sum. Output is
    source-bounded."""
    alloc = x137_unimax_allocation(spark, sf_dir).select(
        "source", "sz_tokens", "alloc_tokens"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        T.token_count(F.col("text")).alias("n_tok"),
        doc_hash("doc_id").alias("h"),
    )
    j = docs.join(F.broadcast(alloc), "source").withColumn(
        "n_full", F.expr("alloc_tokens div sz_tokens")
    ).withColumn(
        "remainder", F.col("alloc_tokens") % F.col("sz_tokens")
    )
    # TWO-PHASE prefix sum for the greedy remainder fill (r10, guide
    # §2.5 / VERDICT r9 #4): the direct form — one running-sum window
    # partitioned by source — puts a source's ENTIRE doc set in one
    # window partition, so a dominant source serializes the job at
    # 100 TB. Instead: (1) histogram the hash axis into
    # REMAINDER_BUCKETS range buckets per source (bucket order ==
    # hash order, so the greedy prefix is bucket-monotone: running
    # token sums are non-decreasing, hence the admitted set is a
    # prefix and every bucket is either fully in, fully out, or THE
    # one crossing bucket); (2) take whole buckets from the tiny
    # histogram; (3) run the row-level window ONLY inside each
    # source's crossing bucket, offset by the histogram prefix — the
    # window partition shrinks from |source| to |source|/buckets.
    # Inclusion set is identical row-for-row, so counts and sums are
    # bit-equal to the direct window (same integer arithmetic).
    bw = SHARD_HASH_P // REMAINDER_BUCKETS + 1
    j2 = j.withColumn("bkt", F.expr(f"h div {bw}"))
    wb = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = (
        j2.groupBy("source", "bkt")
        .agg(
            F.sum("n_tok").cast("long").alias("bt"),
            F.count(F.lit(1)).cast("long").alias("bn"),
            F.min("remainder").alias("remainder"),
        )
        .withColumn(
            "cum_before",
            F.coalesce(F.sum("bt").over(wb), F.lit(0).cast("long")),
        )
        .withColumn("cum_through", F.col("cum_before") + F.col("bt"))
    )
    full = (
        hist.filter(F.col("cum_through") <= F.col("remainder"))
        .groupBy("source")
        .agg(
            F.sum("bn").cast("bigint").alias("full_docs"),
            F.sum("bt").cast("long").alias("full_tokens"),
        )
    )
    crossing = hist.filter(
        (F.col("cum_before") <= F.col("remainder"))
        & (F.col("cum_through") > F.col("remainder"))
    ).select("source", "bkt", "cum_before")
    wp = (
        Window.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        j2.join(F.broadcast(crossing), ["source", "bkt"])
        .withColumn(
            "cum_tok", F.col("cum_before") + F.sum("n_tok").over(wp)
        )
        .filter(F.col("cum_tok") <= F.col("remainder"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("part_docs"),
            F.sum("n_tok").cast("long").alias("part_tokens"),
        )
    )
    extra = (
        full.join(partial, "source", "full_outer")
        .select(
            "source",
            (
                F.coalesce(F.col("full_docs"), F.lit(0))
                + F.coalesce(F.col("part_docs"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_extra_docs"),
            (
                F.coalesce(F.col("full_tokens"), F.lit(0))
                + F.coalesce(F.col("part_tokens"), F.lit(0))
            )
            .cast("long")
            .alias("extra_tokens"),
        )
        .filter(F.col("n_extra_docs") > 0)
    )
    base = j.groupBy(
        "source", "sz_tokens", "alloc_tokens", "n_full"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        base.join(extra, "source", "left")
        .select(
            "source",
            "n_docs",
            F.col("n_full").cast("bigint").alias("n_full_copies"),
            F.coalesce(F.col("n_extra_docs"), F.lit(0))
            .cast("bigint")
            .alias("n_extra_docs"),
            F.coalesce(F.col("extra_tokens"), F.lit(0))
            .cast("long")
            .alias("extra_tokens"),
            (
                F.col("n_full") * F.col("sz_tokens")
                + F.coalesce(F.col("extra_tokens"), F.lit(0))
            )
            .cast("long")
            .alias("realized_tokens"),
            # integer div (never floored float — the x137 discipline);
            # a zero allocation is trivially 100% realized
            F.when(
                F.col("alloc_tokens") == 0, F.lit(1_000_000)
            )
            .otherwise(
                F.expr(
                    "(n_full * sz_tokens + coalesce(extra_tokens, 0L)) "
                    "* 1000000 div alloc_tokens"
                )
            )
            .cast("bigint")
            .alias("fidelity_ppm"),
        )
    )
