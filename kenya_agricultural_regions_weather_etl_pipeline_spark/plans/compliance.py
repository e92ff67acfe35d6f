"""Release-compliance plans: the privacy-audit ladder (k-anonymity →
l-diversity → t-closeness) and right-to-erasure propagation through
derived artifacts (dedup survivors, inverted index, vector cells).

Moved here from ``__spark_entry__`` (VERDICT r7 #4/#8 hygiene: plan
compositions live in the package, the entry module only registers
them). Bodies are byte-for-byte the r7 implementations; the DuckDB
oracles in ``oracles/`` are unchanged. Capability parity note: the
reference (`/root/reference/daily_weather_etl_kenya.py`) has no
privacy/compliance surface — this is §2.8 training-data extension
surface a 100 TB corpus owner is legally required to have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.retrieval import doc_postings
from ..sources.tables import load_table


def x67_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy check a
    data-release pipeline runs before publishing: customers grouped by
    the (nation, market-segment) quasi-identifier tuple; any group
    smaller than k=5 re-identifies its members and must be suppressed
    or generalized. Output: every quasi-group with its size and the
    at-risk flag, plus deterministic ordering columns. ONE hash
    aggregation on the quasi-identifier (map-side combined); the flag
    is a scalar expression — the audit costs a single pass whatever
    the table size."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") < 5).cast("int").alias("at_risk"),
        )
    )


def x118_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit — the release gate one step past x67's
    k-anonymity: a quasi-identifier group can be large (k-anonymous)
    yet expose everyone in it if the SENSITIVE attribute is constant
    within the group (the homogeneity attack k-anonymity ignores).
    Customers grouped by the (nation, market-segment) quasi-identifier;
    the sensitive attribute is the account-balance band (5 equal-width
    bands over [-1000, 10000] — banding IS the generalization step of
    the privacy model); l = distinct bands in the group; at_risk when
    l < 3. ONE hash aggregation with a count + count-distinct —
    map-side partials, a single shuffle on the quasi-identifier, the
    same single-pass cost profile as x67 whatever the table size."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.least(
        F.lit(4),
        F.greatest(
            F.lit(0),
            F.floor((F.col("c_acctbal") + F.lit(1000.0)) / F.lit(2200.0)),
        ),
    ).cast("int")
    return (
        cust.withColumn("bal_band", band)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct("bal_band").cast("bigint").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "l_distinct",
            (F.col("l_distinct") < 3).cast("int").alias("at_risk"),
        )
    )


def x119_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit — the third rung of the release-privacy ladder
    (x67 k-anonymity → x118 l-diversity → t-closeness): a group can be
    large AND l-diverse yet still leak if its sensitive-value
    DISTRIBUTION differs sharply from the table's (the skewness attack
    l-diversity ignores — a group that is 90% top-band in a 20%
    top-band table reveals plenty). Per (nation, market-segment)
    quasi-group: the 1-D earth-mover's distance between the group's
    account-balance-band distribution and the global one, EMD =
    (1/(B−1))·Σᵢ |cumQ(i) − cumP(i)| over the B=5 ordered bands;
    flagged when t > 0.2.

    Exactness discipline: every cumulative term is the integer
    |cum_gb·N − cum_b·n_g| (common denominator n_g·N per group), the
    integer numerators SUM exactly, and ONE double division + 6dp
    round happens at the end — order-free on both engines, the same
    quantize-then-divide rule the e2e folds use. Shape: one group×band
    count (map-side combined), a 5-row global frame broadcast, a
    groups×5 dense grid (groups-bounded, not data-bounded) — the audit
    costs one pass + bounded-frame arithmetic at any table size."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.least(
        F.lit(4),
        F.greatest(
            F.lit(0),
            F.floor((F.col("c_acctbal") + F.lit(1000.0)) / F.lit(2200.0)),
        ),
    ).cast("int")
    banded = cust.select(
        "c_nationkey", "c_mktsegment", band.alias("bal_band")
    )
    gb = banded.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_gb")
    )
    groups = banded.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    glob = banded.groupBy("bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    n_tot = banded.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    bands = spark.range(5).select(F.col("id").cast("int").alias("bal_band"))
    # dense (group × band) grid: absent bands must contribute their
    # zero to the cumulative sums — groups×5 rows, bounded by the
    # quasi-identifier domain, never by table size
    grid = (
        groups.crossJoin(F.broadcast(bands))
        .join(gb, ["c_nationkey", "c_mktsegment", "bal_band"], "left")
        .join(F.broadcast(glob), "bal_band", "left")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "n_g",
            "n_tot",
            F.coalesce(F.col("n_gb"), F.lit(0).cast("long")).alias("n_gb"),
            F.coalesce(F.col("n_b"), F.lit(0).cast("long")).alias("n_b"),
        )
    )
    wcum = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("bal_band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "n_g",
        "n_tot",
        "bal_band",
        F.abs(
            F.sum("n_gb").over(wcum) * F.col("n_tot")
            - F.sum("n_b").over(wcum) * F.col("n_g")
        ).alias("num"),
    ).filter(F.col("bal_band") < 4)  # cum at the last band is 0 by def
    return (
        terms.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.first("n_g").alias("group_size"),
            F.round(
                F.sum("num").cast("double")
                / (F.lit(4.0) * F.first("n_g") * F.first("n_tot")),
                6,
            ).alias("t_emd"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("group_size").cast("long").alias("group_size"),
            "t_emd",
            (F.col("t_emd") > 0.2).cast("int").alias("at_risk"),
        )
    )


def x125_erasure_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE propagation through the dedup layer (r7) —
    the lakehouse op a deletion request actually triggers: deleting a
    document must also fix every DERIVED artifact that references it,
    and the subtle case is the dedup survivor set — if the deleted doc
    was a group's CANONICAL, the next-lowest surviving member takes
    over (its content is still in the corpus via the duplicates); a
    group whose members are all deleted vanishes entirely. Deletion
    set = doc_id % 17 == 3 (a deterministic stand-in for the request
    list). Per affected group (any deleted member): the old canonical,
    the post-erasure canonical (NULL when the whole group is erased),
    and the member counts — exactly the delta a compliance audit logs.
    Shape: one fingerprint groupBy with conditional aggregates — no
    second pass, no join back to the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        T.fingerprint_md5(F.col("text")).alias("fp"),
        (F.col("doc_id") % 17 == 3).cast("int").alias("deleted"),
    )
    agg = g.groupBy("fp").agg(
        F.min("doc_id").alias("old_canonical"),
        F.min(
            F.when(F.col("deleted") == 0, F.col("doc_id"))
        ).alias("new_canonical"),
        F.sum("deleted").cast("long").alias("n_deleted"),
        F.sum(F.lit(1) - F.col("deleted")).cast("long").alias(
            "n_remaining"
        ),
    )
    return agg.filter(F.col("n_deleted") > 0).select(
        "fp",
        "old_canonical",
        "new_canonical",
        (
            F.col("new_canonical").isNotNull()
            & (F.col("new_canonical") != F.col("old_canonical"))
        ).alias("canonical_changed"),
        "n_deleted",
        "n_remaining",
    )


def x127_erasure_cell_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE propagation through the VECTOR SERVING STORE
    (r8, VERDICT r7 #7) — the third derived-artifact leg after x125
    (dedup survivors) and x126 (inverted index): the IVF cell
    partitions (st17/st22/st38b's layout) hold the same doc/vec ids a
    deletion request names, so the store must be repaired too. The
    deletion set is x125's (doc_id % 17 == 3) lifted through the bag
    convention (bag doc_id = vec_id DIV 4), the cells are the x5d
    deterministic codebook's (first-16 vectors, raw-double cosine,
    centroid_id tiebreak).

    DELTA-ONLY discipline (the x126 law applied to cells): the deleted
    vectors' cell assignments name exactly the affected cells — at
    production scale that is |deletions| point assignments against the
    ≤k-row broadcast codebook, never a store rescan — and the repair
    joins that delta to the standing cell-size artifact (≤k rows of
    metadata; recomputed here as its in-query stand-in, exactly like
    x126 recomputes the term dictionary). Per affected cell: old/new
    member counts, dropped count, and whether the cell's directory
    empties entirely. Unaffected cells never appear.
    """
    from ..operators.similarity import _ivf_assign, _ivf_codebook

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = _ivf_codebook(vecs, "vec_id", "v", 16)
    assigned = _ivf_assign(vecs, cent, "vec_id", "v").select(
        "vec_id",
        "cell",
        F.expr("CAST(vec_id DIV 4 AS BIGINT) % 17 = 3").alias("deleted"),
    )
    sizes = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("old_members")
    )
    delta = (
        assigned.filter(F.col("deleted"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("dropped_vecs"))
    )
    return (
        delta.join(sizes, "cell")
        .select(
            F.col("cell").cast("long").alias("cell"),
            "old_members",
            (F.col("old_members") - F.col("dropped_vecs"))
            .cast("long")
            .alias("new_members"),
            "dropped_vecs",
            (F.col("old_members") == F.col("dropped_vecs")).alias(
                "cell_vanishes"
            ),
        )
    )


def _hybrid_topk(tf_all, q_all, pooled, keep) -> DataFrame:
    """x121's hybrid path (BM25 top-20 + pooled cosine top-20 → RRF
    top-10) over a ``keep``-filtered corpus/query universe — the
    pre/post legs of x129. ``keep`` is a callable id-Column →
    boolean-Column; ``lambda c: F.lit(True)`` reproduces x121 exactly
    (same operators, same values).

    r10 shape: the legs share MATERIALIZED artifacts instead of
    re-deriving them — ``tf_all`` (the full corpus posting index) and
    ``q_all`` (the query term bags), tokenized ONCE by the caller.
    Posting rows are per-doc, so ``doc_postings(filtered corpus) ==
    tf_all.filter(keep)`` row-for-row, and dl/df/stats derived from
    the filtered index bind the identical doubles the old
    per-leg ``bm25_topk`` did — each leg now pays a filter + the
    scoring join, never a second corpus tokenization. ``pooled`` is
    the (doc_id, pv) store, likewise materialized once."""
    from ..operators.retrieval import (
        bm25_score_index,
        pooled_cosine_topk,
        rrf_fuse,
    )

    tf = tf_all.filter(keep(F.col("doc_id")))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dfc = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tok"),
    )
    sparse = bm25_score_index(
        q_all.filter(keep(F.col("query_id"))), tf, dfc, dl, stats, 20
    )
    dense = pooled_cosine_topk(
        pooled.filter(
            (F.col("doc_id") >= 5) & keep(F.col("doc_id"))
        ),
        pooled.filter(
            (F.col("doc_id") < 5) & keep(F.col("doc_id"))
        ).select(
            F.col("doc_id").alias("query_id"), F.col("pv").alias("qv")
        ),
        k=20,
    ).select("query_id", "doc_id", "rank")
    return rrf_fuse(sparse, dense, k=10)


def x129_post_erasure_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVING AFTER ERASURE (r8) — the end-to-end check that closes
    the compliance loop the repairs (x125/x126/x127/x128/st41) open:
    after the deletion set is applied, what does the SERVING surface
    look like, and how did it change? Both hybrid runs (x121's exact
    path) are computed — pre-erasure and over the repaired universe
    (deleted docs excluded from corpus, candidates, AND queries; doc 3
    is itself a deleted query, the case a naive filter misses) — and
    full-outer-joined per (query, doc) into the delta frame a
    compliance review reads: old/new rank and a status
    (query_erased / result_erased — a deleted doc vacated a slot —
    / entered / displaced / moved / unchanged).

    Determinism: both legs are the byte-same oracle-replayable x121
    machinery, only the keep-predicate differs, so the delta replays
    exactly. Shape: two bounded hybrid runs (posting-list joins +
    broadcast pooled queries + Q·20 fuses) + one Q·10-bounded
    full-outer join — nothing corpus-sized beyond the index scans; the
    BM25 leg's stats (N, df, avgdl) legitimately shift with the
    corpus, which is exactly why serving deltas need auditing."""
    from ..operators.retrieval import (
        doc_postings,
        mean_pooled_bags,
        query_terms,
    )

    docs = load_table(spark, sf_dir, "documents")
    pooled = mean_pooled_bags(
        load_table(spark, sf_dir, "embeddings")
    ).localCheckpoint(eager=True)
    # tokenize ONCE (r10): postings and query bags are per-doc facts
    # independent of corpus membership, so both hybrid legs filter the
    # same materialized artifacts instead of re-tokenizing the corpus
    tf_all = doc_postings(
        docs.filter(F.col("doc_id") >= 5)
    ).localCheckpoint(eager=True)
    q_all = query_terms(
        docs.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id"), "text"
        )
    ).localCheckpoint(eager=True)
    old = _hybrid_topk(
        tf_all, q_all, pooled, lambda c: F.lit(True)
    ).select("query_id", "doc_id", F.col("rank").alias("old_rank"))
    new = _hybrid_topk(
        tf_all, q_all, pooled, lambda c: ~(c % 17 == 3)
    ).select("query_id", "doc_id", F.col("rank").alias("new_rank"))
    j = old.join(new, ["query_id", "doc_id"], "full_outer")
    status = (
        F.when(
            F.col("old_rank").isNotNull()
            & (F.col("query_id") % 17 == 3),
            "query_erased",
        )
        .when(
            F.col("old_rank").isNotNull() & (F.col("doc_id") % 17 == 3),
            "result_erased",
        )
        .when(F.col("old_rank").isNull(), "entered")
        .when(F.col("new_rank").isNull(), "displaced")
        .when(F.col("old_rank") == F.col("new_rank"), "unchanged")
        .otherwise("moved")
    )
    return j.select(
        "query_id",
        "doc_id",
        F.col("old_rank").cast("int").alias("old_rank"),
        F.col("new_rank").cast("int").alias("new_rank"),
        status.alias("status"),
    )


def x131_erasure_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ERASURE CERTIFICATE (r8) — the one-row artifact a
    compliance officer actually FILES: the whole right-to-erasure
    story (x125 dedup survivors / x126 inverted index / x127 vector
    store / x128 kNN graph / x129 serving surface) collapsed into the
    counts the regulator's question is made of — how many documents
    were requested, how many derived-artifact entries were repaired or
    vanished in each layer, and whether the SERVING surface is clean
    (zero post-erasure results referencing deleted content — the x129
    violation count, which the pipeline guarantees is 0 by
    construction and this certificate PROVES by measurement).

    Shape: five bounded audit frames (each already delta-only,
    individually exact-oracled) aggregated to 1-row counts and
    cross-joined — nothing corpus-sized beyond the audits' own scans;
    every count replays exactly in the composed oracle."""
    reqs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 17 == 3)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_requested"))
    )
    g = x125_erasure_propagation(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups_repaired"),
        F.coalesce(
            F.sum(F.col("new_canonical").isNull().cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_groups_vanished"),
    )
    t = x126_erasure_index_repair(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_repaired"),
        F.coalesce(F.sum(F.col("term_vanishes").cast("long")), F.lit(0))
        .cast("long")
        .alias("n_terms_vanished"),
    )
    c = x127_erasure_cell_repair(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells_repaired"),
        F.coalesce(F.sum(F.col("cell_vanishes").cast("long")), F.lit(0))
        .cast("long")
        .alias("n_cells_vanished"),
    )
    gr = x128_erasure_graph_repair(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n_graph_nodes_repaired"),
        F.coalesce(
            F.sum(F.col("needs_backfill").cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_backfill_nodes"),
    )
    sv = x129_post_erasure_serving(spark, sf_dir).agg(
        F.coalesce(
            F.sum(
                (
                    F.col("new_rank").isNotNull()
                    & (
                        (F.col("doc_id") % 17 == 3)
                        | (F.col("query_id") % 17 == 3)
                    )
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_serving_violations")
    )
    return (
        reqs.crossJoin(g)
        .crossJoin(t)
        .crossJoin(c)
        .crossJoin(gr)
        .crossJoin(sv)
        .withColumn(
            "serving_clean", F.col("n_serving_violations") == 0
        )
    )


def x128_erasure_graph_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE propagation through the kNN GRAPH edge list
    (r8) — the FOURTH derived-artifact leg, completing the set (x125
    dedup survivors / x126 inverted index / x127 vector-store cells /
    THIS): the deployed graph's adjacency lists (x86's artifact, the
    state st21 maintains and st24 serves from) reference deleted
    vectors two ways — a deleted node's own out-list (a partition
    delete, trivial) and its APPEARANCES in surviving nodes' lists,
    the subtle half this audit covers.

    DELTA-ONLY discipline: the affected survivors derive from ONE
    nbr-keyed join of the edge list against the deletion set (at
    production scale a point-lookup per deleted id against the
    nbr-partitioned edge store — never a graph rescan), anti-joined to
    drop deleted sources. Per affected surviving node: old/new degree,
    dropped-neighbor count, and needs_backfill (new degree < k — the
    node the x92 incremental machinery must re-candidate). Deletion
    set = x127's (vec_id DIV 4) % 17 == 3. Output scales with
    |affected survivors|, never the graph."""
    from ..operators import graph_index as GI

    art = GI.deployed_graph_index(spark, sf_dir, k=5, n_probe=2)
    graph = GI.read_graph(spark, art)
    deleted = load_table(spark, sf_dir, "embeddings").select(
        "vec_id"
    ).filter(F.expr("CAST(vec_id DIV 4 AS BIGINT) % 17 = 3"))
    dropped = (
        graph.join(
            deleted.withColumnRenamed("vec_id", "nbr_id"), "nbr_id"
        )
        .join(
            deleted.withColumnRenamed("vec_id", "src_id"),
            "src_id",
            "left_anti",
        )
        .groupBy("src_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dropped"))
    )
    deg = graph.groupBy("src_id").agg(
        F.count(F.lit(1)).cast("long").alias("old_degree")
    )
    return (
        dropped.join(deg, "src_id")
        .select(
            "src_id",
            "old_degree",
            (F.col("old_degree") - F.col("n_dropped"))
            .cast("long")
            .alias("new_degree"),
            "n_dropped",
            (F.col("old_degree") - F.col("n_dropped") < 5).alias(
                "needs_backfill"
            ),
        )
    )


def x126_erasure_index_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE propagation through the INVERTED INDEX (r7) —
    x125's principle applied to the other derived-artifact class: a
    deletion request must also repair the search index (st37/x120's
    postings + term dictionary), and the scale discipline is
    DELTA-ONLY — the deleted docs' postings name exactly the affected
    terms, so df decrements by the per-term count of deleted holders
    and no unaffected term is ever touched (a full dictionary rebuild
    at 10⁹ terms for a 100-doc erasure is the anti-pattern). Deletion
    set = x125's (doc_id % 17 == 3), corpus = the indexed docs
    (doc_id ≥ 5). Per affected term: old/new df, dropped posting and
    token counts, and whether the term vanishes from the dictionary
    entirely. Shape: one postings pass split by the deletion flag —
    the repair aggregate reads ONLY deleted docs' postings joined back
    to the dictionary on term."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") >= 5
    )
    tf = doc_postings(docs.select("doc_id", "text")).withColumn(
        "deleted", (F.col("doc_id") % 17 == 3).cast("int")
    )
    dfc = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("old_df")
    )
    delta = (
        tf.filter(F.col("deleted") == 1)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dropped_postings"),
            F.sum("tf").cast("long").alias("dropped_tokens"),
        )
    )
    return (
        delta.join(dfc, "term")
        .select(
            "term",
            "old_df",
            (F.col("old_df") - F.col("dropped_postings"))
            .cast("long")
            .alias("new_df"),
            "dropped_postings",
            "dropped_tokens",
            (F.col("old_df") == F.col("dropped_postings")).alias(
                "term_vanishes"
            ),
        )
    )


def x132_graph_backfill_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERASURE BACKFILL EXECUTION for the kNN graph (r9) — x128 flags
    the surviving nodes an erasure left under-connected
    (``needs_backfill``: post-drop degree < k); this operator performs
    the repair the x92 incremental machinery owes them: restore each
    flagged node toward degree k=5 with NEW neighbors drawn from its
    2-HOP surviving neighborhood (the NN-descent candidate rule —
    neighbors-of-neighbors are the standard high-recall repair pool),
    ranked by exact cosine with the x86 tiebreak discipline
    (raw-double sim DESC, candidate id ASC — identical doubles on both
    engines), each node taking exactly ``k − new_degree`` fills (fewer
    iff its 2-hop pool runs dry — deterministic either way).

    DELTA-ONLY discipline: candidates derive from the flagged nodes'
    OWN surviving edges joined once against the edge list (k² rows per
    flagged node, never graph² and never a full re-candidate of
    unaffected nodes); existing surviving neighbors and deleted nodes
    are anti-joined away BEFORE scoring, so the cosine pass touches
    only genuine fill candidates. Deletion set = x127/x128's
    ``(vec_id DIV 4) % 17 == 3``. Output: one row per backfilled edge
    (src_id, new_nbr_id, backfill_sim at 6 dp, fill_rank)."""
    from ..operators import graph_index as GI

    art = GI.deployed_graph_index(spark, sf_dir, k=5, n_probe=2)
    graph = GI.read_graph(spark, art).select("src_id", "nbr_id")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cvec")
    )
    deleted = emb.select("vec_id").filter(
        F.expr("CAST(vec_id DIV 4 AS BIGINT) % 17 = 3")
    )
    return graph_backfill_fills(graph, emb, deleted, k=5)


def graph_backfill_fills(
    graph: DataFrame,
    emb: DataFrame,
    deleted: DataFrame,
    k: int = 5,
    sources: DataFrame | None = None,
) -> DataFrame:
    """x132's core as a reusable plan builder (r9): given the frozen
    edge list ``graph`` (src_id, nbr_id), the embedding frame ``emb``
    (vec_id, cvec double[]), and the CURRENT deletion frame
    ``deleted`` (vec_id), emit the backfill fills for every surviving
    source left under degree ``k``. ``sources`` (optional, vec_id)
    restricts the flag/fill derivation to a candidate-source subset —
    st45's recompute-on-touch passes its per-batch touched set so each
    micro-batch pays only for sources whose ≤2-hop neighborhood the
    batch actually changed; semantics for the restricted set are
    IDENTICAL to the full run (fills depend only on the source's own
    2-hop neighborhood and the deletion frame)."""
    from ..functions.vectors import cosine

    # per-source dropped counts + flag, derived from graph ⋈ deleted
    base = graph
    if sources is not None:
        base = graph.join(
            sources.withColumnRenamed("vec_id", "src_id").select(
                "src_id"
            ),
            "src_id",
        )
    dropped = (
        base.join(
            deleted.withColumnRenamed("vec_id", "nbr_id"), "nbr_id"
        )
        .join(
            deleted.withColumnRenamed("vec_id", "src_id"),
            "src_id",
            "left_anti",
        )
        .groupBy("src_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dropped"))
    )
    deg = base.groupBy("src_id").agg(
        F.count(F.lit(1)).cast("long").alias("old_degree")
    )
    nb = (
        dropped.join(deg, "src_id")
        .filter(F.col("old_degree") - F.col("n_dropped") < k)
        .select(
            "src_id",
            (F.lit(k) - (F.col("old_degree") - F.col("n_dropped")))
            .cast("long")
            .alias("needed"),
        )
    )
    # surviving edges: both endpoints outside the deletion set
    sedges = (
        graph.join(
            deleted.withColumnRenamed("vec_id", "src_id"),
            "src_id",
            "left_anti",
        )
        .join(
            deleted.withColumnRenamed("vec_id", "nbr_id"),
            "nbr_id",
            "left_anti",
        )
        .select("src_id", "nbr_id")
    )
    e1 = sedges.join(nb.select("src_id"), "src_id")
    cand = (
        e1.alias("e1")
        .join(
            sedges.alias("e2"),
            F.col("e1.nbr_id") == F.col("e2.src_id"),
        )
        .select(
            F.col("e1.src_id").alias("src_id"),
            F.col("e2.nbr_id").alias("cand_id"),
        )
        .filter(F.col("cand_id") != F.col("src_id"))
        .distinct()
        .join(
            sedges.withColumnRenamed("nbr_id", "cand_id"),
            ["src_id", "cand_id"],
            "left_anti",
        )
    )
    scored = (
        cand.join(
            emb.select(
                F.col("vec_id").alias("src_id"),
                F.col("cvec").alias("sv"),
            ),
            "src_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("cand_id"),
                F.col("cvec").alias("cv"),
            ),
            "cand_id",
        )
        .withColumn("sim", cosine(F.col("sv"), F.col("cv")))
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("fill_rank", F.row_number().over(w))
        .join(nb, "src_id")
        .filter(F.col("fill_rank") <= F.col("needed"))
        .select(
            "src_id",
            F.col("cand_id").alias("new_nbr_id"),
            F.round(F.col("sim"), 6).alias("backfill_sim"),
            F.col("fill_rank").cast("int").alias("fill_rank"),
        )
    )


def x133_repair_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPAIR-vs-REBUILD quality audit (r9) — the receipt that closes
    the erasure loop: after x128 flags and x132 backfills, how good is
    the REPAIRED graph compared to the ground truth (the x86 build run
    fresh over ONLY the surviving vectors — what a full rebuild would
    produce)? Per flagged node: its repaired adjacency (surviving
    original edges ∪ x132 backfills) intersected with the rebuild's
    top-5, reported as n_repaired / n_rebuild / n_overlap /
    repair_recall (6 dp). This is the quantitative basis for the
    repair-vs-rebuild policy decision a 100 TB graph owner faces after
    every erasure batch: delta repair costs k² per flagged node (x132),
    rebuild costs N·√N — this audit prices the recall gap between them.

    Scale shape: the audit side is delta-only (flagged nodes' edges);
    the rebuild side deliberately pays the N·√N build ONCE because it
    IS the ground truth being priced — at production scale this runs
    as a sampled spot-check, not per erasure batch. Oracle: composes
    b12's graph CTE twice (full + surviving ``src_table``) plus the
    x128/x132 SQL as scoped subqueries."""
    from ..operators import graph_index as GI
    from ..operators.similarity import knn_graph

    art = GI.deployed_graph_index(spark, sf_dir, k=5, n_probe=2)
    graph = GI.read_graph(spark, art).select("src_id", "nbr_id")
    emb = load_table(spark, sf_dir, "embeddings")
    deleted = emb.select("vec_id").filter(
        F.expr("CAST(vec_id DIV 4 AS BIGINT) % 17 = 3")
    )
    audit = (
        x128_erasure_graph_repair(spark, sf_dir)
        .filter(F.col("needs_backfill"))
        .select("src_id")
    )
    fills = x132_graph_backfill_repair(spark, sf_dir).select(
        "src_id", F.col("new_nbr_id").alias("nbr_id")
    )
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
    # ONE full-outer edge join + ONE aggregation (r10): the previous
    # three-legged tail (count repaired, count rebuild, count overlap,
    # then re-join all three onto audit) referenced `repaired` and
    # `rebuild` twice each — and each reference re-evaluated its
    # expensive producer (x132's backfill chain; the N·√N ground-truth
    # knn_graph rebuild). Both edge sets are unique on (src_id,
    # nbr_id), so membership flags + sums reproduce the three counts
    # bit-for-bit, with each leg evaluated exactly once. The inner
    # audit⋈reb join of the old tail is the n_rebuild > 0 filter here
    # (both legs are already audit-restricted, so no re-join needed).
    j = (
        repaired.withColumn("in_rep", F.lit(1))
        .join(
            rebuild.withColumn("in_reb", F.lit(1)),
            ["src_id", "nbr_id"],
            "full_outer",
        )
        .groupBy("src_id")
        .agg(
            F.sum(F.coalesce(F.col("in_rep"), F.lit(0)))
            .cast("long")
            .alias("n_repaired"),
            F.sum(F.coalesce(F.col("in_reb"), F.lit(0)))
            .cast("long")
            .alias("n_rebuild"),
            F.sum(
                F.coalesce(F.col("in_rep"), F.lit(0))
                * F.coalesce(F.col("in_reb"), F.lit(0))
            )
            .cast("long")
            .alias("n_overlap"),
        )
    )
    return j.filter(F.col("n_rebuild") > 0).select(
        "src_id",
        "n_repaired",
        "n_rebuild",
        "n_overlap",
        F.round(
            F.col("n_overlap").cast("double") / F.col("n_rebuild"), 6
        ).alias("repair_recall"),
    )
