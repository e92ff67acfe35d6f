"""Similarity search over embedding columns (extension surface).

Two paths, per the scale contract:
- :func:`cosine_topk_bruteforce` — exact top-k: broadcast the (small)
  query set against the corpus, compute cosine JVM-side, rank with a
  window. Baseline + oracle-checkable.
- :func:`cosine_topk_lsh` — sign-LSH (random hyperplane) bucketed
  approximate search: probes only matching buckets, so corpus-side work
  drops by ~2^n_bits. The 100 TB path (IVF-style coarse quantization
  would follow the same join shape with k-means centroids).

All vector math is double-precision JVM expressions
(functions/vectors.py) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, cosine_given_norms, norm, to_double_array

# SemDeDup's scale knob (shared by the batch x40b query, the st20
# streaming twin, and both their DuckDB oracles — ONE source of truth
# so retuning it cannot desynchronize an engine from its oracle): grow
# cluster COUNT with the corpus so the mean cluster stays ~this many
# vectors and candidate pairs stay ≈ N·target/2.
SEMDEDUP_TARGET_CLUSTER_SIZE = 100

# The verified-pair cosine cut shared by every SemDeDup variant and
# every oracle replaying one (calibrated to the synthetic corpus's top
# ~1% of pairs; a real corpus would run ~0.92+ per the paper).
SEMDEDUP_COSINE_THRESHOLD = 0.3


def _hyperplane(dim: int, bit: int, n_bits: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component signs.

    Derived from a fixed integer mix (no RNG → reproducible across
    runs/engines). Values in {-1.0, +1.0}.
    """
    out = []
    for d in range(dim):
        h = (d * 2654435761 + bit * 40503 + 12345) & 0xFFFFFFFF
        h ^= h >> 16
        out.append(1.0 if (h & 1) == 0 else -1.0)
    return out


def sign_bucket(vec: Column, n_bits: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane sign sketch → integer bucket id in [0, 2^n_bits).

    All ``n_bits`` projections run in ONE fold over the vector with an
    array accumulator (the naive per-bit form re-walks the vector
    ``n_bits`` times). Each plane's partial sums still accumulate in the
    same d=0..dim-1 sequential order, so the result is bit-identical to
    the per-plane fold and the SQL oracle's ``list_dot_product``.
    """
    # planes[d][b]: sign of plane b at dimension d
    planes = F.array(
        *[
            F.array(
                *[F.lit(_hyperplane(dim, b, n_bits)[d]) for b in range(n_bits)]
            )
            for d in range(dim)
        ]
    )
    per_dim = F.zip_with(vec, planes, lambda x, pl: F.transform(pl, lambda p: x * p))
    projs = F.aggregate(
        per_dim,
        F.array_repeat(F.lit(0.0), n_bits),
        lambda acc, contrib: F.zip_with(acc, contrib, lambda s, x: s + x),
    )
    # single reference to `projs` (an 8-wide re-reference would re-run
    # the interpreted fold once per bit): weight positive projections by
    # their bit value and sum
    weights = F.array(*[F.lit(1 << b) for b in range(n_bits)])
    return F.aggregate(
        F.zip_with(
            projs, weights, lambda p, bit: F.when(p > 0, bit).otherwise(F.lit(0))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast(query) ⋈ corpus + window rank.

    Output: (query_id, vec_id, cos_sim, rank) — cos_sim rounded to 6dp
    for cross-engine hash stability; ranking uses full precision.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("cvec")
    ).withColumn("cnrm", norm(F.col("cvec")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), to_double_array(F.col(vec_col)).alias("qvec")
    ).withColumn("qnrm", norm(F.col("qvec")))
    scored = c.join(F.broadcast(q)).withColumn(
        "sim_full",
        cosine_given_norms(
            F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lo: float = 0.3,
    hi: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar corpus vectors INSIDE a similarity band
    [lo, hi) — similar enough to be informative negatives, below the
    near-duplicate zone where they would be false negatives (the
    standard in-batch-negatives upgrade for embedding-model training).

    Same exact broadcast(query) ⋈ corpus shape as
    :func:`cosine_topk_bruteforce`; the band filter and the self-pair
    exclusion apply BEFORE ranking on full-precision similarity, and
    both engines compute the dot product in the same sequential fold,
    so the band edges cut identically and the result is oracle-exact.
    At 100 TB the corpus side swaps for the IVF/LSH-bucketed index
    (x5d) with the same band predicate as a residual filter.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("cvec")
    ).withColumn("cnrm", norm(F.col("cvec")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qvec"),
    ).withColumn("qnrm", norm(F.col("qvec")))
    scored = (
        c.join(F.broadcast(q))
        .withColumn(
            "sim_full",
            cosine_given_norms(
                F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
            ),
        )
        .filter(
            (F.col("sim_full") >= lo)
            & (F.col("sim_full") < hi)
            & (F.col("vec_id") != F.col("query_id"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 2,
    codebook_corpus: DataFrame | None = None,
) -> DataFrame:
    """IVF-style coarse-quantized approximate top-k.

    Inverted-file search without a trained quantizer: the first
    ``n_centroids`` corpus vectors act as the coarse codebook (a
    deterministic stand-in for k-means centroids — same join shape,
    reproducible, oracle-expressible). Every corpus vector is assigned
    to its nearest centroid (one broadcast pass over the tiny codebook);
    each query probes its ``n_probe`` nearest cells and reranks
    exactly within them. Corpus-side work per query drops by
    ~n_centroids/n_probe; at 100 TB the cell assignment is computed
    once at ingest and the probe join is a partition-pruned read.

    ``codebook_corpus``: train the codebook on a DIFFERENT frame than
    the one searched — the filtered-vector-search pattern (x5i): one
    shared codebook for the whole store, a metadata predicate narrows
    ``corpus``, and the predicate rides the scan (PushedFilters) so the
    filtered search reads only matching rows of the probed cells.
    """
    cent = _ivf_codebook(
        codebook_corpus if codebook_corpus is not None else corpus,
        id_col,
        vec_col,
        n_centroids,
    )
    assigned = _ivf_assign(corpus, cent, id_col, vec_col)
    probes = _ivf_probes(queries, cent, query_id_col, vec_col, n_probe)
    return _ivf_rerank(assigned, probes, k)


def _ivf_codebook(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """Deterministic coarse codebook: the first n_centroids corpus
    vectors (k-means stand-in — same join shape, oracle-replayable)."""
    return corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"),
        to_double_array(F.col(vec_col)).alias("cent_vec"),
    )


def _ivf_rank_cells(
    corpus: DataFrame, cent: DataFrame, id_col: str, vec_col: str, n: int
) -> DataFrame:
    """Top-``n`` nearest cells per vector in ONE broadcast-codebook
    pass — the shared derivation behind assignment (rank 1) and
    probing (rank ≤ n_probe). Callers that need both (st21's ingest
    path) compute this once per batch instead of paying two
    cross-join windows; the float math is the same dot/(norm·norm)
    expression `_ivf_assign`/`_ivf_probes` use, so derived frames are
    bit-identical to theirs. Returns (vec_id, cvec, cell, cell_rank).
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        to_double_array(F.col(vec_col)).alias("cvec"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cent_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        c.join(F.broadcast(cent))
        .withColumn("cent_sim", cosine(F.col("cvec"), F.col("cent_vec")))
        .withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n)
        .select(
            "vec_id", "cvec", F.col("centroid_id").alias("cell"), "cell_rank"
        )
    )


def _ivf_assign(
    corpus: DataFrame, cent: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest centroid per corpus vector (one broadcast codebook pass)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("cvec")
    )
    w_c = Window.partitionBy("vec_id").orderBy(
        F.col("cent_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        c.withColumn("cnrm", norm(F.col("cvec")))
        .join(F.broadcast(cent.withColumn("cent_nrm", norm(F.col("cent_vec")))))
        .withColumn(
            "cent_sim",
            cosine_given_norms(
                F.col("cvec"), F.col("cent_vec"), F.col("cnrm"), F.col("cent_nrm")
            ),
        )
        .withColumn("cell_rank", F.row_number().over(w_c))
        .filter(F.col("cell_rank") == 1)
        .select("vec_id", "cvec", F.col("centroid_id").alias("cell"))
    )


def _ivf_probes(
    queries: DataFrame,
    cent: DataFrame,
    query_id_col: str,
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """n_probe nearest cells per query (broadcast codebook)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qvec"),
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("cent_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        q.join(F.broadcast(cent))
        .withColumn("cent_sim", cosine(F.col("qvec"), F.col("cent_vec")))
        .withColumn("cell_rank", F.row_number().over(w_q))
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qvec", F.col("centroid_id").alias("cell"))
    )


def _ivf_rerank(assigned: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Exact rerank within probed cells only (norms precomputed per
    side, not per candidate pair — same fold, same float result)."""
    scored = (
        assigned.withColumn("cnrm", norm(F.col("cvec")))
        .join(
            F.broadcast(probes.withColumn("qnrm", norm(F.col("qvec")))), "cell"
        )
        .withColumn(
            "sim_full",
            cosine_given_norms(
                F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    n_probe: int = 2,
    cent: DataFrame | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """IVF-blocked k-nearest-neighbor GRAPH over the corpus itself —
    every vector's approximate top-k neighbors, the build artifact
    behind graph-ANN indexes (HNSW base layers, NN-descent seeds) and
    the input to mutual-kNN clustering / graph dedup.

    Shape, and why it survives 100 TB: the corpus is BOTH sides, so
    nothing here may broadcast the query set (the point lookup path in
    :func:`cosine_topk_ivf` broadcasts its ≤ handful of queries; that
    would be corpus-sized here). Instead the candidate join is keyed by
    ``cell``: assignment (one broadcast-codebook pass) and probing
    (same pass, top ``n_probe`` cells per vector) emit corpus-sized
    frames co-partitioned on the cell id, and the join shuffles each
    side once on that key — candidate work is Σ_cells |cell|·|probers|
    ≈ N·n_probe·(N/n_centroids), never all-pairs N².

    ``n_centroids`` defaults to ceil(√N) (the balanced flat-IVF policy
    measured for SemDeDup k in SURVEY §9): assignment costs N·√N and
    per-vector candidates stay ≈ n_probe·√N, both sub-quadratic. The
    codebook stays broadcastable (√N rows — 32 k rows of dim-64
    doubles ≈ 16 MB at N = 10⁹).

    Assignment (rank 1) and probe lists (rank ≤ n_probe) are derived
    from ONE ``_ivf_rank_cells`` pass over the corpus — the N·√N
    codebook scan is the build's dominant map cost, and the corpus is
    both the assigned side AND the probing side here, so paying it
    twice (the pre-r4 shape: separate ``_ivf_assign`` +
    ``_ivf_probes`` passes) doubled the most expensive stage for
    bit-identical output. The thin ranked frame (2 rows/vector) is
    lazily persisted so its two consumers don't re-execute the scan.

    ``cent`` lets a caller pass an already-built codebook frame (e.g.
    a deployed index's stored codebook, st24) — it must have the
    `_ivf_codebook` schema (centroid_id, cent_vec). ``ranked`` goes one
    step further: a caller that ALSO needs the assignment for its own
    purposes (st24's deploy writes it as the serving index) passes the
    shared `_ivf_rank_cells` frame so the N·√N codebook scan — the
    build's dominant map cost — is paid once for both artifacts (the
    st21 single-pass discipline); the caller owns its persistence.

    Precedence: when ``ranked`` is supplied it IS the assignment —
    ``n_centroids``, ``n_probe`` and ``cent`` are not consulted at all
    (the probe fan-out is whatever ``ranked`` was built with). Passing
    an explicit ``n_centroids`` together with ``ranked`` is therefore a
    caller bug (the graph would silently reflect ranked's codebook, not
    the argument) and raises ``ValueError``. ``cent`` alongside
    ``ranked`` is tolerated — the supported callers (st24's deploy)
    pass the very codebook ``ranked`` was derived from, and frame
    equality can't be checked without a job — and ``n_probe`` is left
    permissive because its default makes intent undetectable; callers
    must match both to the ranked build by convention.

    Returns (src_id, nbr_id, cos_sim, rank): ``k`` directed edges per
    vector, self-edges excluded, rank 1 = nearest.
    """
    import math

    from pyspark.storagelevel import StorageLevel

    if ranked is not None and n_centroids is not None:
        raise ValueError(
            "knn_graph: `ranked` already fixes the codebook size — an "
            "explicit conflicting n_centroids would be silently ignored; "
            "pass one or the other"
        )
    if ranked is None:
        if n_centroids is None:
            n_centroids = max(1, math.ceil(math.sqrt(corpus.count())))
        if cent is None:
            cent = _ivf_codebook(corpus, id_col, vec_col, n_centroids)
        ranked = _ivf_rank_cells(
            corpus, cent, id_col, vec_col, n_probe
        ).persist(StorageLevel.MEMORY_AND_DISK)
    assigned = ranked.filter(F.col("cell_rank") == 1).select(
        "vec_id", "cvec", "cell"
    )
    probes = ranked.select(
        F.col("vec_id").alias("query_id"),
        F.col("cvec").alias("qvec"),
        "cell",
    )
    scored = (
        assigned.withColumn("cnrm", norm(F.col("cvec")))
        # cell-keyed shuffle join, deliberately NOT broadcast: probes is
        # corpus-sized (every vector probes n_probe cells)
        .join(probes.withColumn("qnrm", norm(F.col("qvec"))), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "sim_full",
            cosine_given_norms(
                F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias("src_id"),
            F.col("vec_id").alias("nbr_id"),
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def mutual_knn_edges(graph: DataFrame) -> DataFrame:
    """Undirected mutual-kNN edges from a :func:`knn_graph` result:
    keep pair (a, b) only when a lists b AND b lists a — the standard
    symmetrization that turns an asymmetric kNN graph into the edge set
    mutual-kNN clustering / dedup components consume (hub vectors that
    appear in everyone's list but reciprocate nothing are dropped).

    One self-equi-join on the integer id pair (edge-count-sized, cell
    locality irrelevant at this stage), emitted once per pair with
    ``id_a < id_b``. ``cos_sim`` is direction-independent (same
    dimension-ordered fold both ways), so either edge's value works.
    """
    from pyspark.storagelevel import StorageLevel

    # referenced twice (forward + reversed); lazily persist so the
    # upstream graph build executes once, not per reference
    graph = graph.persist(StorageLevel.MEMORY_AND_DISK)
    fwd = graph.select(
        F.col("src_id").alias("id_a"),
        F.col("nbr_id").alias("id_b"),
        "cos_sim",
    )
    rev = graph.select(
        F.col("nbr_id").alias("id_a"), F.col("src_id").alias("id_b")
    )
    return (
        fwd.join(rev, ["id_a", "id_b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cos_sim")
    )


def knn_graph_upsert(
    base_graph: DataFrame,
    assigned_base: DataFrame,
    delta: DataFrame,
    cent: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    probes_base: DataFrame | None = None,
    assigned_delta: DataFrame | None = None,
    probes_delta: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL maintenance of a :func:`knn_graph` under insert-only
    arrivals — the operation that makes the graph affordable at 100 TB:
    the O(N^1.5) build (SURVEY §9's x86 row) is paid once; every
    subsequent batch pays O(|delta|) plus the bounded fix-up below, and
    the result EQUALS the batch rebuild bit-for-bit, so the batch
    oracle verifies the incremental path (the st17 == x5d discipline).

    Inputs are the index's STORED state: the incumbent edge list
    (``base_graph``), the cell assignment (``assigned_base`` —
    physically the x5f partitioned layout), and the frozen codebook
    (``cent`` — cell count is fixed at index creation; re-sharding the
    codebook is a rebuild, not an upsert). Work per batch:

    1. assign delta vectors to cells (one broadcast-codebook map pass);
    2. delta sources: probe n_probe cells, candidates = full members
       of probed cells (cell-keyed shuffle join — |delta|-driven);
    3. existing sources: the only batch-rebuild candidates NOT already
       reflected in the incumbent top-k are delta vectors landing in a
       cell the source probes — one join of the base probe lists
       against the delta assignment, |delta|-driven again. Pass
       ``probes_base`` to use STORED probe lists (they are
       creation-time index state — the codebook is frozen, so a
       vector's probe cells never change; st21 stores them per ingest
       batch); when omitted they are map-recomputed from
       ``assigned_base``, which costs an extra N·√N codebook pass per
       call — fine for a one-shot upsert (x92), the wrong shape for
       continuous ingest;
    4. rescore incumbent ∪ new pairs from raw vectors and keep top-k
       per source. Dropped base candidates can never re-enter (they
       ranked below the incumbent top-k and delta adds no base
       vectors), which is the exactness argument.
    """
    if assigned_delta is None:
        assigned_delta = _ivf_assign(delta, cent, id_col, vec_col)
    assigned_full = assigned_base.unionByName(assigned_delta)
    vecs = (
        assigned_full.select(
            F.col("vec_id").alias("_vid"), F.col("cvec").alias("_v")
        )
        .withColumn("_nrm", norm(F.col("_v")))
    )
    if probes_delta is None:
        probes_delta = _ivf_probes(delta, cent, id_col, vec_col, n_probe)
    cand_delta = (
        assigned_full.join(probes_delta.select("query_id", "cell"), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(F.col("query_id").alias("src"), F.col("vec_id").alias("cand"))
    )
    if probes_base is None:
        probes_base = _ivf_probes(
            assigned_base.select("vec_id", "cvec"),
            cent,
            "vec_id",
            "cvec",
            n_probe,
        )
    cand_base_new = (
        assigned_delta.select("vec_id", "cell")
        .join(probes_base.select("query_id", "cell"), "cell")
        .select(F.col("query_id").alias("src"), F.col("vec_id").alias("cand"))
    )
    cand_incumbent = base_graph.select(
        F.col("src_id").alias("src"), F.col("nbr_id").alias("cand")
    )
    cand = cand_delta.unionByName(cand_base_new).unionByName(cand_incumbent)
    scored = (
        cand.join(
            vecs.select(
                F.col("_vid").alias("src"),
                F.col("_v").alias("sv"),
                F.col("_nrm").alias("snrm"),
            ),
            "src",
        )
        .join(
            vecs.select(
                F.col("_vid").alias("cand"),
                F.col("_v").alias("cv"),
                F.col("_nrm").alias("cnrm"),
            ),
            "cand",
        )
        .withColumn(
            "sim_full",
            cosine_given_norms(
                F.col("cv"), F.col("sv"), F.col("cnrm"), F.col("snrm")
            ),
        )
    )
    w = Window.partitionBy("src").orderBy(
        F.col("sim_full").desc(), F.col("cand").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("src").alias("src_id"),
            F.col("cand").alias("nbr_id"),
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def nn_descent_round(
    graph: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One NN-DESCENT refinement round over a :func:`knn_graph` result —
    "a neighbor of my neighbor is probably my neighbor" (Dong et al.,
    WWW'11), the iteration graph-ANN builders run until convergence.

    Candidate generation never touches cells or raw similarity scans:
    the UNDIRECTED neighborhood B = fwd ∪ reverse edges (≤ 2·N·k rows),
    candidates = two-hop closure B ⋈ B (≤ N·(2k)² rows — bounded by the
    graph degree, independent of corpus density), unioned with the
    incumbent edges so a round can only improve. Exact cosine is then
    recomputed for the candidate set via two integer-keyed shuffle
    joins against the vector table (norms computed once per side), and
    a per-source window keeps the new top-k. Every stage is
    degree-bounded: at 100 TB the expensive object is N·4k² candidate
    rows, not N² — and rounds are embarrassingly resumable (the graph
    is the only state).

    Returns the same (src_id, nbr_id, cos_sim, rank) schema as
    :func:`knn_graph`; recall vs brute-force is monotonically
    non-decreasing in rounds (pinned by pytest at sf0.01).
    """
    from pyspark.storagelevel import StorageLevel

    # the incoming graph subtree is referenced 3× below (fwd, reversed,
    # incumbent union) — lazily persist so an expensive upstream build
    # (x86's cell-join) runs once, not per reference
    graph = graph.persist(StorageLevel.MEMORY_AND_DISK)
    fwd = graph.select("src_id", "nbr_id")
    b = fwd.union(
        graph.select(
            F.col("nbr_id").alias("src_id"), F.col("src_id").alias("nbr_id")
        )
    ).distinct()
    two_hop = (
        b.alias("g1")
        .join(b.alias("g2"), F.col("g1.nbr_id") == F.col("g2.src_id"))
        .select(
            F.col("g1.src_id").alias("src_id"),
            F.col("g2.nbr_id").alias("cand_id"),
        )
        .filter(F.col("src_id") != F.col("cand_id"))
    )
    cand = two_hop.union(
        fwd.select("src_id", F.col("nbr_id").alias("cand_id"))
    ).distinct()
    emb = corpus.select(
        F.col(id_col).alias("_eid"), to_double_array(F.col(vec_col)).alias("_v")
    ).withColumn("_nrm", norm(F.col("_v")))
    scored = (
        cand.join(
            emb.select(
                F.col("_eid").alias("src_id"),
                F.col("_v").alias("sv"),
                F.col("_nrm").alias("snrm"),
            ),
            "src_id",
        )
        .join(
            emb.select(
                F.col("_eid").alias("cand_id"),
                F.col("_v").alias("cv"),
                F.col("_nrm").alias("cnrm"),
            ),
            "cand_id",
        )
        .withColumn(
            "sim_full",
            cosine_given_norms(
                F.col("sv"), F.col("cv"), F.col("snrm"), F.col("cnrm")
            ),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("sim_full").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "src_id",
            F.col("cand_id").alias("nbr_id"),
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def graph_beam_search(
    corpus: DataFrame,
    graph: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 10,
    hops: int = 3,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    truncate_lineage: bool = True,
    cent: DataFrame | None = None,
    assigned: DataFrame | None = None,
    cframe: DataFrame | None = None,
) -> DataFrame:
    """QUERY-TIME graph-ANN search — the consumer of the
    :func:`knn_graph` build artifact (the HNSW-base-layer / DiskANN
    search idiom): start each query from its IVF entry cell, then run
    ``hops`` rounds of deterministic beam search along graph edges,
    re-scoring candidates with exact cosine and keeping the ``beam``
    best per query each round.

    Semantics per hop (fully deterministic, hence oracle-replayable):
    ``candidates_h = beam_{h-1} ∪ neighbors(beam_{h-1})`` (distinct),
    ``beam_h = top-beam of candidates_h`` by (cosine desc, id asc).
    With ``beam >= k`` the search is hop-monotone: a true top-k member
    can only be displaced by a node with strictly higher cosine, which
    is itself a true top-k member — so recall vs brute force never
    decreases with hops (pinned by pytest).

    Why this shape survives 100 TB: the per-query state is tiny
    (``beam`` ids), so every round is a broadcast of the Q·beam frame
    against the two big, pre-built artifacts — the edge list (join on
    ``src_id``: a point-lookup pattern that partition-prunes when the
    graph is stored cell-partitioned) and the vector table (join on
    the id). Per-round candidate work is Q·beam·graph_k rows,
    INDEPENDENT of corpus size N — unlike IVF probing, whose candidate
    count tracks the N/√N cell occupancy. The entry stage is one
    bounded cell scan (the query's own nearest cell, same codebook the
    graph was built with).

    Returns (query_id, vec_id, cos_sim, rank): top-``k`` of the final
    beam, rank 1 = nearest. Capability parity: reference repo stores
    flat rows only (`daily_weather_etl_kenya.py` has no vector path);
    this is part of the §2.8 training-data extension surface.
    """
    import math

    from pyspark.storagelevel import StorageLevel

    # ``cent``/``assigned`` are creation-time index state — a SERVING
    # caller (st24) passes the stored codebook and the (possibly
    # partition-pruned) stored assignment instead of recomputing
    # either from the corpus
    if cent is None:
        if n_centroids is None:
            n_centroids = max(1, math.ceil(math.sqrt(corpus.count())))
        cent = _ivf_codebook(corpus, id_col, vec_col, n_centroids)
    # entry: the query's single nearest cell (n_probe=1 — identical
    # ordering to assignment, so a corpus-member query enters via its
    # own cell), scored exactly and cut to the initial beam
    probes = _ivf_probes(queries, cent, query_id_col, vec_col, 1)
    if assigned is None:
        assigned = _ivf_assign(corpus, cent, id_col, vec_col)
    qframe = (
        probes.select("query_id", "qvec")
        .withColumn("qnrm", norm(F.col("qvec")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    entry_scored = (
        assigned.withColumn("cnrm", norm(F.col("cvec")))
        .join(F.broadcast(probes.withColumn("qnrm", norm(F.col("qvec")))), "cell")
        .withColumn(
            "sim",
            cosine_given_norms(
                F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    beam_df = (
        entry_scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= beam)
        .select("query_id", F.col("vec_id").alias("node"), "sim")
    )
    # referenced once per hop (edges) / per rescore (vectors) — persist
    # lazily so the upstream graph build and corpus scan run once.
    # ``cframe`` (node, cvec, cnrm) is creation-time index state — the
    # vector table WITH norms is part of what a deployed graph index
    # stores (the DiskANN layout); a serving caller (st24) passes it
    # once instead of re-deriving and re-persisting it per query batch.
    graph = graph.persist(StorageLevel.MEMORY_AND_DISK)
    if cframe is None:
        cframe = (
            corpus.select(
                F.col(id_col).alias("node"),
                to_double_array(F.col(vec_col)).alias("cvec"),
            )
            .withColumn("cnrm", norm(F.col("cvec")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    for _hop in range(hops):
        # beam is Q·beam rows — ALWAYS the broadcast side; the edge
        # list and vector table are the big, possibly-pruned sides
        expanded = graph.join(
            F.broadcast(beam_df.select("query_id", F.col("node").alias("src_id"))),
            "src_id",
        ).select("query_id", F.col("nbr_id").alias("node"))
        cand = beam_df.select("query_id", "node").union(expanded).distinct()
        scored = (
            cframe.join(F.broadcast(cand), "node")
            .join(F.broadcast(qframe), "query_id")
            .withColumn(
                "sim",
                cosine_given_norms(
                    F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
                ),
            )
        )
        w_h = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("node").asc()
        )
        beam_df = (
            scored.withColumn("rn", F.row_number().over(w_h))
            .filter(F.col("rn") <= beam)
            .select("query_id", "node", "sim")
        )
        if truncate_lineage:
            # per-hop cut: keeps the next round's plan rooted at a
            # Q·beam frame instead of re-deriving every prior hop
            # (each hop references its predecessor twice). Off only
            # for plan inspection — the hop joins are invisible
            # behind the checkpoint scan.
            beam_df = beam_df.localCheckpoint(eager=False)
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("node").asc()
    )
    return (
        beam_df.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("node").alias("vec_id"),
            F.round(F.col("sim"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def hierarchical_ivf_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    n_super: int | None = None,
) -> DataFrame:
    """TWO-LEVEL (hierarchical) IVF assignment — the next scale rung
    above the flat ceil(√N) codebook (SURVEY §9's x40c note): flat
    assignment costs N·√N centroid comparisons, which at 10⁹+ vectors
    is the dominant index-build term. Here the √N centroids are
    themselves clustered under ceil(N^¼) SUPER-centroids; a vector
    first picks its super-cell (N·N^¼ work), then compares only
    against the ~√N/N^¼ centroids inside it — total ≈ 2·N^¾·N^¼-ish
    comparisons ≈ N^1.25 vs flat N^1.5, the standard coarse-to-fine
    trade (approximate: the nearest centroid can sit in a different
    super-cell; x94 MEASURES that agreement instead of assuming it).

    Both codebooks follow the deterministic first-rows policy
    (oracle-replayable); n_super defaults to ceil(√√N) via two IEEE
    sqrts — identical on every engine, unlike pow(x, 0.25). All joins
    broadcast bounded codebook/metadata frames (≤ √N rows); the only
    corpus-sized frames are the two rank-1 windows.

    Returns (vec_id, super_id, cell): the chosen super-cell and the
    final (approximate) cell.
    """
    import math

    if n_centroids is None:
        n_centroids = max(1, math.ceil(math.sqrt(corpus.count())))
    if n_super is None:
        n_super = max(1, math.ceil(math.sqrt(math.sqrt(corpus.count()))))
    cent = _ivf_codebook(corpus, id_col, vec_col, n_centroids)
    sup = cent.filter(F.col("centroid_id") < n_super).select(
        F.col("centroid_id").alias("super_id"),
        F.col("cent_vec").alias("super_vec"),
    )
    # level-0 metadata: each centroid's super-cell (√N × N^¼ rows,
    # computed once — at scale this lives with the codebook artifact)
    w_cs = Window.partitionBy("centroid_id").orderBy(
        F.col("s_sim").desc(), F.col("super_id").asc()
    )
    cent_super = (
        cent.join(F.broadcast(sup))
        .withColumn("s_sim", cosine(F.col("cent_vec"), F.col("super_vec")))
        .withColumn("rn", F.row_number().over(w_cs))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "cent_vec", "super_id")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        to_double_array(F.col(vec_col)).alias("cvec"),
    )
    w_vs = Window.partitionBy("vec_id").orderBy(
        F.col("s_sim").desc(), F.col("super_id").asc()
    )
    vec_super = (
        c.join(F.broadcast(sup))
        .withColumn("s_sim", cosine(F.col("cvec"), F.col("super_vec")))
        .withColumn("rn", F.row_number().over(w_vs))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cvec", "super_id")
    )
    w_vc = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        vec_super.join(F.broadcast(cent_super), "super_id")
        .withColumn("c_sim", cosine(F.col("cvec"), F.col("cent_vec")))
        .withColumn("rn", F.row_number().over(w_vc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "super_id", F.col("centroid_id").alias("cell"))
    )


def cosine_topk_ivf_adaptive(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    min_candidates: int = 64,
) -> DataFrame:
    """Multi-probe IVF with a PER-QUERY learned probe count — the
    "n_probe is the wrong knob" refinement: a fixed cell count
    under-probes queries whose nearest cells are small (recall loss)
    and over-probes queries whose nearest cell is huge (wasted rerank).
    The budget that actually prices a query is CANDIDATES, so each
    query probes its cells in decreasing centroid-similarity order and
    stops at the smallest prefix whose cumulative member count reaches
    ``min_candidates`` — skewed cells cost fewer probes, sparse regions
    automatically fan wider.

    Plan shape: cell sizes are one tiny aggregate (≤ n_centroids rows)
    broadcast with the codebook; the prefix rule is a running-sum
    window over ≤ n_centroids rows per query — pure metadata. The
    rerank stays exact within probed cells, and every step (sizes,
    running sum, prefix cut) is plain SQL, so the oracle replays the
    probe decision bit-identically. At 100 TB this composes with the
    x5f physical layout: the adaptive cell list is still bounded
    driver-side metadata for partition-pruned reads."""
    from pyspark.storagelevel import StorageLevel

    cent = _ivf_codebook(corpus, id_col, vec_col, n_centroids)
    # assigned feeds BOTH the size profile and the rerank: persist (NOT
    # an eager localCheckpoint — that would run cluster jobs at plan-
    # BUILD time and leak blocks the ContextCleaner can't reclaim while
    # references live; persisted RDDs are lazily materialized on first
    # action and auto-unpersisted once the frame is GC'd)
    assigned = _ivf_assign(corpus, cent, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_n"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qvec"),
    )
    ranked = (
        q.join(F.broadcast(cent))
        .withColumn("cent_sim", cosine(F.col("qvec"), F.col("cent_vec")))
        .join(F.broadcast(sizes), F.col("centroid_id") == F.col("cell"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cent_sim").desc(), F.col("centroid_id").asc()
    )
    cum_before = F.coalesce(
        F.sum("cell_n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    probes = (
        ranked.withColumn("cum_before", cum_before)
        .filter(F.col("cum_before") < min_candidates)
        .select("query_id", "qvec", "cell")
    )
    return _ivf_rerank(assigned, probes, k)


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 2,
    n_sub: int = 8,
    n_codes: int = 4,
    shortlist: int = 32,
) -> DataFrame:
    """Full IVF-PQ search — the Faiss-default ANN pipeline composed
    from this repo's pieces (x5d's coarse cells + x44's product
    quantization) the way a 100 TB vector store actually runs:

    1. coarse IVF: corpus → nearest of ``n_centroids`` cells; each
       query probes its ``n_probe`` nearest cells (x5d machinery);
    2. PQ encode: every vector's ``n_sub`` subvectors → nearest of
       ``n_codes`` per-subspace centroids. The candidate scan then
       reads CODES (n_sub small ints per vector), not raw vectors —
       the 32× memory axis that makes the in-cell scan cache-resident;
    3. ADC: per query one (n_sub × n_codes)-row lookup table of
       query-subvector↔centroid squared distances broadcasts; a
       candidate's approximate distance is a pure table-sum over its
       codes — no per-pair float math on the scan;
    4. exact rerank: only the ADC-``shortlist`` per query touches raw
       vectors for the true cosine top-k.

    Determinism: PQ/ADC arithmetic runs on the int64 micro-grid
    (floor(x·1e6+0.5)) so distances, argmins and the shortlist are
    exact integer results — reduction-order-free, bit-identical in the
    DuckDB oracle; the rerank reuses the 6dp-rounded cosine. Shapes:
    two broadcasts (codebooks, ADC table), one partial-agg sum keyed by
    (query, vec) over codes, one ≤shortlist-per-query rerank."""
    width = len(corpus.select(vec_col).first()[0])
    if width % n_sub != 0:
        # sub_len would floor and the trailing width % n_sub coordinates
        # would be SILENTLY excluded from codes and ADC distances
        raise ValueError(
            f"PQ requires n_sub to divide the vector width: width={width}, "
            f"n_sub={n_sub}"
        )
    from pyspark.storagelevel import StorageLevel

    cent = _ivf_codebook(corpus, id_col, vec_col, n_centroids)
    # persist, not eager localCheckpoint — same build-time-job/leak
    # rationale as cosine_topk_ivf_adaptive above
    assigned = _ivf_assign(corpus, cent, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    probes = _ivf_probes(queries, cent, query_id_col, vec_col, n_probe)

    # integer micro-grid views (the x44 quantization)
    grid = "transform({src}, x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0+0.5) AS BIGINT))"
    qgrid = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.expr(grid.format(src=vec_col)).alias("qv"),
    )
    dim_arr = F.size(F.col("qv"))
    sub_len = (dim_arr / n_sub).cast("int")
    # per-subspace PQ codebooks: slices of the first n_codes vectors
    cent_sub = (
        qgrid.filter(F.col("vec_id") < n_codes)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
            "qv",
            sub_len.alias("sl"),
        )
        .select(
            "cid", "m", F.expr("slice(qv, m*sl+1, sl)").alias("cv")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sq_d2 = F.expr(
        "aggregate(zip_with(dv, cv, (a,b) -> (a-b)*(a-b)), "
        "CAST(0 AS BIGINT), (acc,x) -> acc + x)"
    )
    # corpus PQ codes: argmin centroid per (vec, subspace)
    codes = (
        qgrid.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
            "qv",
            sub_len.alias("sl"),
        )
        .select("vec_id", "m", F.expr("slice(qv, m*sl+1, sl)").alias("dv"))
        .join(F.broadcast(cent_sub), "m")
        .select("vec_id", "m", "cid", sq_d2.alias("d2"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "cid")).alias("s"))
        .select("vec_id", "m", F.col("s.cid").alias("code"))
    )
    # ADC lookup table: query-subvector ↔ PQ-centroid squared distances
    qsub = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.expr(grid.format(src=vec_col)).alias("qv"),
        )
        .select(
            "query_id",
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
            "qv",
            sub_len.alias("sl"),
        )
        .select("query_id", "m", F.expr("slice(qv, m*sl+1, sl)").alias("dv"))
    )
    adc = (
        qsub.join(F.broadcast(cent_sub), "m")
        .select("query_id", "m", F.col("cid").alias("code"), sq_d2.alias("adc_d2"))
    )
    # candidates: probed cells only; approx distance = Σ table[m, code]
    cand = probes.select("query_id", "cell").join(
        assigned.select("vec_id", "cell"), "cell"
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(adc), ["query_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("adc_d2").alias("adc"))
    )
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    short = (
        scored.withColumn("r", F.row_number().over(w_r))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "vec_id")
    )
    # exact rerank of the shortlist only
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qvec"),
    ).withColumn("qnrm", norm(F.col("qvec")))
    rer = (
        short.join(assigned.select("vec_id", "cvec"), "vec_id")
        .withColumn("cnrm", norm(F.col("cvec")))
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "sim_full",
            cosine_given_norms(
                F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
            ),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("vec_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_topk_ivf_partitioned(
    corpus: DataFrame,
    queries: DataFrame,
    layout_path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """The 100 TB half of the IVF story made physical: the cell
    assignment happens ONCE at ingest — the corpus is written
    ``partitionBy("cell")`` — and a probe becomes a PARTITION-PRUNED
    read: the scan lists and reads only the probed cells' directories
    (n_probe/n_centroids of the data), no join needed to skip the
    rest. The probed cell set is bounded (≤ |queries|·n_probe values),
    so resolving it driver-side is metadata, not data. Same codebook /
    probe / rerank stages as :func:`cosine_topk_ivf`, so both physical
    strategies return identical rows — and share one oracle."""
    cent = _ivf_codebook(corpus, id_col, vec_col, n_centroids)
    _ivf_assign(corpus, cent, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(layout_path)
    probes = _ivf_probes(queries, cent, query_id_col, vec_col, n_probe)
    cells = [r[0] for r in probes.select("cell").distinct().collect()]
    layout = (
        corpus.sparkSession.read.parquet(layout_path)
        .filter(F.col("cell").isin(cells))
        .select("vec_id", "cvec", F.col("cell").cast("long").alias("cell"))
    )
    return _ivf_rerank(layout, probes, k)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_bits: int = 4,
    dim: int = 64,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: join only within matching sign-LSH buckets.

    Recall < 1.0 by design. ``multi_probe`` additionally probes every
    bucket at Hamming distance 1 from the query's (flip each of the
    ``n_bits`` sign bits) — the standard multi-probe LSH recall lever:
    a near-neighbor that lands just across ONE hyperplane is recovered
    at (n_bits+1)× candidate cost. The explosion happens on the QUERY
    side only, which is broadcast and tiny; the corpus keeps exactly
    one bucket per vector, so each (query, candidate) pair still forms
    at most once and no dedup is needed. Measured: recall 0.29 → 0.49
    at sf0.01 (vs exact x5) for n_bits=4; the remaining gap is vectors
    ≥2 planes away — x5d's IVF path is the high-recall option (0.89+).
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), to_double_array(F.col(vec_col)).alias("cvec")
    ).withColumn("bucket", sign_bucket(F.col("cvec"), n_bits, dim)).withColumn(
        "cnrm", norm(F.col("cvec"))
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qvec"),
    ).withColumn("bucket", sign_bucket(F.col("qvec"), n_bits, dim)).withColumn(
        "qnrm", norm(F.col("qvec"))
    )
    if multi_probe:
        q = q.withColumn(
            "bucket",
            F.explode(
                F.expr(
                    "array_union(array(bucket), "
                    f"transform(sequence(0, {n_bits - 1}), "
                    "i -> bucket ^ shiftleft(1, i)))"
                )
            ),
        )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "sim_full",
        cosine_given_norms(
            F.col("cvec"), F.col("qvec"), F.col("cnrm"), F.col("qnrm")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_full"), 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def lloyd_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd assignment: nearest centroid per vector.

    ``emb`` carries (vec_id, v: array<double>), ``cents`` (cid, cv).
    Broadcasts the K-row centroid table against the corpus; squared-L2
    is one zip_with/aggregate fold (JVM codegen); argmin is
    min(struct(d2, cid)) under a single vec_id shuffle — the canonical
    N×K broadcast-assign shape (centroids never grow with the corpus).
    """
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("d2", d2)
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"))
    )


def lloyd_trained_centroids(
    emb: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """K-means centroids after ``iters`` Lloyd iterations from the
    deterministic seeds (K lowest-vec_id vectors) — the trained-centroid
    upgrade over first-K-by-id seeding (SemDeDup / IVF coarse training).

    Engine-portable by construction: the update step QUANTIZES each
    coordinate to an integer micro-grid (floor(x·1e6 + 0.5)) before
    summing, so the per-cluster sums are exact int64 arithmetic —
    independent of partition/accumulation order — and the new centroid
    coordinate is one double division of identical integers on any
    engine. A float sum here would differ across engines/partitionings
    in the last ulp and could flip boundary assignments; the integer
    grid removes that knife-edge entirely (≈1e-7 max quantization error
    per coordinate, irrelevant to cluster geometry).

    Scale shape: per iteration, one broadcast-assign (N×K), one
    posexplode shuffle on (cid, pos) carrying N×dim rows of
    (int64, int64) — the standard distributed k-means update. The K-row
    centroid table is localCheckpoint-ed each round so the plan stays
    flat across iterations.
    """
    # (r11 note: fanning + checkpointing the trainer input here was
    # measured again — with the materialization this time — and still
    # nets out negative at sf0.1: the extra shuffle+checkpoint jobs
    # cost about what the parallelized 1-task assigns save, and the
    # small-k callers regress ~0.5 s. On a cluster the corpus arrives
    # multi-split, so the single-task case is a local-fixture artifact.)
    cents = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        members = lloyd_assign(emb, cents).join(emb, "vec_id")
        upd = (
            members.select("cid", F.posexplode("v").alias("pos", "x"))
            .withColumn(
                "q", F.expr("CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)")
            )
            .groupBy("cid", "pos")
            .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n"))
            .withColumn(
                "val",
                F.col("sq").cast("double") / F.col("n") / F.lit(1000000.0),
            )
        )
        cents = (
            upd.groupBy("cid")
            .agg(F.collect_list(F.struct("pos", "val")).alias("pv"))
            .select(
                "cid",
                F.transform(
                    F.array_sort("pv"), lambda s: s["val"]
                ).alias("cv"),
            )
            .localCheckpoint(eager=True)
        )
    return cents


def maxsim_topk(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int = 5,
    cand_pairs: DataFrame | None = None,
) -> DataFrame:
    """MULTI-VECTOR late-interaction retrieval (ColBERT's MaxSim): a
    document is a BAG of vectors (token/patch embeddings), a query is
    a bag too, and the relevance of doc D to query Q is
    ``Σ_{q ∈ Q} max_{d ∈ D} cos(q, d)`` — each query vector grabs its
    single best match inside the document, and the per-query-vector
    maxima add up. This is the retrieval family single-vector cosine
    (x5) cannot express: a doc that matches EVERY query token somewhere
    beats a doc that matches one token perfectly.

    Inputs: ``doc_vecs`` (doc_id, vec_id, v: array<double>),
    ``query_vecs`` (query_doc, qvid, qv). Returns the top-``k``
    candidate docs per query doc (self-matches excluded):
    (query_doc, cand_doc, maxsim, rank).

    Engine-portable scoring: each per-query-vector max cosine is
    quantized to the integer micro-grid (floor(m·1e6 + 0.5) as int64)
    BEFORE the sum, so the doc score is an exact integer sum — no
    float-accumulation-order sensitivity across partitionings/engines
    (the a22/lloyd quantization discipline) — divided once at the end.

    Scale shape: the query bag (Q·|Q-vectors| rows — a serving batch)
    is the BROADCAST side; the corpus vector table streams through one
    scan. The (query_doc, qvid, cand_doc) max and the (query_doc,
    cand_doc) sum both partial-aggregate map-side before one shuffle
    keyed by query; nothing is ever corpus × corpus. At 10⁹+ corpus
    vectors, compose with the IVF layout exactly like x5d: per query
    vector, probe its cells for candidate doc ids, then run this exact
    MaxSim only over the candidate union — the scoring law (and this
    function, fed the pruned doc_vecs) is unchanged.

    ``cand_pairs`` is that composition's hook (x110b): a
    (query_doc, cand_doc) frame — typically IVF-probed, deterministic
    — restricting WHICH docs each query scores. Candidate docs are
    re-scored against their FULL bags (prune docs, score exactly); the
    scoring join becomes cand_doc-keyed (rows = Σ_pairs |doc bag|)
    instead of corpus-wide.
    """
    from pyspark.storagelevel import StorageLevel

    q = (
        query_vecs.select("query_doc", "qvid", "qv")
        .withColumn("qnrm", norm(F.col("qv")))
    )
    c = doc_vecs.select(
        F.col("doc_id").alias("cand_doc"), "vec_id", "v"
    ).withColumn("cnrm", norm(F.col("v")))
    if cand_pairs is not None:
        # candidate-keyed gate first, then the per-pair query bag join:
        # only candidate docs' vectors ever meet a query vector
        c = c.join(
            cand_pairs.select("query_doc", "cand_doc"), "cand_doc"
        )
        scored_src = c.join(
            F.broadcast(q.withColumnRenamed("query_doc", "qd")),
            (F.col("qd") == F.col("query_doc"))
            & (F.col("cand_doc") != F.col("query_doc")),
        ).drop("qd")
    else:
        scored_src = c.join(
            F.broadcast(q), F.col("cand_doc") != F.col("query_doc")
        )
    per_qvec = (
        scored_src
        .withColumn(
            "cos",
            cosine_given_norms(
                F.col("v"), F.col("qv"), F.col("cnrm"), F.col("qnrm")
            ),
        )
        .groupBy("query_doc", "qvid", "cand_doc")
        .agg(F.max("cos").alias("mx"))
        # integer micro-grid BEFORE the cross-vector sum: exact int64
        # accumulation, order-free on any engine
        .withColumn(
            "mq", F.expr("CAST(floor(mx * 1000000.0 + 0.5) AS BIGINT)")
        )
    )
    scores = per_qvec.groupBy("query_doc", "cand_doc").agg(
        F.sum("mq").alias("smq")
    )
    w = Window.partitionBy("query_doc").orderBy(
        F.col("smq").desc(), F.col("cand_doc").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_doc",
            "cand_doc",
            (F.col("smq").cast("double") / F.lit(1000000.0)).alias("maxsim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
