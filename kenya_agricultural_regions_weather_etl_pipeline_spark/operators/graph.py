"""Distributed graph analytics over edge-list DataFrames.

Companions to the dedup module's connected components: centrality-style
iterative algorithms whose per-round shape is one int-keyed shuffle
join + one hash aggregation — the only pattern that survives 10⁹+
edges. Float-order nondeterminism (the classic reason iterative graph
results differ run-to-run) is eliminated the same way the Lloyd
trainer does it: every per-edge contribution is quantized to an int64
micro-grid BEFORE the sum, so the aggregate is exact integer
arithmetic — order-independent, bit-identical across engines — and
only the final per-node expression returns to doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# contributions are summed on a 1e-12 grid: r/deg ≤ 1 so the scaled
# value stays < 2^53 (exact in double) and the int64 sum of ≤ 10⁹
# quantized terms stays < 2^63
PAGERANK_QUANT = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "id",
) -> DataFrame:
    """Static PageRank (GraphX ``staticPageRank`` semantics: fixed
    iteration count, no dangling-mass redistribution) over a directed
    edge list ``(src, dst)``.

    Per iteration: each node sends r/outdeg along its out-edges
    (outdeg joined into the edge list ONCE before the loop), the
    receiving side sums the micro-grid-quantized contributions (one
    hash shuffle keyed by dst — partial aggregation collapses
    per-partition duplicates first), and every node — including
    isolated ones, via the left join against the node list — becomes
    ``0.15/N + 0.85·(Σq/Q)``. The loop unrolls into one lazy plan
    (fine for the small fixed iteration counts centrality ranking
    uses; a convergence-driven variant would checkpoint each round).

    N comes from one driver-side count() — the same metadata-cheap
    scalar the SemDeDup k-policy uses. Returns (node_col, rank) with
    rank rounded half-up to 12 dp, replayable exactly in SQL.
    """
    from ..functions.weather import round_half_up

    from pyspark.storagelevel import StorageLevel

    n_nodes = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # ej is re-joined every iteration; without a persist the WHOLE edge
    # derivation upstream (for x90: the kNN-graph build) re-executes
    # once per round. Lazy persist (not an eager localCheckpoint — r3
    # block-leak discipline): materialized on the first action, GC'd
    # with the frame.
    ej = (
        edges.join(deg, "src")
        .select("src", "dst", "deg")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    r = nodes.select(
        F.col(node_col).alias("id"), F.lit(1.0 / n_nodes).alias("r")
    )
    base = F.lit(0.15 / n_nodes)
    for _ in range(iterations):
        contrib = ej.join(r, ej.src == r.id).select(
            F.col("dst").alias("id"),
            F.floor(F.col("r") / F.col("deg") * PAGERANK_QUANT + F.lit(0.5))
            .cast("long")
            .alias("q"),
        )
        sums = contrib.groupBy("id").agg(F.sum("q").alias("qsum"))
        r = nodes.select(F.col(node_col).alias("id")).join(
            sums, "id", "left"
        ).select(
            "id",
            (
                base
                + F.lit(damping)
                * (
                    F.coalesce(F.col("qsum"), F.lit(0)).cast("double")
                    / F.lit(float(PAGERANK_QUANT))
                )
            ).alias("r"),
        )
    return r.select(
        F.col("id").alias(node_col), round_half_up(F.col("r"), 12).alias("rank")
    )
