"""Top-k / ranking operators (extension relational surface).

The reference has no sorts or limits (SURVEY.md §2.4 note); the
extension surface needs grouped top-k (similarity search, leaderboards).

Scale notes: `row_number + filter` compiles to a WindowExec after a
hash shuffle on the group key; Spark inserts a rank-limit pushdown
(WindowGroupLimit) so each partition keeps only k rows pre-shuffle —
the right plan at 100 TB. Global top-k uses sort+limit, which Spark
executes as TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """k best rows per group under ``order_by`` (deterministic: include a
    unique tiebreaker in order_by)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_global(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (heap per partition, merge on driver)."""
    return df.orderBy(*order_by).limit(k)


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries → candidate item set.

    Classic mergeable-summary fold (Agarwal et al., "Mergeable Summaries",
    PODS'12): each Arrow batch is summarized exactly by ``value_counts``
    (vectorized — no per-row Python), then merged into the running
    k-counter state by adding counts, subtracting the (k+1)-th largest,
    and dropping non-positives. State is bounded by k items per
    partition regardless of input size.

    Guarantee (the reason the two-pass operator is EXACT): a partition's
    final summary keeps every item whose partition count exceeds
    n_p/(k+1). Any item with global count > N/(k+1) = Σ n_p/(k+1) must,
    by pigeonhole, exceed n_p/(k+1) in at least one partition — so the
    UNION of per-partition survivor sets is a superset of the true
    heavy hitters. Output is ≤ k·num_partitions rows (broadcastable).
    """
    import pandas as pd

    def mg(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > cut] - cut
        yield pd.DataFrame({col: counters.index.astype(str)})

    return items.mapInPandas(mg, schema=f"{col} string").distinct()


def heavy_hitters_exact(items: DataFrame, col: str, k: int) -> DataFrame:
    """Exact φ-heavy hitters (count > N/(k+1)) without a full-vocabulary
    shuffle: sketch-guided two-pass.

    Pass 1 runs Misra-Gries per partition (bounded state, no shuffle at
    all) to get a guaranteed-superset candidate set; pass 2 re-scans,
    semi-joins against the broadcast candidates, and counts ONLY those —
    partial aggregation collapses each partition to ≤ |candidates| rows
    before the single small shuffle. The long tail of the vocabulary
    (the part that explodes at 100 TB) never enters an Exchange; the
    only global state is the ≤ k·partitions candidate list. The final
    filter is integer cross-multiplied (cnt·(k+1) > N) — no division,
    engine-stable — and the result equals the straight GROUP BY/HAVING
    answer exactly, which is what the DuckDB oracle runs.
    """
    cands = misra_gries_candidates(items, col, k)
    total = items.agg(F.count(F.lit(1)).alias("_n"))
    return (
        items.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("_n"))
        .select(col, "cnt", F.col("_n").alias("total_items"))
    )
