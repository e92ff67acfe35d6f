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
