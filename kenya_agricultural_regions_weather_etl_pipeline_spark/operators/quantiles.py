"""Exact distributed weighted-quantile machinery (a23/a24/st36's
shared core): bucket-histogram prefix sums + a within-bucket running
window + the integer crossing rule — never a global sort, never a
buffering percentile aggregate.

All weights are integral (cast BIGINT by callers), so every cumulative
sum is exact integer arithmetic and the crossing row —
``cum_w >= W_p AND cum_w - w < W_p`` — is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_cumulative_ranks(
    df: DataFrame,
    group_cols: list[str],
    tiebreak_cols: list[str],
    bucket_width: float = 100.0,
) -> DataFrame:
    """Annotate ``df`` (…group_cols, value, w, tiebreak…) with
    ``bucket`` and the exact cumulative weight ``cum_w`` in
    (value, tiebreak…) order within each group.

    Shape (the a22/a23 two-pass law): rows histogram into
    value//bucket_width buckets (monotone in the order key);
    per-(group, bucket) WEIGHT totals prefix-sum on the bucket-sized
    frame (broadcast back); each row adds a running within-(group,
    bucket) window sum over the full-column tiebreak order — so state
    per task is one bucket of one group, and both engines walk the
    identical order."""
    b = df.withColumn(
        "bucket", F.floor(F.col("value") / F.lit(bucket_width))
    )
    btot = b.groupBy(*group_cols, "bucket").agg(
        F.sum("w").cast("long").alias("bw")
    )
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
        if group_cols
        else Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    prefix = btot.select(
        *group_cols,
        "bucket",
        F.coalesce(F.sum("bw").over(wb), F.lit(0)).alias("pre"),
    )
    wd = (
        Window.partitionBy(*group_cols, "bucket")
        .orderBy(
            F.col("value").asc(),
            *[F.col(c).asc() for c in tiebreak_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return b.join(
        F.broadcast(prefix), [*group_cols, "bucket"]
    ).withColumn("cum_w", F.col("pre") + F.sum("w").over(wd))


def crossing_rows(ranked: DataFrame, targets: DataFrame, on: list[str]) -> DataFrame:
    """Join the ranked frame to the broadcast per-target frame
    (columns ``wk`` + ``on`` keys) and keep the crossing row:
    cum_w >= wk AND cum_w - w < wk."""
    cond = (F.col("cum_w") >= F.col("wk")) & (
        F.col("cum_w") - F.col("w") < F.col("wk")
    )
    if on:
        j = ranked.join(F.broadcast(targets), on).filter(cond)
    else:
        j = ranked.join(F.broadcast(targets), cond)
    return j
