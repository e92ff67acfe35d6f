"""As-of (most-recent-prior) join — the time-series lookup Spark has no
built-in operator for.

Semantics: for every left row, attach the greatest right-side event time
``ts <= left.ts`` within the same key (DuckDB ``ASOF JOIN`` semantics).

Spark-first design: NOT a per-row correlated lookup (quadratic) and NOT
a range cross-join. Union the two sides tagged, sort once per key, and
forward-fill the right timestamp with ``last(ignorenulls)`` over an
unbounded-preceding window — ONE shuffle on the key, linear work,
skew-safe under AQE. This is the standard distributed as-of shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    tol_seconds: int,
    out_col: str = "n_in_range",
) -> DataFrame:
    """Count right-side events within ±``tol_seconds`` of each left row,
    per key — a range join WITHOUT the O(n·m) theta join.

    Banding: bucket both sides by ``floor(epoch / tol)``; any pair
    within tolerance differs by at most one bucket, so the right side
    explodes into its 3-bucket neighborhood and the join is a plain
    equi-join on (key, bucket) + an exact |Δt| filter. Shuffle is keyed
    by (key, bucket) — linear, skew handled by AQE. (Same shape as the
    LSH band joins; this is how interval joins survive 100 TB.)
    """
    lb = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(tol_seconds))
    l_b = left.withColumn("__b", lb)
    r_b = right.select(
        key, F.col(ts_col).alias("__rts"), lb.alias("__rb")
    ).withColumn("__b", F.explode(F.array(F.col("__rb") - 1, F.col("__rb"), F.col("__rb") + 1)))
    joined = l_b.join(r_b.drop("__rb"), [key, "__b"], "left").withColumn(
        "__hit",
        (
            F.abs(
                F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.col("__rts"))
            )
            <= tol_seconds
        ).cast("int"),
    )
    group_cols = [c for c in left.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias(out_col))
    )


def asof_join_ts(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    out_col: str = "asof_ts",
) -> DataFrame:
    """Attach to each left row the max right ``ts_col`` <= its own, per key.

    ``left`` and ``right`` need columns (key, ts_col); extra left columns
    pass through. Right rows at the same timestamp as a left row DO
    match (<= semantics, like DuckDB ASOF JOIN's >=).
    """
    l_tag = left.withColumn("__src", F.lit(1)).withColumn(
        "__rts", F.lit(None).cast(left.schema[ts_col].dataType)
    )
    r_tag = (
        right.select(key, ts_col)
        .distinct()
        .withColumn("__src", F.lit(0))
        .withColumn("__rts", F.col(ts_col))
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort BEFORE left rows at the same ts (src 0 < 1), so a
    # same-timestamp right event is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(out_col, F.last("__rts", ignorenulls=True).over(w))
    return filled.filter(F.col("__src") == 1).drop("__src", "__rts")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    start_col: str = "s",
    end_col: str = "e",
    band: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join (the two-sided generalization of
    the point-in-range j2): emit every (a, b) pair sharing a key whose
    [s, e] intervals overlap, WITHOUT a theta join.

    Each interval explodes into the coarse ``band``s it covers; pairs
    equi-join on (key, band) plus the exact overlap predicate. A pair
    overlapping across several shared bands would duplicate, so it is
    emitted ONLY in the band containing the overlap's START
    (floor(max(s_a, s_b) / band)) — the classic dedup-free banding
    trick: no distinct, no second shuffle. Cost scales with
    Σ intervals×bands_covered, not |A|×|B|; band width trades explode
    fan-out against candidates per bucket, exactly like j2.

    Inputs need (key, start_col, end_col, id); output carries both ids,
    the key, and the overlap length.
    """
    def banded(df, side):
        return df.select(
            F.col(key),
            F.col("id").alias(f"{side}_id"),
            F.col(start_col).alias(f"{side}_s"),
            F.col(end_col).alias(f"{side}_e"),
        ).withColumn(
            # integer `div`, not floor(x/double): double division loses
            # integer precision past 2^53 (e.g. raw ts_ns inputs) and
            # would misbucket bands / the overlap-start dedup filter.
            # `div` truncates toward zero, which differs from floor for
            # negatives, but it is monotone and used IDENTICALLY in all
            # three banding sites, so bucketing stays consistent for the
            # full integer range.
            "band",
            F.explode(
                F.sequence(
                    F.expr(f"{side}_s div {band}"),
                    F.expr(f"{side}_e div {band}"),
                )
            ),
        )

    aa, bb = banded(a, "a"), banded(b, "b")
    return (
        aa.join(bb, [key, "band"])
        .filter(
            (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            & (F.col("band") == F.expr(f"greatest(a_s, b_s) div {band}"))
        )
        .select(
            key,
            "a_id",
            "b_id",
            (
                F.least(F.col("a_e"), F.col("b_e"))
                - F.greatest(F.col("a_s"), F.col("b_s"))
            ).alias("overlap"),
        )
    )
