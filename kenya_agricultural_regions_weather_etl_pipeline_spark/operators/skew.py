"""Skew mitigation: salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the deterministic fallback when one join
key dominates so heavily that even split partitions overwhelm a task
(the classic hot-key problem at 100 TB).

Shape: the large/skewed side gets a deterministic salt in [0, n_salt)
derived from a high-cardinality column; the smaller side is replicated
n_salt times; the join key becomes (key, salt). Result set is IDENTICAL
to the unsalted join — which is exactly what the DuckDB oracle checks —
but the shuffle spreads each hot key over n_salt reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: Column,
    small_key: Column,
    salt_source: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large ⋈ small`` on equal keys with an ``n_salt``-way salt.

    ``salt_source`` must be a deterministic high-cardinality expression
    on the large side (e.g. a line number or a hash of the row id) so
    rows of one hot key spread evenly. The small side is exploded
    ``n_salt``× — keep it the genuinely smaller relation.
    """
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salt)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_large.join(
        salted_small,
        (large_key == small_key) & (salted_large["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")


def key_skew_profile(
    df: DataFrame, key: Column, hot_factor: int = 2
) -> DataFrame:
    """Pre-join skew AUDIT — the measurement that decides whether a
    join key needs mitigation at all (AQE's runtime split handles
    moderate skew; :func:`salted_join` is the deterministic fallback
    for a dominating hot key). Reduces the per-key histogram to the
    numbers that drive that decision: ``hotspot_factor`` (max key
    count over perfect balance — the straggler-task multiplier a
    shuffle on this key buys) and ``n_hot_keys`` (keys holding more
    than ``hot_factor``× their fair share — each a salting candidate).

    Shape: one key-grouped count (the only corpus-sized shuffle), then
    metadata-sized aggregates; the hot-key test multiplies integers
    (``cnt·n_keys > hot_factor·n_rows``) so no float threshold can
    disagree across engines, and the two derived ratios are emitted
    half-up at 6dp. The 1-row frames compose by broadcast cross-join
    (the scalar-broadcast pattern — no shuffle, no collect).

    Returns one row: (n_rows, n_keys, max_cnt, mean_cnt,
    hotspot_factor, n_hot_keys, top_key).
    """
    from ..functions.weather import round_half_up

    counts = df.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    n_hot = (
        counts.join(F.broadcast(totals))
        .filter(
            F.col("cnt") * F.col("n_keys")
            > F.lit(hot_factor) * F.col("n_rows")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hot_keys"))
    )
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("k").asc())
        .limit(1)
        .select(F.col("k").alias("top_key"))
    )
    return (
        totals.join(F.broadcast(n_hot))
        .join(F.broadcast(top))
        .select(
            "n_rows",
            "n_keys",
            "max_cnt",
            round_half_up(
                F.col("n_rows").cast("double") / F.col("n_keys"), 6
            ).alias("mean_cnt"),
            round_half_up(
                F.col("max_cnt").cast("double")
                * F.col("n_keys")
                / F.col("n_rows"),
                6,
            ).alias("hotspot_factor"),
            "n_hot_keys",
            "top_key",
        )
    )
