"""Deterministic dataset splitting / sampling for training pipelines.

Train/val/test assignment must be a PURE FUNCTION of content, not of
partitioning, row order, or an RNG seed — otherwise re-sharding the
corpus moves documents across splits (leakage). We bucket on the md5 of
the content key: md5 is bit-identical in every engine (the DuckDB
oracle reproduces the exact assignment), and the first 4 hex digits
give a uniform 16-bit bucket, plenty for per-mille split fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MILLE = 1000


def split_bucket(key: Column) -> Column:
    """Uniform bucket in [0, 1000) from the md5 of ``key``."""
    return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int") % MILLE


def split_bucket_sql(key: str) -> str:
    """DuckDB twin of :func:`split_bucket`."""
    return f"(('0x' || substr(md5({key}), 1, 4))::INT % {MILLE})"


def hash_split(
    df: DataFrame, key: Column, fractions: dict[str, float]
) -> DataFrame:
    """Attach a ``split`` column assigning each row to a named split.

    ``fractions`` maps split name → fraction; must sum to 1.0. Rows land
    by cumulative per-mille thresholds over the md5 bucket, so the
    assignment is stable across engines, runs, and re-partitioning.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = split_bucket(key)
    expr = None
    acc = 0
    for name, frac in fractions.items():
        acc += round(frac * MILLE)
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(list(fractions)[-1]))
