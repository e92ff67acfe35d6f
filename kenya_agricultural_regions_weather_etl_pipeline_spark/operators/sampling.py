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


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. rebalance languages).

    Keeps a row iff its content-hash bucket falls under the stratum's
    per-mille threshold — a pure map-side filter: NO shuffle, NO RNG
    state, and the sample is stable under re-partitioning (unlike
    ``DataFrame.sampleBy``, whose Bernoulli draw depends on row order
    within partitions). At 100 TB this composes with predicate pushdown:
    the filter sits directly on the scan.

    ``rates`` maps stratum value → keep fraction in [0, 1].
    """
    for name, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {rate}")
    bucket = split_bucket(key)
    threshold = None
    for name, rate in rates.items():
        cond = F.col(strata_col) == name
        mille = round(rate * MILLE)
        threshold = (
            F.when(cond, mille)
            if threshold is None
            else threshold.when(cond, mille)
        )
    threshold = threshold.otherwise(round(default_rate * MILLE))
    return df.filter(bucket < threshold)


def domain_mixture(
    df: DataFrame,
    key: Column,
    domain_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic domain up/down-weighting via epoch repetition.

    Pre-training mixtures repeat high-value domains fractionally (e.g.
    Wikipedia ×2.5, web crawl ×0.5). Each row gets
    ``n_copies = floor(w) + [bucket < frac_per_mille]`` — the fractional
    epoch is a content-hash draw, so the SAME documents repeat on every
    run and under any re-partitioning (an RNG would re-sample per run,
    breaking reproducible training corpora). Rows then explode into
    ``epoch`` copies 0..n_copies-1: a narrow map stage, no shuffle; at
    100 TB the output feeds straight into the pack/shard writer.
    """
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {w}")
    bucket = split_bucket(key)
    n_copies = None
    for name, w in weights.items():
        cond = F.col(domain_col) == name
        expr = F.lit(int(w)) + (bucket < round((w - int(w)) * MILLE)).cast("int")
        n_copies = F.when(cond, expr) if n_copies is None else n_copies.when(cond, expr)
    dw = default_weight
    default_expr = F.lit(int(dw)) + (bucket < round((dw - int(dw)) * MILLE)).cast("int")
    n_copies = (
        default_expr if n_copies is None else n_copies.otherwise(default_expr)
    )
    return (
        df.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1))
        )
        .drop("n_copies")
    )


def domain_mixture_sql_copies(
    key: str, domain_col: str, weights: dict[str, float], default_weight: float = 1.0
) -> str:
    """DuckDB twin of the per-row ``n_copies`` expression."""
    whens = " ".join(
        f"WHEN '{name}' THEN {int(w)} + (CASE WHEN {split_bucket_sql(key)} < "
        f"{round((w - int(w)) * MILLE)} THEN 1 ELSE 0 END)"
        for name, w in weights.items()
    )
    dw = default_weight
    default = (
        f"{int(dw)} + (CASE WHEN {split_bucket_sql(key)} < "
        f"{round((dw - int(dw)) * MILLE)} THEN 1 ELSE 0 END)"
    )
    return f"(CASE {domain_col} {whens} ELSE {default} END)"


def stratified_hash_sample_sql(
    key: str, strata_col: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    """DuckDB twin of :func:`stratified_hash_sample`'s keep-predicate."""
    whens = " ".join(
        f"WHEN '{name}' THEN {round(rate * MILLE)}" for name, rate in rates.items()
    )
    return (
        f"{split_bucket_sql(key)} < (CASE {strata_col} {whens} "
        f"ELSE {round(default_rate * MILLE)} END)"
    )
