"""Data-quality aggregation layer (SURVEY.md §2.5 A1-A4).

The reference's query surface is three single-table SQL aggregations
run post-load (/root/reference/daily_weather_etl_kenya.py:483-531):
completeness (distinct regions today), null counts, min/max
plausibility. Here each is a DataFrame agg — and `fused_quality_report`
computes ALL of them in ONE scan/aggregation pass (the reference runs
three separate server round-trips).

Scale notes: a single pass over a date-partition-pruned scan; with the
table partitioned by date this reads one partition regardless of total
table size. `approx_count_distinct` variant for when the exact
distinct's shuffle matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F


def completeness_check(df: DataFrame, key: str = "region") -> DataFrame:
    """A1: COUNT(DISTINCT key) (/root/reference/daily_weather_etl_kenya.py:483-487)."""
    return df.agg(F.countDistinct(key).alias("unique_regions"))


def completeness_check_approx(df: DataFrame, key: str = "region", rsd: float = 0.01) -> DataFrame:
    """A1 at scale: HyperLogLog++ sketch — no exact-distinct shuffle."""
    return df.agg(F.approx_count_distinct(key, rsd).alias("unique_regions_approx"))


def null_counts(df: DataFrame, *cols: str) -> DataFrame:
    """A2: SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) per column, one pass
    (/root/reference/daily_weather_etl_kenya.py:501-507)."""
    return df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
            for c in cols
        ]
    )


def min_max(df: DataFrame, col: str) -> DataFrame:
    """A3: MIN/MAX plausibility probe (/root/reference/daily_weather_etl_kenya.py:518-522)."""
    return df.agg(F.min(col).alias(f"min_{col}"), F.max(col).alias(f"max_{col}"))


def fused_quality_report(
    df: DataFrame,
    distinct_key: str = "region",
    null_cols: tuple[str, ...] = ("temperature", "humidity", "pressure"),
    range_col: str = "temperature",
) -> DataFrame:
    """A1+A2+A3+A4 fused into one aggregation pass (SURVEY.md §3.3)."""
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct(distinct_key).alias(f"unique_{distinct_key}"),
        F.min(range_col).alias(f"min_{range_col}"),
        F.max(range_col).alias(f"max_{range_col}"),
    ]
    for c in null_cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}"))
    return df.agg(*aggs)


def quality_verdict(
    report_row: Row,
    expected_regions: int = 15,
    temp_bounds: tuple[float, float] = (-10.0, 60.0),
    distinct_key: str = "region",
    range_col: str = "temperature",
) -> dict[str, bool]:
    """Threshold checks on a collected fused report — the warn-only
    verdict logic of /root/reference/daily_weather_etl_kenya.py:495-531."""
    d = report_row.asDict()
    lo, hi = temp_bounds
    verdict = {
        "completeness_ok": d[f"unique_{distinct_key}"] >= expected_regions,
        "range_ok": (
            d[f"min_{range_col}"] is not None
            and d[f"min_{range_col}"] >= lo
            and d[f"max_{range_col}"] <= hi
        ),
    }
    for k, v in d.items():
        if k.startswith("null_"):
            verdict[f"{k}_ok"] = (v or 0) == 0
    return verdict


# ---------------------------------------------------------------------------
# Distribution-drift monitoring (PSI) — a21 batch / st27 streaming share
# this math so one oracle covers both
# ---------------------------------------------------------------------------

#: PSI binning geometry: 16 fixed-width buckets per metric.
DRIFT_N_BINS = 16
DRIFT_METRICS = ("n_chars", "n_tokens")


def drift_binned_counts(
    docs: DataFrame, cur_source: str = "src0"
) -> DataFrame:
    """Per-(metric, bin) reference/current counts for the PSI drift
    monitor: reference = every source except ``cur_source`` (the
    standing corpus), current = ``cur_source`` (the newest dump). ONE
    pass over the rows it is given — the metric/bin explode is a
    narrow ×2 map, the only shuffle is (metric, bin)-keyed and bounded
    at 32 rows. Counts are a commutative monoid (merge = sum by key),
    which is exactly what lets st27 fold them per micro-batch."""
    from ..functions.text import token_count

    binned = (
        docs.select(
            (F.col("source") == cur_source).alias("is_cur"),
            F.least(
                F.floor(F.col("n_chars") / 64), F.lit(DRIFT_N_BINS - 1)
            )
            .cast("int")
            .alias("chars_bin"),
            F.least(
                F.floor(token_count(F.col("text")) / 16),
                F.lit(DRIFT_N_BINS - 1),
            )
            .cast("int")
            .alias("tok_bin"),
        )
        .select(
            "is_cur",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("n_chars").alias("metric"),
                        F.col("chars_bin").alias("bin"),
                    ),
                    F.struct(
                        F.lit("n_tokens").alias("metric"),
                        F.col("tok_bin").alias("bin"),
                    ),
                )
            ).alias("mb"),
        )
        .select("is_cur", "mb.metric", "mb.bin")
    )
    return binned.groupBy("metric", "bin").agg(
        F.sum(F.when(~F.col("is_cur"), 1).otherwise(0))
        .cast("long")
        .alias("c_ref"),
        F.sum(F.when(F.col("is_cur"), 1).otherwise(0))
        .cast("long")
        .alias("c_cur"),
    )


def psi_scoreboard(spark, counts: DataFrame) -> DataFrame:
    """Finalize (metric, bin, c_ref, c_cur) counts into the PSI
    scoreboard: densify over the full bin grid (empty bins matter —
    add-half smoothing gives them mass), then fold per-bin PSI terms
    quantized to integer 1e-8 units (order-independent; the x94
    floor-quantize discipline — only the per-bin ln/multiply is float,
    bit-identical per term in both engines). psi > 0.2 is the classic
    'significant shift' gate."""
    from ..functions.weather import round_half_up

    from ..functions.jvmframes import values_frame

    metrics = values_frame(
        spark, [(m,) for m in DRIFT_METRICS], "metric string"
    )
    grid = F.broadcast(metrics).crossJoin(
        spark.range(DRIFT_N_BINS).select(
            F.col("id").cast("int").alias("bin")
        )
    )
    dense = grid.join(counts, ["metric", "bin"], "left").fillna(
        0, ["c_ref", "c_cur"]
    )
    tot = dense.groupBy("metric").agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cur").cast("long").alias("n_cur"),
    )
    j = dense.join(F.broadcast(tot), "metric")
    half_bins = float(DRIFT_N_BINS) / 2.0
    p_ref = (F.col("c_ref") + F.lit(0.5)) / (
        F.col("n_ref") + F.lit(half_bins)
    )
    p_cur = (F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_cur") + F.lit(half_bins)
    )
    term_q = F.floor(
        (p_cur - p_ref) * F.log(p_cur / p_ref) * F.lit(1e8) + F.lit(0.5)
    ).cast("long")
    return (
        j.groupBy("metric")
        .agg(
            F.max("n_ref").cast("long").alias("n_ref"),
            F.max("n_cur").cast("long").alias("n_cur"),
            round_half_up(
                F.sum(term_q).cast("double") / F.lit(1e8), 6
            ).alias("psi"),
        )
        .withColumn("drifted", F.col("psi") > 0.2)
        .orderBy("metric")
    )


def nb_train(docs: DataFrame, pos_source: str = "src0"):
    """Train the multinomial Naive Bayes quality filter in-engine
    (x100/st29): seed positives = the curated source, negatives =
    everything else. Returns ``(weights, prior)`` — the deployable
    model artifact: ``weights`` is a vocabulary-sized (term, w_units)
    table of add-one-smoothed log-odds quantized to integer 1e-6 units
    (so every downstream fold is order-free int64 arithmetic), and
    ``prior`` is a 1-row frame with the Laplace-smoothed class prior in
    the same units. Training is pure aggregation: one term-keyed
    shuffle + a 1-row broadcast fold — the model never touches the
    driver."""
    from ..functions.text import tokens

    base = docs.select(
        "doc_id",
        (F.col("source") == pos_source).cast("int").alias("is_pos"),
        tokens(F.lower(F.col("text"))).alias("toks"),
    )
    toks = base.select("is_pos", F.explode("toks").alias("term"))
    tc = toks.groupBy("term").agg(
        F.sum("is_pos").cast("long").alias("c_pos"),
        F.sum(1 - F.col("is_pos")).cast("long").alias("c_neg"),
    )
    tot = tc.agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        F.sum("c_neg").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    w_units = F.floor(
        (
            F.log(
                (F.col("c_pos") + F.lit(1.0))
                / (F.col("n_pos") + F.col("v"))
            )
            - F.log(
                (F.col("c_neg") + F.lit(1.0))
                / (F.col("n_neg") + F.col("v"))
            )
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    weights = tc.crossJoin(F.broadcast(tot)).select(
        "term", w_units.alias("w_units")
    )
    prior = base.agg(
        F.floor(
            F.log(
                (F.sum("is_pos") + F.lit(1.0))
                / (F.count(F.lit(1)) - F.sum("is_pos") + F.lit(1.0))
            )
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("prior_units")
    )
    return weights, prior


def nb_score(docs: DataFrame, weights: DataFrame, prior: DataFrame) -> DataFrame:
    """Apply a trained NB model (x100/st29): tokens join the weight
    table ON TERM — a vocabulary-scaled shuffle join, never a broadcast
    (the x25 rule) — and fold per document in exact integer units.
    Returns (doc_id, n_tokens, units_total)."""
    from ..functions.text import tokens

    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    scored = (
        toks.join(weights, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w_units").alias("units"),
        )
    )
    return scored.crossJoin(F.broadcast(prior)).select(
        "doc_id",
        "n_tokens",
        (F.col("units") + F.col("prior_units")).alias("units_total"),
    )
