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
