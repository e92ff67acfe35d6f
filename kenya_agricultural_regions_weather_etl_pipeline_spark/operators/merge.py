"""Keyed last-write-wins merge — the Parquet-native upsert (SURVEY.md §2 S5/R2).

The reference upserts with ``INSERT ... ON CONFLICT (region,
data_timestamp) DO UPDATE SET`` (/root/reference/daily_weather_etl_kenya.py:422-452):
new batch rows override existing rows on the key. On Parquet the
idiomatic equivalent is union + window-dedup keeping the row with the
greatest version column (``extraction_timestamp``), batch winning ties.

Scale notes (100 TB): merge cost is one shuffle on the key over
(existing ∩ touched partitions) + new batch. With the table
partitioned by date (see sinks), dynamic partition overwrite rewrites
ONLY partitions present in the batch — the daily merge touches 1 day,
not 36,500.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_last_write_wins(
    existing: DataFrame,
    batch: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Union + keep max-version row per key; batch wins version ties.

    Equivalent to ON CONFLICT DO UPDATE last-write-wins: for each key
    the surviving row is the one with the greatest ``version_col``; if
    existing and batch tie on version, the batch row survives (DO
    UPDATE overwrites).
    """
    e = existing.withColumn("__src", F.lit(0))
    b = batch.withColumn("__src", F.lit(1))
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        e.unionByName(b)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def write_merged_partitioned(
    merged: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Dynamic-partition-overwrite write of a merged table.

    Replaces the reference's transactional upsert commit
    (/root/reference/daily_weather_etl_kenya.py:456-466): Parquet job
    commit is atomic per partition; only partitions present in
    ``merged`` are rewritten.
    """
    spark = merged.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
