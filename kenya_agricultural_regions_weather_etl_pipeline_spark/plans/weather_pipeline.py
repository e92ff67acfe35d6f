"""The reference DAG re-expressed as ONE lazy DataFrame lineage (SURVEY.md §3).

Reference: 5 Airflow tasks moving data through XCom/pandas/psycopg2
(/root/reference/daily_weather_etl_kenya.py:542-573). Here the whole
Extract → Transform → Load → Quality chain is a single Catalyst plan:

  raw source → from_json flatten → broadcast region-dim join →
  dedup (keep-first) → range validation → derived metrics → date parts
  → keyed last-write-wins merge → partitioned parquet → fused quality agg

Catalyst collapses the projections into one codegen stage; the only
shuffles are the dedup window and the merge window. The pandas
7-pass eager pipeline (:297-325) becomes one pass.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import weather as W
from ..operators.dedup import dedup_keep_first
from ..operators.merge import (
    collect_touched_partitions,
    merge_last_write_wins,
    write_merged_partitioned,
)
from ..operators.quality import fused_quality_report, quality_verdict
from ..schemas import WEATHER_KEY, WEATHER_LOAD_COLUMNS
from ..sources.regions import regions_df
from ..sources.weather_api import flatten, parse_raw, read_raw


def transform(flat: DataFrame) -> DataFrame:
    """The T of the ETL (/root/reference/daily_weather_etl_kenya.py:286-340):
    dedup → validate → derive → date parts, as native expressions."""
    deduped = dedup_keep_first(
        flat,
        list(WEATHER_KEY),
        # pandas keep='first' is input-order; the deterministic analogue
        # prefers the earliest extraction, then stable tiebreaks
        [F.col("extraction_timestamp").asc(), F.col("temperature").asc()],
    )
    validated = deduped.filter(
        (F.col("temperature") >= -5)
        & (F.col("temperature") <= 50)  # F1 (:309)
        & (F.col("humidity") >= 0)
        & (F.col("humidity") <= 100)  # F2 (:312)
    )
    t, h = F.col("temperature"), F.col("humidity")
    parts = W.date_parts(F.col("data_timestamp"))
    return validated.withColumns(
        {
            "heat_index": W.heat_index(t, h),
            "dew_point": W.dew_point(t, h),
            "is_favorable_temp": W.is_favorable_temp(t),
            "is_high_humidity": W.is_high_humidity(h),
            "rainfall_category": W.rainfall_category(F.col("rainfall_1h")),
            **parts,
        }
    )


def pipeline_frame(
    spark: SparkSession,
    days: int = 3,
    extraction_ts: datetime | None = None,
    use_datasource: bool = True,
    observations: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The full E→T lineage as one lazy plan, no side effects.

    raw source (S1) → PERMISSIVE parse + quarantine (E1) → nested flatten
    with null-tolerant access and pinned extraction ts (S2/F4/P9) →
    broadcast region-dim join (S3) → dedup/validate/derive (R1/F1/F2/
    P1-P6) → ordered 30-col load projection (P10).

    Returns ``(batch, corrupt)`` — the load-ready frame and the
    quarantined raw rows (/root/reference/daily_weather_etl_kenya.py:193-201).
    """
    raw = read_raw(spark, days=days, use_datasource=use_datasource)
    parsed = parse_raw(raw)
    corrupt = parsed.filter(F.col("_corrupt")).select("region", "raw")
    flat = flatten(parsed, extraction_ts)
    # broadcast the 15-row region dim for coordinates (S3)
    flat = flat.join(F.broadcast(regions_df(spark)), "region", "left")
    if observations is not None:
        # E5 observability: the reference logs row counts at every step
        # (/root/reference/daily_weather_etl_kenya.py:300-306); the Spark
        # equivalent is Observation metrics — collected as a side effect
        # of the SAME action, no extra pass over the data.
        from pyspark.sql import Observation

        o_flat, o_batch = Observation(), Observation()
        observations["flat"], observations["batch"] = o_flat, o_batch
        flat = flat.observe(o_flat, F.count(F.lit(1)).alias("rows_flat"))
        batch = transform(flat).select(*WEATHER_LOAD_COLUMNS)
        batch = batch.observe(o_batch, F.count(F.lit(1)).alias("rows_loaded"))
    else:
        batch = transform(flat).select(*WEATHER_LOAD_COLUMNS)
    return batch, corrupt


def run_batch(
    spark: SparkSession,
    table_path: str,
    days: int = 3,
    extraction_ts: datetime | None = None,
    use_datasource: bool = True,
) -> dict:
    """One end-to-end pipeline run against a parquet table at ``table_path``.

    Returns the collected quality verdict (the reference's
    data_quality_check, warn-only, :471-531).
    """
    obs: dict = {}
    batch, corrupt = pipeline_frame(
        spark,
        days=days,
        extraction_ts=extraction_ts,
        use_datasource=use_datasource,
        observations=obs,
    )
    n_corrupt = corrupt.count()

    # fail only if ALL regions failed (E1 policy :203-207)
    if batch.isEmpty():
        raise RuntimeError("extraction produced no valid rows — aborting run")

    # keyed last-write-wins merge into the partitioned table (S5/R2).
    # Only partitions the batch TOUCHES participate: existing rows are
    # filtered to the batch's dates (partition-pruned scan), and dynamic
    # overwrite then rewrites exactly those partitions — a replayed day
    # re-reads and rewrites ONE day, never the table's history. The
    # distinct-dates probe is a tiny driver-side collect, same class as
    # an AQE statistics read.
    batch = batch.localCheckpoint(eager=True)  # branch reuse: dates + merge
    touched = collect_touched_partitions(batch, "date")
    try:
        existing = (
            spark.read.parquet(table_path)
            .filter(F.col("date").isin(touched))
            .select(*WEATHER_LOAD_COLUMNS)
        )
        merged = merge_last_write_wins(
            existing, batch, list(WEATHER_KEY), "extraction_timestamp"
        )
    except AnalysisException:
        # first run only: the table path does not exist yet. Real read/
        # merge failures propagate — masking them would silently replace
        # the touched partitions with only this batch's rows.
        merged = batch
    write_merged_partitioned(merged, table_path, ["date"])

    # fused single-pass quality report over today's partition (A1-A4)
    table = spark.read.parquet(table_path)
    report = fused_quality_report(table).collect()[0]
    verdict = quality_verdict(report)
    verdict["corrupt_quarantined"] = n_corrupt
    # step-count observability (E5): harvested from the write action
    verdict["rows_flat"] = obs["flat"].get["rows_flat"]
    verdict["rows_loaded"] = obs["batch"].get["rows_loaded"]
    return verdict
