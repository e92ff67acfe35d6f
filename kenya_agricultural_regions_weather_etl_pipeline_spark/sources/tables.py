"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under a scale-factor dir.

Scale notes (100 TB): these are plain ``spark.read.parquet`` scans, so
column pruning and predicate pushdown reach the file scan for free —
callers should filter/select on the returned DataFrame *before* any
action so Catalyst can prune. At cluster scale the same loader works on
a directory of thousands of files; nothing here materializes.

``events.ts`` special case: the generator wrote parquet
TIMESTAMP(NANOS, isAdjustedToUTC=false), which Spark's parquet reader
rejects ([PARQUET_TYPE_ILLEGAL]). With
``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as int64
nanoseconds; we expose BOTH the raw ``ts_ns`` long and a
``ts`` TIMESTAMP_NTZ derived by pure arithmetic from the epoch (no
session-timezone dependence, exactly DuckDB's microsecond truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _events_with_ntz_ts(df: DataFrame) -> DataFrame:
    """int64-nanos ``ts`` → TIMESTAMP_NTZ via epoch arithmetic.

    ``timestampadd`` on a TIMESTAMP_NTZ base is timezone-free, so the
    result equals DuckDB's naive TIMESTAMP for the same parquet bytes
    regardless of the session timezone.  Integer ``div`` (not ``/``)
    avoids double-precision loss on 1.7e18-scale nanos.
    """
    return (
        df.withColumnRenamed("ts", "ts_ns")
        .withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts_ns div 1000, "
                "timestamp_ntz '1970-01-01 00:00:00')"
            ),
        )
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes ``events.ts`` to TIMESTAMP_NTZ."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = _events_with_ntz_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
