"""File-format connectors beyond parquet: JSONL, CSV, and the
deterministic training-shard writer.

The reference's I/O surface is a REST fetch plus a Postgres load
(/root/reference/daily_weather_etl_kenya.py:136-231, 379-474); an
engine users can actually switch to also needs the interchange formats
data actually arrives in. Schemas are ALWAYS explicit: at 100 TB,
schema inference is a full extra pass over the data and a correctness
hazard (a single malformed row silently widens a column to string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, *, permissive: bool = True
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    PERMISSIVE mode quarantines malformed rows into ``_corrupt`` instead
    of failing the job — the same failure-isolation posture as the
    weather source (E1): one bad record in a 100 TB crawl must not kill
    the run.
    """
    if permissive:
        # StructType.add MUTATES self — copy the fields so the caller's
        # schema object survives repeated reads
        schema = StructType(list(schema.fields)).add("_corrupt", "string")
    reader = spark.read.schema(schema)
    if permissive:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt"
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, *, compression: str = "none") -> None:
    """Write newline-delimited JSON (one object per line)."""
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Read CSV with an explicit schema (never inferSchema — see module
    docstring)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_csv(
    df: DataFrame, path: str, *, header: bool = True, delimiter: str = ","
) -> None:
    df.write.mode("overwrite").option("header", header).option(
        "delimiter", delimiter
    ).csv(path)


def write_training_shards(
    df: DataFrame, path: str, n_shards: int, order_col: str
) -> None:
    """Write exactly ``n_shards`` range-partitioned, internally-sorted
    parquet shards — the layout a training data loader consumes.

    ``repartitionByRange`` samples the ordering key to build balanced
    range bounds (one shuffle), and ``sortWithinPartitions`` makes each
    shard's row order deterministic, so shard k of run N is byte-stable
    given stable input. At 100 TB, pick ``n_shards`` so each shard is
    ~0.5-1 GB: small enough for loader parallelism, large enough to
    avoid the small-file problem (see operators/maintenance.py).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
