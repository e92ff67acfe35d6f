"""Table maintenance: small-file compaction.

The 100 TB failure mode this addresses: a streaming sink or a
many-task write leaves thousands of tiny parquet files per partition;
scans then pay per-file open/footer cost and lose row-group pruning.
Compaction rewrites the table at a controlled file count.

Local-filesystem swap (shutil/os.rename); on HDFS/S3 the same two-phase
write-then-swap runs through the filesystem API / an atomic prefix
flip. Spark refuses to overwrite a path it is lazily reading, hence the
temp-dir two-phase shape.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet table at ``path`` into ``target_files`` files
    (per partition directory when ``partition_by`` is given). Returns
    the row count of the compacted table (cheap invariant check for the
    caller)."""
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df = spark.read.parquet(path)
    writer = df.repartition(target_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return spark.read.parquet(path).count()


def expire_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep: list[str],
) -> tuple[int, int]:
    """Retention: drop whole partition directories whose value is not in
    ``keep`` (the daily-table expiry the reference would eventually need
    — its Postgres table grows forever, daily_weather_etl_kenya.py:78-113).

    Partition-dir deletion is METADATA-RATE work: no row rewrite, no
    shuffle — the reason date-partitioned layout (S4) beats b-tree
    indexes for time-series retention at 100 TB. Returns
    (n_dropped_partitions, remaining_rows).
    """
    keep_set = {f"{partition_col}={v}" for v in keep}
    dropped = 0
    for entry in os.listdir(path):
        if entry.startswith(f"{partition_col}=") and entry not in keep_set:
            shutil.rmtree(os.path.join(path, entry))
            dropped += 1
    return dropped, spark.read.parquet(path).count()
