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


def morton_interleave(col_a, col_b, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    non-negative integer columns — a JVM Column expression (shiftleft /
    shiftright / bitwise-or fold), no UDF. Locality in EITHER dimension
    maps to locality in the key."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b.cast("bigint"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def zorder_write(
    spark: SparkSession,
    df,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-ORDER clustering write: range-partition + sort the table by the
    Morton interleave of two columns, so parquet row-group min/max
    stats are NARROW in BOTH dimensions — a range predicate on either
    column skips most row groups. This is the multi-dimensional
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) that a single-
    column sort cannot give: sorting by A alone leaves B's per-row-group
    spans at full width. One global range exchange (repartitionByRange
    samples the key), files internally sorted.

    Both dimensions are min-max scaled to the full ``bits`` grid before
    interleaving (one tiny agg job for the domains): raw interleaving
    of unequal-width domains degenerates to a single-column sort — the
    wider column's high bits outrank every bit of the narrower one
    (observed: l_partkey(11 bits) × l_suppkey(7 bits) left suppkey
    spans at 1.0). Real OPTIMIZE ZORDER implementations range-bin for
    the same reason.
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    grid = (1 << bits) - 1

    def scaled(col, lo, hi):
        dom = max(int(hi) - int(lo), 1)
        return (
            (col.cast("bigint") - F.lit(int(lo))) * grid / F.lit(dom)
        ).cast("bigint")

    keyed = df.withColumn(
        "__z",
        morton_interleave(
            scaled(df[col_a], lo_a, hi_a), scaled(df[col_b], lo_b, hi_b), bits
        ),
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_span_stats(path: str, col: str) -> float:
    """Mean relative per-row-group (max-min) span of ``col`` across all
    row groups of all files — the data-skipping quality metric (1.0 =
    every row group spans the whole domain, i.e. nothing skippable;
    ~1/n_groups = perfectly clustered). Driver-side parquet-footer
    metadata only."""
    import glob as _glob

    import pyarrow.parquet as pq

    los, his, spans = [], [], []
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
            spans.append(st.max - st.min)
    domain = max(his) - min(los)
    if domain <= 0:
        return 0.0
    return sum(spans) / len(spans) / domain
