"""Bucketed (pre-shuffled) tables: co-located joins with zero Exchange.

The 100 TB story: a fact table joined on the same key by many daily
queries pays a full shuffle per query unless the table is written
bucketed on that key. ``bucketBy(n, key)`` + ``sortBy(key)`` persists
the shuffle ONCE at write time; every later equi-join or aggregation on
the key reads co-located buckets and Catalyst plans a SortMergeJoin
with NO Exchange on either side. This is Spark's equivalent of the
reference's per-region partitioned load target
(daily_weather_etl_kenya.py:472-487: one Postgres table keyed by
region/date) — but the key layout survives into the execution plan.

Constraints that matter at scale (and are asserted in tests):
- both sides must be bucketed on the join key with the SAME bucket
  count, else Spark re-shuffles the mismatched side;
- bucket count is a physical-layout decision: ~(table size / 128 MB)
  at write time, NOT per-query;
- broadcast beats bucketing for bounded dims — bucket the big-big
  joins (fact ⋈ fact), broadcast the small ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) on ``key``. The write shuffles once; subsequent joins and
    aggregations on ``key`` do not."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key.
    With bucketing aligned, the physical plan contains no Exchange."""
    return spark.table(left).join(spark.table(right), key)
