"""SparkSession construction with scale-aware defaults.

The reference pipeline has no engine of its own (pandas eager + remote
Postgres planner, SURVEY.md §4); here every knob we set is the Spark
equivalent of something the reference hand-rolled:

- AQE replaces any hand-tuning of shuffle sizes (and handles skewed keys
  at 100 TB: ``skewJoin.enabled``).
- ``shuffle.partitions`` sized for the local[32] test harness; on a real
  cluster AQE coalesces / splits at runtime so the static number matters
  less.
- Arrow enabled so any pandas_udf path is vectorized.
- ``nanosAsLong`` lets Spark read parquet TIMESTAMP(NANOS) columns
  (the driver-generated ``events`` table) as int64 nanoseconds; we
  convert explicitly (sources/tables.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to *any* session handed to us (including the
# driver's): safe, idempotent, and required for correct reads of the testdata.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores ts as TIMESTAMP(NANOS): unreadable by the
    # vectorized parquet reader unless surfaced as long (we convert).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # pin the session clock so any LTZ<->NTZ hop is wall-clock-stable
    # regardless of host timezone (oracle runs on naive timestamps)
    "spark.sql.session.timeZone": "UTC",
    # Catalyst runtime re-planning: partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Scan-level pruning (defaults, pinned for clarity).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime row-level join filtering: build a bloom filter from the
    # selective side and push it into the big side's scan (big wins on
    # 100 TB star joins; pinned on).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def release_leaked_blocks(spark: SparkSession) -> None:
    """Between-measurements hygiene shared by bench.py and
    scripts/scale_probe.py: drop DataFrame cache entries AND the
    localCheckpoint RDD blocks that clearCache alone leaves behind
    (they persist until their RDD is GC'd; ~20 leaked checkpoints made
    late-position queries GC-thrash 4-7× before this existed). One
    implementation so a future fix reaches both harnesses."""
    import gc

    spark.catalog.clearCache()
    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
    except Exception:
        pass  # cleanup is best-effort; never fail the harness
    gc.collect()
    spark.sparkContext._jvm.System.gc()


# sessions already conf'd this process (r10): every query wrapper and
# load_table call re-applied the 13 runtime confs — 13 py4j roundtrips
# (~16 ms) × 367 queries per bench run for values nothing ever unsets.
# Values hold the session ref so a recycled id() can't alias a new one.
_CONFS_APPLIED: dict = {}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply idempotent runtime confs to an externally-provided session
    (once per session per process — they are never unset)."""
    hit = _CONFS_APPLIED.get(id(spark))
    if hit is not None and hit is spark:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf may be static on some builds; never fail a query over tuning.
            pass
    _CONFS_APPLIED[id(spark)] = spark
    return spark


def get_spark(app_name: str = "kenya-weather-spark", cpus: str | None = None) -> SparkSession:
    """Build the local test session (local[$SPARK_GRAFT_CPUS], default all cores).

    On a real cluster only the sql.* confs below apply; master/memory come
    from the cluster manager.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Status-store retention: even with the UI off, the app status
        # listeners retain up to 1000 SQL executions — each holding the
        # FULL formatted plan string. A 300-query bench session (plus
        # streaming micro-batches) accumulates gigabytes of old-gen
        # plan blobs, making every GC progressively costlier (measured:
        # the mid-bench 5-30x slowdown band in r4 session 4). Long-lived
        # cluster sessions want the same caps.
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.sql.streaming.ui.retainedQueries", "8")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
