"""Dynamic partition pruning evidence: at 100 TB the fact table is
date-partitioned and the filter arrives on the DIMENSION — static
pruning can't help, the fact scan must be pruned at RUNTIME by the
dim's surviving join keys (the broadcast's values become the fact
scan's partition filter). This test writes a partitioned fact to disk,
joins it with a selectively-filtered dim on the partition column, and
asserts (a) the fact scan carries a dynamicpruningexpression and (b)
the result equals the statically-filtered recompute — the mechanism
changes the scan, never the answer."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F


def test_dynamic_partition_pruning_engages(spark, sf01):
    path = tempfile.mkdtemp(prefix="dpp_fact_")
    conf_key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    old_conf = spark.conf.get(conf_key, None)
    try:
        li = spark.read.parquet(f"{sf01}/lineitem.parquet").select(
            "l_orderkey",
            "l_quantity",
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        )
        li.write.mode("overwrite").partitionBy("ship_month").parquet(path)
        fact = spark.read.parquet(path)
        months = (
            fact.select("ship_month")
            .distinct()
            .withColumn(
                "is_peak",
                F.col("ship_month").isin("1995-03", "1995-04"),
            )
        )
        dim = months.filter(F.col("is_peak"))
        spark.conf.set(conf_key, "true")
        joined = fact.join(dim, "ship_month").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:4000]
        got = joined.collect()[0]
        want = (
            fact.filter(F.col("ship_month").isin("1995-03", "1995-04"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("qty"),
            )
            .collect()[0]
        )
        assert tuple(got) == tuple(want)
    finally:
        # restore-or-unset: conf.get(k, None) is None for never-set keys,
        # and restoring None must UNSET, not skip (the conf-leak trap the
        # sibling AQE/bloom tests guard against).
        if old_conf is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old_conf)
        shutil.rmtree(path, ignore_errors=True)
