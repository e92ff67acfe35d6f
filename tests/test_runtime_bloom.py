"""Runtime bloom-filter join evidence: session.py pins
spark.sql.optimizer.runtime.bloomFilter.enabled=true as the third
100 TB runtime mechanism (AQE skew, DPP, and this) — a selective dim
filter should materialize as a bloom filter pushed into the BIG side's
scan, discarding non-joining rows before the shuffle. This test lowers
the creation thresholds so the tiny corpus qualifies, asserts the
optimized plan contains the bloom-filter expression on the fact side,
and checks the result equals the bloom-disabled run — the filter is
one-sided (false positives pass through to the real join), so the
answer is invariant by construction and the test pins that."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_runtime_bloom_filter_injects_and_preserves_result(spark, sf01):
    li = spark.read.parquet(f"{sf01}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf01}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )

    def run(enabled: bool):
        confs = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": str(
                enabled
            ).lower(),
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            # force a shuffle join so the bloom filter has a shuffle to
            # save; a broadcast join would already prune via the hash
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            dim = orders.filter(F.col("o_orderpriority") == "1-URGENT")
            j = li.join(
                dim, li.l_orderkey == dim.o_orderkey
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("qty"),
            )
            plan = j._jdf.queryExecution().optimizedPlan().toString()
            rows = tuple(j.collect()[0])
            return rows, plan
        finally:
            # old value None = never explicitly set: UNSET to restore
            # the engine default instead of leaking the override
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)

    rows_on, plan_on = run(True)
    rows_off, _ = run(False)
    assert rows_on == rows_off
    assert "bloomfilter" in plan_on.lower().replace("_", ""), plan_on[:4000]
