"""AQE skew-join evidence: the session conf pins
spark.sql.adaptive.skewJoin.enabled=true (session.py) as the engine's
answer to hot keys at 100 TB — this test proves the mechanism actually
ENGAGES on a skewed workload, rather than trusting the flag. A crafted
join with one hot key (99% of rows) runs under aggressively lowered
skew thresholds; the final adaptive plan must show the skewed-side
shuffle read split (AQEShuffleRead ... skewed / 'isSkew=true'
markers), and the join result must be byte-identical to the same join
with skew handling disabled — the optimization is allowed to change
the PLAN, never the answer. Complements b2_salted_join (the manual
mitigation) with the runtime one."""

from __future__ import annotations

import pyspark.sql.functions as F


def _skewed_frames(spark):
    # one hot key (0) carrying ~99% of the fact side
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    return fact, dim


def test_aqe_skew_join_engages_and_preserves_result(spark):
    fact, dim = _skewed_frames(spark)

    def run(skew_enabled: bool):
        confs = {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": str(
                skew_enabled
            ).lower(),
            # aggressive thresholds so the tiny test corpus qualifies
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # the downstream groupBy("k") could reuse the join's
            # partitioning, which makes AQE suppress the split (it
            # would add a shuffle); force-apply so the mechanism under
            # test engages — the extra-shuffle trade is exactly what a
            # hot-key 100 TB join accepts
            "spark.sql.adaptive.forceOptimizeSkewedJoin": str(
                skew_enabled
            ).lower(),
            # broadcast would bypass the sort-merge path under test
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            joined = fact.join(dim, "k").groupBy("k").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v") + F.col("w")).alias("s"),
            )
            rows = sorted(tuple(r) for r in joined.collect())
            plan = joined._jdf.queryExecution().executedPlan().toString()
            return rows, plan
        finally:
            # old value None = the key was never explicitly set in this
            # session: UNSET it (restoring the engine default) — setting
            # nothing would leak the test's override into later tests
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)

    rows_skew, plan_skew = run(True)
    rows_plain, _ = run(False)
    # correctness is invariant under the optimization
    assert rows_skew == rows_plain
    # and the mechanism actually engaged: the adaptive shuffle read on
    # the skewed side reports split skewed partitions
    assert "skewed" in plan_skew.lower(), plan_skew[:4000]
