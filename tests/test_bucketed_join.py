"""Bucketed-table co-located join: result parity with a plain join AND
a physical plan with zero Exchange nodes — the write-once-shuffle-never
contract that makes repeated fact⋈fact joins affordable at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf001):
    orders = load_table(spark, sf001, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf001, "customer").select(
        "c_custkey", "c_nationkey"
    ).withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(orders, "b_orders", "o_custkey", buckets=8)
    write_bucketed(cust, "b_customer", "o_custkey", buckets=8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the small test tables take the SMJ path the
    # layout is designed for (at real scale neither side broadcasts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, left, right, "o_custkey")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf001, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed_join(spark, left, right, "o_custkey")
    got = j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
    )
    orders = load_table(spark, sf001, "orders")
    cust = load_table(spark, sf001, "customer")
    want = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = agg._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan, plan
