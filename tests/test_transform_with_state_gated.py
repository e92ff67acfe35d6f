"""Spark 4's transformWithStateInPandas (the successor to
applyInPandasWithState, st4's operator) — GATED: the PySpark driver
worker for this API needs the google.protobuf runtime, which is absent
in this container (`cannot import name 'descriptor'`). The test runs
the real per-key ValueState counter end-to-end wherever protobuf is
installed and skips cleanly here; st4's applyInPandasWithState remains
the exercised stateful-UDF surface in this environment."""

from __future__ import annotations

import tempfile

import pytest


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _protobuf_ok(),
    reason="transformWithStateInPandas needs google.protobuf, absent here",
)
def test_transform_with_state_running_count(spark):
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.cnt = handle.getValueState(
                "cnt", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self.cnt.get()
            total = (prev[0] if prev else 0) + n
            self.cnt.update((total,))
            yield pd.DataFrame({"k": [key[0]], "n": [total]})

        def close(self):
            pass

    workdir = tempfile.mkdtemp(prefix="tws_")
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "k string, v long"
    )
    df.coalesce(1).write.json(workdir + "/src")
    out_schema = StructType(
        [StructField("k", StringType()), StructField("n", LongType())]
    )
    stream = (
        spark.readStream.schema("k string, v long")
        .json(workdir + "/src")
        .groupBy("k")
        .transformWithStateInPandas(
            Counter(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tws_gated")
        .outputMode("update")
        .option("checkpointLocation", workdir + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["n"]) for r in spark.table("tws_gated").collect()
    }
    assert got == {("a", 2), ("b", 1)}
