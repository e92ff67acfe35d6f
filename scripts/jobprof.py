"""Per-job profile of a single query via the Spark UI REST API: runs
the named query once (bench methodology: build + noop write) and dumps
every Spark job's duration/description, so "where do the seconds go"
is measured instead of guessed (guide §1.1/§7.1).

Usage: python scripts/jobprof.py name [--sf DIR] [--top N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from kenya_agricultural_regions_weather_etl_pipeline_spark.session import (  # noqa: E402
    RUNTIME_CONFS,
    release_leaked_blocks,
)


def _spark_with_ui():
    """get_spark() twin with the UI ON (get_spark pins it off; the REST
    API is this profiler's data source). Profiling-only session."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jobprof")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.sql.streaming.ui.retainedQueries", "8")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    spark = _spark_with_ui()
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    spark.range(1024).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    try:
        from kenya_agricultural_regions_weather_etl_pipeline_spark.streaming.micro_batch import (
            run_windowed_counts as _warm_stream,
        )

        _warm_stream(spark, "/root/testdata/sf0.001")
    except Exception:
        pass
    try:
        from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.graph_index import (
            deployed_graph_index as _warm_graph_index,
        )

        _warm_graph_index(spark, args.sf, k=5, n_probe=2)
    except Exception:
        pass
    release_leaked_blocks(spark)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs() -> list[dict]:
        url = f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    before_ids = {j["jobId"] for j in jobs()}

    fn = E.queries()[args.name]
    t0 = time.perf_counter()
    df = fn(spark, args.sf)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    release_leaked_blocks(spark)

    new = [j for j in jobs() if j["jobId"] not in before_ids]
    new.sort(key=lambda j: j["jobId"])

    def dur(j: dict) -> float:
        try:
            st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            en = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            base = time.mktime(en) - time.mktime(st)
            # add sub-second parts
            base += float(j["completionTime"][19:23] or 0) - float(
                j["submissionTime"][19:23] or 0
            )
            return base
        except Exception:
            return -1.0

    def stage_names(j: dict) -> str:
        names = []
        for sid in sorted(j.get("stageIds", []))[-3:]:
            try:
                with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
                ) as r:
                    data = json.load(r)
                if data:
                    names.append(data[0].get("name", "")[:48])
            except Exception:
                pass
        return " | ".join(names)

    total = 0.0
    rows = []
    for j in new:
        d = dur(j)
        total += max(d, 0)
        desc = (j.get("description") or j.get("name") or "")[:60]
        rows.append((j["jobId"], d, j.get("numTasks"), f"{desc} :: {stage_names(j)}"))
    print(f"[jobprof] {args.name}: wall={wall:.2f}s jobs={len(new)} sum_job_sec={total:.2f}")
    # chronological dump
    for jid, d, nt, desc in rows:
        print(f"  job {jid:>5} {d:7.3f}s tasks={nt:<4} {desc}")
    # slowest
    print("[jobprof] slowest:")
    for jid, d, nt, desc in sorted(rows, key=lambda r: -r[1])[: args.top]:
        print(f"  job {jid:>5} {d:7.3f}s tasks={nt:<4} {desc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
