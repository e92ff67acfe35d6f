"""Standalone per-query timer for optimization work: runs the named
queries K times each (bench.py's exact methodology: build + noop write
per run, leaked-block hygiene between runs) and prints min/median —
min-of-K is the noise-robust "clean" number on this bimodal host.

Usage: python scripts/qtime.py [-k 3] [--explain DIR] name [name...]
With --explain DIR, each query's .explain("formatted") output is also
written to DIR/<name>.txt (the plans/r10 before/after receipts).
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from kenya_agricultural_regions_weather_etl_pipeline_spark.session import (  # noqa: E402
    get_spark,
    release_leaked_blocks,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-k", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None)
    args = ap.parse_args()

    spark = get_spark("qtime")
    # same warmups as bench.py so the first query isn't charged boot
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

    qs = E.queries()
    for name in args.names:
        fn = qs[name]
        runs = []
        for _ in range(args.k):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_leaked_blocks(spark)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            release_leaked_blocks(spark)
        print(
            f"[qtime] {name}: min={min(runs)} med={statistics.median(runs)} runs={runs}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
