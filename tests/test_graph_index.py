"""Deploy-once graph index: cache identity, content invalidation, and
bit-equality of the cached read vs a fresh in-memory build.

The contract (operators/graph_index.py): one build per
(dataset fingerprint, k, n_probe) per process; any rewrite of the
embeddings file — even same-size — changes the fingerprint and forces
a rebuild against the NEW data; and a consumer reading the stored
artifacts is indistinguishable from one that ran knn_graph itself.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kenya_agricultural_regions_weather_etl_pipeline_spark.operators import (
    graph_index as GI,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.similarity import (
    knn_graph,
)


@pytest.fixture()
def tiny_sf(spark, sf001):
    """A private sf_dir whose embeddings file the test may rewrite."""
    d = tempfile.mkdtemp(prefix="kw_gidx_sf_")
    try:
        (
            spark.read.parquet(f"{sf001}/embeddings.parquet")
            .filter(F.col("vec_id") < 120)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, "embeddings.parquet"))
        )
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cache_hit_returns_same_artifacts(spark, tiny_sf):
    a1 = GI.deployed_graph_index(spark, tiny_sf, k=3, n_probe=2)
    a2 = GI.deployed_graph_index(spark, tiny_sf, k=3, n_probe=2)
    assert a1["artifacts_dir"] == a2["artifacts_dir"]
    assert a1["fingerprint"] == a2["fingerprint"]
    # different build parameters are a different artifact
    a3 = GI.deployed_graph_index(spark, tiny_sf, k=2, n_probe=2)
    assert a3["artifacts_dir"] != a1["artifacts_dir"]


def test_cached_graph_equals_fresh_build(spark, tiny_sf):
    emb = spark.read.parquet(os.path.join(tiny_sf, "embeddings.parquet"))
    art = GI.deployed_graph_index(spark, tiny_sf, k=3, n_probe=2)
    cached = _rows(GI.read_graph(spark, art))
    fresh = _rows(knn_graph(emb, k=3, n_probe=2))
    assert cached == fresh  # parquet round-trip is bit-exact


def test_data_change_invalidates_fingerprint(spark, tiny_sf):
    emb_path = os.path.join(tiny_sf, "embeddings.parquet")
    art1 = GI.deployed_graph_index(spark, tiny_sf, k=3, n_probe=2)
    n1 = art1["n"]

    # rewrite the dataset with MORE vectors — sizes/mtimes change, so
    # the stat-based fingerprint must change and the next call must
    # rebuild against the new content, not serve the stale artifact
    bigger = spark.read.parquet(emb_path).union(
        spark.read.parquet(emb_path).select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
        )
    )
    tmp = emb_path + ".new"
    bigger.coalesce(1).write.parquet(tmp)
    shutil.rmtree(emb_path)
    os.rename(tmp, emb_path)

    art2 = GI.deployed_graph_index(spark, tiny_sf, k=3, n_probe=2)
    assert art2["fingerprint"] != art1["fingerprint"]
    assert art2["artifacts_dir"] != art1["artifacts_dir"]
    assert art2["n"] == 2 * n1
    # and the rebuilt edge list really covers the new vectors
    srcs = GI.read_graph(spark, art2).select("src_id").distinct().count()
    assert srcs == 2 * n1


def test_touch_alone_invalidates(spark, tiny_sf):
    """Even a same-content touch (mtime bump) changes the key — the
    cheap stat fingerprint deliberately over-invalidates rather than
    ever serving a stale index."""
    emb_path = os.path.join(tiny_sf, "embeddings.parquet")
    f1 = GI.dataset_fingerprint(emb_path)
    inner = next(
        os.path.join(emb_path, p)
        for p in os.listdir(emb_path)
        if p.endswith(".parquet")
    )
    st = os.stat(inner)
    os.utime(inner, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert GI.dataset_fingerprint(emb_path) != f1
