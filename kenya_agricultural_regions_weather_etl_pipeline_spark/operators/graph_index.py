"""Deploy-once graph-ANN index artifacts, cached per dataset content.

The graph family (x86 build, x86b/x88/x90/x98 graph analytics, x93/x95
beam search, st24 streaming serving) all consume the SAME build
artifacts over the full embedding corpus: the kNN edge list, the
cell-partitioned assignment layout, and the norm-carrying vector table
(the DiskANN-style deployed state). Before round 6 every one of those
queries re-ran the N·√N build inside its own timing — correct, but it
meant "serving" queries measured a shared deploy instead of their own
operator, and a bench suite paid the identical build ~8×.

This module makes the deploy a process-lifetime, content-addressed
artifact: :func:`deployed_graph_index` builds ONCE per
(dataset fingerprint, k, n_probe) and returns parquet paths; every
later caller in the process reads the stored artifacts. Parquet
round-trips IEEE doubles bit-exactly, so a cached read is
bit-identical to a fresh build — the DuckDB oracles are untouched.

Production mapping: on a real cluster these artifacts live in object
storage written by the (scheduled, once-per-corpus-version) index
build job; serving jobs only ever read them. The in-process cache here
is the same contract at test scale, with the content fingerprint
standing in for the corpus version id.

Capability parity note: the reference repo
(`daily_weather_etl_kenya.py`) stores flat rows only — the vector
platform is part of the §2.8 training-data extension surface.
"""

from __future__ import annotations

import atexit
import hashlib
import math
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "dataset_fingerprint",
    "deployed_graph_index",
    "read_assignment",
    "read_cframe",
    "read_graph",
]

# (fingerprint, k, n_probe) -> artifact dict. Process-lifetime; the
# fingerprint key makes stale hits impossible across testdata
# regenerations, and atexit reclaims the temp dirs.
_CACHE: dict[tuple[str, int, int], dict] = {}


def _cleanup() -> None:
    for art in _CACHE.values():
        shutil.rmtree(art["artifacts_dir"], ignore_errors=True)
    _CACHE.clear()


atexit.register(_cleanup)


def dataset_fingerprint(path: str) -> str:
    """Content fingerprint of a parquet dataset WITHOUT scanning it:
    sha1 over the sorted (relative path, size, mtime_ns) of every file
    under ``path`` (or of the single file). Any rewrite — new data,
    re-partition, touch — changes size or mtime and so the key; this
    is the same metadata Spark's own file index invalidates on. O(#
    files) stat calls, no data read — a cache key must never cost a
    scan."""
    h = hashlib.sha1(path.encode())
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())
        return h.hexdigest()
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            fp = os.path.join(root, f)
            st = os.stat(fp)
            entries.append(
                (os.path.relpath(fp, path), st.st_size, st.st_mtime_ns)
            )
    for rel, size, mt in sorted(entries):
        h.update(f"|{rel}|{size}|{mt}".encode())
    return h.hexdigest()


def deployed_graph_index(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_probe: int = 2,
    emb: DataFrame | None = None,
    force_rebuild: bool = False,
) -> dict:
    """Build-or-fetch the deployed graph index for ``sf_dir``'s
    embeddings table. Returns a dict with:

    * ``graph_path`` — :func:`~.similarity.knn_graph` edge list
      (src_id, nbr_id, cos_sim, rank), parquet;
    * ``assign_dir`` — cell-PARTITIONED assignment layout
      (vec_id, cvec; cell = partition column), the pruned-read serving
      index (st22/st24's layout);
    * ``cframe_path`` — (node, cvec, cnrm): the vector table with
      norms, the beam search's rescoring side;
    * ``n`` / ``n_centroids`` — corpus size and the ceil(√N) codebook
      size the artifacts were built with;
    * ``fingerprint`` / ``artifacts_dir`` — the cache identity.

    ONE ``_ivf_rank_cells`` pass (the build's dominant N·√N cost)
    feeds both the assignment and the edge list — the st21 single-pass
    discipline — and everything lands in parquet once per process per
    corpus content. Doubles round-trip bit-exactly, so consumers are
    indistinguishable from a fresh in-memory build.

    ``force_rebuild=True`` discards any cached artifact and rebuilds —
    the BUILD query (x86) uses it so the deploy cost is always timed
    by the query whose operator IS the deploy, never smeared into a
    serving query that happened to run first.
    """
    from pyspark.storagelevel import StorageLevel

    from ..functions.vectors import norm, to_double_array
    from ..sources.tables import load_table
    from .similarity import _ivf_codebook, _ivf_rank_cells, knn_graph

    data_path = os.path.join(sf_dir, "embeddings.parquet")
    key = (dataset_fingerprint(data_path), int(k), int(n_probe))
    hit = _CACHE.get(key)
    if hit is not None:
        if not force_rebuild:
            return hit
        _CACHE.pop(key, None)
        shutil.rmtree(hit["artifacts_dir"], ignore_errors=True)

    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    nc = max(1, math.ceil(math.sqrt(n)))
    # fan the single-split embeddings scan to machine parallelism
    # before the build's N·√N rank pass (guide §2.5: an unsplittable
    # one-file input otherwise runs the dominant map on one task; each
    # testdata table is one single-row-group parquet). Per-row math
    # and tie-broken windows are partition-independent, so the built
    # artifacts are bit-identical.
    emb = emb.repartition(spark.sparkContext.defaultParallelism)
    cent = _ivf_codebook(emb, "vec_id", "embedding", nc)

    art_dir = tempfile.mkdtemp(prefix="kw_graph_idx_")
    graph_path = os.path.join(art_dir, "graph")
    assign_dir = os.path.join(art_dir, "assign")
    cframe_path = os.path.join(art_dir, "cframe")
    try:
        ranked = _ivf_rank_cells(
            emb, cent, "vec_id", "embedding", n_probe
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # repartition-by-cell landing (st31's discipline): exactly ONE
        # file per occupied cell instead of tasks×cells tiny files —
        # measured 24 s → ~2 s for the write at sf0.1, and bounded file
        # count is the same property the 100 TB layout needs
        ranked.filter(F.col("cell_rank") == 1).select(
            "vec_id", "cvec", "cell"
        ).repartition("cell").write.partitionBy("cell").parquet(assign_dir)
        knn_graph(
            emb, k=k, n_probe=n_probe, cent=cent, ranked=ranked
        ).coalesce(8).write.parquet(graph_path)
        ranked.unpersist()
        (
            emb.select(
                F.col("vec_id").alias("node"),
                to_double_array(F.col("embedding")).alias("cvec"),
            )
            .withColumn("cnrm", norm(F.col("cvec")))
            .coalesce(4)
            .write.parquet(cframe_path)
        )
    except BaseException:
        shutil.rmtree(art_dir, ignore_errors=True)
        raise

    art = {
        "graph_path": graph_path,
        "assign_dir": assign_dir,
        "cframe_path": cframe_path,
        "n": n,
        "n_centroids": nc,
        "fingerprint": key[0],
        "artifacts_dir": art_dir,
    }
    _CACHE[key] = art
    return art


def read_graph(spark: SparkSession, art: dict) -> DataFrame:
    """The stored edge list, column-ordered as knn_graph returns it."""
    return spark.read.parquet(art["graph_path"]).select(
        "src_id", "nbr_id", "cos_sim", "rank"
    )


def read_assignment(spark: SparkSession, art: dict) -> DataFrame:
    """The stored assignment with the partition column restored to the
    long `_ivf_assign` emits (partition-value inference reads ints)."""
    return spark.read.parquet(art["assign_dir"]).select(
        "vec_id", "cvec", F.col("cell").cast("long").alias("cell")
    )


def read_cframe(spark: SparkSession, art: dict) -> DataFrame:
    """The stored norm-carrying vector table (node, cvec, cnrm)."""
    return spark.read.parquet(art["cframe_path"]).select(
        "node", "cvec", "cnrm"
    )
