"""JSONL/CSV connector roundtrips + deterministic shard writer
(sources/files.py). Explicit-schema reads, PERMISSIVE quarantine, and
the exactly-N-shards / stable-order guarantees the training loader
depends on."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_training_shards,
)
from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.tables import (
    load_table,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
    ]
)


def _docs(spark, sf01):
    return load_table(spark, sf01, "documents").select("doc_id", "lang", "text")


def test_jsonl_roundtrip(spark, sf01, tmp_path):
    docs = _docs(spark, sf01)
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    # Spark disallows querying only the corrupt column straight off raw
    # files (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parse first
    back = read_jsonl(spark, path, DOC_SCHEMA).cache()
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 0
    a = sorted(docs.collect())
    b = sorted(back.drop("_corrupt").select("doc_id", "lang", "text").collect())
    assert a == b


def test_jsonl_quarantines_malformed_rows(spark, tmp_path):
    path = tmp_path / "bad"
    path.mkdir()
    (path / "part-0.json").write_text(
        '{"doc_id": 1, "lang": "en", "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "lang": "fr", "text": "aussi ok"}\n'
    )
    back = read_jsonl(spark, str(path), DOC_SCHEMA).cache()
    assert back.count() == 3
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 1
    assert back.filter(F.col("doc_id").isNotNull()).count() == 2


def test_csv_roundtrip(spark, sf01, tmp_path):
    docs = _docs(spark, sf01)
    path = str(tmp_path / "docs_csv")
    write_csv(docs, path)
    back = read_csv(spark, path, DOC_SCHEMA)
    assert sorted(docs.collect()) == sorted(
        back.select("doc_id", "lang", "text").collect()
    )


def test_shard_writer_exact_count_and_order(spark, sf01, tmp_path):
    docs = _docs(spark, sf01)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4, order_col="doc_id")
    import glob

    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # each shard is internally sorted and shards are range-disjoint
    import pandas as pd

    ranges = []
    for f in sorted(files):
        pdf = pd.read_parquet(f, columns=["doc_id"])
        assert pdf["doc_id"].is_monotonic_increasing
        ranges.append((pdf["doc_id"].min(), pdf["doc_id"].max()))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo


def test_parquet_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution at the STORAGE layer (the reference's ALTER TABLE
    ADD COLUMN twin): older parquet files lack a column added later;
    mergeSchema=true reads the union schema with nulls backfilled, and
    the new column's filter still prunes correctly."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(path)
    spark.range(5, 10).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit("new").alias("tag"),
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "v", "tag"}
    assert merged.count() == 10
    assert merged.filter(F.col("tag").isNull()).count() == 5
    assert merged.filter(F.col("tag") == "new").count() == 5


def test_jsonl_commit_sink_manifest_isolation(spark, tmp_path):
    """The manifest IS the committed dataset: stray part files dropped
    into the directory (failed/speculative task leftovers) must be
    invisible to the manifest-resolving reader."""
    import json
    import os

    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.json_sink import (
        MANIFEST,
        read_committed,
        register_json_sink,
    )

    assert register_json_sink(spark)
    path = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.write.format("jsonl_commit").option("path", path).mode("append").save()

    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 100
    part_files = [f for f in os.listdir(path) if f.startswith("part-")]
    assert sorted(manifest["files"]) == sorted(part_files)

    # orphan part file from an aborted task: on disk, not in the manifest
    with open(os.path.join(path, "part-orphan.jsonl"), "w") as fh:
        fh.write('{"id": 999999, "v": 0}\n')

    back = read_committed(spark, path, "id long, v long")
    assert back.count() == 100
    assert back.filter("id = 999999").count() == 0
    assert back.selectExpr("sum(v)").first()[0] == sum(2 * i for i in range(100))


def test_snapshot_versions_chain_and_time_travel(spark, tmp_path):
    """Versioned manifests: append chains the parent's files, overwrite
    starts a new file set, and a version-pinned read is STABLE across
    later commits (snapshot isolation)."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.json_sink import (
        read_snapshot,
        register_json_sink,
        snapshot_log,
    )

    assert register_json_sink(spark)
    path = str(tmp_path / "snap")
    schema = "id long, v long"

    def commit(lo, hi, mode):
        (
            spark.range(lo, hi)
            .selectExpr("id", "id * 2 AS v")
            .coalesce(1)
            .write.format("jsonl_commit")
            .option("path", path)
            .mode(mode)
            .save()
        )

    commit(0, 10, "append")     # v1: 0-9
    commit(10, 30, "append")    # v2: 0-29 (chains v1's files)
    v2_before = read_snapshot(spark, path, schema, version=2).count()
    commit(30, 35, "append")    # v3: 0-34
    commit(100, 104, "overwrite")  # v4: 100-103 only (new lineage)

    log = snapshot_log(path)
    assert [(s["version"], s["parent"], s["rows"]) for s in log] == [
        (1, None, 10),
        (2, 1, 30),
        (3, 2, 35),
        (4, 3, 4),
    ]
    # append shares data files: v3 = v2's files + 1 new
    assert log[2]["n_files"] == log[1]["n_files"] + 1
    # overwrite resets the file set without touching history
    assert log[3]["n_files"] == 1

    # time travel: pinned reads reflect their snapshot, not HEAD
    assert read_snapshot(spark, path, schema, version=1).count() == 10
    assert read_snapshot(spark, path, schema, version=2).count() == 30
    assert v2_before == 30
    v2_ids = read_snapshot(spark, path, schema, version=2)
    assert v2_ids.selectExpr("max(id)").first()[0] == 29
    # HEAD read = latest overwrite
    head = read_snapshot(spark, path, schema)
    assert sorted(r.id for r in head.collect()) == [100, 101, 102, 103]


def test_stream_writer_batch_replay_is_idempotent(tmp_path):
    """A micro-batch replayed after a crash-between-commit-and-checkpoint
    must NOT chain its files twice: the batch_id recorded in the
    manifest makes the streaming commit exactly-once."""
    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.json_sink import (
        _PartFile,
        JsonDirStreamWriter,
        snapshot_log,
    )

    path = str(tmp_path / "stream_sink")
    w = JsonDirStreamWriter({"path": path})
    import os

    os.makedirs(path)
    for fname, n in (("part-a.jsonl", 5), ("part-b.jsonl", 7)):
        with open(os.path.join(path, fname), "w") as fh:
            fh.write('{"x": 1}\n' * n)

    w.commit([_PartFile("part-a.jsonl", 5)], batchId=0)
    w.commit([_PartFile("part-b.jsonl", 7)], batchId=1)
    # replay of batch 1 (and a stale replay of batch 0): both no-ops
    w.commit([_PartFile("part-b.jsonl", 7)], batchId=1)
    w.commit([_PartFile("part-a.jsonl", 5)], batchId=0)

    log = snapshot_log(path)
    assert [(s["version"], s["rows"]) for s in log] == [(1, 5), (2, 12)]


def test_vacuum_expires_versions_and_deletes_orphans(spark, tmp_path):
    """vacuum(keep_last=2): retained snapshots (HEAD and HEAD-1) read
    bit-identically afterwards, expired versions are gone from disk and
    raise on time travel, and orphan part files from aborted tasks are
    unlinked. Live data files shared with expired versions survive
    (append-chained files are referenced by the retained manifests)."""
    import os

    from kenya_agricultural_regions_weather_etl_pipeline_spark.sources.json_sink import (
        read_snapshot,
        register_json_sink,
        snapshot_log,
        vacuum,
    )

    assert register_json_sink(spark)
    path = str(tmp_path / "vac")
    schema = "id long, v long"

    def commit(lo, hi, mode):
        (
            spark.range(lo, hi)
            .selectExpr("id", "id * 2 AS v")
            .coalesce(1)
            .write.format("jsonl_commit")
            .option("path", path)
            .mode(mode)
            .save()
        )

    commit(0, 10, "append")        # v1
    commit(100, 105, "overwrite")  # v2: new lineage, v1's file now dead
    commit(105, 120, "append")     # v3: chains v2's file
    commit(120, 125, "append")     # v4 (HEAD): chains v2+v3
    # orphan from a crashed/speculative task: present, never committed
    with open(os.path.join(path, "part-orphan.jsonl"), "w") as fh:
        fh.write('{"id": 0, "v": 0}\n')

    before_v3 = sorted(
        r.id for r in read_snapshot(spark, path, schema, version=3).collect()
    )
    stats = vacuum(path, keep_last=2)
    assert stats["head"] == 4 and stats["retained_from"] == 3
    # v1's dead file + the orphan deleted; v1/v2 manifests expired
    assert stats["n_data_files_deleted"] == 2
    assert stats["n_manifests_deleted"] == 2
    assert not os.path.exists(os.path.join(path, "part-orphan.jsonl"))

    # retained versions read bit-identically (shared v2 file survived)
    assert (
        sorted(r.id for r in read_snapshot(spark, path, schema, version=3).collect())
        == before_v3
    )
    head_ids = sorted(r.id for r in read_snapshot(spark, path, schema).collect())
    assert head_ids == list(range(100, 125))
    # expired version: manifest gone -> time travel raises
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, schema, version=1)
    # log skips expired versions, keeps the retained tail
    assert [s["version"] for s in snapshot_log(path)] == [3, 4]
    # on-disk part files == the live set exactly
    on_disk = [
        f for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".jsonl")
    ]
    assert len(on_disk) == stats["n_live_files"] == 3
    # idempotent: a second vacuum deletes nothing
    stats2 = vacuum(path, keep_last=2)
    assert stats2["n_data_files_deleted"] == 0
    assert stats2["n_manifests_deleted"] == 0


def test_parquet_schema_evolution_merge_schema(spark, tmp_path):
    """S4 read-side schema evolution: a table whose later writes added a
    column must read as ONE frame under mergeSchema — old rows surface
    NULL for the new column, new rows carry it, and pruning a pre-
    evolution column still works. This is the lakehouse 'add a column
    without rewriting history' contract (the alternative — a full table
    rewrite — is the thing you cannot do at 100 TB)."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "evolving")
    spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.parquet(path + "/batch=0")
    spark.range(10, 20).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("en").alias("lang")
    ).write.parquet(path + "/batch=1")

    df = spark.read.option("mergeSchema", "true").option(
        "basePath", path
    ).parquet(path)
    assert set(df.columns) == {"id", "v", "lang", "batch"}
    rows = {r.id: (r.v, r.lang) for r in df.collect()}
    assert len(rows) == 20
    assert rows[3] == (6, None)       # pre-evolution row: new col is NULL
    assert rows[15] == (30, "en")     # post-evolution row carries it
    # column pruning still reaches the scan for the original column
    plan = (
        df.select("v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lang" not in plan.split("ReadSchema")[-1][:200]
