"""Python DataSource WRITER: a manifest-committed JSONL sink.

The write-side twin of the ``weather_api`` custom source
(/root/reference/daily_weather_etl_kenya.py loads via psycopg2 INSERT;
the Spark-native shape is a DataSource writer with a two-phase commit):

- each task serializes its partition to ``part-<uuid>.jsonl`` inside the
  target directory and returns the filename + row count as its commit
  message (executor-side, parallel, no driver involvement);
- the driver's ``commit`` publishes atomically by writing ``_MANIFEST``
  — the list of files that constitute the committed dataset;
- ``abort`` writes nothing, so half-written part files from failed or
  speculative tasks are simply never referenced.

Readers therefore MUST resolve the manifest (``read_committed``): a
directory listing would see uncommitted garbage. This is the same
manifest-pointer pattern object-store table formats use for atomic
publish; at 100 TB the manifest stays driver-sized (one line per task).

VERSIONED SNAPSHOTS (the time-travel half of the pattern): every commit
also publishes an immutable ``_MANIFEST.v{N}`` and flips the ``_HEAD``
pointer atomically. ``mode("append")`` chains the parent's file list
(data files are append-only and shared across versions — a commit costs
one manifest, not a rewrite); ``mode("overwrite")`` starts a new file
set while old versions stay readable. ``read_snapshot(version=N)``
pins a read to any historical version regardless of later commits —
snapshot isolation by construction, since manifests are immutable and
the pointer flip is the only mutation. Single-writer is assumed here;
a real object-store deployment would CAS the pointer swap.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"
HEAD = "_HEAD"


def _read_json(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)

def _write_part(path: str, iterator) -> tuple[str, int]:
    """Task-side part write shared by the batch and streaming writers."""
    os.makedirs(path, exist_ok=True)
    fname = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(path, fname), "w") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return fname, n


def _commit_snapshot(
    path: str,
    new_files: list[str],
    n_new: int,
    overwrite: bool,
    batch_id: int | None = None,
) -> None:
    """Driver-side snapshot commit shared by the batch and streaming
    writers: resolve parent via HEAD, chain (append) or reset
    (overwrite) the file list, publish the immutable per-version
    manifest, then flip the pointer LAST."""
    head_path = os.path.join(path, HEAD)
    parent, parent_files, parent_rows = 0, [], 0
    if os.path.exists(head_path):
        parent = _read_json(head_path)["version"]
        pm = _read_json(os.path.join(path, f"{MANIFEST}.v{parent}"))
        parent_files, parent_rows = pm["files"], pm["rows"]
    if overwrite:
        files, rows = new_files, n_new
    else:
        files, rows = sorted(parent_files + new_files), parent_rows + n_new
    version = parent + 1
    manifest = {
        "version": version,
        "parent": parent or None,
        "files": files,
        "rows": rows,
    }
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    _write_json_atomic(os.path.join(path, f"{MANIFEST}.v{version}"), manifest)
    _write_json_atomic(os.path.join(path, MANIFEST), manifest)
    _write_json_atomic(head_path, {"version": version})


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _PartFile(WriterCommitMessage):
        def __init__(self, filename: str, n_rows: int):
            self.filename = filename
            self.n_rows = n_rows

    class JsonDirWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool = False):
            self.path = options.get("path")
            self.overwrite = overwrite
            if not self.path:
                raise ValueError("jsonl_commit sink requires a 'path' option")

        def write(self, iterator):
            return _PartFile(*_write_part(self.path, iterator))

        def commit(self, messages):
            # immutable per-version manifest, latest-alias, then the
            # pointer flip LAST — a crash between steps leaves the old
            # head intact and the new version simply unreferenced
            _commit_snapshot(
                self.path,
                sorted(m.filename for m in messages if m),
                sum(m.n_rows for m in messages if m),
                self.overwrite,
            )

        def abort(self, messages):
            # no manifest -> nothing published; stray part files are
            # invisible to manifest-resolving readers
            pass

    class JsonDirStreamWriter(DataSourceStreamWriter):
        """Streaming twin of :class:`JsonDirWriter`: every micro-batch
        commits ONE append snapshot (immutable manifest + HEAD flip),
        so a stream materializes as a table-format commit log — any
        prefix of the stream is readable via ``read_snapshot``.
        Replayed batches (restart after a crash between sink commit and
        checkpoint write) are detected by the recorded batch_id and
        skipped, keeping the log exactly-once."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_commit sink requires a 'path' option")

        def write(self, iterator):
            return _PartFile(*_write_part(self.path, iterator))

        def commit(self, messages, batchId):
            head_path = os.path.join(self.path, HEAD)
            if os.path.exists(head_path):
                head = _read_json(head_path)["version"]
                last = _read_json(
                    os.path.join(self.path, f"{MANIFEST}.v{head}")
                ).get("batch_id")
                if last is not None and batchId <= last:
                    return  # replayed batch: already in the log
            _commit_snapshot(
                self.path,
                sorted(m.filename for m in messages if m),
                sum(m.n_rows for m in messages if m),
                overwrite=False,
                batch_id=batchId,
            )

        def abort(self, messages, batchId):
            pass  # unreferenced part files stay invisible

    class JsonCommitDataSource(DataSource):
        """``df.write.format("jsonl_commit").option("path", dir).save()``
        (batch) and ``df.writeStream.format("jsonl_commit")`` (one
        snapshot commit per micro-batch)."""

        @classmethod
        def name(cls):
            return "jsonl_commit"

        def writer(self, schema, overwrite):
            return JsonDirWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite):
            return JsonDirStreamWriter(self.options)

    HAS_WRITER_API = True
except Exception:  # pragma: no cover - older pyspark
    JsonCommitDataSource = None  # type: ignore[assignment]
    HAS_WRITER_API = False


def register_json_sink(spark: SparkSession) -> bool:
    if not HAS_WRITER_API:  # pragma: no cover
        return False
    try:
        spark.dataSource.register(JsonCommitDataSource)
    except Exception:
        pass  # already registered in this session
    return True


def read_committed(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read ONLY the files the manifest references (the transactional
    contract — uncommitted part files are invisible). The manifest read
    is a driver-side metadata fetch, one line per committed task."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    return spark.read.schema(schema).json(files)


def read_snapshot(
    spark: SparkSession, path: str, schema: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: pin to snapshot ``version`` (or HEAD when
    None). Manifests are immutable, so a version-pinned read returns
    the same rows forever, regardless of later commits — snapshot
    isolation without locks. Metadata cost: two driver-side JSON reads."""
    if version is None:
        version = _read_json(os.path.join(path, HEAD))["version"]
    manifest = _read_json(os.path.join(path, f"{MANIFEST}.v{version}"))
    files = [os.path.join(path, f) for f in manifest["files"]]
    return spark.read.schema(schema).json(files)


def vacuum(path: str, keep_last: int = 2) -> dict:
    """Retention maintenance for the versioned snapshot sink: expire all
    but the newest ``keep_last`` snapshots and physically delete every
    data file no retained manifest references.

    This is the table-format VACUUM: because commits only ever ADD part
    files and manifests are immutable, the live set is exactly the
    union of the retained manifests' file lists — anything else in the
    directory is either an expired version's data or an orphan from an
    aborted/speculative task, and both are safe to unlink. Metadata and
    deletes are all driver-side (one JSON read per retained version,
    one listing); no Spark job runs. After vacuum, ``read_snapshot`` on
    an expired version raises (its manifest is gone) while every
    retained version — HEAD included — reads bit-identically.

    Single-writer assumption as for commits: don't vacuum concurrently
    with a writer, or a just-written uncommitted part file would look
    like an orphan (real table formats age-gate orphan deletion for
    this reason).
    """
    head = _read_json(os.path.join(path, HEAD))["version"]
    lo = max(1, head - keep_last + 1)
    live: set[str] = set()
    for v in range(lo, head + 1):
        live.update(_read_json(os.path.join(path, f"{MANIFEST}.v{v}"))["files"])
    n_data, n_manifests = 0, 0
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if entry in (MANIFEST, HEAD) or not os.path.isfile(full):
            continue
        if entry.startswith(f"{MANIFEST}.v"):
            if int(entry.rsplit(".v", 1)[1]) < lo:
                os.unlink(full)
                n_manifests += 1
        elif entry not in live:
            os.unlink(full)
            n_data += 1
    return {
        "head": head,
        "retained_from": lo,
        "n_data_files_deleted": n_data,
        "n_manifests_deleted": n_manifests,
        "n_live_files": len(live),
    }


def snapshot_log(path: str) -> list[dict]:
    """The commit log, oldest first: (version, parent, n_files, rows)
    per snapshot — driver-side metadata only."""
    head = _read_json(os.path.join(path, HEAD))["version"]
    out = []
    for v in range(1, head + 1):
        if not os.path.exists(os.path.join(path, f"{MANIFEST}.v{v}")):
            continue  # expired by vacuum()
        m = _read_json(os.path.join(path, f"{MANIFEST}.v{v}"))
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "n_files": len(m["files"]),
                "rows": m["rows"],
            }
        )
    return out
