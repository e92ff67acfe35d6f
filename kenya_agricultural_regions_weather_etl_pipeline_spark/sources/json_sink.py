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
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _PartFile(WriterCommitMessage):
        def __init__(self, filename: str, n_rows: int):
            self.filename = filename
            self.n_rows = n_rows

    class JsonDirWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_commit sink requires a 'path' option")

        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            fname = f"part-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, fname), "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _PartFile(fname, n)

        def commit(self, messages):
            manifest = {
                "files": sorted(m.filename for m in messages if m),
                "rows": sum(m.n_rows for m in messages if m),
            }
            tmp = os.path.join(self.path, MANIFEST + ".tmp")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, os.path.join(self.path, MANIFEST))

        def abort(self, messages):
            # no manifest -> nothing published; stray part files are
            # invisible to manifest-resolving readers
            pass

    class JsonCommitDataSource(DataSource):
        """``df.write.format("jsonl_commit").option("path", dir).save()``"""

        @classmethod
        def name(cls):
            return "jsonl_commit"

        def writer(self, schema, overwrite):
            return JsonDirWriter(self.options)

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
