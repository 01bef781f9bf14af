"""Custom Python DataSource SINK with two-phase commit:
``df.write.format("jsonlsink")``.

Completes the Python DataSource API trio (seriesgen covers the batch
reader and the streaming reader halves): a JSONL writer whose
visibility contract is MANIFEST-based two-phase commit —

1. every write task streams its partition to a ``part-<uuid>.jsonl``
   under ``_staging/`` and returns the file name + row count as its
   commit message;
2. ``commit()`` on the driver moves the named staging files into the
   target directory and writes ``_MANIFEST`` (the file list + counts)
   LAST — a reader that honors the manifest never sees a torn write;
3. ``abort()`` removes the staging directory, so failed/speculative
   task output is never visible.

This is the same atomicity recipe real lakehouse sinks use (Delta's
transaction log, Iceberg's snapshot manifest) reduced to its minimal
form. At 100 TB the staging rename is per-FILE metadata work, never a
data copy (same filesystem).

Options: ``path`` (required). Overwrite mode replaces the manifest
atomically (old files are removed after the new manifest lands).

``read_manifest`` is the matching reader helper: only manifest-listed
files are loaded, so partially-committed or orphaned part files are
invisible.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST"


class _PartMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires a path option")
        self.overwrite = overwrite

    # executor side: stage, never publish
    def write(self, iterator) -> _PartMessage:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartMessage(name, n)

    # driver side: publish exactly the staged files the tasks reported
    def commit(self, messages) -> None:
        import shutil

        staging = os.path.join(self.path, "_staging")
        entries = []
        for m in messages:
            if m is None:
                continue
            shutil.move(
                os.path.join(staging, m.filename),
                os.path.join(self.path, m.filename),
            )
            entries.append({"file": m.filename, "rows": m.n_rows})
        manifest_path = os.path.join(self.path, MANIFEST)
        old_files = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                prior = json.load(fh)["files"]
            if self.overwrite:
                # old generation becomes invisible, then its files are removed
                old_files = [e["file"] for e in prior]
            else:
                # append mode: the new manifest must keep every previously
                # committed entry, or earlier rows become invisible orphans
                entries = prior + entries
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"files": entries, "total_rows": sum(e["rows"] for e in entries)},
                fh,
            )
        os.replace(tmp, manifest_path)  # the atomic publish point
        for f in old_files:  # old generation invisible once manifest swapped
            p = os.path.join(self.path, f)
            if os.path.exists(p):
                os.remove(p)
        shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


def read_manifest(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read back ONLY manifest-listed files — the visibility contract."""
    with open(os.path.join(path, MANIFEST)) as fh:
        files = [os.path.join(path, e["file"]) for e in json.load(fh)["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
