"""Manifest-committed JSONL sink (+ reader) on the Python DataSource API.

The read side of the Spark 4 Python DataSource API is covered by
``http_csv_source.py``; this module exercises the WRITE side — the
task/driver commit protocol that makes a distributed write look
atomic:

- ``write()`` runs per task on EXECUTORS: rows stream to a
  task-unique file under ``<path>/_staging/<job_id>/`` and the task
  returns a :class:`WriterCommitMessage` naming what it wrote.  A
  retried/speculative task writes a DIFFERENT staging file; nothing a
  failed attempt left behind is ever visible.
- ``commit(messages)`` runs ONCE on the driver with the messages of
  the SUCCESSFUL attempt of each task: it moves exactly those files
  into place and then atomically publishes ``_MANIFEST.json``
  (``os.replace``) listing the committed files + row counts.
- ``abort(messages)`` removes the staging directory; a crashed job
  leaves the previous manifest — and therefore the previous table
  contents — untouched.

Readers (the bundled reader, one input partition per manifest entry)
list the MANIFEST, not the directory, so partial/duplicate/aborted
files can never surface: writer-side exactly-once visibility with
reader-side snapshot isolation — the commit design every table format
(Delta/Iceberg/Hive FileOutputCommitter v2) builds on, here in its
minimal auditable form.

Usage::

    df.write.format("jsonl_manifest").mode("overwrite").save(path)
    spark.read.format("jsonl_manifest").schema(ddl).load(path)

JSON values: str/int/float/bool pass through; date/timestamp
serialize ISO-8601 and are re-parsed on read via the declared read
schema (the reader requires an explicit schema — same contract as the
http_csv source).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, staged_name: str, n_rows: int):
        self.staged_name = staged_name
        self.n_rows = n_rows


def _to_jsonable(v):
    if v is None or isinstance(v, (str, int, float, bool)):
        return v
    return str(v)  # date/datetime/decimal → ISO-ish text


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest: .save(path) is required")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # chosen on the DRIVER, shipped inside the pickled writer: every
        # task of this job stages under the same job directory
        self.job_id = uuid.uuid4().hex

    # -- executor side ---------------------------------------------------
    def write(self, iterator: Iterator) -> JsonlCommitMessage:
        staging = os.path.join(self.path, "_staging", self.job_id)
        os.makedirs(staging, exist_ok=True)
        name = f"task-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as fh:
            for row in iterator:
                d = {f: _to_jsonable(v) for f, v in zip(self.fields, row)}
                fh.write(json.dumps(d, sort_keys=True) + "\n")
                n += 1
        return JsonlCommitMessage(name, n)

    # -- driver side -----------------------------------------------------
    def commit(self, messages) -> None:
        import shutil

        staging = os.path.join(self.path, "_staging", self.job_id)
        committed = []
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-{i:05d}-{self.job_id}.jsonl"
            os.replace(
                os.path.join(staging, m.staged_name),
                os.path.join(self.path, final),
            )
            committed.append({"file": final, "n_rows": m.n_rows})
        manifest = {"files": committed, "job_id": self.job_id}
        if not self.overwrite and os.path.exists(
            os.path.join(self.path, MANIFEST)
        ):
            with open(os.path.join(self.path, MANIFEST)) as fh:
                manifest["files"] = json.load(fh)["files"] + committed
        tmp = os.path.join(self.path, f"{MANIFEST}.{self.job_id}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, MANIFEST))  # atomic publish
        shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(
            os.path.join(self.path, "_staging", self.job_id),
            ignore_errors=True,
        )


class _FilePartition(InputPartition):
    def __init__(self, idx: int, fname: str):
        super().__init__(idx)
        self.fname = fname


class JsonlManifestReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest: .load(path) is required")
        self.schema = schema

    def partitions(self):
        with open(os.path.join(self.path, MANIFEST)) as fh:
            files = [e["file"] for e in json.load(fh)["files"]]
        return [_FilePartition(i, f) for i, f in enumerate(files)]

    def read(self, partition: _FilePartition):
        from pyspark.sql.types import (
            DateType,
            TimestampNTZType,
            TimestampType,
        )

        convs = []
        for f in self.schema.fields:
            if isinstance(f.dataType, (TimestampType, TimestampNTZType)):
                from datetime import datetime

                convs.append((f.name, lambda s: datetime.fromisoformat(s)))
            elif isinstance(f.dataType, DateType):
                from datetime import date

                convs.append((f.name, lambda s: date.fromisoformat(s)))
            else:
                convs.append((f.name, lambda v: v))
        with open(os.path.join(self.path, partition.fname)) as fh:
            for line in fh:
                d = json.loads(line)
                yield tuple(
                    conv(d[name]) if d.get(name) is not None else None
                    for name, conv in convs
                )


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> JsonlManifestWriter:
        return JsonlManifestWriter(self.options, schema, overwrite)

    def reader(self, schema) -> JsonlManifestReader:
        return JsonlManifestReader(self.options, schema)


def register_jsonl_manifest(spark) -> None:
    spark.dataSource.register(JsonlManifestDataSource)
