"""Custom Python DataSource WRITER (Spark 4 ``pyspark.sql.datasource``):
a manifest-committed JSONL sink demonstrating the two-phase commit
protocol that makes distributed writes atomic.

Why this shape matters at scale: a 1000-task write fails atomically or
not at all only if visibility is decoupled from writing. Here each task
streams its partition to a uniquely-named shard (task failures/retries
can never collide — the attempt id is in the name), returns a
``WriterCommitMessage`` (shard path + row count), and ONLY the driver's
``commit`` publishes ``manifest.json`` listing the finished shards.
Readers go through the manifest, so half-written jobs are invisible:
``abort`` deletes orphan shards, and a crash before commit leaves data
files but no manifest — the same contract as Hadoop committers /
Iceberg snapshot publish.

Usage::

    spark.dataSource.register(ManifestJsonlDataSource)   # or register_…
    df.write.format("manifest_jsonl").mode("append") \\
      .option("path", "/out/dir").save()
    read_manifest_jsonl(spark, "/out/dir")   # manifest-gated read
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class ShardCommit(WriterCommitMessage):
    path: str
    n_rows: int


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self._dir = options["path"]
        self._columns = schema.fieldNames()
        self._overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> ShardCommit:
        # executor-side: unique shard name per task attempt — retries of
        # the same partition write DIFFERENT files; only the attempt whose
        # message reaches commit() becomes visible
        os.makedirs(self._dir, exist_ok=True)
        shard = os.path.join(self._dir, f"shard-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(shard, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self._columns, row))) + "\n")
                n += 1
        return ShardCommit(path=shard, n_rows=n)

    def commit(self, messages) -> None:
        # driver-side, runs once, after EVERY task succeeded: atomic
        # publish via rename (os.replace is atomic on POSIX)
        shards = [
            {"path": os.path.basename(m.path), "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        manifest = {
            "shards": shards,
            "total_rows": sum(s["n_rows"] for s in shards),
            "columns": self._columns,
        }
        tmp = os.path.join(self._dir, f"_manifest.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self._dir, "manifest.json"))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ManifestJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> ManifestJsonlWriter:
        return ManifestJsonlWriter(self.options, schema, overwrite)


def register_manifest_sink(spark) -> None:
    """By-value registration (same worker sys.path discipline as
    ``pydatasource.register_ine_source``)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(ManifestJsonlDataSource)


def read_manifest_jsonl(spark, path: str):
    """Manifest-gated read: only shards the committed manifest lists are
    visible — orphans from failed attempts are ignored by construction."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, s["path"]) for s in manifest["shards"]]
    return spark.read.json(files) if files else None
