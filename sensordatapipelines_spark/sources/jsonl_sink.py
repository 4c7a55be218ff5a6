"""Custom Python DataSource WRITER (PySpark 4 ``pyspark.sql.datasource``):
a JSON-lines sink with task-temp + driver-commit semantics.

Completes the custom-DataSource API surface next to the reader/stream
sides in ``sources/synthetic.py``: ``df.write.format("jsonl_sink")
.option("path", dir).save()`` writes one ``part-<N>.jsonl`` per input
partition. Each task writes to a ``.tmp-<uuid>`` file and returns its
name in the commit message; the DRIVER renames the temp files into place
in ``commit()`` and deletes them in ``abort()`` — the standard
two-phase-commit shape that keeps a failed/speculated task from leaving
a half-written part visible (the same protocol Spark's own
``FileCommitProtocol`` implements; local-filesystem contract, like the
GeoJSON sink).

JSON encoding is ``json.dumps`` with ``sort_keys`` and no whitespace —
deterministic bytes for a given Row, so tests can round-trip through
``spark.read.json`` and compare values.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartFile(WriterCommitMessage):
    tmp_name: str


class JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires .option('path', <dir>)")
        self.path = path
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> _PartFile:
        os.makedirs(self.path, exist_ok=True)
        tmp = f".tmp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                rec = {k: row[k] for k in self.fields}
                f.write(json.dumps(rec, sort_keys=True, separators=(",", ":")))
                f.write("\n")
                n += 1
        return _PartFile(tmp_name=tmp)

    def commit(self, messages) -> None:
        if self.overwrite:
            for old in os.listdir(self.path):
                if old.startswith("part-") and old.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, old))
        # In append mode the part numbering must CONTINUE past existing
        # parts: naming by message index alone would os.replace() over a
        # previous write's part-00000..N files and silently drop them.
        start = 0
        for old in os.listdir(self.path):
            if old.startswith("part-") and old.endswith(".jsonl"):
                try:
                    start = max(start, int(old[5:-6]) + 1)
                except ValueError:
                    continue
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"part-{start + i:05d}.jsonl"),
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlStreamWriter":
        return JsonlStreamWriter(self.options, schema)


def register_jsonl_sink(spark) -> None:
    """Idempotent registration of the custom sink on a session."""
    spark.dataSource.register(JsonlSinkDataSource)


class JsonlStreamWriter(DataSourceStreamWriter):
    """STREAMING side of the custom sink (PySpark 4
    ``DataSourceStreamWriter``): each micro-batch's tasks write temp
    files; the driver renames them into ``part-b{batchId}-{i}.jsonl`` in
    ``commit(messages, batchId)`` — batch-scoped names make replayed
    batches idempotent (a re-run of batch N replaces exactly batch N's
    parts, the same exactly-once contract Spark's own file sink keys on
    batch id)."""

    def __init__(self, options: dict, schema) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires .option('path', <dir>)")
        self.path = path
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator: Iterator) -> _PartFile:
        os.makedirs(self.path, exist_ok=True)
        tmp = f".tmp-{uuid.uuid4().hex}.jsonl"
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                rec = {k: row[k] for k in self.fields}
                f.write(json.dumps(rec, sort_keys=True, separators=(",", ":")))
                f.write("\n")
        return _PartFile(tmp_name=tmp)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        for old in os.listdir(self.path):
            if old.startswith(f"part-b{batchId:05d}-") and old.endswith(".jsonl"):
                os.remove(os.path.join(self.path, old))  # replay: replace batch
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"part-b{batchId:05d}-{i:05d}.jsonl"),
            )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass
