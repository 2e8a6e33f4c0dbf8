"""Custom Python data source with connector-owned resource lifecycle —
the genuine Spark form of the reference's ManagedSource (reference
Node.scala:135-171): the engine, not the caller, owns open/stream/close,
and close runs exactly once per partition on success OR failure (ensuring
parity, reference Stream.scala:188-228).

Reads JSON-lines files: one input partition per file (split-parallel at
the file level — the unit a connector can open/close independently), one
file handle per partition opened in ``read`` and closed in ``finally``.
An optional ``lifecycle_log`` directory receives an ``open``/``close``
marker per partition so tests (and operators) can audit close-exactly-once
from the driver — executor-side state is otherwise invisible.

Scale note: a production connector yields Arrow record batches instead of
Python tuples (this API supports both); per-file partitioning means 10k
files → 10k independently scheduled, independently retried tasks, and a
task retry re-opens its own resource only — exactly the retry granularity
the reference's single-process ManagedSource cannot express.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManagedJsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._dir = options["path"]
        self._log = options.get("lifecycle_log")

    def partitions(self):
        files = sorted(
            os.path.join(self._dir, f) for f in os.listdir(self._dir) if f.endswith(".jsonl")
        )
        if not files:
            raise FileNotFoundError(f"no .jsonl files under {self._dir}")
        return [JsonlPartition(p) for p in files]

    def read(self, partition: JsonlPartition):
        fields = [f.name for f in self._schema.fields]
        log = self._log
        mark = uuid.uuid4().hex[:8]

        def audit(event: str) -> None:
            if log:
                with open(os.path.join(log, f"{event}-{mark}"), "w") as f:
                    f.write(partition.path)

        handle = open(partition.path, encoding="utf-8")
        audit("open")
        try:
            for line in handle:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(name) for name in fields)
        finally:
            handle.close()
            audit("close")


class ManagedJsonlDataSource(DataSource):
    """Register with ``spark.dataSource.register(ManagedJsonlDataSource)``;
    read with ``spark.read.format("ssp_jsonl").schema(ddl)
    .option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "ssp_jsonl"

    def schema(self):
        raise NotImplementedError("ssp_jsonl requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> ManagedJsonlReader:
        return ManagedJsonlReader(schema, self.options)
