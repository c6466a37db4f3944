"""Offset-resumable sharded stream source (SURVEY §2.2 — the
reference's CDC read path: ``custom_resource.py:331-332`` tails a
DynamoDB Stream with per-shard iterators from ``LATEST``).

The built-in ``FileSource`` models a stream as "new files are new
events" — Spark's file-stream semantics can't resume INSIDE a file,
so an appended shard is invisible. Real stream transports (Kinesis/
DynamoDB Streams/Kafka) are offset-addressed: a consumer holds a
per-shard position and restarts exactly there. This module supplies
that shape with the PySpark 4 Python Data Source API
(:class:`pyspark.sql.datasource.DataSourceStreamReader`):

* the "stream" is a directory of shard files (``*.jsonl``, one CDC
  record per line — appends and new shards both model live traffic);
* the OFFSET is ``{shard_name: line_position}`` — exactly a Kinesis
  shard-iterator map. Spark persists it in the streaming checkpoint's
  offset log, so a restarted query resumes mid-file with no re-apply
  and no loss, which is the property file streams cannot give;
* ``start_position`` is ``TRIM_HORIZON`` (read history) or ``LATEST``
  (only records arriving after the query starts) — the reference's
  ``start_position: LATEST``.

Scale: the driver touches only shard POSITIONS (``latestOffset`` scans
line counts); record bytes are read executor-side in ``read`` — one
input partition per (shard, range), so a many-shard stream fans out
across the cluster exactly like Kinesis→Spark mappings do.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# CDC record shape (matches streaming.pipeline.CDC_SCHEMA; declared as
# DDL here so the data source has no import cycle with the pipeline)
CDC_DDL = (
    "seq long, event_name string, event_ts string, "
    "pk string, sk string, new_image_json string"
)
_FIELDS = ("seq", "event_name", "event_ts", "pk", "sk", "new_image_json")


def _shard_files(root: str) -> dict[str, str]:
    """Current shard files, name → absolute path. Sorted for stable
    partition planning."""
    if not os.path.isdir(root):
        raise ValueError(f"sharded-stream: no such shards_root {root!r}")
    return {
        f: os.path.join(root, f)
        for f in sorted(os.listdir(root))
        if f.endswith((".jsonl", ".json")) and not f.startswith((".", "_"))
    }


def _count_lines(path: str) -> int:
    n = 0
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            n += chunk.count(b"\n")
    return n


class _ShardSlice(InputPartition):
    """One task's slice: (shard path, start line, end line)."""

    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ShardedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        root = options.get("shards_root")
        if not root:
            raise ValueError(
                "sharded-stream: option 'shards_root' is required"
            )
        self.root = root
        pos = str(options.get("start_position", "TRIM_HORIZON")).upper()
        if pos not in ("TRIM_HORIZON", "LATEST"):
            raise ValueError(
                f"sharded-stream: start_position must be TRIM_HORIZON or "
                f"LATEST, got {pos!r}"
            )
        self.start_position = pos

    # -- offsets: {shard_name: consumed_line_count} ----------------------

    def initialOffset(self) -> dict:
        # LATEST ≙ the reference's shard-iterator mode: only records
        # arriving after the query starts. TRIM_HORIZON reads history.
        # Only used for a FRESH query — a restart resumes from the
        # checkpointed offset instead (the Data Source contract).
        if self.start_position == "LATEST":
            return self.latestOffset()
        return {name: 0 for name in _shard_files(self.root)}

    def latestOffset(self) -> dict:
        return {
            name: _count_lines(path)
            for name, path in _shard_files(self.root).items()
        }

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        shards = _shard_files(self.root)
        out = []
        for name, hi in end.items():
            lo = start.get(name, 0)  # a NEW shard starts at horizon 0
            if hi > lo and name in shards:
                out.append(_ShardSlice(shards[name], lo, hi))
        return out

    def read(self, partition: _ShardSlice) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i >= partition.end:
                    break
                if i < partition.start or not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(k) for k in _FIELDS)

    def commit(self, end: dict) -> None:
        # file-backed shards need no broker-side ack; a real Kinesis
        # transport would checkpoint its lease table here
        pass


class ShardedStreamDataSource(DataSource):
    """``spark.readStream.format("sharded-stream")`` — registered once
    per session by :class:`ShardedStreamSource` (or manually via
    ``spark.dataSource.register``)."""

    @classmethod
    def name(cls) -> str:
        return "sharded-stream"

    def schema(self) -> str:
        return CDC_DDL

    def streamReader(self, schema) -> ShardedStreamReader:
        return ShardedStreamReader(dict(self.options))


def register_sharded_stream(spark) -> None:
    """Idempotently register the data source with the session."""
    spark.dataSource.register(ShardedStreamDataSource)
