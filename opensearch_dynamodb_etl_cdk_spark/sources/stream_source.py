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

Scale: the driver touches only shard POSITIONS — ``latestOffset``
counts newlines INCREMENTALLY (per-shard (size, lines) cache; each
trigger reads only bytes appended since the last), so per-trigger
driver I/O tracks new data, not stream history. Offsets carry both
the line and the byte position, so executor-side ``read`` seeks
straight to its slice instead of re-scanning consumed history — one
input partition per (shard, range), fanning out across the cluster
exactly like Kinesis→Spark mappings do.
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


def _pos(entry) -> tuple[int, int]:
    """(line, byte) from an offset entry; plain ints (line counts, the
    pre-round-8 format) resolve with byte unknown (-1 → line skip)."""
    if isinstance(entry, dict):
        return int(entry.get("line", 0)), int(entry.get("byte", 0))
    n = int(entry or 0)
    return n, (0 if n == 0 else -1)


class _ShardSlice(InputPartition):
    """One task's slice: (shard path, line range, start byte). A
    negative start byte means unknown — read() skips lines from 0."""

    def __init__(self, path: str, start: int, end: int, byte: int):
        self.path = path
        self.start = start
        self.end = end
        self.byte = byte


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
        # incremental scan cache: path → (size, lines, bytes counted).
        # latestOffset reads only APPENDED bytes per trigger, so
        # per-trigger driver I/O tracks new data, not stream history
        self._scan_cache: dict[str, tuple[int, int, int]] = {}

    # -- offsets: {shard_name: consumed_line_count} ----------------------

    def initialOffset(self) -> dict:
        # LATEST ≙ the reference's shard-iterator mode: only records
        # arriving after the query starts. TRIM_HORIZON reads history.
        # Only used for a FRESH query — a restart resumes from the
        # checkpointed offset instead (the Data Source contract).
        if self.start_position == "LATEST":
            return self.latestOffset()
        return {name: {"line": 0, "byte": 0}
                for name in _shard_files(self.root)}

    def _scan(self, path: str) -> tuple[int, int]:
        """(line_count, counted_byte) for a shard — ``counted_byte``
        is the position just after the LAST counted newline, NOT the
        raw file size: a torn append leaves a partial trailing line
        the line count (based on ``\\n``) excludes, and recording the
        raw size would make the next batch seek mid-record and
        json-parse the tail of a split line. Counts only the bytes
        appended since the previous call; a shrunken file
        (rewrite/truncate) rescans from zero."""
        size = os.path.getsize(path)
        cached = self._scan_cache.get(path)
        if cached and cached[0] == size:
            return cached[1], cached[2]
        lines, start = (cached[1], cached[2]) \
            if cached and size > cached[0] else (0, 0)
        counted, pos = start, start
        with open(path, "rb") as f:
            f.seek(start)
            for chunk in iter(lambda: f.read(1 << 20), b""):
                n = chunk.count(b"\n")
                lines += n
                if n:
                    counted = pos + chunk.rindex(b"\n") + 1
                pos += len(chunk)
        self._scan_cache[path] = (size, lines, counted)
        return lines, counted

    def latestOffset(self) -> dict:
        out = {}
        for name, path in _shard_files(self.root).items():
            lines, size = self._scan(path)
            out[name] = {"line": lines, "byte": size}
        return out

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        shards = _shard_files(self.root)
        out = []
        for name, hi_entry in end.items():
            hi, _hb = _pos(hi_entry)
            # a NEW shard starts at horizon 0
            lo, lb = _pos(start.get(name, 0))
            if hi > lo and name in shards:
                out.append(_ShardSlice(shards[name], lo, hi, lb))
        return out

    def read(self, partition: _ShardSlice) -> Iterator[tuple]:
        with open(partition.path, "rb") as fb:
            if partition.byte >= 0:
                # offset-addressed entry: jump straight to the start
                # byte — no re-read of consumed history
                fb.seek(partition.byte)
                n = partition.end - partition.start
                for _ in range(n):
                    line = fb.readline()
                    if not line:
                        break
                    if not line.strip():
                        continue
                    rec = json.loads(line.decode("utf-8"))
                    yield tuple(rec.get(k) for k in _FIELDS)
            else:  # legacy line-count offset: skip from the top
                for i, line in enumerate(fb):
                    if i >= partition.end:
                        break
                    if i < partition.start or not line.strip():
                        continue
                    rec = json.loads(line.decode("utf-8"))
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
