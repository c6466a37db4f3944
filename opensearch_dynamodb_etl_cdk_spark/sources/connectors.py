"""Pluggable external source/sink connectors (SURVEY §2.1/§2.5).

The reference's identity is CONNECTING real systems — a DynamoDB
export + stream on one side, an OpenSearch bulk endpoint on the other
(custom_resource.py:331-357 wires both ends of the OSIS pipeline).
This module is the engine's seam for the same job: a registry of
named source connectors (where export snapshots and CDC streams come
FROM) and sink connectors (where routed, merged documents go TO), so
a Kinesis/Kafka-shaped reader or an HTTP-bulk-shaped writer plugs
into the SAME transform → route → merge path the built-ins use —
exactly like ``operators/multimodal.py::register_decoder`` is the
seam for codecs.

Contracts (duck-typed; subclassing the bases is optional):

* **SourceConnector** — ``read_export(spark, options) -> DataFrame``
  returns a batch frame with an ``item_json`` column (DynamoDB-JSON
  item per row, the export-snapshot shape), and
  ``read_stream(spark, options) -> DataFrame`` returns a STREAMING
  frame with the CDC schema (seq/event_name/event_ts/pk/sk/
  new_image_json). The pipeline never cares where either came from.
* **SinkConnector** — ``write_route(pipeline, route, df, epoch_id)``
  receives one route's slice of a micro-batch (upserts + deletes,
  already transformed and routed). The built-in ``index`` sink MERGEs
  into the hash-bucketed parquet index table; an external sink would
  render ``_bulk`` actions and POST them. A raised exception routes
  the slice to the DLQ (W3) — the at-least-once retry semantics the
  reference gets from the OSIS ack loop.

Scale: connectors return/accept DataFrames, so all data movement
stays on executors — a connector that collects to the driver is
wrong by construction. Streaming sources compose with the pipeline's
checkpointing untouched (offsets tracking is the source's own
responsibility, exactly as with Kafka's ``startingOffsets``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class SourceConnector:
    """Base/protocol for export+stream readers. ``options`` is the
    per-call config dict (paths, topics, offsets, ...)."""

    name = "?"

    def read_export(self, spark: SparkSession, options: dict) -> DataFrame:
        raise NotImplementedError(
            f"source {self.name!r} does not support export snapshots"
        )

    def read_stream(self, spark: SparkSession, options: dict) -> DataFrame:
        raise NotImplementedError(
            f"source {self.name!r} does not support streaming reads"
        )


class SinkConnector:
    """Base/protocol for per-route batch writers."""

    name = "?"

    def write_route(
        self, pipeline, route: str, df: DataFrame, epoch_id: int
    ) -> None:
        raise NotImplementedError


class FileSource(SourceConnector):
    """The built-in file-backed source (test/dev stand-in for the
    DynamoDB export bucket + stream poller; prod registers a
    Kinesis/Kafka connector with the same two methods).

    options: ``export_path`` (parquet or json dir of item_json rows)
    for exports; ``stream_path`` (json dir, file-stream semantics —
    new files are new events) for streams.
    """

    name = "file"

    def read_export(self, spark: SparkSession, options: dict) -> DataFrame:
        path = options.get("export_path")
        if not path:
            raise ValueError("file source: options['export_path'] required")
        fmt = options.get("format", "parquet")
        df = spark.read.format(fmt).load(path)
        if "item_json" not in df.columns:
            raise ValueError(
                "file source: export frame must carry an item_json column"
            )
        return df

    def read_stream(self, spark: SparkSession, options: dict) -> DataFrame:
        from ..streaming.pipeline import CDC_SCHEMA

        path = options.get("stream_path")
        if not path:
            raise ValueError("file source: options['stream_path'] required")
        return spark.readStream.schema(CDC_SCHEMA).json(path)


class IndexMergeSink(SinkConnector):
    """The built-in sink: MERGE into the route's hash-bucketed parquet
    index table (exactly-once by (key, seq); see pipeline module
    docstring). This is the default — plugging a different sink in
    changes WHERE documents land, never how they were transformed."""

    name = "index"

    def write_route(
        self, pipeline, route: str, df: DataFrame, epoch_id: int
    ) -> None:
        pipeline._merge_route(df, route)


class BulkNdjsonSink(SinkConnector):
    """HTTP-bulk-shaped sink, with a file transport: renders each
    route's micro-batch slice as PUBLIC ``_bulk`` request bodies —
    action-metadata line followed by the source document for upserts,
    a bare delete action line for deletes:

        {"index": {"_index": "fare", "_id": "DEN|..."}}
        {"pk": "DEN", "sk": "...", ...}
        {"delete": {"_index": "fare", "_id": "LAX|..."}}

    Rendering happens EXECUTOR-side (``to_json`` over codegen structs;
    the driver never sees a document) into one NDJSON directory per
    (route, epoch). Re-delivery of a failed micro-batch overwrites its
    own epoch directory, so the rendered stream stays exactly-once
    like the parquet sink's MERGE. An HTTP transport would POST each
    partition's lines from ``foreachPartition`` — the render plan is
    identical, which is the point of the seam.
    """

    name = "bulk-ndjson"

    # merge bookkeeping columns that must not leak into _source
    _INTERNAL = ("_action", "_bucket", "_seq", "_deleted")

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def write_route(self, pipeline, route, df, epoch_id):
        import os

        from pyspark.sql import functions as F

        meta = F.struct(F.lit(route).alias("_index"), F.col("_id"))
        src_cols = [c for c in df.columns
                    if c not in self._INTERNAL and c != "_id"]
        ups = df.filter(F.col("_action") != "delete").select(
            F.concat(
                F.to_json(F.struct(meta.alias("index"))),
                F.lit("\n"),
                F.to_json(F.struct(*[F.col(c) for c in src_cols])),
            ).alias("value")
        )
        dels = df.filter(F.col("_action") == "delete").select(
            F.to_json(F.struct(meta.alias("delete"))).alias("value")
        )
        (
            ups.unionByName(dels)
            .write.mode("overwrite")
            .text(os.path.join(self.out_dir, route, f"epoch={epoch_id}"))
        )


_SOURCES: dict[str, SourceConnector] = {}
_SINKS: dict[str, SinkConnector] = {}
_BUILTIN_SOURCES = {"file": FileSource()}
_BUILTIN_SINKS = {"index": IndexMergeSink()}
_SOURCES.update(_BUILTIN_SOURCES)
_SINKS.update(_BUILTIN_SINKS)


def register_source_connector(
    name: str, connector: SourceConnector
) -> SourceConnector:
    """Plug in a named source (e.g. a Kinesis-shaped reader). The
    connector must expose ``read_export`` and/or ``read_stream`` with
    the documented frame contracts. Returns the connector (decorator-
    friendly)."""
    if not name or not isinstance(name, str):
        raise ValueError("source connector name must be a non-empty string")
    for m in ("read_export", "read_stream"):
        if not callable(getattr(connector, m, None)):
            raise TypeError(f"source connector must define {m}()")
    _SOURCES[name] = connector
    return connector


def register_sink_connector(name: str, connector: SinkConnector) -> SinkConnector:
    """Plug in a named sink (e.g. an HTTP-bulk-shaped writer)."""
    if not name or not isinstance(name, str):
        raise ValueError("sink connector name must be a non-empty string")
    if not callable(getattr(connector, "write_route", None)):
        raise TypeError("sink connector must define write_route()")
    _SINKS[name] = connector
    return connector


def unregister_source_connector(name: str) -> None:
    """Remove a plugged-in source; built-ins revert to themselves."""
    if name in _BUILTIN_SOURCES:
        _SOURCES[name] = _BUILTIN_SOURCES[name]
    else:
        _SOURCES.pop(name, None)


def unregister_sink_connector(name: str) -> None:
    if name in _BUILTIN_SINKS:
        _SINKS[name] = _BUILTIN_SINKS[name]
    else:
        _SINKS.pop(name, None)


def get_source_connector(name: str) -> SourceConnector:
    try:
        return _SOURCES[name]
    except KeyError:
        raise ValueError(
            f"unknown source connector {name!r} (registered: "
            f"{sorted(_SOURCES)})"
        ) from None


def get_sink_connector(name: str) -> SinkConnector:
    try:
        return _SINKS[name]
    except KeyError:
        raise ValueError(
            f"unknown sink connector {name!r} (registered: "
            f"{sorted(_SINKS)})"
        ) from None
