"""Connector seam tests (sources/connectors.py): a stub external
source drives bootstrap + tail end-to-end through the UNCHANGED
transform → route → merge path with the golden counts, and a stub
sink observes exactly the per-route slices the built-in index sink
merges. The registry's error surface and the DLQ-on-sink-failure
contract round it out."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.sources import connectors as C
from opensearch_dynamodb_etl_cdk_spark.sources.fixture_gen import (
    gen_cdc_events,
    gen_corpus,
    probe_item,
)
from opensearch_dynamodb_etl_cdk_spark.streaming.pipeline import (
    FlightsEtlPipeline,
    PipelineConfig,
)


def _cfg(tmp_path):
    return PipelineConfig(
        index_root=str(tmp_path / "indexes"),
        checkpoint_root=str(tmp_path / "chk"),
    )


class KinesisShapedStub(C.SourceConnector):
    """A Kinesis-shaped stub: records live in 'shards' (files) under a
    directory the connector owns; options carry the stream name. The
    point is the SHAPE — the pipeline sees only the contract frames,
    never the transport."""

    name = "kinesis-stub"

    def __init__(self, root: str):
        self.root = root

    def read_export(self, spark, options):
        stream = options.get("stream_name")
        if not stream:
            raise ValueError("kinesis-stub: stream_name required")
        return spark.read.parquet(os.path.join(self.root, stream, "export"))

    def read_stream(self, spark, options):
        from opensearch_dynamodb_etl_cdk_spark.streaming.pipeline import (
            CDC_SCHEMA,
        )

        stream = options.get("stream_name")
        if not stream:
            raise ValueError("kinesis-stub: stream_name required")
        return spark.readStream.schema(CDC_SCHEMA).json(
            os.path.join(self.root, stream, "shards")
        )


class RecordingSink(C.SinkConnector):
    """HTTP-bulk-shaped stub: instead of POSTing rendered actions it
    records per-route action counts, THEN delegates to the built-in
    index merge so the end state stays inspectable."""

    name = "recording"

    def __init__(self, fail_route: str | None = None):
        self.calls: list[tuple[int, str, int, int]] = []
        self.fail_route = fail_route
        self._inner = C.IndexMergeSink()

    def write_route(self, pipeline, route, df, epoch_id):
        if route == self.fail_route:
            raise RuntimeError("bulk endpoint returned 503")
        n_upsert = df.filter(F.col("_action") != "delete").count()
        n_delete = df.filter(F.col("_action") == "delete").count()
        self.calls.append((epoch_id, route, n_upsert, n_delete))
        self._inner.write_route(pipeline, route, df, epoch_id)


@pytest.fixture()
def stub_source(spark, tmp_path):
    root = str(tmp_path / "kinesis")
    stub = C.register_source_connector("kinesis-stub", KinesisShapedStub(root))
    # lay the 'stream': export snapshot + two CDC shard files
    export_dir = os.path.join(root, "travel", "export")
    spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    ).write.parquet(export_dir)
    shards = os.path.join(root, "travel", "shards")
    os.makedirs(shards, exist_ok=True)
    events = [e for e in gen_cdc_events() if e["seq"] > 40]
    half = len(events) // 2
    for i, chunk in enumerate((events[:half], events[half:])):
        with open(os.path.join(shards, f"shard_{i}.json"), "w") as f:
            for e in chunk:
                f.write(json.dumps(e) + "\n")
    yield stub
    C.unregister_source_connector("kinesis-stub")


def test_stub_connector_bootstrap_and_tail_end_to_end(
    spark, tmp_path, stub_source
):
    """The full reference dataflow driven ENTIRELY through the seam:
    registered source (export + stream) in, recording sink out, golden
    counts at every stage."""
    sink = RecordingSink()
    p = FlightsEtlPipeline(spark, _cfg(tmp_path), sink=sink)

    p.bootstrap_from("kinesis-stub", {"stream_name": "travel"})
    assert p.index_view("fare").count() == 22  # golden bootstrap counts
    assert p.index_view("flight").count() == 13
    boot = {(r, u, d) for (_e, r, u, d) in sink.calls}
    assert boot == {("fare", 22, 0), ("flight", 13, 0)}

    sink.calls.clear()
    q = p.start_stream(source="kinesis-stub",
                       options={"stream_name": "travel"})
    q.awaitTermination(120)
    # the tail applied: probe item landed through the same merge path
    probe = json.loads(probe_item())
    probe_id = f'{probe["PK"]["S"]}|{probe["SK"]["S"]}'
    assert p.index_view("fare").filter(F.col("_id") == probe_id).count() == 1
    assert sink.calls, "sink saw the streamed micro-batches"
    assert {r for (_e, r, _u, _d) in sink.calls} == {"fare", "flight"}
    assert all(e >= 0 for (e, *_rest) in sink.calls)  # real epoch ids
    # stream counts match the metrics table (same numbers, two observers)
    m = p.read_metrics().filter(F.col("epoch") >= 0)
    merged = {
        (r["epoch"], r["route"]): r["rows_merged"]
        for r in m.filter(F.col("route").isin("fare", "flight")).collect()
    }
    for (e, route, n_upsert, _d) in sink.calls:
        assert merged[(e, route)] == n_upsert


def test_default_sink_unchanged_and_bad_names_raise(spark, tmp_path):
    p = FlightsEtlPipeline(spark, _cfg(tmp_path))
    assert isinstance(p.sink, C.IndexMergeSink)  # back-compat default
    with pytest.raises(ValueError, match="unknown source connector"):
        p.bootstrap_from("nope")
    with pytest.raises(ValueError, match="unknown sink connector"):
        FlightsEtlPipeline(spark, _cfg(tmp_path), sink="nope")
    with pytest.raises(ValueError, match="cdc_path or source"):
        p.start_stream()
    with pytest.raises(TypeError, match="write_route"):
        FlightsEtlPipeline(spark, _cfg(tmp_path), sink=object())
    with pytest.raises(TypeError, match="read_export"):
        C.register_source_connector("bad", object())
    with pytest.raises(TypeError, match="write_route"):
        C.register_sink_connector("bad", object())


def test_nonstreaming_source_rejected(spark, tmp_path, stub_source):
    class BatchOnly(C.SourceConnector):
        def read_stream(self, spark_, options):
            return spark_.range(1)  # not a streaming frame

    C.register_source_connector("batch-only", BatchOnly())
    try:
        p = FlightsEtlPipeline(spark, _cfg(tmp_path))
        with pytest.raises(TypeError, match="streaming DataFrame"):
            p.start_stream(source="batch-only")
    finally:
        C.unregister_source_connector("batch-only")


def test_sink_failure_routes_to_dlq(spark, tmp_path):
    """A sink exception must not lose documents: the slice lands in the
    route's DLQ with the error, other routes merge normally — the W3
    contract holds for PLUGGED sinks exactly as for the built-in."""
    sink = RecordingSink(fail_route="fare")
    p = FlightsEtlPipeline(spark, _cfg(tmp_path), sink=sink)
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    )
    p.bootstrap(items)
    assert p.read_index("fare") is None  # fare never merged
    assert p.index_view("flight").count() == 13  # flight unaffected
    dlq = spark.read.parquet(
        os.path.join(p.cfg.index_root, "dlq", "fare")
    )
    assert dlq.count() == 22
    assert dlq.filter(F.col("_error").contains("503")).count() == 22
    m = {r["route"]: r["rows_dlq"] for r in p.read_metrics().collect()}
    assert m["fare"] == 22 and m["flight"] == 0


def test_file_source_builtin_roundtrip(spark, tmp_path):
    """The built-in 'file' source drives bootstrap through the same
    registry entry external connectors use."""
    export = str(tmp_path / "export")
    spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    ).write.parquet(export)
    p = FlightsEtlPipeline(spark, _cfg(tmp_path))
    p.bootstrap_from("file", {"export_path": export})
    assert p.index_view("fare").count() == 22
    with pytest.raises(ValueError, match="export_path"):
        p.bootstrap_from("file", {})
    # a frame without item_json is rejected loudly, not mis-parsed
    bad = str(tmp_path / "bad")
    spark.range(3).write.parquet(bad)
    with pytest.raises(ValueError, match="item_json"):
        p.bootstrap_from("file", {"export_path": bad})


def test_bulk_ndjson_sink_renders_public_bulk_bodies(spark, tmp_path):
    """The HTTP-bulk-shaped sink renders real _bulk request bodies:
    action-metadata + source pairs for upserts, bare delete actions,
    one exactly-once directory per (route, epoch)."""
    out = str(tmp_path / "bulk")
    p = FlightsEtlPipeline(spark, _cfg(tmp_path), sink=C.BulkNdjsonSink(out))
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    )
    p.bootstrap(items)

    def lines(route, epoch=-1):
        import glob

        got = []
        for f in sorted(glob.glob(os.path.join(out, route,
                                               f"epoch={epoch}",
                                               "part-*"))):
            with open(f) as fh:
                got.extend(ln for ln in fh.read().splitlines() if ln)
        return got

    fare = [json.loads(ln) for ln in lines("fare")]
    actions = [x for x in fare if set(x) <= {"index", "delete"}]
    sources = [x for x in fare if not (set(x) <= {"index", "delete"})]
    assert len(actions) == 22 and len(sources) == 22  # golden count
    assert all(a["index"]["_index"] == "fare" for a in actions)
    # pairs are adjacent: every action line is followed by its source
    raw = lines("fare")
    idx = [i for i, ln in enumerate(raw) if '"index"' in ln and
           json.loads(ln).get("index", {}).get("_index") == "fare"]
    for i in idx:
        src = json.loads(raw[i + 1])
        assert "index" not in src and "_id" not in src  # a source doc
        assert not set(src) & {"_action", "_bucket", "_seq"}  # no leaks
    # deletes render as bare action lines (REMOVE events carry no
    # image), landing in their OWN epoch directory (exactly-once:
    # a re-delivered micro-batch overwrites epoch=7, never appends)
    ev = [{"seq": 99, "event_name": "REMOVE", "event_ts": None,
           "pk": "DEN", "sk": "XXX", "new_image_json": None}]
    cdc = spark.createDataFrame(ev, "seq long, event_name string, "
                                "event_ts string, pk string, sk string, "
                                "new_image_json string")
    p._apply_batch(p.transform_cdc(cdc), epoch_id=7)
    dels = [json.loads(ln) for ln in lines("fare", epoch=7)]
    assert any(d.get("delete", {}).get("_id") == "DEN|XXX" for d in dels)
    p._apply_batch(p.transform_cdc(cdc), epoch_id=7)  # re-delivery
    assert [json.loads(ln) for ln in lines("fare", epoch=7)] == dels
