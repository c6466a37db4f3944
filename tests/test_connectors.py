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


# -- HTTP transport for the bulk sink ------------------------------------

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer  # noqa: E402
import threading  # noqa: E402


class _BulkHandler(BaseHTTPRequestHandler):
    """Records every _bulk POST; response mode set on the server:
    'ok' → 200 {"errors": false}; '500' → HTTP 500;
    'item-errors' → 200 with the public per-item errors flag."""

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n).decode("utf-8")
        with self.server.lock:
            self.server.requests.append({
                "path": self.path,
                "route": self.headers.get("X-Route"),
                "epoch": self.headers.get("X-Epoch"),
                "content_type": self.headers.get("Content-Type"),
                "body": body,
            })
        mode = self.server.mode
        if mode == "500":
            payload = b'{"error": "rejected"}'
            self.send_response(500)
        elif mode == "item-errors":
            payload = (b'{"took": 1, "errors": true, "items": '
                       b'[{"index": {"status": 429}}]}')
            self.send_response(200)
        else:
            payload = b'{"took": 1, "errors": false, "items": []}'
            self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *_a):  # quiet test output
        pass


@pytest.fixture()
def bulk_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _BulkHandler)
    srv.requests, srv.lock, srv.mode = [], threading.Lock(), "ok"
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(10)


def _actions(requests, route=None):
    """Parse recorded NDJSON bodies back into (action, meta, source)."""
    out = []
    for req in requests:
        if route is not None and req["route"] != route:
            continue
        lines = [json.loads(ln) for ln in req["body"].splitlines() if ln]
        i = 0
        while i < len(lines):
            (kind, meta), = lines[i].items()
            if kind == "index":
                out.append((kind, meta, lines[i + 1]))
                i += 2
            else:
                assert kind == "delete"
                out.append((kind, meta, None))
                i += 1
    return out


def test_bulk_http_sink_delivers_bootstrap_and_tail(
    spark, tmp_path, bulk_server
):
    """The reference's write path end-to-end: bootstrap + CDC tail
    POST real public _bulk bodies INTO a live (local) HTTP server —
    golden counts, adjacent action/source pairs, bounded request
    sizes, idempotent-by-_id actions."""
    port = bulk_server.server_address[1]
    sink = C.BulkHttpSink(f"http://127.0.0.1:{port}",
                          max_actions_per_request=10)
    p = FlightsEtlPipeline(spark, _cfg(tmp_path), sink=sink)
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    )
    p.bootstrap(items)

    reqs = list(bulk_server.requests)
    assert reqs and all(r["path"] == "/_bulk" for r in reqs)
    assert all(r["content_type"] == "application/x-ndjson" for r in reqs)
    assert {r["epoch"] for r in reqs} == {"-1"}  # bootstrap epoch
    fare = _actions(reqs, "fare")
    flight = _actions(reqs, "flight")
    assert len(fare) == 22 and len(flight) == 13  # golden counts
    assert all(k == "index" and m["_index"] == "fare" and m["_id"]
               for k, m, _s in fare)
    # source docs carry data, never merge bookkeeping or the _id
    for _k, _m, src in fare:
        assert src and not set(src) & {"_action", "_bucket", "_seq", "_id"}
    # chunking: every request bounded by max_actions_per_request
    for r in reqs:
        # count metadata lines precisely: lines whose single key is an
        # action verb AND whose value carries _index
        n_actions = sum(
            1 for ln in r["body"].splitlines() if ln
            for obj in [json.loads(ln)]
            if len(obj) == 1 and next(iter(obj)) in ("index", "delete")
            and "_index" in next(iter(obj.values()))
        )
        assert 1 <= n_actions <= 10

    # -- tail: CDC events (upserts + REMOVEs) through the SAME sink
    bulk_server.requests.clear()
    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    events = [e for e in gen_cdc_events() if e["seq"] > 40]
    with open(cdc_dir / "events.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    q = p.start_stream(cdc_path=str(cdc_dir))
    q.awaitTermination(120)

    reqs = list(bulk_server.requests)
    assert reqs and all(int(r["epoch"]) >= 0 for r in reqs)
    assert {r["route"] for r in reqs} == {"fare", "flight"}
    probe = json.loads(probe_item())
    probe_id = f'{probe["PK"]["S"]}|{probe["SK"]["S"]}'
    fare = _actions(reqs, "fare")
    assert any(k == "index" and m["_id"] == probe_id for k, m, _s in fare)
    # REMOVE events render as bare delete actions on every route
    n_removes = sum(1 for e in events if e["event_name"] == "REMOVE")
    assert n_removes > 0
    assert sum(1 for k, _m, _s in fare if k == "delete") == n_removes
    assert sum(1 for k, _m, _s in _actions(reqs, "flight")
               if k == "delete") == n_removes


def test_bulk_http_sink_failures_land_in_dlq(spark, tmp_path, bulk_server):
    """Non-2xx responses, per-item errors flags, and connection
    failures all raise inside the sink — the pipeline's W3 contract
    routes the whole slice to the DLQ, losing nothing."""
    port = bulk_server.server_address[1]
    items_rows = [(s,) for s in gen_corpus()]

    bulk_server.mode = "500"
    p = FlightsEtlPipeline(
        spark, _cfg(tmp_path / "a"),
        sink=C.BulkHttpSink(f"http://127.0.0.1:{port}"))
    p.bootstrap(spark.createDataFrame(items_rows, "item_json string"))
    dlq = spark.read.parquet(
        os.path.join(p.cfg.index_root, "dlq", "fare"))
    assert dlq.count() == 22
    assert dlq.filter(F.col("_error").contains("HTTP 500")).count() == 22
    m = {r["route"]: r["rows_dlq"] for r in p.read_metrics().collect()}
    assert m["fare"] == 22 and m["flight"] == 13

    # 200 + {"errors": true}: half-landed bulks must also fail loudly
    bulk_server.mode = "item-errors"
    p2 = FlightsEtlPipeline(
        spark, _cfg(tmp_path / "b"),
        sink=C.BulkHttpSink(f"http://127.0.0.1:{port}"))
    p2.bootstrap(spark.createDataFrame(items_rows, "item_json string"))
    dlq2 = spark.read.parquet(
        os.path.join(p2.cfg.index_root, "dlq", "fare"))
    assert dlq2.filter(
        F.col("_error").contains("item errors")).count() == 22

    # connection refused (nothing listens on the ephemeral port 1)
    p3 = FlightsEtlPipeline(
        spark, _cfg(tmp_path / "c"),
        sink=C.BulkHttpSink("http://127.0.0.1:1", timeout=2))
    p3.bootstrap(spark.createDataFrame(items_rows, "item_json string"))
    dlq3 = spark.read.parquet(
        os.path.join(p3.cfg.index_root, "dlq", "fare"))
    assert dlq3.count() == 22


def test_bulk_http_sink_validation():
    with pytest.raises(ValueError, match="endpoint"):
        C.BulkHttpSink("ftp://x")
    with pytest.raises(ValueError, match="endpoint"):
        C.BulkHttpSink("not a url")
    with pytest.raises(ValueError, match="max_actions_per_request"):
        C.BulkHttpSink("http://h:1", max_actions_per_request=0)


# -- offset-resumable sharded stream source --------------------------------


def _write_shard(path, events, append=False):
    with open(path, "a" if append else "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _consumed_per_epoch(p):
    """Distinct (epoch, rows_in) from the metrics table: how many CDC
    records each micro-batch consumed (rows_in repeats per route row)."""
    return {
        r["epoch"]: r["rows_in"]
        for r in p.read_metrics().filter(F.col("epoch") >= 0)
        .select("epoch", "rows_in").distinct().collect()
    }


def test_sharded_stream_source_offset_resume(spark, tmp_path):
    """The reference's read path through the seam: a per-shard
    offset-addressed tail. Offsets ({shard: line}) flow through the
    streaming checkpoint — a restart resumes MID-FILE: appended
    records apply exactly once, consumed history never re-applies,
    new shards start at horizon. File streams cannot do any of this;
    this is the Kinesis-shaped capability the connector adds."""
    p = FlightsEtlPipeline(spark, _cfg(tmp_path))
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    )
    p.bootstrap(items)

    shards = tmp_path / "shards"
    shards.mkdir()
    events = [e for e in gen_cdc_events() if e["seq"] > 40]
    half = len(events) // 2
    _write_shard(shards / "shard_0.jsonl", events[:half])
    _write_shard(shards / "shard_1.jsonl", events[half:])
    opts = {"shards_root": str(shards)}

    q = p.start_stream(source="sharded-stream", options=opts)
    q.awaitTermination(120)
    count1 = p.index_view("fare").count()
    probe = json.loads(probe_item())
    probe_id = f'{probe["PK"]["S"]}|{probe["SK"]["S"]}'
    assert p.index_view("fare").filter(
        F.col("_id") == probe_id).count() == 1
    assert sum(_consumed_per_epoch(p).values()) == len(events)

    # the checkpointed offsets ARE per-shard line positions
    off_dir = os.path.join(p.cfg.checkpoint_root, "offsets")
    latest = sorted((f for f in os.listdir(off_dir) if f.isdigit()),
                    key=int)[-1]
    with open(os.path.join(off_dir, latest)) as f:
        off_log = f.read()
    assert "shard_0.jsonl" in off_log and "shard_1.jsonl" in off_log

    # restart with no new data: nothing re-applies, nothing consumed
    q = p.start_stream(source="sharded-stream", options=opts)
    q.awaitTermination(120)
    assert p.index_view("fare").count() == count1
    assert sum(_consumed_per_epoch(p).values()) == len(events)

    # APPEND to an existing shard (a REMOVE for the probe) and add a
    # brand-new shard (one fresh upsert): restart consumes exactly the
    # two new records — mid-file resume, horizon-start for new shards
    _write_shard(shards / "shard_0.jsonl", [{
        "seq": 1000, "event_name": "REMOVE",
        "event_ts": "2021-12-13T00:00:00",
        "pk": probe["PK"]["S"], "sk": probe["SK"]["S"],
        "new_image_json": None,
    }], append=True)
    fresh = dict(json.loads(probe_item()))
    _write_shard(shards / "shard_2.jsonl", [{
        "seq": 1001, "event_name": "INSERT",
        "event_ts": "2021-12-13T01:00:00",
        "pk": "ZRH", "sk": "ZRH#2021-12-13",
        "new_image_json": json.dumps(
            {k: v for k, v in json.loads(probe_item()).items()}
        ).replace(probe["PK"]["S"], "ZRH"),
    }])
    del fresh
    q = p.start_stream(source="sharded-stream", options=opts)
    q.awaitTermination(120)
    fare = p.index_view("fare")
    assert fare.filter(F.col("_id") == probe_id).count() == 0  # removed
    assert sum(_consumed_per_epoch(p).values()) == len(events) + 2


def test_sharded_stream_source_latest_start_position(spark, tmp_path):
    """start_position=LATEST (the reference's shard-iterator mode):
    records already in the shards when the query first starts are
    skipped; records appended afterwards apply."""
    p = FlightsEtlPipeline(spark, _cfg(tmp_path))
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    )
    p.bootstrap(items)
    base = p.index_view("fare").count()

    shards = tmp_path / "shards"
    shards.mkdir()
    events = [e for e in gen_cdc_events() if e["seq"] > 40]
    _write_shard(shards / "shard_0.jsonl", events)
    opts = {"shards_root": str(shards), "start_position": "LATEST"}

    q = p.start_stream(source="sharded-stream", options=opts)
    q.awaitTermination(120)
    # pre-existing records skipped: the probe never applied
    probe = json.loads(probe_item())
    probe_id = f'{probe["PK"]["S"]}|{probe["SK"]["S"]}'
    assert p.index_view("fare").filter(
        F.col("_id") == probe_id).count() == 0
    assert p.index_view("fare").count() == base

    # appended after the horizon: applies on restart
    _write_shard(shards / "shard_0.jsonl", events[:1], append=True)
    appended = 1
    q = p.start_stream(source="sharded-stream", options=opts)
    q.awaitTermination(120)
    got = sum(_consumed_per_epoch(p).values())
    assert got == appended  # exactly the post-horizon record


def test_sharded_stream_source_validation(spark, tmp_path):
    p = FlightsEtlPipeline(spark, _cfg(tmp_path))
    with pytest.raises(ValueError, match="shards_root"):
        p.start_stream(source="sharded-stream", options={})
    from opensearch_dynamodb_etl_cdk_spark.sources.stream_source import (
        ShardedStreamReader,
    )
    with pytest.raises(ValueError, match="start_position"):
        ShardedStreamReader({"shards_root": str(tmp_path),
                             "start_position": "EARLIEST"})
    with pytest.raises(ValueError, match="no such shards_root"):
        ShardedStreamReader(
            {"shards_root": str(tmp_path / "nope")}).latestOffset()
    # the bootstrap half shares the file-source contract
    export = str(tmp_path / "export")
    spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string"
    ).write.parquet(export)
    p.bootstrap_from("sharded-stream", {"export_path": export})
    assert p.index_view("fare").count() == 22


def test_bulk_render_emits_one_terminal_action_per_id(spark):
    """A micro-batch carrying REMOVE then a later re-INSERT for the
    same _id must render EXACTLY the terminal action (index, newest
    image) — an in-order bulk receiver replaying index-then-delete
    would drop a document the parquet MERGE keeps. Same-key double
    upserts likewise collapse to the newest image (LWW by _seq, the
    MERGE's rule)."""
    df = spark.createDataFrame(
        [
            # delete at seq 5, re-insert at seq 6 → terminal = index v2
            ("A|1", 5, "delete", None),
            ("A|1", 6, "upsert", "v2"),
            # two upserts → newest image only
            ("B|2", 1, "upsert", "old"),
            ("B|2", 9, "upsert", "new"),
            # insert then delete → terminal = delete
            ("C|3", 2, "upsert", "x"),
            ("C|3", 7, "delete", None),
        ],
        "_id string, _seq long, _action string, payload string",
    )
    lines = [r.value for r in
             C.render_bulk_lines("fare", df).collect()]
    actions = {}
    for ln in lines:
        head = json.loads(ln.splitlines()[0])
        kind = next(iter(head))
        _id = head[kind]["_id"]
        assert _id not in actions, f"duplicate action for {_id}"
        actions[_id] = (kind, ln)
    assert set(actions) == {"A|1", "B|2", "C|3"}
    assert actions["A|1"][0] == "index"
    assert json.loads(actions["A|1"][1].splitlines()[1])["payload"] == "v2"
    assert actions["B|2"][0] == "index"
    assert json.loads(actions["B|2"][1].splitlines()[1])["payload"] == "new"
    assert actions["C|3"][0] == "delete"


def test_sharded_stream_scan_excludes_torn_trailing_line(tmp_path):
    """A live writer can be observed mid-append: the offset's byte
    field must point at the last counted NEWLINE, not the raw file
    size — otherwise the next batch seeks into the torn record and
    json-parses half a line."""
    from opensearch_dynamodb_etl_cdk_spark.sources.stream_source import (
        ShardedStreamReader,
    )

    shards = tmp_path / "shards"
    shards.mkdir()
    path = shards / "shard_0.jsonl"
    full = (json.dumps({"seq": 1, "event_name": "INSERT", "event_ts": None,
                        "pk": "A", "sk": "1", "new_image_json": None})
            + "\n"
            + json.dumps({"seq": 2, "event_name": "INSERT",
                          "event_ts": None, "pk": "B", "sk": "2",
                          "new_image_json": None}) + "\n")
    torn = '{"seq": 3, "event_name": "INS'  # writer mid-append
    path.write_bytes(full.encode() + torn.encode())

    r = ShardedStreamReader({"shards_root": str(shards)})
    off1 = r.latestOffset()["shard_0.jsonl"]
    assert off1["line"] == 2
    assert off1["byte"] == len(full)  # NOT the raw size

    # the writer finishes the record; the next scan picks up ONLY the
    # completed line, and reading from the stored byte offset parses it
    rest = 'ERT", "event_ts": null, "pk": "C", "sk": "3", "new_image_json": null}\n'
    with open(path, "ab") as f:
        f.write(rest.encode())
    off2 = r.latestOffset()["shard_0.jsonl"]
    assert off2["line"] == 3
    parts = r.partitions({"shard_0.jsonl": off1}, {"shard_0.jsonl": off2})
    rows = [t for part in parts for t in r.read(part)]
    assert len(rows) == 1 and rows[0][3] == "C"  # pk of the torn record
