"""End-to-end ETL pipeline tests: bootstrap from export, CDC tail via
Structured Streaming, keyed MERGE, DLQ, and the reference's golden
invariants (22 fare / 13 flight / 5 dropped; probe item appears after
stream insert) — SURVEY §5 e2e strategy."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.sources.fixture_gen import (
    gen_cdc_events,
    gen_corpus,
    probe_item,
)
from opensearch_dynamodb_etl_cdk_spark.streaming.pipeline import (
    CDC_SCHEMA,
    FlightsEtlPipeline,
    PipelineConfig,
)


@pytest.fixture()
def pipeline(spark, tmp_path):
    cfg = PipelineConfig(
        index_root=str(tmp_path / "indexes"),
        checkpoint_root=str(tmp_path / "chk"),
    )
    return FlightsEtlPipeline(spark, cfg)


def _write_cdc_files(path, events, files=2):
    os.makedirs(path, exist_ok=True)
    per = (len(events) + files - 1) // files
    for i in range(files):
        chunk = events[i * per : (i + 1) * per]
        with open(os.path.join(path, f"cdc_{i}.json"), "w") as f:
            for e in chunk:
                f.write(json.dumps(e) + "\n")


def test_bootstrap_golden_counts(spark, pipeline):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    fare = pipeline.index_view("fare")
    flight = pipeline.index_view("flight")
    assert fare.count() == 22
    assert flight.count() == 13
    # keyed: one row per _id
    assert fare.select("_id").distinct().count() == 22
    # unmarshalled columns usable for the Q2-style query
    q2 = fare.filter(
        (F.col("pk") == "DEN")
        & F.col("fare_class").isin("nonstop", "direct")
        & F.col("start_ts").between("2021-08-01", "2021-09-01")
    )
    assert q2.count() >= 1


def test_stream_tail_applies_cdc(spark, pipeline, tmp_path):
    """Bootstrap from corpus, then stream the F3 CDC replay: MODIFY wins,
    REMOVE deletes, duplicate delivery is idempotent, probe item lands."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)

    cdc_dir = str(tmp_path / "cdc")
    events = gen_cdc_events()
    # drop the initial bulk inserts (bootstrap already loaded them) but keep
    # the interesting tail: modify/remove/duplicate/probe
    tail = [e for e in events if e["seq"] > 40] + [
        dict(e, seq=e["seq"]) for e in events if e["seq"] > 40
    ]  # whole tail delivered twice → at-least-once
    _write_cdc_files(cdc_dir, tail)

    q = pipeline.start_stream(cdc_dir)
    q.awaitTermination(120)

    fare = pipeline.index_view("fare")
    ids = {r._id for r in fare.select("_id").collect()}
    # probe item (late INSERT via stream) present
    assert "JFK|DEN#2021-12-12T00:00:00#nonstop" in ids
    # REMOVEd fare absent
    removed = [e for e in events if e["event_name"] == "REMOVE"][0]
    assert f"{removed['pk']}|{removed['sk']}" not in ids
    # MODIFY flipped class on the first fare
    modified = [e for e in events if e["event_name"] == "MODIFY"][0]
    mid = f"{modified['pk']}|{modified['sk']}"
    assert fare.filter(F.col("_id") == mid).collect()[0].fare_class == "direct"
    # still exactly one row per key
    assert fare.select("_id").distinct().count() == fare.count()
    # 22 - 1 removed + 1 probe = 22
    assert fare.count() == 22


def test_stream_restart_checkpoint_no_reapply(spark, pipeline, tmp_path):
    """Restarting the stream over the same files must not duplicate state
    (checkpoint) — and adding a new file picks up only the delta."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    cdc_dir = str(tmp_path / "cdc")
    events = [e for e in gen_cdc_events() if e["seq"] > 40]
    _write_cdc_files(cdc_dir, events, files=1)

    q = pipeline.start_stream(cdc_dir)
    q.awaitTermination(120)
    count1 = pipeline.index_view("fare").count()

    # restart with no new data
    q = pipeline.start_stream(cdc_dir)
    q.awaitTermination(120)
    assert pipeline.index_view("fare").count() == count1

    # new file with one more REMOVE
    probe = json.loads(probe_item())
    with open(os.path.join(cdc_dir, "cdc_more.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "seq": 1000,
                    "event_name": "REMOVE",
                    "event_ts": "2021-12-13T00:00:00",
                    "pk": probe["PK"]["S"],
                    "sk": probe["SK"]["S"],
                    "new_image_json": None,
                }
            )
            + "\n"
        )
    q = pipeline.start_stream(cdc_dir)
    q.awaitTermination(120)
    fare = pipeline.index_view("fare")
    assert fare.count() == count1 - 1
    assert "JFK|DEN#2021-12-12T00:00:00#nonstop" not in {
        r._id for r in fare.select("_id").collect()
    }


def test_compact_bounds_files_and_preserves_data(spark, pipeline, tmp_path):
    """Repeated MERGEs accumulate small files; compact() rewrites the
    index to a bounded file count per bucket without changing a row."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    # a second merge of the same corpus (idempotent) adds more files
    pipeline.bootstrap(items)

    def parquet_files(route):
        root = os.path.join(pipeline.cfg.index_root, route)
        return [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        ]

    before = pipeline.read_index("fare").orderBy("_id").collect()
    n_before = len(parquet_files("fare"))

    pipeline.compact("fare")

    after = pipeline.read_index("fare").orderBy("_id").collect()
    assert after == before
    n_after = len(parquet_files("fare"))
    assert n_after <= n_before
    # bounded: at most files_per_bucket=1 file per populated bucket
    from collections import Counter

    per_bucket = Counter(os.path.dirname(p) for p in parquet_files("fare"))
    assert max(per_bucket.values()) == 1


def test_metrics_golden_counts(spark, pipeline):
    """W5 observability: the bootstrap batch appends per-route metrics —
    40 rows in, 22 fare / 13 flight routed+merged, 5 dropped, 0 DLQ'd
    (the reference's CloudWatch log group analog)."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    m = {r.route: r for r in pipeline.read_metrics().collect()}
    assert m["fare"].rows_in == 40
    assert m["fare"].rows_routed == m["fare"].rows_merged == 22
    assert m["flight"].rows_routed == m["flight"].rows_merged == 13
    assert m["dropped"].rows_routed == 5
    assert m["fare"].rows_deleted == 0 and m["fare"].rows_dlq == 0
    assert m["fare"].epoch == -1

    # a streamed CDC tail adds per-epoch rows with the delete counted
    removed = [e for e in gen_cdc_events() if e["event_name"] == "REMOVE"][0]
    batch = spark.createDataFrame([removed], CDC_SCHEMA)
    pipeline._apply_batch(pipeline.transform_cdc(batch), epoch_id=7)
    m7 = {
        r.route: r
        for r in pipeline.read_metrics().filter(F.col("epoch") == 7).collect()
    }
    assert m7["fare"].rows_deleted == 1
    assert m7["fare"].rows_routed == 0

    # re-delivery of the same epoch overwrites its rows — no duplicates
    pipeline._apply_batch(pipeline.transform_cdc(batch), epoch_id=7)
    n_rows_epoch7 = (
        pipeline.read_metrics().filter(F.col("epoch") == 7).count()
    )
    assert n_rows_epoch7 == len(pipeline.cfg.routes) + 1


def test_lower_seq_in_later_batch_does_not_clobber(spark, pipeline):
    """Cross-batch last-write-wins (K1): a stale re-delivered MODIFY with
    a LOWER sequence number arriving in a LATER micro-batch must lose to
    the stored higher-seq image — by sequence, never by arrival order."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    first = json.loads(gen_corpus()[0])
    pk, sk = first["PK"]["S"], first["SK"]["S"]
    mid = f"{pk}|{sk}"

    def modify(seq, klass):
        img = dict(first)
        img["class"] = {"S": klass}
        return {
            "seq": seq,
            "event_name": "MODIFY",
            "event_ts": "2021-09-01T00:00:00",
            "pk": pk,
            "sk": sk,
            "new_image_json": json.dumps(img, sort_keys=True),
        }

    newer = spark.createDataFrame([modify(100, "direct")], CDC_SCHEMA)
    pipeline._apply_batch(pipeline.transform_cdc(newer))
    fare = pipeline.read_index("fare")
    assert fare.filter(F.col("_id") == mid).collect()[0].fare_class == "direct"

    stale = spark.createDataFrame([modify(50, "nonstop")], CDC_SCHEMA)
    pipeline._apply_batch(pipeline.transform_cdc(stale))
    row = pipeline.read_index("fare").filter(F.col("_id") == mid).collect()[0]
    assert row.fare_class == "direct"  # seq-100 image survived the stale seq-50
    assert row._seq == 200  # stored as 2 x source seq (even = stream half)


def test_deletes_that_empty_buckets_remove_partitions(spark, pipeline):
    """Delete-survival (W1): a batch whose deletes empty entire hash
    buckets must leave zero rows AND zero parquet files on disk —
    dynamic partition overwrite alone would leave the old files."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    removes = [
        {
            "seq": 1000 + i,
            "event_name": "REMOVE",
            "event_ts": "2021-09-02T00:00:00",
            "pk": d["PK"]["S"],
            "sk": d["SK"]["S"],
            "new_image_json": None,
        }
        for i, d in enumerate(json.loads(s) for s in gen_corpus())
    ]
    batch = spark.createDataFrame(removes, CDC_SCHEMA)
    pipeline._apply_batch(pipeline.transform_cdc(batch))
    for route in ("fare", "flight"):
        idx = pipeline.read_index(route)
        assert idx is None or idx.count() == 0
        root = os.path.join(pipeline.cfg.index_root, route)
        files = [
            f
            for _, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        ]
        assert files == []


def test_tombstones_block_stale_resurrection(spark, tmp_path):
    """keep_tombstones=True: a REMOVE persists as a _deleted row with its
    seq, so a STALE lower-seq upsert in a LATER batch cannot resurrect
    the doc — while a genuinely newer upsert still can."""
    cfg = PipelineConfig(
        index_root=str(tmp_path / "indexes"),
        checkpoint_root=str(tmp_path / "chk"),
        keep_tombstones=True,
    )
    pipeline = FlightsEtlPipeline(spark, cfg)
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    first = json.loads(gen_corpus()[0])
    pk, sk = first["PK"]["S"], first["SK"]["S"]
    mid = f"{pk}|{sk}"

    def event(seq, name, image):
        return {
            "seq": seq, "event_name": name, "event_ts": "2021-09-01T00:00:00",
            "pk": pk, "sk": sk,
            "new_image_json": json.dumps(image, sort_keys=True) if image else None,
        }

    # delete at seq 100
    pipeline._apply_batch(
        pipeline.transform_cdc(
            spark.createDataFrame([event(100, "REMOVE", None)], CDC_SCHEMA)
        ),
        epoch_id=1,
    )
    assert pipeline.index_view("fare").filter(F.col("_id") == mid).count() == 0

    # stale upsert at seq 50 in a LATER batch: must stay dead
    pipeline._apply_batch(
        pipeline.transform_cdc(
            spark.createDataFrame([event(50, "MODIFY", first)], CDC_SCHEMA)
        ),
        epoch_id=2,
    )
    assert pipeline.index_view("fare").filter(F.col("_id") == mid).count() == 0
    assert pipeline.index_view("fare").count() == 21  # others untouched

    # genuinely newer insert at seq 200: resurrects
    pipeline._apply_batch(
        pipeline.transform_cdc(
            spark.createDataFrame([event(200, "INSERT", first)], CDC_SCHEMA)
        ),
        epoch_id=3,
    )
    assert pipeline.index_view("fare").filter(F.col("_id") == mid).count() == 1

    # tombstone purge at compaction keeps only live rows on disk
    pipeline._apply_batch(
        pipeline.transform_cdc(
            spark.createDataFrame([event(300, "REMOVE", None)], CDC_SCHEMA)
        ),
        epoch_id=4,
    )
    pipeline.compact("fare", purge_tombstones=True)
    raw = pipeline.read_index("fare")
    assert raw.filter(F.col("_deleted")).count() == 0
    assert pipeline.index_view("fare").count() == 21


def test_tombstone_churn_with_compaction_stays_bounded(spark, tmp_path):
    """Long INSERT→REMOVE churn on one key with keep_tombstones=True:
    periodic compaction must keep the index's file count AND on-disk
    bytes bounded — per-key upsert means churn rewrites one latest-state
    row, never accumulates history rows, and compact() folds the small
    merge files back down."""
    cfg = PipelineConfig(
        index_root=str(tmp_path / "indexes"),
        checkpoint_root=str(tmp_path / "chk"),
        keep_tombstones=True,
    )
    pipeline = FlightsEtlPipeline(spark, cfg)
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    first = json.loads(gen_corpus()[0])
    pk, sk = first["PK"]["S"], first["SK"]["S"]
    mid = f"{pk}|{sk}"

    def event(seq, name, image):
        return {
            "seq": seq, "event_name": name, "event_ts": "2021-09-01T00:00:00",
            "pk": pk, "sk": sk,
            "new_image_json": json.dumps(image, sort_keys=True) if image else None,
        }

    def stats():
        root = os.path.join(cfg.index_root, "fare")
        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        ]
        return len(files), sum(os.path.getsize(p) for p in files)

    observed = []
    seq = 1000
    for cycle in range(8):
        pipeline._apply_batch(
            pipeline.transform_cdc(
                spark.createDataFrame([event(seq, "REMOVE", None)], CDC_SCHEMA)
            ),
            epoch_id=10 + 2 * cycle,
        )
        pipeline._apply_batch(
            pipeline.transform_cdc(
                spark.createDataFrame(
                    [event(seq + 1, "INSERT", first)], CDC_SCHEMA
                )
            ),
            epoch_id=11 + 2 * cycle,
        )
        seq += 2
        if cycle % 2 == 1:  # periodic compaction, off the hot path
            pipeline.compact("fare")
            observed.append(stats())

    # live state correct after all the churn (key ends alive)
    assert pipeline.index_view("fare").filter(F.col("_id") == mid).count() == 1
    assert pipeline.index_view("fare").count() == 22
    # exactly one raw row per key — churn never accumulates history
    raw = pipeline.read_index("fare")
    assert raw.count() == raw.select("_id").distinct().count() == 22

    # bounded growth: post-compaction file count and bytes are flat
    # (not monotonically growing with churn cycles)
    n_files = [n for n, _ in observed]
    n_bytes = [b for _, b in observed]
    assert max(n_files) == min(n_files), n_files
    assert max(n_bytes) <= int(min(n_bytes) * 1.1), n_bytes


def test_count_and_mget(spark, pipeline):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    # _count over patterns, with and without a query body
    assert pipeline.count("fare") == 22
    assert pipeline.count("fare,flight") == 35
    assert pipeline.count("fare", {"query": {"term": {"pk": "DEN"}}}) == \
        pipeline.index_view("fare").filter(F.col("pk") == "DEN").count()
    assert pipeline.count("f*") == 35
    # bare query dicts (no "query" wrapper) accepted too
    assert pipeline.count("fare", {"term": {"pk": "DEN"}}) == \
        pipeline.count("fare", {"query": {"term": {"pk": "DEN"}}})
    # _mget: present ids return rows, missing ids are absent
    ids = [r._id for r in pipeline.index_view("fare").limit(2).collect()]
    got = pipeline.mget("fare", ids + ["nope|missing"])
    assert {r._id for r in got.collect()} == set(ids)
    assert pipeline.mget("never-materialized", ["x"]) is None


def test_unrouted_items_not_in_indexes(spark, pipeline):
    """R3 parity: assignment/booking items reach no index table."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    for route in ("fare", "flight"):
        idx = pipeline.index_view(route)
        assert idx.filter(F.col("type").isin("assignment", "booking")).count() == 0


def test_dsl_search_over_live_index(spark, pipeline):
    """Close the reference's loop end-to-end: the CDC pipeline
    materializes per-route indexes, and the OpenSearch-DSL bodies a
    reference user POSTs to /fare/_search run directly against the live
    index view — filters, pagination, and aggregations."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import execute_search

    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    fare = pipeline.index_view("fare")

    # bool filter: DEN nonstop fares in August (access pattern Q2)
    res = execute_search(
        fare,
        {
            "query": {
                "bool": {
                    "must": [{"term": {"pk": "DEN"}}],
                    "filter": [
                        {"term": {"fare_class": "nonstop"}},
                        {"range": {"start_ts": {"gte": "2021-08-01",
                                                "lt": "2021-09-01"}}},
                    ],
                }
            }
        },
    )
    expected = fare.filter(
        (F.col("pk") == "DEN")
        & (F.col("fare_class") == "nonstop")
        & (F.col("start_ts") >= "2021-08-01")
        & (F.col("start_ts") < "2021-09-01")
    ).count()
    assert res["hits"].count() == expected > 0

    # terms aggregation over the whole index
    res = execute_search(
        fare,
        {"size": 0, "aggs": {"by_class": {"terms": {"field": "fare_class"}}}},
    )
    buckets = res["aggregations"]["by_class"]["buckets"]
    assert sum(b["doc_count"] for b in buckets) == 22

    # keyset pagination walks the full index without overlap
    sort = [{"sk": "asc"}, {"_id": "asc"}]
    seen, cursor = [], None
    for _ in range(30):
        body = {"sort": sort, "size": 5}
        if cursor is not None:
            body["search_after"] = cursor
        page = execute_search(fare, body)["hits"].select("sk", "_id").collect()
        if not page:
            break
        seen.extend((r["sk"], r["_id"]) for r in page)
        cursor = [page[-1]["sk"], page[-1]["_id"]]
    assert len(seen) == 22 == len(set(seen))


def test_multi_index_search(spark, pipeline):
    """OpenSearch multi-index patterns (`GET /fare,flight/_search`,
    wildcards) over the live route indexes: schema-merged union with
    per-hit `_index` metadata; DSL bodies run unchanged on top."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import execute_search

    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)

    both = pipeline.multi_index_view("fare,flight")
    assert both.count() == 35  # 22 fares + 13 flights
    by_index = {r._index: r.n for r in
                both.groupBy("_index").agg(F.count("*").alias("n")).collect()}
    assert by_index == {"fare": 22, "flight": 13}

    # wildcard patterns: '*' matches all routes, 'f*' both, 'z*' none-but-valid
    assert pipeline.multi_index_view("*").count() == 35
    assert pipeline.multi_index_view("fl*").count() == 13
    with pytest.raises(ValueError):
        pipeline.multi_index_view("bookings")

    # a DSL body runs unchanged across indexes; _index is filterable
    res = execute_search(
        both,
        {"query": {"bool": {"must": [{"term": {"pk": "DEN"}}]}},
         "size": 100},
    )
    got = res["hits"].select("_index", "_id").collect()
    assert {r._index for r in got} == {"fare", "flight"}
    assert len(got) == both.filter(F.col("pk") == "DEN").count()


def test_streaming_percolate_alerts(spark, pipeline, tmp_path):
    """Percolator over the CDC tail (the alerting shape): stored queries
    compile once, the streaming micro-batches evaluate them in a single
    projection, and only matching events reach the alert sink."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import percolate

    cdc_dir = str(tmp_path / "cdc")
    _write_cdc_files(cdc_dir, gen_cdc_events())

    registry = {
        "den_activity": {"term": {"pk": "DEN"}},
        "removals": {"term": {"_action": "delete"}},
    }
    stream = (
        spark.readStream.schema(CDC_SCHEMA).json(cdc_dir)
        .transform(pipeline.transform_cdc)
        .transform(lambda df: percolate(df, registry, only_matches=True))
        .select("_id", "_action", "_matched_queries")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("percolate_alerts")
        .option("checkpointLocation", str(tmp_path / "chk_perc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    alerts = spark.table("percolate_alerts")
    batch = pipeline.transform_cdc(
        spark.read.schema(CDC_SCHEMA).json(cdc_dir)
    )
    n_den = batch.filter(F.col("pk") == "DEN").count()
    n_rem = batch.filter(F.col("_action") == "delete").count()
    got = {r[0]: r[1] for r in
           alerts.select(F.explode("_matched_queries")).groupBy("col")
           .count().collect()}
    assert got.get("den_activity", 0) == n_den > 0
    assert got.get("removals", 0) == n_rem > 0
    assert alerts.count() <= batch.count()


def test_cat_indices_operational_snapshot(spark, pipeline):
    assert all(r["status"] == "missing" for r in pipeline.cat_indices())
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    cat = {r["index"]: r for r in pipeline.cat_indices()}
    assert cat["fare"]["docs"] == 22 and cat["flight"]["docs"] == 13
    assert cat["fare"]["status"] == "open"
    assert cat["fare"]["bytes"] > 0
    assert 1 <= cat["fare"]["buckets"] <= pipeline.cfg.n_buckets
    assert cat["fare"]["blocks"] == []
    # blocks and closed state surface operationally
    pipeline.add_block("fare", "write")
    pipeline.close_index("flight")
    cat = {r["index"]: r for r in pipeline.cat_indices()}
    assert cat["fare"]["blocks"] == ["write"]
    assert cat["flight"]["status"] == "close"
    pipeline.remove_block("fare", "write")
    pipeline.open_index("flight")
    # opening a nonexistent index is a 404, not an implicit create —
    # and must not leave a phantom dir behind for wildcards to find
    with pytest.raises(ValueError, match="no such index"):
        pipeline.open_index("phantom")
    assert "phantom" not in {r["index"] for r in pipeline.cat_indices()}


def test_get_mapping_renders_opensearch_field_types(spark, pipeline):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    m = pipeline.get_mapping("fare")
    props = m["fare"]["mappings"]["properties"]
    assert props["_id"]["type"] == "keyword"
    assert props["start_ts"]["type"] == "date"
    # internal merge columns never leak into the public mapping
    assert not ({"_bucket", "_seq", "_deleted"} & props.keys())
    with pytest.raises(ValueError):
        pipeline.get_mapping("nope")


def test_delete_by_query_through_merge_path(spark, pipeline):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    n_den = pipeline.index_view("fare").filter(F.col("pk") == "DEN").count()
    deleted = pipeline.delete_by_query("fare", {"term": {"pk": "DEN"}})
    assert deleted == n_den > 0
    fare = pipeline.index_view("fare")
    assert fare.filter(F.col("pk") == "DEN").count() == 0
    assert fare.count() == 22 - n_den
    # no match -> 0, index untouched
    assert pipeline.delete_by_query("fare", {"term": {"pk": "ZZZ"}}) == 0
    assert pipeline.index_view("fare").count() == 22 - n_den


def test_update_by_query_bumps_seq_and_applies_script(spark, pipeline):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    updated = pipeline.update_by_query(
        "fare", {"term": {"fare_class": "nonstop"}},
        {"fare_class": "'express'"},
    )
    assert updated > 0
    fare = pipeline.index_view("fare")
    assert fare.filter(F.col("fare_class") == "nonstop").count() == 0
    assert fare.filter(F.col("fare_class") == "express").count() == updated
    assert fare.count() == 22  # upserts, not inserts: same doc count
    # bad script field names fail fast — including internal merge columns
    with pytest.raises(ValueError):
        pipeline.update_by_query("fare", {"match_all": {}}, {"nope": "'x'"})
    with pytest.raises(ValueError):
        pipeline.update_by_query("fare", {"match_all": {}}, {"_bucket": "0"})
    # a later STREAMED event beats the admin update (admin ops take the
    # odd half of the sequence space, below every future source seq)
    target = fare.limit(1).collect()[0]
    pk, sk = target._id.split("|", 1)
    ev = {"seq": 1000, "event_name": "MODIFY", "event_ts": None,
          "pk": pk, "sk": sk,
          "new_image_json": json.dumps({
              "PK": {"S": pk}, "SK": {"S": sk}, "type": {"S": "fare"},
              "class": {"S": "streamed"}})}
    batch = pipeline.transform_cdc(
        spark.createDataFrame([ev], CDC_SCHEMA))
    pipeline._apply_batch(batch, epoch_id=99)
    row = pipeline.index_view("fare").filter(
        F.col("_id") == target._id).collect()[0]
    assert row.fare_class == "streamed"


def test_reindex_filtered_transformed_copy(spark, pipeline):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    n = pipeline.reindex(
        "fare", "fare_den", query={"term": {"pk": "DEN"}},
        set_fields={"fare_class": "upper(fare_class)"},
    )
    assert n == pipeline.index_view("fare").filter(F.col("pk") == "DEN").count()
    copy = pipeline.index_view("fare_den")
    assert copy.count() == n
    assert copy.filter(F.col("fare_class").rlike("^[A-Z]+$")).count() == n
    # re-running is idempotent (per-key upserts, not appends)
    assert pipeline.reindex("fare", "fare_den",
                            query={"term": {"pk": "DEN"}}) == n
    assert pipeline.index_view("fare_den").count() == n


def test_aliases_and_snapshot_restore(spark, pipeline, tmp_path):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)

    # alias resolves to its pattern inside multi-index search
    pipeline.put_alias("all-travel", "fare,flight")
    assert pipeline.multi_index_view("all-travel").count() == 35
    pipeline.delete_alias("all-travel")
    with pytest.raises(ValueError):
        pipeline.multi_index_view("all-travel")  # now an unknown literal

    # snapshot, mutate, restore → snapshot state returns
    snap = str(tmp_path / "snap")
    assert sorted(pipeline.snapshot(snap)) == ["fare", "flight"]
    n_before = pipeline.index_view("fare").count()
    assert pipeline.delete_by_query("fare", {"match_all": {}}) == n_before
    assert pipeline.read_index("fare") is None or \
        pipeline.index_view("fare").count() == 0
    assert pipeline.restore(snap, "fare") == ["fare"]
    assert pipeline.index_view("fare").count() == n_before


def _tree_digest(root):
    import hashlib

    h = hashlib.sha256()
    entries = []
    for r, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(r, fn)
            entries.append((os.path.relpath(p, root), p))
    for rel, p in sorted(entries):
        h.update(rel.encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def test_incremental_snapshot_reuses_unchanged_buckets(spark, pipeline, tmp_path):
    """Second snapshot into the same dir re-copies ONLY the bucket
    files a merge rewrote (the public _snapshot API's segment-level
    incrementality), yet stays byte-identical to a full copy."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    snap = str(tmp_path / "snap")

    pipeline.snapshot(snap)
    s1 = pipeline.last_snapshot_stats
    assert s1["fare"]["copied"] > 0 and s1["fare"]["skipped"] == 0

    # nothing changed → nothing copies, everything skips
    pipeline.snapshot(snap)
    s2 = pipeline.last_snapshot_stats
    for route in ("fare", "flight"):
        assert s2[route]["copied"] == 0
        assert s2[route]["skipped"] == s1[route]["copied"]

    # a small merge rewrites only the buckets holding DEN keys; the
    # next snapshot copies those and skips the rest — and the other
    # index copies nothing at all
    assert pipeline.delete_by_query("fare", {"term": {"pk": "DEN"}}) >= 1
    n_after = pipeline.index_view("fare").count()
    pipeline.snapshot(snap)
    s3 = pipeline.last_snapshot_stats
    assert 0 < s3["fare"]["copied"] < s1["fare"]["copied"]
    assert s3["fare"]["skipped"] > 0
    assert s3["flight"]["copied"] == 0

    # the incremental mirror is byte-identical to the live table...
    assert _tree_digest(os.path.join(pipeline.cfg.index_root, "fare")) == \
        _tree_digest(os.path.join(snap, "fare"))
    # ...and restore returns exactly the snapshot state
    assert pipeline.delete_by_query("fare", {"match_all": {}}) == n_after
    pipeline.restore(snap, "fare")
    assert pipeline.index_view("fare").count() == n_after
    assert pipeline.index_view("fare").filter(F.col("pk") == "DEN").count() == 0


def test_snapshot_carries_alias_state(spark, pipeline, tmp_path):
    """OpenSearch snapshots include aliases by default; a restore must
    bring back alias state too, not just index tables."""
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    pipeline.put_alias("all-travel", "fare,flight")
    snap = str(tmp_path / "snap")
    pipeline.snapshot(snap)
    # losing the alias after the snapshot...
    pipeline.delete_alias("all-travel")
    with pytest.raises(ValueError):
        pipeline.multi_index_view("all-travel")
    # ...restore brings it back along with the tables
    pipeline.restore(snap)
    assert pipeline.get_aliases() == {"all-travel": "fare,flight"}
    assert pipeline.multi_index_view("all-travel").count() == 35
    # a later alias-free snapshot replaces wholesale: stale snapshot
    # alias file must not survive
    pipeline.delete_alias("all-travel")
    pipeline.snapshot(snap)
    import os as _os

    assert not _os.path.exists(_os.path.join(snap, "_aliases.json"))


def test_snapshot_replaces_stale_files_and_covers_reindexed(spark, pipeline, tmp_path):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    pipeline.reindex("fare", "fare_copy")
    snap = str(tmp_path / "snap")
    # reindexed tables are first-class snapshot members
    assert "fare_copy" in pipeline.snapshot(snap)
    # mutate (rewrites bucket files), re-snapshot into the SAME dir,
    # restore: no stale part-files may survive the second snapshot
    n = pipeline.index_view("fare").count()
    pipeline.delete_by_query("fare", {"term": {"pk": "DEN"}})
    n_after = pipeline.index_view("fare").count()
    assert n_after < n
    pipeline.snapshot(snap)
    pipeline.restore(snap, "fare")
    assert pipeline.index_view("fare").count() == n_after  # not n, no dupes


def test_put_alias_rejects_index_name_collision(spark, pipeline):
    with pytest.raises(ValueError):
        pipeline.put_alias("fare", "flight")
    # delete_alias on a fresh pipeline (no index_root yet) is a no-op
    pipeline.delete_alias("never-existed")


def test_reindexed_tables_searchable_and_alias_collision_blocked(spark, pipeline):
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipeline.bootstrap(items)
    pipeline.reindex("fare", "fare_copy")
    # reindexed tables are first-class search targets: literal + wildcard
    assert pipeline.multi_index_view("fare_copy").count() == 22
    assert pipeline.multi_index_view("fare*").count() == 44  # fare + copy
    # reindex cannot create a table shadowed by an existing alias
    pipeline.put_alias("hot", "fare")
    with pytest.raises(ValueError):
        pipeline.reindex("fare", "hot")
