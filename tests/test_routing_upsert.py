"""Routing (R1–R3) and keyed upsert/delete (K1/K2) unit tests, including
the CDC replay scenarios from FIXTURES.md F3."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.routing import (
    Route,
    Router,
    UNROUTED,
    type_route,
)
from opensearch_dynamodb_etl_cdk_spark.operators.upsert import (
    apply_cdc_batch,
    derive_action,
    latest_by_key,
)
from opensearch_dynamodb_etl_cdk_spark.sources.fixture_gen import (
    gen_cdc_events,
    gen_corpus,
)
from opensearch_dynamodb_etl_cdk_spark.sources.flights import unmarshal_items_df


def _items_df(spark, items):
    return unmarshal_items_df(
        spark.createDataFrame([(s,) for s in items], "item_json string")
    )


def test_route_split_counts(spark):
    """Reference parity: routes fare/flight; assignment+booking silently
    dropped (5/40) — here observable via UNROUTED."""
    df = _items_df(spark, gen_corpus())
    router = Router([type_route("fare"), type_route("flight")])
    parts = router.split(df)
    assert parts["fare"].count() == 22
    assert parts["flight"].count() == 13
    assert parts[UNROUTED].count() == 5


def test_route_tag_and_custom_predicate(spark):
    df = _items_df(spark, gen_corpus())
    router = Router(
        [
            Route("den_fares", (F.col("type") == "fare") & (F.col("pk") == "DEN")),
            type_route("flight"),
        ]
    )
    tagged = df.transform(router.tag)
    counts = {r.route: r.n for r in tagged.groupBy("route").agg(F.count("*").alias("n")).collect()}
    assert counts["den_fares"] == df.filter((F.col("type") == "fare") & (F.col("pk") == "DEN")).count()
    assert counts["flight"] == 13


def test_derive_action(spark):
    df = spark.createDataFrame(
        [("INSERT",), ("MODIFY",), ("REMOVE",)], "event_name string"
    )
    got = {r.event_name: r.a for r in df.select("event_name", derive_action(F.col("event_name")).alias("a")).collect()}
    assert got == {"INSERT": "index", "MODIFY": "upsert", "REMOVE": "delete"}


def test_latest_by_key_orders_by_seq_not_task_order(spark):
    """Out-of-order within a batch: MODIFY seq=5 must beat INSERT seq=9? No —
    highest seq wins regardless of arrival order."""
    rows = [
        ("k1", 2, "v-new"),
        ("k1", 1, "v-old"),
        ("k2", 7, "b"),
        ("k1", 2, "v-new"),  # at-least-once duplicate (same key+seq)
    ]
    df = spark.createDataFrame(rows, "_id string, _seq long, payload string").repartition(8)
    latest = latest_by_key(df)
    got = {r._id: (r._seq, r.payload) for r in latest.collect()}
    assert got == {"k1": (2, "v-new"), "k2": (7, "b")}


def _cdc_df(spark, events):
    return spark.createDataFrame(
        [
            (
                e["seq"],
                e["event_name"],
                e["event_ts"],
                e["pk"],
                e["sk"],
                e["new_image_json"],
            )
            for e in events
        ],
        "seq long, event_name string, event_ts string, pk string, sk string, new_image_json string",
    )


def _to_batch(spark, cdc_df):
    """CDC events → unmarshalled batch with _id/_seq/_action (the streaming
    pipeline's per-batch transform, exercised here in batch form)."""
    from opensearch_dynamodb_etl_cdk_spark.functions.ddb import parse_item
    from opensearch_dynamodb_etl_cdk_spark.sources.flights import (
        ALIASES,
        SUPERSET_ATTRS,
    )
    from opensearch_dynamodb_etl_cdk_spark.functions.ddb import unmarshal

    parsed = parse_item(F.col("new_image_json"))
    return cdc_df.select(
        F.concat_ws("|", F.col("pk"), F.col("sk")).alias("_id"),
        F.col("seq").alias("_seq"),
        derive_action(F.col("event_name")).alias("_action"),
        *unmarshal(parsed, SUPERSET_ATTRS, aliases=ALIASES),
    )


def test_cdc_replay_final_index(spark):
    """Full F3 replay: corpus inserts + modify + remove + dup + probe insert."""
    events = gen_cdc_events()
    batch = _to_batch(spark, _cdc_df(spark, events))
    index = apply_cdc_batch(None, batch)

    # 40 corpus keys - 1 removed + 1 probe = 40
    assert index.count() == 40
    ids = {r._id for r in index.select("_id").collect()}
    # removed key absent
    removed = [e for e in events if e["event_name"] == "REMOVE"][0]
    assert f"{removed['pk']}|{removed['sk']}" not in ids
    # probe item present
    assert "JFK|DEN#2021-12-12T00:00:00#nonstop" in ids
    # MODIFY won over INSERT for the first fare: class flipped to direct
    modified = [e for e in events if e["event_name"] == "MODIFY"][0]
    mid = f"{modified['pk']}|{modified['sk']}"
    row = index.filter(F.col("_id") == mid).collect()[0]
    assert row.fare_class == "direct"
    # exactly one row per key (last-write-wins)
    assert index.select("_id").distinct().count() == index.count()


def test_cdc_incremental_merge_idempotent(spark):
    """Split the replay into two micro-batches; re-apply batch 2 twice —
    same final index (at-least-once → exactly-once effect)."""
    events = gen_cdc_events()
    cut = len(events) // 2
    b1 = _to_batch(spark, _cdc_df(spark, events[:cut]))
    b2 = _to_batch(spark, _cdc_df(spark, events[cut:]))

    idx1 = apply_cdc_batch(None, b1)
    idx2 = apply_cdc_batch(idx1, b2)
    idx2_again = apply_cdc_batch(idx2, b2)

    final = sorted(r._id for r in idx2.select("_id").collect())
    again = sorted(r._id for r in idx2_again.select("_id").collect())
    assert final == again
    assert idx2.count() == 40


def test_modify_after_remove_of_other_key(spark):
    """A MODIFY arriving after a REMOVE of a different key must not resurrect
    the removed key."""
    rows = [
        (1, "INSERT", "a", "1", json.dumps({"PK": {"S": "a"}, "SK": {"S": "1"}, "type": {"S": "fare"}})),
        (2, "INSERT", "b", "1", json.dumps({"PK": {"S": "b"}, "SK": {"S": "1"}, "type": {"S": "fare"}})),
        (3, "REMOVE", "a", "1", None),
        (4, "MODIFY", "b", "1", json.dumps({"PK": {"S": "b"}, "SK": {"S": "1"}, "type": {"S": "flight"}})),
    ]
    cdc = spark.createDataFrame(
        rows, "seq long, event_name string, pk string, sk string, new_image_json string"
    ).withColumn("event_ts", F.lit("2021-09-01T00:00:00"))
    batch = _to_batch(spark, cdc)
    index = apply_cdc_batch(None, batch)
    got = {r._id: r.type for r in index.select("_id", "type").collect()}
    assert got == {"b|1": "flight"}
