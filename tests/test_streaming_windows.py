"""Streaming windowed aggregation, dedup, and custom stateful operator
tests: file-source streams driven with availableNow, results compared to
the equivalent batch computation (unified-model property)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.streaming.windows import (
    running_user_totals,
    session_window_counts,
    streaming_dedup,
    windowed_counts,
)

EVENT_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"


def _rows(n0=0, hours=0, n=20):
    return [
        {
            "event_id": n0 + i,
            "user_id": i % 3,
            "ts": f"2024-01-01T{hours + i // 10:02d}:{(i * 7) % 60:02d}:00",
            "event_type": "click" if i % 2 else "view",
            "value": float(i),
        }
        for i in range(n)
    ]


def _write(path, rows, name="a.json"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, df, tmp_path, query_name, output_mode, chk_name=None):
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option(
            "checkpointLocation", str(tmp_path / f"chk_{chk_name or query_name}")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {query_name}")


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = _rows()
    _write(src, rows)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    out = _run_stream(
        spark, windowed_counts(stream), tmp_path, "win_counts", "append"
    )
    # append emits only watermark-closed windows; with availableNow the
    # final watermark passes all but the newest window
    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    expected = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_counts(batch).collect()
    }
    got = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in out.collect()}
    assert got  # at least the closed windows emitted
    for k, v in got.items():
        assert expected[k] == v


def test_streaming_session_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    # two files processed as two micro-batches: the second is 8 hours
    # later, so its watermark closes every session from the first file
    _write(src, _rows(), name="a.json")
    _write(src, _rows(n0=500, hours=8, n=5), name="b.json")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = _run_stream(
        spark, session_window_counts(stream, gap="30 minutes"),
        tmp_path, "sess_counts", "append",
    )
    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    expected = {
        (r.session_start, r.user_id): r.n_events
        for r in session_window_counts(batch, gap="30 minutes").collect()
    }
    got = {(r.session_start, r.user_id): r.n_events for r in out.collect()}
    assert got
    for k, v in got.items():
        assert expected[k] == v


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = _rows(n=10)
    _write(src, rows + rows, name="dup.json")  # every event delivered twice
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    out = _run_stream(
        spark, streaming_dedup(stream, ["event_id"]), tmp_path, "dedup", "append"
    )
    got = out.collect()
    assert len(got) == 10
    assert len({r.event_id for r in got}) == 10


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from opensearch_dynamodb_etl_cdk_spark.streaming.windows import interval_join

    src = str(tmp_path / "src")
    _write(src, _rows(n=30))
    mk = lambda reader: (
        reader.filter(F.col("event_type") == "click"),
        reader.filter(F.col("event_type") == "view"),
    )
    s_clicks, s_views = mk(spark.readStream.schema(EVENT_SCHEMA).json(src))
    out = _run_stream(
        spark,
        interval_join(s_clicks, s_views, horizon="1 hour"),
        tmp_path,
        "ssj",
        "append",
    )
    b_clicks, b_views = mk(spark.read.schema(EVENT_SCHEMA).json(src))
    expected = sorted(
        (r.user_id, r.l_id, r.r_id)
        for r in interval_join(b_clicks, b_views, horizon="1 hour").collect()
    )
    got = sorted((r.user_id, r.l_id, r.r_id) for r in out.collect())
    assert got == expected
    assert got  # non-trivial: at least one attribution pair


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state accumulates across micro-batches
    (maxFilesPerTrigger=1 forces two batches in one availableNow run)."""
    src = str(tmp_path / "src")
    _write(src, _rows(n0=0, n=12), name="a.json")
    _write(src, _rows(n0=100, hours=3, n=12), name="b.json")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = _run_stream(
        spark, running_user_totals(stream), tmp_path, "totals", "update"
    )
    rows = out.collect()
    # update mode emits once per (batch, user); the LAST emission per
    # user must hold the grand total over both files
    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    expected = {
        r.user_id: (r.n, r.s)
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    finals = {}
    for r in rows:  # memory sink preserves emission order per query
        finals[r.user_id] = (r.n_events, r.sum_value)
    assert finals == expected
    # and at least one user must have been emitted twice (two batches)
    assert len(rows) > len(expected)


def test_stateful_totals_recover_from_checkpoint(spark, tmp_path):
    """State survives a stream restart via the checkpoint: a second run
    over a NEW file continues from the first run's totals. (foreachBatch
    sink — the memory sink does not support checkpoint recovery.)"""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk_shared")
    collected: list = []

    def run(new_file_rows, name):
        _write(src, new_file_rows, name=name)
        stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, _eid: collected.append(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(_rows(n0=0, n=9), "a.json")
    n_first = {r.user_id: r.n_events for batch in collected for r in batch}
    assert sum(n_first.values()) == 9

    collected.clear()
    run(_rows(n0=200, hours=5, n=9), "b.json")
    finals = {r.user_id: r.n_events for batch in collected for r in batch}
    for uid, n in finals.items():
        assert n == n_first[uid] + 3  # 9 new events over 3 users


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    from opensearch_dynamodb_etl_cdk_spark.streaming.windows import (
        stream_static_enrich,
    )

    src = str(tmp_path / "src_enrich")
    rows = _rows()
    _write(src, rows)
    dim = spark.createDataFrame(
        [(0, "free"), (1, "pro")], "user_id long, tier string"
    )

    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    enriched = stream_static_enrich(stream, dim).select(
        "event_id", "user_id", "tier"
    )
    got = _run_stream(spark, enriched, tmp_path, "enriched", "append").collect()

    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .json(src)
        .join(dim, "user_id", "left")
        .select("event_id", "user_id", "tier")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # user 2 has no dimension row → null tier survives the left join
    assert any(t[2] is None for t in map(tuple, got))


def test_ppl_pipeline_over_stream_matches_batch(spark, tmp_path):
    """A PPL pipeline compiles to a plan that runs unchanged over a
    readStream (the unified-model property): where→eval→stats..by span
    on a file stream in update mode equals the same PPL over the batch
    frame."""
    from opensearch_dynamodb_etl_cdk_spark.operators.ppl import ppl_query

    src = str(tmp_path / "ppl_src")
    _write(src, _rows(n=40))
    query = (
        "source=events | where value >= 4 "
        "| eval vat = value * 1.1 "
        "| stats count() as cnt, sum(vat) as total "
        "by event_type, span(ts, 1h)"
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    out = ppl_query(query, lambda n: stream)
    assert out.isStreaming
    got = _run_stream(spark, out, tmp_path, "ppl_stream", "update")
    batch = ppl_query(
        query, lambda n: spark.read.schema(EVENT_SCHEMA).json(src)
    )
    want = {tuple(r) for r in batch.collect()}
    have = {tuple(r) for r in got.collect()}
    assert have == want
    assert len(want) > 1
