"""DLQ side-output (SURVEY W3) and empty/degenerate-input edges for the
extension operators — the failure paths a long-running pipeline actually
hits."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators import dedup as D
from opensearch_dynamodb_etl_cdk_spark.operators import similarity as S
from opensearch_dynamodb_etl_cdk_spark.sources.fixture_gen import gen_corpus
from opensearch_dynamodb_etl_cdk_spark.streaming.pipeline import (
    FlightsEtlPipeline,
    PipelineConfig,
)
from opensearch_dynamodb_etl_cdk_spark.streaming.windows import (
    session_window_counts,
    windowed_counts,
)


def test_dlq_captures_failed_route_with_error(spark, tmp_path, monkeypatch):
    """A sink-side failure must land the route's documents in
    dlq/<route>/ with the error attached — never lose documents (W3)."""
    cfg = PipelineConfig(
        index_root=str(tmp_path / "indexes"),
        checkpoint_root=str(tmp_path / "chk"),
    )
    pipe = FlightsEtlPipeline(spark, cfg)

    original = pipe._merge_route

    def failing_merge(route_df, route):
        if route == "fare":
            raise RuntimeError("simulated sink outage")
        return original(route_df, route)

    monkeypatch.setattr(pipe, "_merge_route", failing_merge)
    items = spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    pipe.bootstrap(items)

    dlq = spark.read.parquet(os.path.join(cfg.index_root, "dlq", "fare"))
    assert dlq.count() == 22  # every fare doc captured, none lost
    assert dlq.filter(F.col("_error").contains("simulated sink outage")).count() == 22
    assert {r._route for r in dlq.select("_route").distinct().collect()} == {"fare"}
    # the healthy route still materialized
    assert pipe.read_index("flight").count() == 13
    # and the failed route produced no (partial) index
    assert pipe.read_index("fare") is None


def test_replay_dlq_recovers_failed_route_then_noops(spark, tmp_path, monkeypatch):
    """The DLQ's closing half (the reference parks failed payloads so
    they can be RECOVERED, custom_resource.py:358-363): sink outage →
    slices parked → endpoint heals → replay_dlq re-drives them through
    the same sink → index matches the never-failed run exactly; the
    DLQ is cleared, a metrics row records the replay, and a second
    replay is a no-op."""
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string")

    # golden: the same bootstrap with a healthy sink throughout
    gold_cfg = PipelineConfig(index_root=str(tmp_path / "gold"),
                              checkpoint_root=str(tmp_path / "gchk"))
    gold = FlightsEtlPipeline(spark, gold_cfg)
    gold.bootstrap(items)
    golden_rows = sorted(
        map(tuple, gold.read_index("fare").drop("_bucket").collect()),
        key=repr)

    cfg = PipelineConfig(index_root=str(tmp_path / "indexes"),
                         checkpoint_root=str(tmp_path / "chk"))
    pipe = FlightsEtlPipeline(spark, cfg)
    original = pipe._merge_route
    down = {"fare": True}

    def flaky_merge(route_df, route):
        if down.get(route):
            raise RuntimeError("simulated sink outage")
        return original(route_df, route)

    monkeypatch.setattr(pipe, "_merge_route", flaky_merge)
    pipe.bootstrap(items)
    assert pipe.read_index("fare") is None  # outage: nothing landed

    down["fare"] = False  # endpoint heals
    n = pipe.replay_dlq("fare")
    assert n == 22
    got = sorted(
        map(tuple, pipe.read_index("fare").drop("_bucket").collect()),
        key=repr)
    assert got == golden_rows
    # DLQ cleared; replay recorded in metrics under its own epoch
    assert not os.path.exists(os.path.join(cfg.index_root, "dlq", "fare"))
    m = pipe.read_metrics().filter(
        (F.col("epoch") == -2) & (F.col("route") == "fare")).collect()
    assert len(m) == 1 and m[0].rows_merged == 22 and m[0].rows_dlq == 0
    # second replay: empty DLQ → no-op, index unchanged
    assert pipe.replay_dlq("fare") == 0
    again = sorted(
        map(tuple, pipe.read_index("fare").drop("_bucket").collect()),
        key=repr)
    assert again == golden_rows


def test_replay_dlq_metrics_survive_second_route(spark, tmp_path, monkeypatch):
    """r9 verdict item 5a: replaying route A then route B must leave
    BOTH audit rows under the replay epoch — the old dynamic partition
    overwrite on epoch=-2 erased A's row when B replayed."""
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string")
    cfg = PipelineConfig(index_root=str(tmp_path / "indexes"),
                         checkpoint_root=str(tmp_path / "chk"))
    pipe = FlightsEtlPipeline(spark, cfg)
    original = pipe._merge_route
    down = {"fare": True, "flight": True}

    def flaky_merge(route_df, route):
        if down.get(route):
            raise RuntimeError("simulated sink outage")
        return original(route_df, route)

    monkeypatch.setattr(pipe, "_merge_route", flaky_merge)
    pipe.bootstrap(items)
    down["fare"] = down["flight"] = False
    assert pipe.replay_dlq("fare") == 22
    assert pipe.replay_dlq("flight") == 13
    m = {r.route: r.rows_merged
         for r in pipe.read_metrics().filter(F.col("epoch") == -2).collect()}
    assert m == {"fare": 22, "flight": 13}


def test_replay_dlq_leaves_concurrently_parked_rows(
        spark, tmp_path, monkeypatch):
    """r9 verdict item 5b: a slice parked WHILE a replay is running
    (sink still failing for a concurrent micro-batch) must survive the
    replay's clearing pass — only the snapshot the replay actually
    re-drove may be deleted."""
    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string")
    cfg = PipelineConfig(index_root=str(tmp_path / "indexes"),
                         checkpoint_root=str(tmp_path / "chk"))
    pipe = FlightsEtlPipeline(spark, cfg)
    original = pipe._merge_route
    down = {"fare": True}

    def flaky_merge(route_df, route):
        if down.get(route):
            raise RuntimeError("simulated sink outage")
        return original(route_df, route)

    monkeypatch.setattr(pipe, "_merge_route", flaky_merge)
    pipe.bootstrap(items)
    down["fare"] = False

    parked_late = spark.read.parquet(
        os.path.join(cfg.index_root, "dlq", "fare")).drop(
        "_error", "_route").limit(3).localCheckpoint(eager=True)
    orig_write = pipe.sink.write_route

    def write_and_park_late(pipeline, route, df, epoch_id):
        out = orig_write(pipeline, route, df, epoch_id)
        # a concurrent micro-batch parks a fresh slice mid-replay
        pipeline._write_dlq(parked_late, route, "late outage")
        return out

    monkeypatch.setattr(pipe.sink, "write_route", write_and_park_late)
    assert pipe.replay_dlq("fare") == 22
    monkeypatch.setattr(pipe.sink, "write_route", orig_write)
    # the late slice is still parked — not lost, not replayed
    left = spark.read.parquet(os.path.join(cfg.index_root, "dlq", "fare"))
    assert left.count() == 3
    # and the next replay drains it
    assert pipe.replay_dlq("fare") == 3
    assert not os.path.exists(os.path.join(cfg.index_root, "dlq", "fare"))




def test_replay_dlq_skips_inflight_committer_temp_files(
        spark, tmp_path, monkeypatch):
    """A concurrent writer's UNCOMMITTED attempt files live under
    dlq/<route>/_temporary/.../part-*.parquet — visible basename,
    hidden path segment. The replay snapshot must exclude hidden
    SEGMENTS anywhere in the path (reading them replays torn/duplicate
    rows; deleting them breaks the writer's task commit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    items = spark.createDataFrame(
        [(s,) for s in gen_corpus()], "item_json string")
    cfg = PipelineConfig(index_root=str(tmp_path / "indexes"),
                         checkpoint_root=str(tmp_path / "chk"))
    pipe = FlightsEtlPipeline(spark, cfg)
    original = pipe._merge_route
    down = {"fare": True}

    def flaky_merge(route_df, route):
        if down.get(route):
            raise RuntimeError("simulated sink outage")
        return original(route_df, route)

    monkeypatch.setattr(pipe, "_merge_route", flaky_merge)
    pipe.bootstrap(items)
    down["fare"] = False

    # simulate an in-flight FileOutputCommitter attempt: a real parquet
    # file (same schema as a parked slice) under _temporary/
    dlq_dir = os.path.join(cfg.index_root, "dlq", "fare")
    committed = spark.read.parquet(dlq_dir)
    tmp_dir = os.path.join(dlq_dir, "_temporary", "0",
                           "attempt_20260816_0001")
    os.makedirs(tmp_dir)
    inflight = os.path.join(tmp_dir, "part-00000.parquet")
    pq.write_table(
        pa.Table.from_pandas(committed.limit(2).toPandas()), inflight)

    assert pipe.replay_dlq("fare") == 22  # only the committed slices
    # the in-flight attempt file survived untouched
    assert os.path.exists(inflight)
    # and the DLQ dir itself was left in place (non-empty tidy refuses)
    assert os.path.exists(dlq_dir)


EMPTY_DOCS = "doc_id long, text string, lang string"


def test_dedup_operators_on_empty_corpus(spark):
    empty = spark.createDataFrame([], EMPTY_DOCS)
    assert D.exact_dedup(empty).count() == 0
    assert D.minhash_lsh_pairs(empty, num_hashes=64, bands=32).count() == 0
    assert D.simhash_pairs(empty).count() == 0
    assert D.blocked_jaccard_pairs(empty, block_cols=("lang",)).count() == 0


def test_ann_on_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.brute_force_topk(empty, [1.0, 0.0], k=5).count() == 0
    assert S.lsh_ann_topk(empty, [1.0, 0.0], k=5, bits=4, n_tables=2).count() == 0


def test_single_doc_corpus_no_pairs(spark):
    one = spark.createDataFrame([(1, "only one document here", "en")], EMPTY_DOCS)
    assert D.minhash_lsh_pairs(one, num_hashes=64, bands=32).count() == 0
    assert D.simhash_pairs(one).count() == 0


def test_short_text_shingle_fallback(spark):
    """Docs with fewer tokens than the shingle width fall back to the
    whole-text shingle — two identical short docs must still pair."""
    df = spark.createDataFrame(
        [(1, "hi there", "en"), (2, "hi there", "en"), (3, "bye now", "en")],
        EMPTY_DOCS,
    )
    pairs = D.minhash_lsh_pairs(df, num_hashes=64, bands=32, threshold=0.7).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(1, 2, 1.0)]


def test_streaming_aggs_on_empty_batch(spark):
    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    assert windowed_counts(empty).count() == 0
    assert session_window_counts(empty).count() == 0
