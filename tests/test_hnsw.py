"""HNSW sharded-graph ANN: recall on planted clusters, deterministic
builds, indexed == one-shot, delta refresh ≡ full rebuild, multi-query
consistency, and tiny-shard edges (no SQL oracle — graph search is
approximate by design; these are the named property tests)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators import hnsw as H
from opensearch_dynamodb_etl_cdk_spark.operators import similarity as S


def _planted(rng, n_clusters=6, per_cluster=30, dim=16, spread=0.05):
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows, vid = [], 0
    for c in centers:
        for _ in range(per_cluster):
            rows.append((vid, [x + rng.gauss(0, spread) for x in c]))
            vid += 1
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hnsw_recall_on_clusters(spark):
    """Scatter-gather HNSW must recover ≥9/10 of the exact cosine
    top-10 on clustered data, with the exact best hit first — every
    shard is searched, so unlike IVF there is no cell-miss mode."""
    rng = random.Random(11)
    rows = _planted(rng)
    df = _df(spark, rows)
    q = rows[40][1]
    bf = [r.vec_id for r in S.brute_force_topk(df, q, k=10).collect()]
    got = H.hnsw_ann_topk(df, q, k=10, n_shards=4, ef_search=64).collect()
    assert len(set(bf) & {r.vec_id for r in got}) >= 9
    assert got[0].vec_id == bf[0]
    # scores are exact cosines, descending
    scores = [r["_score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_hnsw_build_is_deterministic(spark):
    """Same corpus → bit-identical graph rows, regardless of input
    partitioning (levels hash from vec_id; insertion is vec_id-sorted)."""
    rng = random.Random(3)
    rows = _planted(rng, n_clusters=3, per_cluster=20)
    a = H.build_hnsw_index(_df(spark, rows), n_shards=3).collect()
    b = H.build_hnsw_index(_df(spark, rows).repartition(7), n_shards=3).collect()
    key = lambda r: (r["_shard"], r["node"])
    assert sorted(
        [(r["_shard"], r["node"], r["vec_id"], r["level"], r["neighbors"]) for r in a]
    ) == sorted(
        [(r["_shard"], r["node"], r["vec_id"], r["level"], r["neighbors"]) for r in b]
    )


def test_hnsw_indexed_matches_oneshot(spark):
    rng = random.Random(5)
    rows = _planted(rng, n_clusters=4, per_cluster=25)
    df = _df(spark, rows)
    q = rows[7][1]
    idx = H.build_hnsw_index(df, n_shards=4)
    indexed = H.query_hnsw_topk(idx, q, k=5, ef_search=40).collect()
    oneshot = H.hnsw_ann_topk(df, q, k=5, n_shards=4, ef_search=40).collect()
    assert [(r.vec_id, r["_score"]) for r in indexed] == [
        (r.vec_id, r["_score"]) for r in oneshot
    ]


def test_hnsw_refresh_equals_full_rebuild(spark):
    """Rebuilding only the delta-touched shards from the updated corpus
    must equal a from-scratch build bit-for-bit (deterministic
    construction + independent shards)."""
    rng = random.Random(9)
    rows = _planted(rng, n_clusters=4, per_cluster=20)
    df = _df(spark, rows)
    idx = H.build_hnsw_index(df, n_shards=4)
    # CDC delta: vectors 0-4 re-embedded, 50-52 deleted
    changed_rows = [(i, [x + 0.3 for x in rows[i][1]]) for i in range(5)]
    deleted = {50, 51, 52}
    new_corpus_rows = [
        (vid, vec) for vid, vec in rows if vid not in deleted and vid >= 5
    ] + changed_rows
    corpus2 = _df(spark, new_corpus_rows)
    delta_ids = spark.createDataFrame(
        [(i,) for i in list(range(5)) + sorted(deleted)], "vec_id long"
    )
    refreshed = H.refresh_hnsw_index(idx, corpus2, delta_ids, n_shards=4).collect()
    rebuilt = H.build_hnsw_index(corpus2, n_shards=4).collect()
    norm = lambda rs: sorted(
        (r["_shard"], r["node"], r["vec_id"], r["level"], r["neighbors"], r["_emb"])
        for r in rs
    )
    assert norm(refreshed) == norm(rebuilt)


def test_hnsw_multi_query_matches_single(spark):
    rng = random.Random(21)
    rows = _planted(rng, n_clusters=4, per_cluster=20)
    df = _df(spark, rows)
    idx = H.build_hnsw_index(df, n_shards=3)
    queries = spark.createDataFrame(
        [(0, rows[3][1]), (1, rows[33][1])], "qid int, qvec array<float>"
    )
    multi = H.query_hnsw_topk_multi(idx, queries, k=5, ef_search=40).collect()
    by_q = {}
    for r in sorted(multi, key=lambda r: (r.qid, r["_rank"])):
        by_q.setdefault(r.qid, []).append((r.vec_id, r["_score"]))
    for qid, qvec in [(0, rows[3][1]), (1, rows[33][1])]:
        single = [
            (r.vec_id, r["_score"])
            for r in H.query_hnsw_topk(idx, qvec, k=5, ef_search=40).collect()
        ]
        # ids and ranking identical; scores agree to float32 round-trip
        # precision (the query column is array<float>, the direct call
        # passes python doubles)
        assert [v for v, _ in by_q[qid]] == [v for v, _ in single]
        for (_, a), (_, b) in zip(by_q[qid], single):
            assert abs(a - b) < 1e-6


def test_hnsw_tiny_corpus_more_shards_than_rows(spark):
    """3 vectors across 8 shards: singleton (and absent) shards must
    build and answer; top-k over the union is still the exact ranking
    (every vector is its shard's entry point)."""
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    df = _df(spark, rows)
    got = H.hnsw_ann_topk(df, [1.0, 0.0], k=3, n_shards=8).collect()
    assert [r.vec_id for r in got] == [0, 1, 2]
    assert abs(got[0]["_score"] - 1.0) < 1e-12
