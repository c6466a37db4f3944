"""Atomic ANN index publication (plans/catalog_ext.py::_publish_index):
the materialized LSH/IVF index tables live under a SHARED
spark-warehouse path, so concurrent sessions with the same sf tag must
never clobber a version another session is mid-scan on. Publication is
build-into-a-unique-version-dir + atomic _CURRENT pointer flip
(os.replace); readers resolve the pointer, in-flight readers of the
previous version keep their files (two newest kept)."""

from __future__ import annotations

import os

import pytest

from opensearch_dynamodb_etl_cdk_spark.plans import catalog_ext as CE


def _versions(base):
    return sorted(d for d in os.listdir(base) if d.startswith("v"))


def test_publish_is_versioned_and_pointer_flips(spark, tmp_path):
    base = str(tmp_path / "idx")
    df1 = spark.range(5).toDF("id")
    CE._publish_index(base, lambda d: df1.write.parquet(d))
    v1 = CE._resolve_index(base)
    assert os.path.basename(v1).startswith("v")
    assert spark.read.parquet(v1).count() == 5

    # an in-flight reader of the first version...
    reader = spark.read.parquet(v1)

    # ...survives a concurrent rebuild: the new version lands in its
    # own dir, the pointer flips atomically, v1's files stay on disk
    df2 = spark.range(9).toDF("id")
    CE._publish_index(base, lambda d: df2.write.parquet(d))
    v2 = CE._resolve_index(base)
    assert v2 != v1
    assert spark.read.parquet(v2).count() == 9
    assert reader.count() == 5  # old version still fully readable
    assert set(_versions(base)) >= {os.path.basename(v1),
                                    os.path.basename(v2)}

    # a third publish keeps EVERY version still inside the pruning
    # grace period — back-to-back rebuilds must not delete a version a
    # long-running reader resolved moments earlier (r9 ADVICE)
    CE._publish_index(base, lambda d: spark.range(2).write.parquet(d))
    v3 = CE._resolve_index(base)
    vers = _versions(base)
    assert {os.path.basename(v) for v in (v1, v2, v3)} <= set(vers)

    # ...but an AGED superseded version (past the grace period and not
    # the newest previous) is pruned by the next publish
    import time

    aged = time.time() - 3600
    os.utime(os.path.join(base, os.path.basename(v1)), (aged, aged))
    CE._publish_index(base, lambda d: spark.range(4).write.parquet(d))
    vers = _versions(base)
    assert os.path.basename(v1) not in vers
    assert os.path.basename(v3) in vers  # newest previous always kept

    # no half-written state is ever pointed at: _CURRENT contents name
    # an existing, complete parquet dir
    assert spark.read.parquet(CE._resolve_index(base)).count() == 4


def test_lsh_index_interleaved_rebuild_consistent(spark, sf_dir):
    """Two 'sessions' (simulated by clearing the per-process memo)
    interleaving a rebuild with reads of the same index tag: both
    readers get complete indexes, never an error or a torn read."""
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]

    idx1 = CE._lsh_index(spark, sf_dir, e)
    n1 = idx1.count()
    assert n1 > 0

    # session 2 arrives with an empty memo and rebuilds concurrently
    CE._ANN_IDX_BUILT.discard(CE._idx_path("lsh", sf_dir))
    idx2 = CE._lsh_index(spark, sf_dir, e)
    n2 = idx2.count()

    # the rebuild is deterministic (seeded signatures) and the first
    # reader's frame still scans its own version without error
    assert n2 == n1
    assert idx1.count() == n1
