"""Distributed logistic regression (operators/classifier.py): learning
on separable data, bit-exact partition invariance (the decimal-summed
gradient claim), agreement with a NumPy full-batch reference, listwise
deletion of unusable rows, and the codegen scoring surface."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.classifier import (
    logistic_margin,
    logistic_score,
    train_logistic,
)


def _blob(seed: int, n: int, cx: float, cy: float, label: int):
    # deterministic pseudo-random cluster (LCG — no RNG state in tests)
    rows, s = [], seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        dx = (s % 1000) / 1000.0 - 0.5
        s = (s * 1103515245 + 12345) % (1 << 31)
        dy = (s % 1000) / 1000.0 - 0.5
        rows.append(([cx + dx, cy + dy], label))
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    rows = _blob(1, 60, -2.0, -2.0, 0) + _blob(2, 60, 2.0, 2.0, 1)
    df = spark.createDataFrame(rows, "x array<double>, y int").cache()
    df.count()
    return df


def test_learns_separable_data(blobs):
    m = train_logistic(blobs, "x", "y", iters=30, lr=1.0)
    assert m["n"] == 120
    scored = blobs.select(
        "y", logistic_score("x", m["bias"], m["weights"]).alias("p")
    )
    acc = scored.filter(
        ((F.col("p") >= 0.5) & (F.col("y") == 1))
        | ((F.col("p") < 0.5) & (F.col("y") == 0))
    ).count() / 120.0
    assert acc == 1.0
    # more steps keep reducing the loss on this easy problem
    m5 = train_logistic(blobs, "x", "y", iters=5, lr=1.0)
    assert m["loss"] < m5["loss"] < math.log(2.0)  # log 2 = iter-0 loss


def test_partition_invariance_bit_exact(blobs):
    a = train_logistic(blobs.repartition(1), "x", "y", iters=8, lr=0.7)
    b = train_logistic(blobs.repartition(32), "x", "y", iters=8, lr=0.7)
    assert a["bias"] == b["bias"]            # ==, not approx: decimal sums
    assert a["weights"] == b["weights"]
    assert a["loss"] == b["loss"]


def test_matches_numpy_reference(spark):
    import numpy as np

    rows = _blob(7, 40, -1.0, 0.5, 0) + _blob(8, 40, 1.5, -0.5, 1)
    df = spark.createDataFrame(rows, "x array<double>, y int")
    got = train_logistic(df, "x", "y", iters=10, lr=0.5, l2=0.01)

    X = np.array([r[0] for r in rows])
    Y = np.array([r[1] for r in rows], dtype=float)
    w, b = np.zeros(2), 0.0
    for _ in range(10):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - Y
        w = w - 0.5 * (X.T @ err / len(Y) + 0.01 * w)
        b = b - 0.5 * err.sum() / len(Y)
    assert got["bias"] == pytest.approx(b, abs=1e-9)
    assert got["weights"] == pytest.approx(w.tolist(), abs=1e-9)


def test_listwise_deletion_and_errors(spark):
    df = spark.createDataFrame(
        [([0.0, 1.0], 1), ([1.0, 0.0], 0),
         (None, 1),                 # null vector
         ([1.0], 0),                # wrong length
         ([1.0, None], 0),          # null element
         ([0.5, 0.5], None)],       # null label
        "x array<double>, y int",
    )
    m = train_logistic(df, "x", "y", iters=2)
    assert m["n"] == 2
    with pytest.raises(ValueError, match="iters"):
        train_logistic(df, "x", "y", iters=0)
    with pytest.raises(ValueError, match="no trainable rows"):
        train_logistic(df.filter(F.col("y").isNull()), "x", "y", dim=2)


def test_scoring_surface(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], "x array<double>")
    row = df.select(
        logistic_margin("x", 0.5, [2.0, -1.0]).alias("z"),
        logistic_score("x", 0.5, [2.0, -1.0]).alias("p"),
    ).collect()[0]
    assert row["z"] == pytest.approx(0.5 + 2.0 - 2.0)
    assert row["p"] == pytest.approx(1.0 / (1.0 + math.exp(-0.5)))


def test_binary_words_properties():
    """Pure-Python properties of the sign-bit packing (no Spark): the
    driver-side twin used to build query signatures."""
    from hypothesis import given, strategies as st

    from opensearch_dynamodb_etl_cdk_spark.operators.similarity import (
        _binary_words_py,
    )

    @given(st.lists(
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e6, max_value=1e6),
        min_size=1, max_size=96,
    ), st.data())
    def check(vec, data):
        words = _binary_words_py(vec)
        assert len(words) == (len(vec) + 31) // 32
        # bit i of word w ⇔ component (32w + i) positive
        for idx, v in enumerate(vec):
            bit = (words[idx // 32] >> (idx % 32)) & 1
            assert bit == (1 if v > 0 else 0)
        # flipping one component's sign toggles exactly that bit
        i = data.draw(st.integers(0, len(vec) - 1))
        flipped = list(vec)
        flipped[i] = -flipped[i] if flipped[i] != 0 else 1.0
        fwords = _binary_words_py(flipped)
        diff = [a ^ b for a, b in zip(words, fwords)]
        assert sum(bin(d).count("1") for d in diff) == (
            0 if vec[i] == 0 and flipped[i] <= 0 else 1
        )

    check()
