"""Distributed logistic-regression training and scoring — the
quality-classifier tier of an LLM data pipeline (train a lightweight
linear model on labeled documents, score the whole corpus with it).

Reference semantics: the standard full-batch gradient-descent logistic
regression every public framework implements; what this module adds is
the *engine* discipline the rest of the repo holds itself to:

- **Scan-shaped iterations.** Each training step is ONE aggregate job
  over the feature frame (d+2 running sums — gradient per dimension,
  bias gradient, row count folded into the same pass on iteration 1).
  Nothing is ever collected except the d+2 scalars; the corpus never
  shuffles (no groupBy key at all — a pure map-side-combine reduce).
  At 100 TB this is exactly as expensive as `iters` column scans.

- **Deterministic, partition-invariant arithmetic.** Per-row gradient
  contributions are rounded into DECIMAL(38,18) before summing, so the
  reduce is exact integer arithmetic — the resulting weights are
  bit-identical whether the frame has 1 partition or 10,000 (asserted
  in tests), which double-sums cannot promise. The same trick as
  operators/pca.py and the IVF centroid refinement.

- **Codegen-only scoring.** The margin is an explicit left-to-right
  `bias + w1·x1 + … + wd·xd` Column chain (fixed association order, so
  a SQL oracle reproduces it bit-for-bit), and the sigmoid is plain
  `1/(1+exp(−z))` — one whole-stage-codegen projection, no UDF, no ML
  library, usable inside any query/filter the engine runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_logistic", "logistic_margin", "logistic_score"]

_DEC = "decimal(38,18)"


def logistic_margin(
    features_col: str | Column, bias: float, weights: list[float]
) -> Column:
    """``bias + Σ w_j · x_j`` over an ``array<double>`` column, folded
    left-to-right with a fixed association order (element_at is
    1-indexed). Pure codegen arithmetic."""
    col = F.col(features_col) if isinstance(features_col, str) else features_col
    z = F.lit(float(bias))
    for j, wj in enumerate(weights):
        z = z + F.lit(float(wj)) * F.element_at(col, j + 1)
    return z


def logistic_score(
    features_col: str | Column, bias: float, weights: list[float]
) -> Column:
    """``sigmoid(margin)`` ∈ (0, 1) — the classifier probability."""
    z = logistic_margin(features_col, bias, weights)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logistic(
    df: DataFrame,
    features_col: str,
    label_col: str,
    *,
    dim: int | None = None,
    iters: int = 25,
    lr: float = 1.0,
    l2: float = 0.0,
) -> dict:
    """Full-batch gradient descent on the logistic loss.

    ``features_col`` is an ``array<double>`` column of fixed length
    (``dim``; probed from the first row when omitted), ``label_col`` a
    0/1 (or boolean) column. Returns ``{"bias", "weights", "n",
    "loss"}`` where ``loss`` is the final mean logistic loss (computed
    inside the same aggregate pass — no extra job).

    Update rule per iteration (driver-side, Python floats — exact
    given the decimal-summed gradients):

        w_j ← w_j − lr · (Σ (p_i − y_i)·x_ij / n + l2 · w_j)
        b   ← b   − lr ·  Σ (p_i − y_i)       / n

    Rows with a NULL label or NULL/wrong-length feature vector are
    excluded up front (listwise deletion, one filter folded into every
    iteration's scan)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    y = F.col(label_col).cast("double")
    x = F.col(features_col)
    if dim is None:
        probe = df.select(F.size(x).alias("d")).filter(
            F.col("d") >= 0).limit(1).collect()
        if not probe:
            raise ValueError("train_logistic: empty frame")
        dim = int(probe[0]["d"])
    if dim < 1:
        raise ValueError(f"feature dimension must be >= 1, got {dim}")
    clean = df.filter(
        y.isNotNull() & x.isNotNull() & (F.size(x) == dim)
        & ~F.exists(x, lambda v: v.isNull())
    ).select(x.alias("__x"), y.alias("__y"))
    # persist across the gradient scans: every iteration re-reads the
    # SAME (features, label) frame, and feature projections are often
    # expensive (tokenizer regexes); materializing once turns `iters`
    # upstream recomputations into `iters` cached-column scans —
    # MEMORY_AND_DISK, so a corpus larger than cluster memory spills
    # instead of thrashing the upstream pipeline
    clean = clean.persist()

    bias = 0.0
    weights = [0.0] * dim
    n: int | None = None
    loss = float("nan")
    for _ in range(iters):
        z = logistic_margin("__x", bias, weights)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("__y")
        aggs = [F.sum(err.cast(_DEC)).alias("g_b")]
        for j in range(dim):
            aggs.append(
                F.sum((err * F.element_at(F.col("__x"), j + 1)).cast(_DEC))
                .alias(f"g_{j}")
            )
        # mean logistic loss via the numerically-stable softplus form:
        # loss_i = softplus(z) − y·z  (= −y·ln p − (1−y)·ln(1−p))
        loss_term = (
            F.when(z > 0, z + F.log1p(F.exp(-z)))
            .otherwise(F.log1p(F.exp(z)))
            - F.col("__y") * z
        )
        aggs.append(F.sum(loss_term.cast(_DEC)).alias("l"))
        if n is None:
            aggs.append(F.count(F.lit(1)).alias("n"))
        try:
            row = clean.agg(*aggs).collect()[0]
        except Exception:
            clean.unpersist()
            raise
        if n is None:
            n = int(row["n"])
            if n == 0:
                clean.unpersist()
                raise ValueError("train_logistic: no trainable rows")
        loss = float(row["l"]) / n
        bias -= lr * float(row["g_b"]) / n
        weights = [
            w - lr * (float(row[f"g_{j}"]) / n + l2 * w)
            for j, w in enumerate(weights)
        ]
    clean.unpersist()
    return {"bias": bias, "weights": weights, "n": n, "loss": loss}
