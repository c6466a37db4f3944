"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (JVM-side, codegen) so similarity queries stay in
whole-stage codegen and remain oracle-checkable bit-for-bit.

The fold order of ``F.aggregate`` is element order, matching DuckDB's
list functions — dot products computed on both engines agree to the
last bit (floats upcast to double per element before multiply).

For bulk ANN workloads the Arrow/numpy path in operators/similarity.py
is faster (matrix multiply per batch); these expressions are the
correctness baseline and the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(l2_norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize; after this, cosine = dot (one fewer pass at scale)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
