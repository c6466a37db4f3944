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


def int8_scale(a: Column) -> Column:
    """Per-vector symmetric int8 quantization scale: max-abs / 127.

    Zero vectors get scale 1.0 so quantize/dequantize stay total
    functions (they round-trip 0 exactly). Double math throughout —
    Spark and DuckDB agree bit-for-bit, keeping the quantization
    oracle-checkable.
    """
    m = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return F.when(m > 0, m / F.lit(127.0)).otherwise(F.lit(1.0))


def quantize_int8(a: Column, scale: Column) -> Column:
    """Symmetric linear quantization to array<tinyint> (¼ the bytes of
    float32, 1/8 of the doubles they'd otherwise occupy in shuffle).
    Spark ``round`` is HALF_UP (away from zero), same as DuckDB's
    ``round`` — the engines produce identical codes. |code| ≤ 127 by
    construction of :func:`int8_scale`, so the tinyint cast never wraps.
    """
    return F.transform(
        a, lambda x: F.round(x.cast("double") / scale).cast("tinyint")
    )


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Reconstruct doubles from int8 codes; error ≤ scale/2 per element."""
    return F.transform(q, lambda x: x.cast("double") * scale)
