"""Scalar statistical special functions for the aggregation tier.

These run DRIVER-side on already-reduced scalars (an aggregation's
single output row), never per document — the distributed work is the
one-pass moment aggregation in ``operators/search.py``; turning the
reduced (t, dof) pair into a p-value is O(1) math that has no business
on an executor. Implemented from the standard public formulas: the
regularized incomplete beta via the modified-Lentz continued fraction
(the textbook evaluation — converges in a few dozen terms for all the
(a, b, x) this tier produces), and Student's t two-sided tail as
``I_{v/(v+t²)}(v/2, 1/2)``.
"""

from __future__ import annotations

import math

_CF_MAX_ITER = 300
_CF_EPS = 3e-14
_CF_TINY = 1e-300


def _beta_continued_fraction(a: float, b: float, x: float) -> float:
    """Continued-fraction factor of the incomplete beta (modified
    Lentz evaluation of the standard even/odd coefficient scheme
    d_{2m} = m(b-m)x / ((a+2m-1)(a+2m)),
    d_{2m+1} = -(a+m)(a+b+m)x / ((a+2m)(a+2m+1)))."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _CF_TINY:
        d = _CF_TINY
    d = 1.0 / d
    h = d
    for m in range(1, _CF_MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _CF_TINY:
            d = _CF_TINY
        c = 1.0 + aa / c
        if abs(c) < _CF_TINY:
            c = _CF_TINY
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _CF_TINY:
            d = _CF_TINY
        c = 1.0 + aa / c
        if abs(c) < _CF_TINY:
            c = _CF_TINY
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _CF_EPS:
            return h
    raise ArithmeticError(
        f"incomplete-beta continued fraction failed to converge "
        f"(a={a}, b={b}, x={x})"
    )


def regularized_incomplete_beta(a: float, b: float, x: float) -> float:
    """I_x(a, b) for a, b > 0 and x in [0, 1], with the standard
    symmetry switch so the continued fraction is always evaluated in
    its fast-converging region x < (a+1)/(a+b+2)."""
    if not 0.0 <= x <= 1.0:
        raise ValueError(f"x must be in [0, 1], got {x}")
    if a <= 0.0 or b <= 0.0:
        raise ValueError(f"a, b must be positive, got a={a}, b={b}")
    if x == 0.0:
        return 0.0
    if x == 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _beta_continued_fraction(a, b, x) / a
    return 1.0 - front * _beta_continued_fraction(b, a, 1.0 - x) / b


def student_t_two_sided_pvalue(t: float, dof: float) -> float:
    """P(|T| >= |t|) under Student's t with ``dof`` degrees of freedom
    — the exact tail identity ``I_{v/(v+t²)}(v/2, 1/2)``, no sampling,
    no approximation beyond double precision."""
    if dof <= 0.0:
        raise ValueError(f"degrees of freedom must be positive, got {dof}")
    if math.isnan(t):
        return float("nan")
    x = dof / (dof + t * t)
    return regularized_incomplete_beta(dof / 2.0, 0.5, x)
