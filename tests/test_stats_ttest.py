"""t_test aggregation + the incomplete-beta special function.

The p-value path is anchored two independent ways: published critical
values (t_{0.975,v} must give p = 0.05) and a numerical quadrature of
the Student t density (Simpson over the tail complement) that shares
no code with the continued-fraction evaluation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.functions.stats import (
    regularized_incomplete_beta,
    student_t_two_sided_pvalue,
)
from opensearch_dynamodb_etl_cdk_spark.operators.search import execute_search


def _t_pdf(x: float, v: float) -> float:
    ln_c = (
        math.lgamma((v + 1.0) / 2.0)
        - math.lgamma(v / 2.0)
        - 0.5 * math.log(v * math.pi)
    )
    return math.exp(ln_c - (v + 1.0) / 2.0 * math.log1p(x * x / v))


def _p_two_sided_quadrature(t: float, v: float, steps: int = 20000) -> float:
    # 1 - integral of the pdf over [-|t|, |t|], Simpson's rule
    a, b = -abs(t), abs(t)
    h = (b - a) / steps
    s = _t_pdf(a, v) + _t_pdf(b, v)
    for i in range(1, steps):
        s += _t_pdf(a + i * h, v) * (4 if i % 2 else 2)
    return 1.0 - s * h / 3.0


def test_pvalue_matches_published_critical_values():
    # t_{0.975, v} two-sided critical values → p = 0.05
    for v, tcrit in [(1, 12.7062), (5, 2.5706), (10, 2.2281),
                     (30, 2.0423), (120, 1.9799)]:
        assert student_t_two_sided_pvalue(tcrit, v) == pytest.approx(
            0.05, abs=5e-4)
    # dof=1 is the Cauchy: P(|T| >= 1) is exactly 1/2
    assert student_t_two_sided_pvalue(1.0, 1.0) == pytest.approx(0.5, 1e-12)
    assert student_t_two_sided_pvalue(0.0, 7.0) == 1.0


def test_pvalue_matches_numerical_quadrature():
    for t, v in [(1.8973665961010275, 5.882352941176471),
                 (2.5, 8.0), (0.3, 3.0), (4.2, 17.5)]:
        assert student_t_two_sided_pvalue(t, v) == pytest.approx(
            _p_two_sided_quadrature(t, v), abs=1e-9)
        # symmetry
        assert student_t_two_sided_pvalue(-t, v) == \
            student_t_two_sided_pvalue(t, v)


def test_incomplete_beta_properties():
    assert regularized_incomplete_beta(2.0, 3.0, 0.0) == 0.0
    assert regularized_incomplete_beta(2.0, 3.0, 1.0) == 1.0
    # I_x(1,1) is the identity
    assert regularized_incomplete_beta(1.0, 1.0, 0.37) == pytest.approx(
        0.37, 1e-12)
    # symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
    assert regularized_incomplete_beta(2.5, 4.0, 0.3) == pytest.approx(
        1.0 - regularized_incomplete_beta(4.0, 2.5, 0.7), 1e-12)
    with pytest.raises(ValueError):
        regularized_incomplete_beta(0.0, 1.0, 0.5)
    with pytest.raises(ValueError):
        regularized_incomplete_beta(1.0, 1.0, 1.5)


@pytest.fixture(scope="module")
def samples(spark):
    # group A = [1..5] (mean 3, var_s 2.5), B = [2,4,6,8,10] (mean 6,
    # var_s 10) — the classic hand-checkable Welch example
    rows = [(float(v), "a", float(2 * v)) for v in range(1, 6)]
    return spark.createDataFrame(rows, "x double, grp string, y double")


def _tt(df, body):
    return execute_search(
        df, {"size": 0, "aggs": {"tt": {"t_test": body}}}
    )["aggregations"]["tt"]


def test_t_test_welch_hand_example(samples):
    # unpaired via two filters over one column union
    both = samples.select(F.col("x").alias("v"), "grp").union(
        samples.select(F.col("y").alias("v"), F.lit("b")))
    r = _tt(both, {
        "a": {"field": "v", "filter": {"term": {"grp": "a"}}},
        "b": {"field": "v", "filter": {"term": {"grp": "b"}}},
    })  # heteroscedastic is the default type
    assert r["na"] == 5 and r["nb"] == 5
    assert r["t_statistic"] == pytest.approx(-3.0 / math.sqrt(2.5), 1e-12)
    assert r["degrees_of_freedom"] == pytest.approx(6.25 / 1.0625, 1e-12)
    assert r["value"] == pytest.approx(
        _p_two_sided_quadrature(r["t_statistic"],
                                r["degrees_of_freedom"]), abs=1e-9)


def test_t_test_homoscedastic_and_paired(samples):
    both = samples.select(F.col("x").alias("v"), "grp").union(
        samples.select(F.col("y").alias("v"), F.lit("b")))
    r = _tt(both, {
        "a": {"field": "v", "filter": {"term": {"grp": "a"}}},
        "b": {"field": "v", "filter": {"term": {"grp": "b"}}},
        "type": "homoscedastic",
    })
    # pooled var 6.25 → same t, dof 8
    assert r["t_statistic"] == pytest.approx(-3.0 / math.sqrt(2.5), 1e-12)
    assert r["degrees_of_freedom"] == 8.0
    # paired: d = x - y = -v → mean -3, var_s 2.5
    rp = _tt(samples, {"a": {"field": "x"}, "b": {"field": "y"},
                       "type": "paired"})
    assert rp["n"] == 5
    assert rp["t_statistic"] == pytest.approx(
        -3.0 / math.sqrt(2.5 / 5.0), 1e-12)
    assert rp["degrees_of_freedom"] == 4.0


def test_t_test_edge_cases(samples):
    # degenerate: fewer than two observations on a side
    one = samples.filter(F.col("x") == 1.0)
    r = _tt(one, {"a": {"field": "x"}, "b": {"field": "y"},
                  "type": "paired"})
    assert r["value"] is None and r["n"] == 1
    # constant differences → zero variance, no statistic
    const = samples.withColumn("y2", F.col("x") + 1.0)
    rc = _tt(const, {"a": {"field": "x"}, "b": {"field": "y2"},
                     "type": "paired"})
    assert rc["value"] is None
    assert rc["degrees_of_freedom"] == 4.0
    # loud rejections
    with pytest.raises(ValueError, match="paired"):
        _tt(samples, {"a": {"field": "x", "filter": {"term": {"grp": "a"}}},
                      "b": {"field": "y"}, "type": "paired"})
    with pytest.raises(ValueError, match="t_test type"):
        _tt(samples, {"a": {"field": "x"}, "b": {"field": "y"},
                      "type": "bayesian"})
