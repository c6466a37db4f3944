"""Property sweep for the range-query date-math engine (pure Python —
no Spark session): rounding bracketing, shift inverses, calendar-month
clamping, and the op-rewrite contract."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_dynamodb_etl_cdk_spark.operators.search import (
    _dm_floor,
    _dm_shift,
    _resolve_date_math,
)

_dts = st.datetimes(
    min_value=dt.datetime(1971, 1, 1),
    max_value=dt.datetime(2099, 12, 28),
)
_units = st.sampled_from(["y", "M", "w", "d", "h", "m", "s"])


@settings(max_examples=300, deadline=None)
@given(_dts, _units)
def test_floor_brackets_the_instant(t, unit):
    lo = _dm_floor(t, unit)
    hi = _dm_shift(lo, 1, unit) if unit != "w" else _dm_shift(lo, 7, "d")
    assert lo <= t < hi
    # flooring is idempotent
    assert _dm_floor(lo, unit) == lo


@settings(max_examples=300, deadline=None)
@given(_dts, st.integers(min_value=-500, max_value=500),
       st.sampled_from(["w", "d", "h", "m", "s"]))
def test_fixed_unit_shift_inverts(t, n, unit):
    # fixed-duration units invert exactly; calendar units (y/M) clamp
    # and deliberately do not
    assert _dm_shift(_dm_shift(t, n, unit), -n, unit) == t


@settings(max_examples=300, deadline=None)
@given(_dts, st.integers(min_value=-240, max_value=240))
def test_month_shift_clamps_day(t, n):
    out = _dm_shift(t, n, "M")
    assert 1 <= out.day <= 31
    assert out.day <= t.day  # clamping never grows the day-of-month
    # the month advances by exactly n modulo year rollover
    assert (out.year * 12 + out.month) - (t.year * 12 + t.month) == n


@settings(max_examples=200, deadline=None)
@given(_dts, st.sampled_from(["gte", "gt", "lte", "lt"]), _units)
def test_rounding_op_rewrite_contract(now, op, unit):
    got_op, got = _resolve_date_math(f"now/{unit}", op, now)
    lo = _dm_floor(now, unit)
    hi = _dm_shift(lo, 1, unit) if unit != "w" else _dm_shift(lo, 7, "d")
    if op in ("gte", "lt"):
        assert (got_op, got) == (op, lo)
    else:  # gt / lte round UP and become exclusive next-unit bounds
        assert got == hi
        assert got_op == {"gt": "gte", "lte": "lt"}[op]


@settings(max_examples=200, deadline=None)
@given(_dts, st.integers(min_value=-400, max_value=400),
       st.sampled_from(["d", "h", "m"]))
def test_offsets_preserve_op_and_compose(now, n, unit):
    sign = "+" if n >= 0 else "-"
    expr = f"now{sign}{abs(n)}{unit}"
    op, got = _resolve_date_math(expr, "gte", now)
    assert op == "gte"
    assert got == _dm_shift(now, n, unit)
