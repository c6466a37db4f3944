"""Round-6 property tests: the geohash cell encoder against a pure-
Python reference implementation, ip_range bounds against the stdlib,
and sentence-dedup invariants (idempotence, conservation on a
duplicate-free corpus) — the same Hypothesis strategy the rest of the
suite uses (SURVEY §5)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Pure-Python reference: interleave lon/lat interval halvings,
    MSB first, lon leads — the textbook geohash algorithm, written
    independently of the Column implementation's floor-divide form."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for j in range(precision):
        v = 0
        for i in range(5):
            v = (v << 1) | bits[5 * j + i]
        out.append(_ALPHABET[v])
    return "".join(out)


@settings(max_examples=30, deadline=None)
@given(
    lat=st.floats(min_value=-89.999, max_value=89.999,
                  allow_nan=False, allow_infinity=False),
    lon=st.floats(min_value=-179.999, max_value=179.999,
                  allow_nan=False, allow_infinity=False),
    p=st.integers(min_value=1, max_value=9),
)
def test_geohash_cell_matches_reference(spark, lat, lon, p):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        geohash_cell,
    )

    # interval-halving and floor-divide encodings agree except exactly
    # ON a cell boundary where float rounding may pick either side;
    # nudge off boundaries by requiring the cell fraction to be clean
    total = 5 * p
    lon_cells = 1 << ((total + 1) // 2)
    lat_cells = 1 << (total // 2)
    fx = (lon + 180.0) / 360.0 * lon_cells
    fy = (lat + 90.0) / 180.0 * lat_cells
    if min(abs(fx - round(fx)), abs(fy - round(fy))) < 1e-6:
        return  # boundary-adjacent point: both answers are defensible
    df = spark.createDataFrame([(lat, lon)], "lat double, lon double") \
        .select(F.struct("lat", "lon").alias("g"))
    got = df.select(geohash_cell("g", p).alias("h")).collect()[0]["h"]
    assert got == _ref_geohash(lat, lon, p)


def test_geohash_canonical_vectors(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        geohash_cell,
    )

    cases = [
        (57.64911, 10.40744, 11, "u4pruydqqvj"),
        (42.605, -5.603, 5, "ezs42"),
        (38.8977, -77.0365, 9, _ref_geohash(38.8977, -77.0365, 9)),
    ]
    df = spark.createDataFrame(
        [(la, lo) for la, lo, _, _ in cases], "lat double, lon double"
    ).select(F.struct("lat", "lon").alias("g"))
    rows = [
        df.filter((F.col("g.lat") == la) & (F.col("g.lon") == lo))
        .select(geohash_cell("g", p).alias("h")).collect()[0]["h"]
        for la, lo, p, _ in cases
    ]
    assert rows == [exp for _, _, _, exp in cases]


@settings(max_examples=15, deadline=None)
@given(
    ips=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255),
                  st.integers(0, 255), st.integers(0, 255)),
        min_size=1, max_size=12,
    ),
    lo=st.integers(0, 2**32 - 2),
    span=st.integers(1, 2**24),
)
def test_ip_range_matches_stdlib(spark, ips, lo, span):
    import ipaddress

    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    hi = min(lo + span, 2**32 - 1)
    lo_s = str(ipaddress.ip_address(lo))
    hi_s = str(ipaddress.ip_address(hi))
    df = spark.createDataFrame(
        [(".".join(map(str, q)),) for q in ips], "ip string")
    res = execute_search(df, {"size": 0, "aggs": {"r": {
        "ip_range": {"field": "ip", "ranges": [
            {"from": lo_s, "to": hi_s}]}}}})
    got = res["aggregations"]["r"]["buckets"][0]["doc_count"]
    expect = sum(
        1 for q in ips
        if lo <= int(ipaddress.ip_address(".".join(map(str, q)))) < hi
    )
    assert got == expect


def test_sentence_dedup_idempotent_and_conserving(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.dedup import (
        sentence_dedup,
    )

    df = spark.createDataFrame([
        (1, "Alpha beta gamma delta. Shared boiler plate text here. "
            "Unique one two three."),
        (2, "Shared boiler plate text here. Another different line "
            "entirely. Hi."),
        (3, "No duplicate sentences in this document at all."),
    ], "doc_id long, text string")
    once = sentence_dedup(df).select("doc_id", "text")
    twice = sentence_dedup(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))
    # a duplicate-free corpus passes through byte-identically
    clean = sentence_dedup(
        df.filter(F.col("doc_id") == 3)).collect()[0]
    assert clean["text"] == \
        "No duplicate sentences in this document at all."
