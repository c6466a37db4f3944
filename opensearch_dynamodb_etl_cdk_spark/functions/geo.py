"""Geo primitives for the DSL's geo tier (SURVEY §2.7 extension).

OpenSearch geo_point queries (geo_distance / geo_bounding_box / geo
sort) over a struct column carrying ``lat``/``lon`` degree fields —
the engine's geo_point analog. Everything is pure Column arithmetic
(haversine great-circle distance on the WGS84 mean radius), so geo
predicates stay inside whole-stage codegen and push as far as Catalyst
can take ordinary comparisons; there is no geo index tier (OpenSearch
uses BKD trees) — at 100 TB the coarse pre-filter is the bounding box,
which IS pushable to the scan, with the exact haversine refining the
candidates, mirroring the classic bbox→exact two-phase geo plan.

No antimeridian (±180°) wrapping in the bounding box: boxes are taken
as plain coordinate intervals, the common case; a crossing box can be
expressed as the OR of two boxes by the caller.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius

_UNIT_KM = {
    "km": 1.0,
    "kilometers": 1.0,
    "m": 0.001,
    "meters": 0.001,
    "mi": 1.609344,
    "miles": 1.609344,
    "nmi": 1.852,
    "nauticalmiles": 1.852,
    "yd": 0.0009144,
    "yards": 0.0009144,
    "ft": 0.0003048,
    "feet": 0.0003048,
}

_DISTANCE_RE = re.compile(r"^\s*([0-9]*\.?[0-9]+)\s*([a-zA-Z]*)\s*$")


def parse_distance_km(distance: str | float | int) -> float:
    """Public distance-string grammar: a number with an optional unit
    suffix (``500km``, ``10mi``, ``2500``); bare numbers are meters,
    matching the OpenSearch default unit."""
    if isinstance(distance, (int, float)):
        return float(distance) * _UNIT_KM["m"]
    m = _DISTANCE_RE.match(str(distance))
    if not m:
        raise ValueError(f"unparseable distance {distance!r}")
    value, unit = float(m.group(1)), (m.group(2) or "m").lower()
    if unit not in _UNIT_KM:
        raise ValueError(f"unknown distance unit {unit!r} in {distance!r}")
    return value * _UNIT_KM[unit]


def parse_point(p) -> tuple[float, float]:
    """(lat, lon) from the public geo_point formats: an object
    ``{"lat": .., "lon": ..}``, a string ``"lat,lon"``, or a GeoJSON
    array ``[lon, lat]`` (note the reversed order, per the spec)."""
    if isinstance(p, dict):
        return float(p["lat"]), float(p["lon"])
    if isinstance(p, str):
        lat_s, lon_s = p.split(",")
        return float(lat_s), float(lon_s)
    if isinstance(p, (list, tuple)) and len(p) == 2:
        return float(p[1]), float(p[0])  # GeoJSON: [lon, lat]
    raise ValueError(f"unparseable geo point {p!r}")


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) coordinate
    pairs — the standard haversine formula as codegen-able arithmetic."""
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2.0
    dlmb = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb) * F.sin(dlmb)
    )
    # clamp against rounding drift above 1.0 (antipodal points)
    return (
        F.lit(2.0 * EARTH_RADIUS_KM)
        * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
    )


def geo_distance_pred(
    lat: Column, lon: Column, origin_lat: float, origin_lon: float,
    distance: str | float,
) -> Column:
    """``geo_distance`` filter predicate: within ``distance`` of the
    origin (inclusive, as the public query is)."""
    return haversine_km(
        lat, lon, F.lit(float(origin_lat)), F.lit(float(origin_lon))
    ) <= F.lit(parse_distance_km(distance))


def bounding_box_pred(
    lat: Column, lon: Column,
    top_left: tuple[float, float], bottom_right: tuple[float, float],
) -> Column:
    """``geo_bounding_box`` predicate — four plain comparisons, fully
    pushable. Corners are (lat, lon) pairs; no antimeridian wrap."""
    top, left = float(top_left[0]), float(top_left[1])
    bottom, right = float(bottom_right[0]), float(bottom_right[1])
    return (
        (lat <= F.lit(top))
        & (lat >= F.lit(bottom))
        & (lon >= F.lit(left))
        & (lon <= F.lit(right))
    )


def point_in_polygon_pred(
    lat: Column, lon: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Even-odd ray casting entirely in Column algebra: for each
    non-horizontal edge, a crossing iff the edge straddles the point's
    latitude and the edge's longitude at that latitude lies east of the
    point; odd crossing count = inside. The polygon is a request-time
    constant, so slopes precompute in Python and the predicate is a
    fixed chain of comparisons — whole-stage codegen, no UDF, no
    geometry library. Planar even-odd (no great-circle edges, no
    antimeridian wrap) — the documented approximation for the
    coordinate ranges the engine's geo tier covers."""
    if len(vertices) < 3:
        raise ValueError("geo_polygon needs at least 3 points")
    crossings = F.lit(0)
    n = len(vertices)
    for i in range(n):
        y1, x1 = (float(v) for v in vertices[i])
        y2, x2 = (float(v) for v in vertices[(i + 1) % n])
        if y1 == y2:
            continue  # horizontal edges never cross a horizontal ray
        slope = (x2 - x1) / (y2 - y1)
        cond = (
            ((F.lit(y1) > lat) != (F.lit(y2) > lat))
            & (lon < (lat - F.lit(y1)) * F.lit(slope) + F.lit(x1))
        )
        crossings = crossings + cond.cast("int")
    return crossings % 2 == 1


def _ring_vertices(ring) -> list[tuple[float, float]]:
    """(lat, lon) vertex list from a GeoJSON ring ([lon, lat] pairs);
    tolerates both closed (first == last, per the GeoJSON spec) and
    unclosed rings by dropping the duplicate closing vertex."""
    vs = [(float(p[1]), float(p[0])) for p in ring]
    if len(vs) >= 2 and vs[0] == vs[-1]:
        vs = vs[:-1]
    return vs


def shape_contains_point_pred(lat: Column, lon: Column, shape: dict) -> Column:
    """True iff the document's geo_point lies inside the request-time
    GeoJSON ``shape`` — the point-field evaluation of the public
    ``geo_shape`` query. Supported types: ``point`` (exact coordinate
    equality), ``envelope`` (the public [top-left, bottom-right]
    lon/lat corner convention → 4 pushable comparisons), ``circle``
    (center + radius string → exact haversine), ``polygon`` (outer ring
    minus holes, even-odd ray casting), ``multipolygon`` and
    ``geometrycollection`` (OR over members). Every branch is a fixed
    chain of codegen comparisons over request-constant geometry — no
    geometry library, no UDF, so the predicate pipelines into the scan
    at any scale. Line types are rejected loudly: a point doc meets a
    zero-width line only under exact-rational arithmetic this planar
    double-precision tier does not provide."""
    st = str(shape.get("type", "")).lower()
    if st == "point":
        plat, plon = parse_point(shape["coordinates"])
        return (lat == F.lit(plat)) & (lon == F.lit(plon))
    if st == "envelope":
        (x1, y1), (x2, y2) = shape["coordinates"]  # [lon, lat] corners
        return bounding_box_pred(
            lat, lon, (float(y1), float(x1)), (float(y2), float(x2))
        )
    if st == "circle":
        plat, plon = parse_point(shape["coordinates"])
        return geo_distance_pred(lat, lon, plat, plon, shape["radius"])
    if st == "polygon":
        rings = shape["coordinates"]
        pred = point_in_polygon_pred(lat, lon, _ring_vertices(rings[0]))
        for hole in rings[1:]:
            pred = pred & ~point_in_polygon_pred(
                lat, lon, _ring_vertices(hole)
            )
        return pred
    if st == "multipolygon":
        preds = [
            shape_contains_point_pred(
                lat, lon, {"type": "polygon", "coordinates": poly}
            )
            for poly in shape["coordinates"]
        ]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    if st == "geometrycollection":
        preds = [
            shape_contains_point_pred(lat, lon, g)
            for g in shape["geometries"]
        ]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    raise ValueError(
        f"unsupported geo_shape type {st!r} (line types have zero-measure "
        "intersection with point documents in this planar tier)"
    )
