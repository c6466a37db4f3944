"""Content-based routing (SURVEY §2.3 R1–R3).

The reference declares ``route: - fare: '/type == "fare"'`` /
``- flight: '/type == "flight"'`` (custom_resource.py:340-342) and each
sink binds a route list; events matching no route are silently dropped
(R3). Here a route is any Spark ``Column`` predicate — strictly more
general than the reference's equality-on-a-top-level-field expression
language — and the drop is observable via an explicit ``UNROUTED`` split.

Scale note: routing is a per-row predicate, no shuffle. ``split`` over N
routes re-filters one cached frame rather than re-scanning the source —
on a stream micro-batch the batch is already materialized, so the N
filters are cheap map-side scans of it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNROUTED = "__unrouted__"


@dataclass(frozen=True)
class Route:
    name: str
    predicate: Column


def type_route(name: str, entity: str | None = None) -> Route:
    """The reference's route form: equality on the top-level ``type`` field."""
    return Route(name, F.col("type") == (entity or name))


class Router:
    """Fan one frame out to named routes + an explicit unrouted remainder.

    Routes are non-exclusive (OSIS/Data Prepper semantics: a sink
    receives events matching *any* of its routes; one event may match
    several routes).
    """

    def __init__(self, routes: list[Route]):
        if not routes:
            raise ValueError("at least one route required")
        names = [r.name for r in routes]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate route names: {names}")
        self.routes = routes

    def any_route_predicate(self) -> Column:
        pred = self.routes[0].predicate
        for r in self.routes[1:]:
            pred = pred | r.predicate
        return pred

    def split(self, df: DataFrame) -> dict[str, DataFrame]:
        """Route name → matching rows; UNROUTED → rows matching no route
        (the reference drops these silently; we keep the drop auditable)."""
        out = {r.name: df.filter(r.predicate) for r in self.routes}
        out[UNROUTED] = df.filter(~F.coalesce(self.any_route_predicate(), F.lit(False)))
        return out

    def tag(self, df: DataFrame, col_name: str = "route") -> DataFrame:
        """Single-pass variant: first matching route as a tag column
        (exclusive semantics, for route-count audits)."""
        expr = F.lit(UNROUTED)
        for r in reversed(self.routes):
            expr = F.when(r.predicate, F.lit(r.name)).otherwise(expr)
        return df.withColumn(col_name, expr)
