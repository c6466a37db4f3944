"""Connected components over a pair list — cluster labeling for
near-duplicate groups (driver charter, SURVEY §2.10 E2: a near-dup
*pair* list only answers "are these two similar"; curation needs the
transitive closure "which documents form one duplicate cluster" so a
single survivor per cluster can be kept).

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", 2014) — the
published O(log² n)-round algorithm, robust to adversarial diameters:

* large-star(u): every neighbor LARGER than u re-attaches to
  m = min(N(u) ∪ {u}) — long tails collapse toward small ids;
* small-star(u): every neighbor ≤ u (and u itself) attaches to the
  minimum neighbor — stars flatten so each node points at its
  component's current minimum.

At the fixpoint every edge is (node, component-min) and the label read
is a projection. Naive min-label propagation needs diameter rounds — a
million-node chain is a million joins; star contraction roughly halves
chains every round.

Scale notes (100 TB): the driver loop is control flow only — each
round is two keyed groupBy/join passes, shuffle linear in |edges|,
edges always carried canonically as (larger, smaller) so the frames
stay narrow and `distinct` bounds growth. `localCheckpoint` truncates
lineage per round. Convergence = the canonical edge set is unchanged
(two `exceptAll(...).limit(1)` probes that short-circuit without
materializing a full diff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over a canonical (a > b) edge frame:
    for each node, neighbors larger than it re-attach to the minimum
    of its closed neighborhood. Output is canonical again."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(
        F.least(F.col("a"), F.min("b")).alias("m")
    )
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: every node (and each of its ≤ neighbors)
    attaches to its minimum neighbor. Input/output canonical (a > b)."""
    mins = e.groupBy("a").agg(F.min("b").alias("m"))
    out = (
        e.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(mins.select(F.col("a"), F.col("m").alias("b")))
    )
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node that appears in ``pairs`` with the minimum node
    id reachable from it. Returns ``(node, component_id)``.

    ``pairs`` is an undirected edge list (one row per pair, either
    orientation); self-loops are ignored for contraction but their
    nodes are still labeled (with themselves, if isolated). Isolated
    nodes never appearing in ``pairs`` are not labeled — callers
    wanting them keep ``coalesce(component_id, node)`` after a left
    join.
    """
    raw = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    nodes = (
        raw.select("a")
        .union(raw.select(F.col("b").alias("a")))
        .distinct()
        .select(F.col("a").alias("node"))
        .localCheckpoint()
    )
    # canonical (larger, smaller) distinct edge set
    e = (
        raw.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        unchanged = (
            e2.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(e2).limit(1).count() == 0
        )
        e = e2
        if unchanged:
            break

    # fixpoint edges are (member, component-min); roots and isolated
    # nodes label themselves
    member = e.groupBy(F.col("a").alias("node")).agg(
        F.min("b").alias("component_id")
    )
    return nodes.join(member, "node", "left").select(
        "node",
        F.coalesce(F.col("component_id"), F.col("node")).alias("component_id"),
    )


def component_sizes(labels: DataFrame) -> DataFrame:
    """(component_id, n_members) for each cluster."""
    return labels.groupBy("component_id").agg(F.count("*").alias("n_members"))
