"""Connected components over a pair list — cluster labeling for
near-duplicate groups (driver charter, SURVEY §2.10 E2: a near-dup
*pair* list only answers "are these two similar"; curation needs the
transitive closure "which documents form one duplicate cluster" so a
single survivor per cluster can be kept).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round a node adopts the minimum of its own label and
its neighbors' labels; fixpoint = every node carries the minimum node
id of its component. Rounds needed = graph diameter (near-dup clusters
are shallow — duplicates of a common source connect within 1–2 hops).

Scale notes (100 TB): the driver loop is control flow only — each
round is one distributed join + groupBy keyed on node id, shuffle
linear in |edges|. `localCheckpoint` truncates lineage so plans don't
grow with iteration count. For adversarial graphs (long chains) the
round count grows with diameter; the published fix is large-star /
small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond") which converges in O(log² n) — the loop body
here is the building block either way. Convergence is detected with a
`limit(1).count()` on changed labels, so the check short-circuits and
never materializes a full diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node that appears in ``pairs`` with the minimum node
    id reachable from it. Returns ``(node, component_id)``.

    ``pairs`` is an undirected edge list (one row per pair, either
    orientation); isolated nodes (no edges) are not labeled — callers
    wanting them keep ``coalesce(component_id, node)`` after a left
    join.
    """
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # cache the edge list: it is re-joined every round
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component_id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                labels["node"],
                F.least(
                    labels["component_id"],
                    F.coalesce(nbr_min["nbr_min"], labels["component_id"]),
                ).alias("component_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component_id") != F.col("o.component_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def component_sizes(labels: DataFrame) -> DataFrame:
    """(component_id, n_members) for each cluster."""
    return labels.groupBy("component_id").agg(F.count("*").alias("n_members"))
