"""Graph operators for dedup-group resolution: distributed connected
components over a near-dup pair list.

A pair list (MinHash / SimHash / embedding LSH output) is not yet a
deduplication: transitively-linked docs (A~B, B~C) must collapse into ONE
group with one survivor. That grouping is connected components over the
candidate-pair graph — the step every production dedup pipeline runs
between "pairs" and "drop list".

Algorithm: iterative min-label propagation — every node starts labeled
with its own id; each round a node takes the min of its label and its
neighbors' labels; at fixpoint the label is the min node id reachable,
i.e. the component id. Rounds = graph diameter. Near-dup components are
tiny and star-shaped (diameter 2-4 typical), so the loop converges in a
handful of rounds; for adversarial long-chain graphs the
large-star/small-star variant (Kiveris et al. 2014) halves the diameter
per round — noted, not needed for the dedup workload this serves.

Scale (100 TB): each round is one join keyed by node id + one min
aggregate — shuffle partitioning on the node id is stable across rounds
so AQE reuses the exchange layout. The label frame is
``localCheckpoint``-ed every round: iterative Spark loops otherwise grow
the lineage exponentially and re-execute all prior rounds per action.
Convergence is detected with a changed-row count (one small job per
round). No driver-side graph state — only the converged/not bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_group_keep"]


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Resolve connected components of the undirected graph given by the
    ``(id_a, id_b)`` pair list.

    Returns ``(node, component)`` where ``component`` is the smallest
    node id in the node's component — deterministic, engine-portable
    (equals "min reachable id", which a recursive-CTE oracle can
    replay). ``nodes`` (with ``node_col``) optionally supplies isolated
    vertices that appear in no pair; they come back as singleton
    components.

    Raises ``RuntimeError`` if the propagation has not converged after
    ``max_iter`` rounds (graph diameter > max_iter — raise the cap or
    switch to the star-contraction variant).
    """
    und = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            edges.select(
                F.col(id_b).alias("src"), F.col(id_a).alias("dst")
            )
        )
        .distinct()
    )
    vertices = und.select(F.col("src").alias("node")).distinct()
    if nodes is not None:
        if node_col is None:
            raise ValueError("nodes provided without node_col")
        vertices = (
            vertices.unionByName(
                nodes.select(F.col(node_col).alias("node"))
            ).distinct()
        )
    labels = vertices.select(
        "node", F.col("node").alias("component")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min label among neighbors, per node
        neighbor_min = (
            und.join(
                labels.select(
                    F.col("node").alias("dst"),
                    F.col("component").alias("__nl"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("__nl").alias("__nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("__nmin", F.col("component"))
                ).alias("component"),
                (F.coalesce("__nmin", F.col("component")) < F.col("component"))
                .cast("int")
                .alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.agg(F.sum("__changed")).collect()[0][0] or 0
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: not converged after {max_iter} rounds "
        "(diameter exceeds cap)"
    )


def dedup_group_keep(
    components: DataFrame,
    node_col: str = "node",
    comp_col: str = "component",
    keep_col: str = "group_keep",
) -> DataFrame:
    """Survivor flag per node: keep exactly the min-id member of each
    component (which IS the component label, so this is a map-side
    comparison — no extra shuffle)."""
    return components.withColumn(
        keep_col, (F.col(node_col) == F.col(comp_col)).cast("int")
    )
