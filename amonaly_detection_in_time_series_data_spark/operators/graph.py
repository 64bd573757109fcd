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

__all__ = ["connected_components", "dedup_group_keep", "pagerank"]


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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 40,
    weight_col: str | None = None,
    nodes: DataFrame | None = None,
    node_col: str | None = None,
) -> DataFrame:
    """PageRank by power iteration over a ``(src, dst)`` edge list —
    the link-graph quality prior of the CommonCrawl-style pipeline
    (harmonic/pagerank centrality of a page's host is a standard
    pretraining quality signal; Brin & Page 1998).

    Semantics: directed graph, duplicate unweighted edges collapse
    (``distinct``); with ``weight_col`` parallel edges fold into one
    summed weight and a node's rank flows out proportionally. Dangling
    nodes (no out-edge) spread their mass uniformly — the standard
    correction, so ranks sum to 1 every round. ``nodes`` adds isolated
    vertices (rank floor ``(1-d)/N``). Stops when the L1 delta drops
    below ``tol``; raises after ``max_iter`` like
    :func:`connected_components`.

    Scale (100 TB of edges): each round is ONE join of the static
    out-degree-annotated edge list against the rank frame on ``src``
    (both hash-partitioned on the same key — AQE reuses the layout) +
    one ``groupBy(dst)`` sum with map-side partials. Driver traffic per
    round is two scalars (dangling mass, L1 delta). Rank frames are
    ``localCheckpoint``-ed so lineage stays flat across rounds.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"pagerank: damping must be in (0,1), got {damping}")
    if weight_col is None:
        e = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        ).distinct().withColumn("w", F.lit(1.0))
    else:
        e = (
            edges.groupBy(
                F.col(src).alias("src"), F.col(dst).alias("dst")
            )
            .agg(F.sum(F.col(weight_col).cast("double")).alias("w"))
            .where(F.col("w") > 0)
        )
    out_w = e.groupBy("src").agg(F.sum("w").alias("__out"))
    # static per-edge share of the source's outflow; one-time join
    shares = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("__out")).alias("share")
    ).localCheckpoint(eager=True)

    vertices = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if nodes is not None:
        if node_col is None:
            raise ValueError("nodes provided without node_col")
        vertices = vertices.unionByName(
            nodes.select(F.col(node_col).alias("node"))
        ).distinct()
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))
    has_out = out_w.select(F.col("src").alias("node")).withColumn(
        "__has_out", F.lit(1)
    )
    ranks = (
        vertices.join(has_out, "node", "left")
        .select(
            "node",
            F.lit(1.0 / n).alias("rank"),
            F.coalesce("__has_out", F.lit(0)).alias("__has_out"),
        )
        .localCheckpoint(eager=True)
    )

    base = (1.0 - damping) / n
    for _ in range(max_iter):
        dangling = (
            ranks.where(F.col("__has_out") == 0).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        contrib = (
            shares.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("__in"))
        )
        updated = (
            ranks.join(contrib, "node", "left")
            .select(
                "node",
                F.lit(base
                      + damping * dangling / n).alias("__c"),
                F.coalesce("__in", F.lit(0.0)).alias("__in"),
                "rank",
                "__has_out",
            )
            .select(
                "node",
                (F.col("__c") + F.lit(damping) * F.col("__in")).alias("rank"),
                F.abs(
                    F.col("__c") + F.lit(damping) * F.col("__in") - F.col("rank")
                ).alias("__delta"),
                "__has_out",
            )
            .localCheckpoint(eager=True)
        )
        delta = updated.agg(F.sum("__delta")).collect()[0][0] or 0.0
        ranks = updated.drop("__delta")
        if delta < tol:
            return ranks.drop("__has_out")
    raise RuntimeError(
        f"pagerank: not converged after {max_iter} rounds (l1 delta {delta:.2e})"
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
