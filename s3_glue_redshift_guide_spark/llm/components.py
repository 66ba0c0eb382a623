"""Connected components over the near-dup pair graph (L2's grouping step).

``jaccard_pairs``/``minhash_near_dup_pairs`` emit edges; deduplication
needs the transitive closure — each component keeps one canonical doc.
Implementation: alternating large-star / small-star label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond") expressed
as DataFrame joins:

* every vertex carries a current label (the min vertex id it has seen);
* each round, vertices adopt the min label in their neighborhood;
* converges in O(log n) rounds on real graphs — each round is one join +
  one groupBy, so the whole thing is a handful of shuffles, no driver-side
  graph.

Rounds run under ``localCheckpoint`` to truncate the (exponentially
growing) lineage — the standard iterative-algorithm discipline on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex in ``pairs``; component id is
    the minimum vertex id reachable."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # initial label: min neighbor (or self)
    labels = (
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("vertex"), F.col("label"))
    )
    labels = labels.withColumn("label", F.least("vertex", "label")).localCheckpoint(
        eager=False
    )

    converged = False
    for _ in range(max_iter):
        # propagate: vertex's new label = min(own, neighbors' labels,
        # label-of-label). The third source is pointer doubling: each round
        # a vertex also adopts its current label's label, so label chains
        # halve every round — convergence is O(log diameter), not
        # O(diameter), and chain-shaped components can't outrun max_iter.
        neighbor_labels = (
            edges.join(labels, edges.b == labels.vertex)
            .select(F.col("a").alias("vertex"), F.col("label"))
        )
        lab2 = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.label") == F.col("y.vertex"))
            .select(F.col("x.vertex").alias("vertex"), F.col("y.label").alias("label"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .unionByName(lab2)
            .groupBy("vertex")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds; "
            "raise max_iter (components deeper than 2^max_iter hops)"
        )
    return labels.select("vertex", F.col("label").alias("component"))


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The full near-dup dedup: collapse each component to its canonical
    (min-id) doc; docs with no near-dup edge pass through untouched."""
    comp = connected_components(pairs)
    keep = comp.filter(F.col("vertex") == F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    in_graph = comp.select(F.col("vertex").alias(id_col))
    untouched = docs.join(in_graph, id_col, "left_anti")
    return untouched.select(id_col).unionByName(keep)
