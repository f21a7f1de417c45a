"""Connected components via min-label propagation — the iterative
operator that turns pairwise near-duplicate evidence into dedup
clusters (pair lists from MinHash-LSH / SimHash / n-gram Jaccard say
"a≈b"; cluster-and-keep-canonical needs the transitive closure).

Algorithm: every node starts labeled with its own id; each round every
node takes the min of its own label and its neighbors' labels; stop
when no label changes. Converges in O(graph diameter) rounds — small
for dedup graphs, which are unions of near-cliques.

Scale design:
- each round is one shuffle (edge⋈label join + min-aggregate) over
  |E|+|V| rows — no driver-side graph materialization;
- ``localCheckpoint`` after every round truncates the lineage, keeping
  the plan O(1) instead of O(rounds) (the classic iterative-Spark trap:
  round N replays rounds 1..N-1);
- the convergence check is a count of changed labels — one action per
  round, driver sees only a scalar;
- for adversarial diameters (long chains) the production upgrade is
  the alternating large/small-star algorithm (same join primitives,
  O(log n) rounds); dedup graphs don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, component_id) for every node appearing in
    ``edges``, where component_id = min node id in the component.

    Nodes with no edges simply don't appear — callers left-join and
    coalesce to the node's own id (a singleton is its own canonical).
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    labels = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)

    label_type = labels.schema["label"].dataType
    for _ in range(max_iter):
        # The node's previous label rides the aggregate as min("old")
        # (null on message rows, so min() recovers exactly the labels-
        # branch value): the convergence check is then a narrow filter
        # over the checkpointed result instead of a labels⋈new_labels
        # join — one shuffle join and one job less per round.
        msgs = sym.join(labels, sym.s == labels.node).select(
            F.col("d").alias("node"),
            F.col("label"),
            F.lit(None).cast(label_type).alias("old"),
        )
        new_labels = (
            labels.select("node", "label", F.col("label").alias("old"))
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component_id"))
