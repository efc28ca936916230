"""Distributed connected components over an edge list (dedup clustering).

The LLM-pipeline step after near-dup PAIR detection: pairs are edges,
duplicate groups are connected components, and the canonical "keeper"
per group is the minimum doc id in its component. The reference has no
graph machinery at all (it is a row-at-a-time event app); this is the
north-star operator that turns any of the pair generators (MinHash/LSH,
SimHash, Jaccard) into deletable duplicate sets.

Algorithm: hash-min label propagation — every node starts labeled with
itself; each round a node takes the minimum label among itself and its
neighbors; fixpoint = components labeled by their minimum node.

Scale design (100 TB):
  - Near-dup graphs are overwhelmingly tiny cliques/chains (pairs of
    re-posts, mirror families), so the diameter — and the round count —
    is small; each round is two partial-aggregated hash shuffles
    (edges ⋈ labels on dst, then min-combine on src). Rounds terminate
    at the first fixpoint, checked with a cheap aggregate.
  - ``localCheckpoint`` after each round truncates the lineage so the
    plan does not grow with the iteration count (the classic iterative-
    algorithm failure mode on Spark).
  - For adversarial long-chain graphs the O(log n)-round alternating
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond") is the drop-in upgrade; the
    hash-min loop is the right default for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = the minimum node id reachable through the pair graph.

    ``pairs`` is an undirected edge list (one row per pair, any order).
    Raises after ``max_iter`` rounds without convergence rather than
    returning partially-merged clusters.
    """
    # symmetrize once: propagation below then only needs one direction
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # init fuses the first propagation round: with identity labels, the
    # min neighbor LABEL is the min neighbor ID, so one aggregation both
    # enumerates the nodes and applies round 0 — disjoint-pair graphs
    # (the dedup common case) then converge with zero loop rounds
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("m")).alias("label"),
        )
    )
    for _ in range(max_iter):
        # min neighbor label per node (partial-aggregated both sides)
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                "label",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "new_label"
                ),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        changed = stepped.filter(F.col("new_label") < F.col("label")).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")
