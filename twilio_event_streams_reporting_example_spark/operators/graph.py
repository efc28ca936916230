"""Distributed connected components over an edge list (dedup clustering).

The LLM-pipeline step after near-dup PAIR detection: pairs are edges,
duplicate groups are connected components, and the canonical "keeper"
per group is the minimum doc id in its component. The reference has no
graph machinery at all (it is a row-at-a-time event app); this is the
north-star operator that turns any of the pair generators (MinHash/LSH,
SimHash, Jaccard) into deletable duplicate sets.

Algorithm: hash-min label propagation with pointer jumping — every node
starts labeled with itself; each round a node takes the minimum label
among itself, its neighbors, and its label's label (the pointer-jump
shortcut that halves remaining chain distance per round); fixpoint =
components labeled by their minimum node in O(log diameter) rounds.

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
    Components in MapReduce and Beyond") is the drop-in upgrade
    (:func:`connected_components_star` below); the hash-min loop is
    the right default for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import (
    checkpoint_rdd_id,
    pin_checkpoint,
    track_release,
    unpersist_rdd_ids,
)


class _RoundCaches:
    """Bounded cached-block footprint for iterative checkpoint loops.

    Each round's localCheckpoint materializes new persisted RDDs; once the
    NEXT round is materialized (and the fixpoint test has read the previous
    round) the previous round's blocks are dead weight — the classic
    iterative-Spark leak, footprint growing with round count. The loop
    ``note()``s each round's checkpointed DataFrame (EXACT persisted-RDD
    id — no global diff, so two fixpoint loops can run concurrently
    without dropping each other's blocks) and the previous round's blocks
    are released at the first safe point. The FINAL round's blocks back
    the returned DataFrame, so they are handed to the registry's deferred
    release (dropped by release_caches() once the consumer has evaluated
    the result)."""

    def __init__(self, sc):
        self._sc = sc
        self._prev: set[int] = set()
        self._cur: set[int] = set()

    def note(self, df) -> None:
        """Record a DataFrame localCheckpoint'ed THIS round."""
        i = checkpoint_rdd_id(df)
        if i is not None:
            self._cur.add(i)

    def rotate(self) -> None:
        """Call once this round's checkpoints are materialized AND
        nothing will read the previous round again: releases the previous
        round's blocks."""
        unpersist_rdd_ids(self._sc, self._prev)
        self._prev = self._cur
        self._cur = set()

    def finish(self) -> None:
        """Defer the last round's release to registry.release_caches()."""
        sc, ids = self._sc, self._prev | self._cur
        track_release(lambda: unpersist_rdd_ids(sc, ids))
        self._prev = set()
        self._cur = set()

# Edge count at/below which the component computation runs as a bounded
# driver-side union-find instead of the iterative distributed loop. A
# graph this small (<= ~320 KB of edge tuples) pays 0.3-0.8s of PURE
# per-round scheduling overhead per distributed round — a 2k-node chain
# graph took 9 rounds / ~8s where union-find is < 10 ms — while any
# corpus-scale dedup graph blows past the threshold and takes the
# distributed path. The collect is BOUNDED by the threshold (this is
# not a driver-side loop over unbounded data); certification queries
# pass local_threshold=0 to force the distributed loops they certify.
EDGES_LOCAL_CC_MAX = 20_000


def _union_find(edge_rows) -> dict:
    """node -> component-minimum over a bounded edge list: union-find
    with path compression and union-by-min-root (attaching the larger
    root under the smaller keeps every root the minimum of its set).
    Pure function — property-tested against an independent reachability
    oracle in tests/test_properties.py."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # attach under the smaller root -> root == min
    return {n: find(n) for n in parent}


def _local_cc(session, edge_rows, node_type) -> DataFrame:
    """Bounded driver-side components via :func:`_union_find`;
    cluster_id = component minimum, matching the distributed contract
    exactly."""
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("cluster_id", node_type)]
    )
    return session.createDataFrame(list(_union_find(edge_rows).items()), schema)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    local_threshold: int = EDGES_LOCAL_CC_MAX,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = the minimum node id reachable through the pair graph.

    ``pairs`` is an undirected edge list (one row per pair, any order).
    Raises after ``max_iter`` rounds without convergence rather than
    returning partially-merged clusters.
    """
    sc = pairs.sparkSession.sparkContext
    # symmetrize once: propagation below then only needs one direction.
    # Eager: the edge list is read every round; pinned by EXACT rdd id.
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pin_checkpoint(edges)
    # counting the eagerly-checkpointed edges is a cached-block scan;
    # tiny graphs route to the bounded union-find (see EDGES_LOCAL_CC_MAX)
    if local_threshold and edges.count() <= local_threshold:
        return _local_cc(
            pairs.sparkSession,
            [(r[0], r[1]) for r in edges.collect()],
            edges.schema["src"].dataType,
        )
    rc = _RoundCaches(sc)
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
        mid = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                "label",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "mid_label"
                ),
            )
            # LAZY cache, not an eager checkpoint: both sides of the jump
            # self-join below read this table, and the single fixpoint
            # count at the end of the round materializes everything in
            # ONE Spark job — per-round scheduling overhead (the dominant
            # cost on small/medium graphs: 3 jobs/round → 1) collapses,
            # while the end-of-round localCheckpoint still truncates the
            # iterative lineage.
            .cache()
        )
        # pointer jumping: shortcut each label to its label's label
        # (label values are node ids of the same component, so the self-
        # join always resolves). Neighbor propagation alone needs a round
        # per hop of remaining diameter; adding the label-of-label hop
        # halves the remaining distance every round → O(log diameter)
        # rounds on chain-shaped near-dup graphs, at the cost of one
        # extra equi-join on the (small) label table.
        jump = mid.select(F.col("node").alias("jn"), F.col("mid_label").alias("jl"))
        stepped = (
            mid.join(jump, mid["mid_label"] == jump["jn"], "left")
            .select(
                "node",
                "label",
                F.least(
                    F.col("mid_label"), F.coalesce("jl", "mid_label")
                ).alias("new_label"),
            )
            # lazy: materialized (and lineage-truncated) by the count below
            .localCheckpoint(eager=False)
        )
        rc.note(stepped)
        # the ONE action of the round: computes mid (filling its cache),
        # the jump join, the checkpoint, and the fixpoint test together
        changed = stepped.filter(F.col("new_label") < F.col("label")).count()
        # mid is dead once the count has materialized stepped's
        # checkpoint: release it through the DataFrame API (not just the
        # raw RDD blocks) so the SQL CacheManager entry — which pins the
        # analyzed plan for the life of the session — is dropped with it
        mid.unpersist()
        # this round is materialized and nothing reads round N-1 again —
        # drop its checkpoint blocks (bounded footprint per round)
        rc.rotate()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            rc.finish()
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-LARGER
    neighbors to the minimum of its closed neighborhood. Input/output are
    undirected pair lists (one row per pair, orientation irrelevant)."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least(F.col("src"), F.col("mn")).alias("m"))
    )
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge big→small, then each node
    connects its smaller neighbors (and itself) to the minimum of them."""
    o = (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    mins = o.groupBy("src").agg(F.min("dst").alias("m"))
    relink = (
        o.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    anchor = mins.select("src", F.col("m").alias("dst"))  # m < src always holds
    return relink.unionByName(anchor).distinct()


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    local_threshold: int = EDGES_LOCAL_CC_MAX,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — same output
    contract as :func:`connected_components` but O(log n) rounds on
    adversarial long-chain/high-diameter graphs, where hash-min needs a
    round per hop of remaining diameter.

    Each round is two groupBy-min shuffles plus an edge-list rewrite; the
    edge list only ever shrinks toward the star forest (node → component
    minimum), so per-round cost decays. ``localCheckpoint`` truncates the
    iterative lineage exactly as in the hash-min loop.
    """
    sc = pairs.sparkSession.sparkContext
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # self_only below reads this initial edge checkpoint LAZILY (at result
    # evaluation) — pin it (exact id) for deferred release, never per-round
    # rotation.
    pin_checkpoint(edges)
    if local_threshold and edges.count() <= local_threshold:
        rows = [(r[0], r[1]) for r in edges.collect()]
        # self-pairs were filtered from the edge checkpoint but are part
        # of the output contract (singleton clusters)
        rows += [
            (r[0], r[0])
            for r in pairs.filter(F.col(src) == F.col(dst)).select(src).distinct().collect()
        ]
        return _local_cc(pairs.sparkSession, rows, edges.schema["src"].dataType)
    rc = _RoundCaches(sc)
    # Nodes appearing ONLY in self-pairs (src == dst) were dropped by the
    # filter above but are part of the output contract: the hash-min
    # variant emits them as singleton clusters, so this one must too.
    self_only = (
        pairs.filter(F.col(src) == F.col(dst))
        .select(F.col(src).alias("node"))
        .distinct()
        .join(
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct(),
            "node",
            "left_anti",
        )
        .select("node", F.col("node").alias("cluster_id"))
    )
    for _ in range(max_iter):
        # lazy checkpoint: the fixpoint count below materializes (and
        # lineage-truncates) the round in ONE job instead of two
        stepped = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        rc.note(stepped)
        # fixpoint test: the star forest is stable iff the (small-star
        # canonical, big→small oriented) edge multiset did not move
        changed = (
            stepped.unionByName(edges)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") != 2)
            .limit(1)
            .count()
        )
        edges = stepped
        # the fixpoint test above was the last read of round N-1 — drop it
        rc.rotate()
        if changed == 0:
            rc.finish()
            roots = (
                edges.select(F.col("dst").alias("node"))
                .distinct()
                .join(edges.select(F.col("src").alias("node")).distinct(), "node", "left_anti")
                .select("node", F.col("node").alias("cluster_id"))
            )
            return (
                edges.select(
                    F.col("src").alias("node"), F.col("dst").alias("cluster_id")
                )
                .unionByName(roots)
                .unionByName(self_only)
            )
    raise RuntimeError(f"connected_components_star: no fixpoint after {max_iter} rounds")
