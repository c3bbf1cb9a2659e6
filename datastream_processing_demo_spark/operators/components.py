"""Connected components by min-label propagation (dup-cluster assignment).

Training-data dedup needs more than candidate PAIRS: near-duplicate
relations chain (A~B, B~C), so the keep/drop decision operates on the
transitive closure — each document gets a cluster id (the minimum doc
id reachable through near-dup edges) and one canonical doc survives per
cluster. The reference has nothing comparable (SURVEY.md §2.1.1).

Algorithm: classic label propagation. Every node starts labeled with
itself; each round every node takes the min of its own label and its
neighbors' labels; converged when a round changes nothing. Rounds are
bounded by the graph diameter, which for near-dup clusters is tiny
(pairs/chains, not social graphs).

Scale notes: each round is one join of the (symmetrized) edge list with
the label table plus a min-aggregate — all shuffles on the node id, no
driver-side data. `localCheckpoint` truncates the growing lineage each
round (the standard Spark iterative-algorithm idiom; on a cluster use
`checkpoint()` to HDFS for fault tolerance). The convergence probe
collects a single count per round. For planet-scale graphs swap the
round body for the large-star/small-star steps (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond") — same loop shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 20) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns (node, cluster_id) where cluster_id = min node id in the
    component. Isolated nodes (absent from `edges`) are absent here —
    join back and coalesce(cluster_id, node) for keep-one semantics.
    """
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = fwd.union(fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))) \
             .distinct().localCheckpoint()
    labels = (sym.select(F.col("s").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())

    # Convergence probe: a changed-row flag computed in the same select
    # that produces the new label, summed in one cheap aggregate over the
    # just-checkpointed round result. Works for ANY comparable label type
    # (hash-magnitude longs, strings) — a sum-of-labels probe would
    # overflow under ANSI mode on 64-bit hash ids, and the flag count is
    # bounded by the node count so it can't.
    for _ in range(max_iter):
        nbr_min = (sym.join(labels, sym.d == labels.node)
                   .groupBy("s").agg(F.min("label").alias("nbr_label")))
        new_label = F.least(labels.label,
                            F.coalesce(nbr_min.nbr_label, labels.label))
        new = (labels.join(nbr_min, labels.node == nbr_min.s, "left")
               .select(labels.node.alias("node"),
                       new_label.alias("label"),
                       (labels.label != new_label).cast("int").alias("_chg"))
               .localCheckpoint())
        changed = new.agg(F.sum("_chg")).collect()[0][0]
        labels = new.drop("_chg")
        if not changed:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def blocked_components(edges: DataFrame, block_col: str,
                       src: str = "src", dst: str = "dst") -> DataFrame:
    """Connected components when every edge is confined to a BLOCK
    (e.g. SemDeDup's k-means cell: candidate pairs are within-cell by
    construction, so no component can span blocks). One shuffle on the
    block key + per-block union-find in an Arrow batch replaces the
    iterative join-per-round of `min_label_components` — at sf0.1 that
    is 1 job instead of ~4 checkpoint+probe rounds, and at cluster
    scale the block IS the unit that fits an executor task (the same
    contract that bounds the pair join itself).

    Returns (node, cluster_id = min node in component), one row per
    node that appears in any edge — same contract as
    min_label_components. Use the iterative form for unblocked graphs.
    """
    import pandas as pd

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:        # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["_s"], pdf["_d"]):
            for n in (a, b):
                if n not in parent:
                    parent[n] = n
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root so the final label needs no re-walk
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = list(parent)
        return pd.DataFrame({"node": nodes,
                             "cluster_id": [find(n) for n in nodes]})

    dt = edges.schema[src].dataType.simpleString()
    return (edges.select(F.col(block_col).alias("_b"),
                         F.col(src).alias("_s"), F.col(dst).alias("_d"))
            .groupBy("_b")
            .applyInPandas(uf, schema=f"node {dt}, cluster_id {dt}"))
