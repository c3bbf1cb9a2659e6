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
collects a single count per round. For planet-scale / long-diameter
graphs the swap is `alternating_components` below — the
large-star/small-star rounds of Kiveris et al. 2014 ("Connected
Components in MapReduce and Beyond"), O(log n) rounds on a shrinking
edge list regardless of diameter.
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
    else:
        # Unconverged labels are silently WRONG (a label only travels one
        # hop per round, so any node farther than max_iter from its
        # component's min keeps a stale label — found by the r10
        # differential fuzz vs union-find on a 200-node sparse graph).
        # Fail loud; for long-path graphs use alternating_components,
        # whose round count is O(log n) regardless of diameter.
        raise RuntimeError(
            f"min_label_components did not converge in {max_iter} rounds "
            f"(graph diameter exceeds the round budget); raise max_iter "
            f"or use alternating_components")
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


def alternating_components(edges: DataFrame, src: str = "src",
                           dst: str = "dst", max_iter: int = 50) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond" §3) — the planet-scale swap the min-label docstring above
    names, made executable.

    Why it exists next to `min_label_components`: min-label runs one
    join per round over the FULL edge list for diameter-many rounds —
    fine for near-dup clusters (diameter ~2-3), quadratic-ish pain on a
    chained graph (a length-d path costs d rounds x all edges). The
    alternating rounds contract the graph toward per-component stars in
    O(log n) rounds regardless of diameter, and each round's edge list
    only shrinks (never above the symmetrized input), so the join
    volume FALLS as it converges.

    Round shapes (all hash shuffles on a node id, no driver data):
    - large-star: group the symmetrized edges by u, m = min(N(u) ∪ u);
      re-link every neighbor v > u to m.
    - small-star: direct each edge big->small, group by the big end,
      m = min(N<=(u) ∪ u); re-link u and its smaller neighbors to m.
    Fixpoint: every component is a star rooted at its minimum node;
    small-star's output IS the (node -> root) mapping then.

    Convergence probe is one aggregate per round over the NEW edge set
    (a (count, bit_xor(hash)) pair unchanged between rounds); a 2^-64
    xor-collision false stop is the same order as the hash-key
    collisions the dedup lanes already price. Returns (node,
    cluster_id = min node in component), one row per node appearing in
    any edge — the min_label_components contract, INCLUDING nodes that
    appear only in self-loop edges (they come back as their own
    singleton cluster, exactly as min-label labels them).
    """
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # one checkpoint materializes the edge lineage ONCE and serves both
    # the star rounds (s != d) and the self-loop singleton contract
    # (s == d) — re-deriving self-loops from `edges` at the end would
    # re-run the whole upstream pair computation.
    pairs = fwd.union(fwd.select("d", "s")).distinct().localCheckpoint()
    self_nodes = (pairs.filter(F.col("s") == F.col("d"))
                  .select(F.col("s").alias("node")))
    cur = pairs.filter(F.col("s") != F.col("d"))

    def _sig(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)),
            F.expr("bit_xor(xxhash64(s, d))"),
        ).collect()[0]
        return (row[0], row[1])

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        m = (sym.groupBy("s")
             .agg(F.least(F.min("d"), F.first("s")).alias("m")))
        return (sym.join(m, "s")
                .filter(F.col("d") > F.col("s"))
                .select(F.col("d").alias("s"), F.col("m").alias("d"))
                .filter(F.col("s") != F.col("d"))
                .distinct())

    def _small_star(e: DataFrame) -> DataFrame:
        directed = e.select(F.greatest("s", "d").alias("s"),
                            F.least("s", "d").alias("d"))
        m = (directed.groupBy("s")
             .agg(F.least(F.min("d"), F.first("s")).alias("m")))
        relinked = (directed.join(m, "s")
                    .select(F.col("d").alias("s"), F.col("m").alias("d"))
                    .union(m.select(F.col("s"), F.col("m").alias("d"))))
        return (relinked.filter(F.col("s") != F.col("d")).distinct())

    sig = _sig(cur)
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        new_sig = _sig(cur)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        # An unstabilized edge set means some component is not yet a
        # star, so reading (s -> d) as (child -> root) below would emit
        # multiple cluster_ids for one node — the same silent-wrong mode
        # min_label_components fails loud on. Practically unreachable at
        # max_iter=50 (rounds are O(log n)), but never return it.
        raise RuntimeError(
            f"alternating_components did not converge in {max_iter} "
            f"large-star/small-star rounds; raise max_iter")
    # fixpoint edges are (child -> root) stars; roots label themselves
    out = (cur.select(F.col("s").alias("node"),
                      F.col("d").alias("cluster_id"))
           .union(cur.select(F.col("d").alias("node"),
                             F.col("d").alias("cluster_id")))
           .distinct())
    # nodes seen ONLY in self-loops: singleton clusters (min-label
    # returns (node, node) for them; the star rounds filtered them out)
    singles = (self_nodes.join(out.select("node"), "node", "left_anti")
               .select("node", F.col("node").alias("cluster_id")))
    return out.union(singles)
