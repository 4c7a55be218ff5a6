"""Graph analytics over edge lists (charter extension, SURVEY.md §2.7).

Companion to ``dedup.connected_components``: where components CLUSTER the
near-duplicate graph, PageRank RANKS it — the standard centrality measure
for picking the canonical document of a duplicate family (the doc most
linked-to by near-dups) or for weighting crawl sources. Same iterative
shape as components: per-round state is (node, value) pairs partitioned by
node, ``localCheckpoint`` truncates lineage, and the loop runs unchanged on
a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensordatapipelines_spark.registry import register


@register("pagerank")
def pagerank(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iters: int = 3,
    damping: float = 0.85,
    undirected: bool = True,
) -> DataFrame:
    """Power-iteration PageRank → ``(node, rank)`` after a FIXED number of
    rounds (fixed, not convergence-tested, so the run is exactly
    reproducible and an unrolled SQL oracle can replay it).

    ``rank_{t+1}(n) = (1-d)/N + d · Σ_{m→n} rank_t(m)/deg(m)``

    Scale shape per round: one equi-join of the (node, rank/deg) table onto
    the edge list (both keyed by node — co-partitioned after the first
    round) and one map-side-combining sum keyed by destination. Driver
    state: the node count N, a single long. Undirected mode doubles the
    edge list, which guarantees deg ≥ 1 for every node — no dangling-mass
    redistribution needed (documented constraint; pass directed edges only
    if every node has an out-edge)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    nodes = deg.select(F.col("src").alias("node"), "__deg").localCheckpoint()
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select(
        "node", "__deg", F.lit(1.0 / n_nodes).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("__deg")).alias("__c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                "__deg",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")


@register("triangle_count")
def triangle_count(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list → ``(node,
    n_triangles)`` — the clustering-structure readout of the near-dup
    graph (duplicate families are near-cliques; a high triangle count
    flags template/boilerplate blobs, a low one chance collisions).

    Scale shape: edges canonicalize to ``a < b`` once, then triangles
    enumerate via two equi-joins — (a,b)⋈(b,c) on the shared middle
    node, then a semi-check that (a,c) is an edge. Every join is keyed
    (shuffle by node), no cross product; the standard optimization of
    orienting edges low→high means each triangle is generated exactly
    once as a<b<c. Skewed hubs shuffle by their node id — salt or
    AQE-skew-split if one node dominates (SCALE.md)."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        # three consumers (both wedge sides + the closing semi-join) would
        # each re-derive the upstream edge computation — at 3× the cost of
        # a near-dup candidate join that is itself the expensive part
        # (measured: 14 s → 5 s on the gate). Materialize once.
        .localCheckpoint()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    tri = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")),
        on=["x", "z"],
        how="left_semi",
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node
