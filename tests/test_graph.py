"""Graph analytics tests (pagerank — SURVEY §2.7 iterative surface)."""

import pytest


def test_pagerank_star_graph(spark):
    """Star graph: the hub must outrank every leaf; total mass ≈ 1."""
    from sensordatapipelines_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a long, id_b long"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert set(ranks) == set(range(6))
    hub = ranks[0]
    leaves = [ranks[i] for i in range(1, 6)]
    assert all(hub > leaf for leaf in leaves)
    assert max(leaves) - min(leaves) < 1e-12   # symmetric leaves rank equally
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_deterministic(spark):
    from sensordatapipelines_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "id_a long, id_b long"
    )
    a = sorted(map(tuple, pagerank(edges, iters=3).collect()))
    b = sorted(map(tuple, pagerank(edges, iters=3).collect()))
    assert a == b
