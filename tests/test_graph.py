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


def test_cooccurrence_edges_counts(spark):
    from sensordatapipelines_spark.operators.graph import cooccurrence_edges

    # users 1,2 share buckets (a,1),(a,2),(b,1); users 1,3 share only (a,1)
    rows = [
        (1, "a", 1), (2, "a", 1), (3, "a", 1),
        (1, "a", 2), (2, "a", 2),
        (1, "b", 1), (2, "b", 1),
        (1, "b", 1),  # duplicate occurrence must not inflate counts
    ]
    df = spark.createDataFrame(rows, "u long, t string, h long")
    out = {(r.u, r.w): r.n_cooccur
           for r in cooccurrence_edges(df, "u", ["t", "h"], min_cooccur=1).collect()}
    assert out[(1, 2)] == 3
    assert out[(1, 3)] == 1
    assert out[(2, 3)] == 1
    # threshold prunes
    from sensordatapipelines_spark.operators.graph import cooccurrence_edges as ce
    out2 = {(r.u, r.w) for r in ce(df, "u", ["t", "h"], min_cooccur=2).collect()}
    assert out2 == {(1, 2)}


def test_adamic_adar_square_plus_hub(spark):
    import math

    from sensordatapipelines_spark.operators.graph import adamic_adar

    # path graph 1-2-3: the only common-neighbor pair is (1,3) through 2,
    # but min_common=2 needs two shared neighbors → add 1-4-3.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (4, 3)], "u long, w long"
    )
    out = adamic_adar(edges, min_common=2, top_k=5).collect()
    # both square diagonals are predicted: (1,3) through {2,4} and
    # (2,4) through {1,3}
    got = {(r.u, r.w): r for r in out}
    assert set(got) == {(1, 3), (2, 4)}
    expected = 2 * round(1e6 / math.log(2.0)) / 1e6
    for r in got.values():
        assert (r.n_common, r.rank) == (2, 1)
        assert abs(r.aa_score - expected) < 1e-9
    # existing edges are never predicted
    assert all((o.u, o.w) not in {(1, 2), (2, 3), (1, 4), (3, 4)} for o in out)


def test_kcore_peels_tail(spark):
    from sensordatapipelines_spark.operators.graph import kcore

    # triangle 1-2-3 plus a pendant chain 3-4-5: 2-core keeps the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "u long, w long"
    )
    out = {r.node: r.degree for r in kcore(edges, k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_bfs_depths_chain_and_saturation(spark):
    """Min-hop depths on a chain with a branch; nodes beyond max_depth
    absent; seeds not in the graph still report depth 0; two seeds take
    the MIN distance."""
    from sensordatapipelines_spark.operators.graph import bfs_depths

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (3, 7), (8, 9)],
        "u long, w long",
    )
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {r.node: r.depth for r in bfs_depths(edges, seeds, max_depth=3).collect()}
    assert got == {1: 0, 99: 0, 2: 1, 3: 2, 4: 3, 7: 3}
    # two seeds: depth is min over seeds; direction is undirected
    seeds2 = spark.createDataFrame([(1,), (5,)], "node long")
    got2 = {r.node: r.depth for r in bfs_depths(edges, seeds2, max_depth=2).collect()}
    assert got2 == {1: 0, 5: 0, 2: 1, 4: 1, 6: 1, 3: 2}


def test_hub_cap_excludes_celebrity_mediators(spark):
    """max_degree (VERDICT r7 #8): a hub whose degree exceeds the cap
    stops MEDIATING candidate pairs; drop metrics report it; a generous
    cap reproduces the uncapped result exactly."""
    from sensordatapipelines_spark.operators.graph import (
        adamic_adar,
        cooccurrence_edges,
        jaccard_link_pred,
    )

    # star around node 0 (deg 29) + a small clique
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 30)] + [(1, 2), (3, 4), (2, 3)],
        "u long, w long",
    )
    m: dict = {}
    capped = adamic_adar(edges, max_degree=10, metrics=m).count()
    assert m == {"n_nodes": 30, "n_hub_nodes": 1}
    wide = adamic_adar(edges, max_degree=10**6).count()
    assert capped < wide  # hub-mediated pairs gone, cap really bites

    m2: dict = {}
    jaccard_link_pred(edges, max_degree=10, metrics=m2).count()
    assert m2["n_hub_nodes"] == 1

    df = spark.createDataFrame(
        [(i, 1) for i in range(50)] + [(1, 2), (2, 2), (3, 2)],
        "a long, b long",
    )
    m3: dict = {}
    out = cooccurrence_edges(
        df, "a", ["b"], min_cooccur=1, max_bucket_width=10, metrics=m3
    )
    assert m3 == {"n_buckets": 2, "n_hot_buckets": 1}
    # only the narrow bucket's 3 pairs survive
    assert out.count() == 3
