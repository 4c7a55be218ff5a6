"""RRF fusion: hand-checkable example and exact-integer determinism."""

from sensordatapipelines_spark.operators.similarity import rrf_fuse


def test_rrf_worked_example(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "query_id long, vec_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 10, 2), (1, 40, 3)], "query_id long, vec_id long, rank int"
    )
    out = {r.vec_id: r for r in rrf_fuse([a, b], top_k=4).collect()}
    t = lambda r: round(1e9 / (60 + r))
    # 10: 1/61 + 1/62 ; 20: 1/62 + 1/61 → identical sums, tie on id
    assert out[10].rrf_e9 == t(1) + t(2) == out[20].rrf_e9
    assert out[10].fused_rank == 1 and out[20].fused_rank == 2  # id tiebreak
    assert out[30].n_lists == 1 and out[30].rrf_e9 == t(3)
    assert out[30].fused_rank == 3 and out[40].fused_rank == 4  # 30 < 40 tie


def test_rrf_top_k_bound(spark):
    a = spark.createDataFrame(
        [(1, i, i) for i in range(1, 30)], "query_id long, vec_id long, rank int"
    )
    assert rrf_fuse([a], top_k=5).count() == 5
