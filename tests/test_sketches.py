"""Sketch operators: count-min guarantees, KMV exactness/estimation."""

import pytest
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.sketches import (
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
    kmv_distinct,
)
from sensordatapipelines_spark.registry import get_operation


def _skewed(spark, n_keys=200, heavy=("hot_a", "hot_b"), heavy_n=500):
    rows = [(f"k{i}",) for i in range(n_keys) for _ in (0, 1)]
    rows += [(h,) for h in heavy for _ in range(heavy_n)]
    return spark.createDataFrame(rows, "key string")


def test_cms_never_underestimates(spark):
    df = _skewed(spark)
    exact = {r.key: r.c for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()}
    sk = cms_sketch(df, "key", depth=4, width=256)
    est = {
        r.key: r.est
        for r in cms_estimate(sk, df.select("key").distinct(), "key", depth=4, width=256).collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k], f"CMS underestimated {k}: {e} < {exact[k]}"


def test_cms_heavy_hitters_no_false_negatives(spark):
    df = _skewed(spark, heavy_n=500)
    hh = {r.key for r in cms_heavy_hitters(df, "key", threshold=500, depth=4, width=256).collect()}
    # true heavies (count 500) must be present; false positives allowed
    assert {"hot_a", "hot_b"} <= hh


def test_cms_sketch_is_bounded(spark):
    df = _skewed(spark, n_keys=1000)
    sk = cms_sketch(df, "key", depth=3, width=64)
    assert sk.count() <= 3 * 64
    # total weight per hash row equals the input row count
    per_row = {r.j: r.s for r in sk.groupBy("j").agg(F.sum("cnt").alias("s")).collect()}
    n = df.count()
    assert all(v == n for v in per_row.values())


def test_cms_depth_guard(spark):
    df = _skewed(spark, n_keys=5)
    with pytest.raises(ValueError):
        cms_sketch(df, "key", depth=99)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(f"u{i}", "t") for i in range(10)], "key string, g string")
    out = kmv_distinct(df, "key", k=32, group_by="g").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_kept == 10 and r.kth_hash is None and r.est_distinct == 10.0


def test_kmv_estimates_within_error(spark):
    n = 5000
    df = spark.createDataFrame([(f"user_{i:06d}",) for i in range(n)], "key string")
    r = kmv_distinct(df, "key", k=256).collect()[0]
    assert r.n_kept == 256 and r.kth_hash is not None
    # KMV relative error ~ 1/sqrt(k-1) ≈ 6%; allow 4 sigma for the weak
    # poly hash's imperfect uniformity
    assert abs(r.est_distinct - n) / n < 0.25, r.est_distinct


def test_sketch_registry_slots_resolve():
    # the semantic_dedup lesson: registration must point at the operator
    assert get_operation("cms_sketch").__name__ == "cms_sketch"
    assert get_operation("cms_heavy_hitters").__name__ == "cms_heavy_hitters"
    assert get_operation("kmv_distinct").__name__ == "kmv_distinct"


def test_kmv_intersect_exact_below_k(spark):
    """Small groups (< k distinct) degenerate to exact set counts."""
    from sensordatapipelines_spark.operators.sketches import kmv_intersect_pairs

    rows = [("A", f"u{i}") for i in range(10)] + [("B", f"u{i}") for i in range(5, 20)]
    df = spark.createDataFrame(rows, "grp string, key string")
    out = kmv_intersect_pairs(df, "key", k=64, group_by="grp").collect()
    assert len(out) == 1
    r = out[0]
    assert r.grp_a == "A" and r.grp_b == "B"
    assert r.n_kept == 20  # |A ∪ B| exactly
    assert r.n_common == 5  # u5..u9
    assert r.est_union == 20.0 and r.est_intersection == 5.0


def test_kmv_intersect_estimates_overlap(spark):
    """At k, the ρ·|A∪B| estimate lands near the true intersection."""
    from sensordatapipelines_spark.operators.sketches import kmv_intersect_pairs

    n, overlap = 2000, 1000
    rows = [("A", f"key_{i:05d}") for i in range(n)] + [
        ("B", f"key_{i:05d}") for i in range(n - overlap, 2 * n - overlap)
    ]
    df = spark.createDataFrame(rows, "grp string, key string")
    r = kmv_intersect_pairs(df, "key", k=256, group_by="grp").collect()[0]
    true_union, true_int = 2 * n - overlap, overlap
    assert abs(r.est_union - true_union) / true_union < 0.3
    assert abs(r.est_intersection - true_int) / true_int < 0.45


def test_histogram_quantiles_exact_and_mergeable(spark):
    """Type-1 inverted-CDF quantiles from the histogram equal the naive
    sorted-list answer, and the histogram state is mergeable: quantiles
    over the union of two halves equal quantiles over the whole."""
    import math

    from sensordatapipelines_spark.operators.sketches import histogram_quantiles

    vals = [1, 1, 2, 2, 2, 3, 5, 5, 8, 13, 13, 13, 21, 34, 34]
    rows = [("k", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "key string, v double")
    got = {
        (r["q"]): r["value_at_q"]
        for r in histogram_quantiles(df, "key", "v", qs=(25, 50, 75, 90)).collect()
    }
    s = sorted(vals)
    want = {q: s[math.ceil(q * len(s) / 100) - 1] for q in (25, 50, 75, 90)}
    assert got == want
    # mergeability: same answer when the rows arrive as two shuffled halves
    half = spark.createDataFrame(rows[::2] + rows[1::2], "key string, v double")
    got2 = {
        (r["q"]): r["value_at_q"]
        for r in histogram_quantiles(half, "key", "v", qs=(25, 50, 75, 90)).collect()
    }
    assert got2 == want
