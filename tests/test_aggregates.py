"""Aggregation builder tests: mixed builtin/callable funcs and the UDTF leg
of the reference's callable-extension surface (SURVEY §2.6)."""

import math

from sensordatapipelines_spark.operators.aggregates import (
    build_agg_exprs,
    grouped_aggregate,
    stat_column_name,
)


def _values(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", None)]
    return spark.createDataFrame(rows, "k string, v double")


def test_grouped_aggregate_mixed_builtin_and_callable(spark):
    """A named builtin (JVM fast path) and an arbitrary callable (GROUPED_AGG
    pandas UDF) in ONE funcs list — the reference's contract (:176-177).
    Spark forbids mixing them in a single agg, so grouped_aggregate splits
    and joins; output columns stay func-major (U6)."""

    def rms(s):
        v = s.dropna()
        return float((v.pow(2).mean()) ** 0.5)

    out = grouped_aggregate(
        _values(spark), keys=["k"], columns=["v"], funcs=["mean", rms], source="src"
    )
    assert out.columns == ["k", "mean_src_v", "rms_src_v"]
    got = {r["k"]: r for r in out.collect()}
    assert got["a"]["mean_src_v"] == 2.0
    assert math.isclose(got["a"]["rms_src_v"], math.sqrt((1 + 4 + 9) / 3))
    # Null-skipping holds on both paths (SQL semantics, pandas dropna).
    assert got["b"]["mean_src_v"] == 4.0
    assert math.isclose(got["b"]["rms_src_v"], 4.0)


def test_grouped_aggregate_builtin_only_single_aggregation(spark):
    """All-builtin funcs take the one-aggregation path (no join in the
    plan): only one Aggregate pair should appear."""
    out = grouped_aggregate(
        _values(spark), keys=["k"], columns=["v"], funcs=["mean", "max"], source="s"
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert out.columns == ["k", "mean_s_v", "max_s_v"]


def test_stat_column_name_func_major_product():
    exprs = build_agg_exprs(["x", "y"], ["mean", "max"], "layer")
    names = [e._jc.toString().split(" AS ")[-1] for e in exprs]
    assert names == ["mean_layer_x", "mean_layer_y", "max_layer_x", "max_layer_y"]
    assert stat_column_name("mean", "layer", "x") == "mean_layer_x"


def test_word_explode_udtf_lateral(spark):
    """UDTF via LATERAL join: str.split() semantics — whitespace runs
    collapse, blank text yields no rows (doc drops from the inner lateral)."""
    from sensordatapipelines_spark.operators.udtf import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "hello  big world"), (2, "  "), (3, "one")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, COUNT(*) AS n, MAX(t.wlen) AS mx
        FROM udtf_docs d, LATERAL word_explode(d.text) t
        GROUP BY d.doc_id
        """
    )
    got = {r["doc_id"]: (r["n"], r["mx"]) for r in out.collect()}
    assert got == {1: (3, 5), 3: (1, 3)}


def test_key_skew_profile_hand_computed(spark):
    from sensordatapipelines_spark.operators.utility import key_skew_profile

    df = spark.createDataFrame(
        [(k,) for k in [1] * 6 + [2] * 3 + [3]], "k long"
    )
    rows = key_skew_profile(df, "k", top_n=2).collect()
    assert [r["key"] for r in rows] == [1, 2]
    assert rows[0]["n"] == 6
    assert rows[0]["share"] == 0.6
    assert rows[0]["uniform_ratio"] == 1.8  # 0.6 share x 3 distinct keys


def test_winsorize_and_impute_group_mean(spark):
    import pytest

    from sensordatapipelines_spark.operators.utility import (
        impute_group_mean,
        winsorize,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id long, v double"
    )
    w = {r["id"]: r["v_w"] for r in winsorize(df, "v", lo=0.2, hi=0.8).collect()}
    # p20/p80 of 1..10 (linear interp) = 2.8, 8.2
    assert w[1] == pytest.approx(2.8) and w[10] == pytest.approx(8.2)
    assert w[5] == 5.0  # interior untouched

    g = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None), ("b", None)],
        "grp string, v double",
    )
    out = impute_group_mean(g, "v", "grp")
    rows = sorted((r["grp"], r["v_filled"]) for r in out.collect())
    # group a nulls -> a-mean 2.0; group b all-null -> global mean 2.0
    assert rows == [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 2.0)]
