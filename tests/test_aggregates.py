"""Aggregation builder tests: mixed builtin/callable funcs and the UDTF leg
of the reference's callable-extension surface (SURVEY §2.6)."""

import math

from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Round-3 continuation: mergeable aggregate state + top-p coverage
# ---------------------------------------------------------------------------


def test_aggregate_state_merge_equals_full_recompute(spark):
    """Splitting the data arbitrarily, building states, and merging must
    finalize to the same metrics as a single full-data state — the
    incremental-maintenance exactness contract (incl. a key present in
    only one half)."""
    import pytest
    from sensordatapipelines_spark.operators.utility import (
        aggregate_state,
        finalize_aggregate_state,
        merge_aggregate_states,
    )

    rows = [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 10.0), ("b", 20.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    half1 = df.limit(3)  # a,a,a (deterministic: limit on unshuffled local data)
    full_state = aggregate_state(df, ["k"], "v")
    s1 = aggregate_state(spark.createDataFrame(rows[:3], "k string, v double"), ["k"], "v")
    s2 = aggregate_state(spark.createDataFrame(rows[3:], "k string, v double"), ["k"], "v")
    merged = merge_aggregate_states(s1, s2, ["k"])
    a = {r["k"]: r for r in finalize_aggregate_state(merged, ["k"]).collect()}
    b = {r["k"]: r for r in finalize_aggregate_state(full_state, ["k"]).collect()}
    assert set(a) == set(b) == {"a", "b", "c"}
    for k in a:
        for col in ("n", "mean", "var_samp", "vmin", "vmax"):
            assert a[k][col] == pytest.approx(b[k][col]), (k, col)
    assert a["a"]["mean"] == 3.0 and a["a"]["var_samp"] == 4.0
    assert a["c"]["var_samp"] is None  # n=1 → undefined sample variance


def test_top_p_by_weight_crosses_threshold(spark):
    """Keys enter in weight order until cumulative coverage crosses p; the
    selection always includes the key that crosses the line."""
    from sensordatapipelines_spark.operators.utility import top_p_by_weight

    df = spark.createDataFrame(
        [("w", 50), ("x", 30), ("y", 15), ("z", 5)], "k string, wt long"
    )
    kept = {r["k"]: r for r in top_p_by_weight(df, "k", "wt", p=0.8).collect()}
    # cumulative: w=50 (before 0), x=80 (before 50), y crosses? before=80 == 0.8*100 → excluded
    assert set(kept) == {"w", "x"}
    assert kept["x"]["cum_share"] == 0.8
    everything = top_p_by_weight(df, "k", "wt", p=1.0).count()
    assert everything == 4


def test_psi_drift_identical_distributions_zero(spark):
    """PSI of a distribution against itself is ~0; a shifted distribution
    produces a clearly positive total."""
    import pytest
    from sensordatapipelines_spark.operators.utility import psi_drift

    a = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    b = spark.range(1000).selectExpr("CAST((id % 100) + 30 AS DOUBLE) AS v")
    same = psi_drift(a, a, "v", lo=0.0, hi=100.0, n_bins=10)
    total_same = sum(r["psi_term"] for r in same.collect())
    assert total_same == pytest.approx(0.0, abs=1e-9)
    shifted = psi_drift(a, b, "v", lo=0.0, hi=100.0, n_bins=10)
    total_shift = sum(r["psi_term"] for r in shifted.collect())
    assert total_shift > 0.25  # action-level drift
    # out-of-range values clamp into edge bins, never vanish
    assert sum(r["n_cur"] for r in shifted.collect()) == 1000


def test_equal_depth_binning_balanced(spark):
    from sensordatapipelines_spark.operators.utility import equal_depth_binning

    df = spark.range(100).selectExpr("id AS k", "CAST(id * id AS DOUBLE) AS v")
    out = equal_depth_binning(df, "v", n_bins=4, order_tiebreak="k")
    counts = {r["depth_bin"]: r["count"] for r in out.groupBy("depth_bin").count().collect()}
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}  # equal depth, heavy tail


def test_topn_with_others_folds_tail(spark):
    from sensordatapipelines_spark.operators.utility import topn_with_others

    rows = [("a", 5), ("a", 5), ("b", 8), ("c", 3), ("d", 1), ("e", 1)]
    df = spark.createDataFrame(rows, "k string, w long")
    out = topn_with_others(df, "k", n=2, weight_expr=F.col("w"))
    rowsd = {r["key_or_other"]: r for r in out.collect()}
    assert rowsd["a"]["weight"] == 10.0 and rowsd["b"]["weight"] == 8.0
    assert rowsd["__others__"]["n_keys"] == 3
    assert rowsd["__others__"]["weight"] == 5.0
    assert set(rowsd) == {"a", "b", "__others__"}


def test_contract_violations_counts(spark):
    import pytest
    from sensordatapipelines_spark.operators.utility import contract_violations

    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", 50.0), (2, None, 150.0), (3, "c", None)],
        "id long, name string, v double",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in contract_violations(
            df,
            unique_keys=["id"],
            not_null=["name"],
            ranges={"v": (0.0, 100.0)},
        ).collect()
    }
    assert out["unique(id)"] == 1          # id=1 twice -> 1 extra row
    assert out["not_null(name)"] == 1
    assert out["range(v,0.0,100.0)"] == 1  # 150 out of range; NULL not counted
    with pytest.raises(ValueError):
        contract_violations(df)


def test_group_sample_k_balanced_and_stable(spark):
    from sensordatapipelines_spark.operators.utility import group_sample_k

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = group_sample_k(df, "grp", "id", k=5, salt="s")
    counts = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    assert counts == {"big": 5, "small": 3}  # min(k, group size)
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in group_sample_k(df, "grp", "id", k=5, salt="s").collect())
    assert ids1 == ids2  # deterministic
    ids3 = sorted(r["id"] for r in group_sample_k(df, "grp", "id", k=5, salt="t").collect())
    assert ids1 != ids3  # salt changes the sample


def test_weighted_percentile_vs_manual(spark):
    """Weighted median picks the value where cumulative weight crosses
    half the total; heavy weight on a single value pulls the median there;
    zero-total groups are absent (NULL contract)."""
    rows = [
        ("g", 1.0, 1.0, 1),
        ("g", 2.0, 1.0, 2),
        ("g", 100.0, 10.0, 3),  # dominates: weighted median = 100
        ("z", 5.0, 0.0, 4),     # zero-total group
    ]
    df = spark.createDataFrame(rows, "grp string, v double, w double, id long")
    from sensordatapipelines_spark.operators.aggregates import weighted_percentile

    out = {
        r["grp"]: r["p50_weighted"]
        for r in weighted_percentile(df, "grp", "v", "w", q=0.5, tiebreak_col="id").collect()
    }
    assert out["g"] == 100.0
    assert "z" not in out
    unw = {
        r["grp"]: r["p50_weighted"]
        for r in weighted_percentile(
            df.withColumn("w1", F.lit(1.0)), "grp", "v", "w1", q=0.5, tiebreak_col="id"
        ).collect()
    }
    assert unw["g"] == 2.0  # unweighted median of {1,2,100}


def test_rfm_segments_scores(spark):
    """Recent/frequent/big spenders land in top tiles; the reverse lands
    at the bottom; segment code concatenates r/f/m."""
    rows = (
        [(1, f"2024-03-{d:02d}", 100.0) for d in range(1, 9)]   # recent, frequent, big
        + [(2, "2024-01-01", 5.0)]                                # stale, rare, small
        + [(3, "2024-02-15", 50.0), (4, "2024-02-20", 60.0)]
    )
    df = spark.createDataFrame(rows, "cust long, d string, amt double")
    from sensordatapipelines_spark.operators.utility import rfm_segments

    out = {r["key"]: r for r in rfm_segments(df, "cust", "d", "amt", n_tiles=4).collect()}
    assert out[1]["rfm"] == "444"
    assert out[2]["rfm"] == "111"
    assert out[1]["recency_days"] == 0 and out[1]["frequency"] == 8


def test_rolling_origin_folds_no_leakage(spark):
    """Every fold's train count equals the rows strictly before its test
    window; counts grow monotonically; all rows belong to some slice."""
    rows = [(i, f"2024-01-01 {h:02d}:00:00") for i, h in enumerate(range(20))]
    df = spark.createDataFrame(rows, "id long, ts string")
    from sensordatapipelines_spark.operators.utility import rolling_origin_folds

    folds = sorted(
        rolling_origin_folds(df, "ts", k=3).collect(), key=lambda r: r["fold"]
    )
    trains = [r["n_train"] for r in folds]
    assert trains == sorted(trains)            # expanding windows
    for r in folds:
        assert r["n_train"] + r["n_test"] <= 20
        assert r["test_start_us"] < r["test_end_us"]
    assert folds[0]["n_train"] > 0 and folds[-1]["n_test"] > 0


def test_snapshot_diff_classification(spark):
    from sensordatapipelines_spark.operators.utility import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (4, "d", 40)], "k long, s string, v long"
    )
    out = {r.k: r.change for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}
    full = {
        r.k: r.change
        for r in snapshot_diff(old, new, keys=["k"], include_unchanged=True).collect()
    }
    assert full[1] == "unchanged" and len(full) == 4
    # NULL value vs the string 'NULL' must hash differently (sentinel)
    o3 = spark.createDataFrame([(1, None)], "k long, s string")
    n3 = spark.createDataFrame([(1, "NULL")], "k long, s string")
    assert (
        snapshot_diff(o3, n3, keys=["k"]).collect()[0].change == "changed"
    )


def test_group_disjoint_split_never_straddles(spark):
    from sensordatapipelines_spark.operators.utility import group_disjoint_split

    df = spark.createDataFrame(
        [(i, f"host{i % 7}") for i in range(70)], "doc_id long, source string"
    )
    out = group_disjoint_split(df, group_col="source", heldout_rate=0.4)
    sides = out.groupBy("source").agg(
        F.count_distinct("split").alias("n_sides")
    ).collect()
    assert all(r.n_sides == 1 for r in sides)  # no group straddles
    # stable across re-runs (pure function of the group key)
    again = {(r.doc_id, r.split) for r in out.collect()}
    assert {(r.doc_id, r.split) for r in
            group_disjoint_split(df, "source", 0.4).collect()} == again


def test_token_budget_pack_floor_semantics(spark):
    from sensordatapipelines_spark.operators.utility import token_budget_pack

    df = spark.createDataFrame(
        [
            (1, "a", 40, 9),   # priority order within 'a': 1 (40), 2 (30), 3 (20)
            (2, "a", 30, 5),
            (3, "a", 20, 5),
            (4, "b", 99, 100),
        ],
        "doc_id long, source string, prio long, n_tokens long",
    )
    out = {
        r.doc_id: r.cum_tokens
        for r in token_budget_pack(
            df, budget=10, group_col="source",
            tokens_col="n_tokens", priority_col="prio",
        ).collect()
    }
    # doc 1 (9 < 10) kept; doc 2 starts at 9 < 10 -> kept (crosses, floor
    # semantics); doc 3 starts at 14 >= 10 -> cut; group b's first always kept
    assert out == {1: 9, 2: 14, 4: 100}


def test_grouped_linregress_recovers_planted_line(spark):
    from sensordatapipelines_spark.operators.aggregates import grouped_linregress

    rows = [("g", float(x), 2.5 * x + 7.0) for x in range(50)]
    rows += [("noisy", float(x), 1.0 * x + ((-1) ** x) * 0.5) for x in range(50)]
    rows += [("flat", 3.0, 9.0), ("flat", 3.0, 11.0)]  # zero x-variance
    rows += [("single", 1.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    # scale chosen INSIDE the enforced overflow contract (|x·scale| ≤ 3e6
    # clamp; x ≤ 124 here → quantized ≤ 1.24e6); scale=1e6 would clamp
    out = {r.g: r for r in grouped_linregress(df, "g", "x", "y", scale=1e4).collect()}
    assert abs(out["g"].slope - 2.5) < 1e-3
    assert abs(out["g"].intercept - 7.0) < 1e-2
    assert abs(out["g"].r2 - 1.0) < 1e-6
    assert abs(out["noisy"].slope - 1.0) < 0.01 and out["noisy"].r2 < 1.0
    assert out["flat"].slope is None and out["flat"].r2 is None
    assert out["single"].slope is None
    # inside the clamp window nothing clamps, and it says so
    assert all(r.n_clamped == 0 for r in out.values())


def test_grouped_linregress_clamping_is_not_silent(spark):
    """ADVICE r8: values beyond the quantizer clamp degrade the fit —
    the n_clamped column must report every clamped row instead of
    silently emitting a wrong line; a wider row budget raises the bound
    and un-clamps the same data."""
    from sensordatapipelines_spark.operators.aggregates import grouped_linregress

    rows = [("g", float(x), 5e3 * x) for x in range(10)]  # y up to 4.5e4
    df = spark.createDataFrame(rows, "g string, x double, y double")
    # scale=1e3 → |y·scale| up to 4.5e7 > 3e6 default bound: clamps, reported
    out = grouped_linregress(df, "g", "x", "y", scale=1e3).collect()[0]
    assert out.n_clamped > 0
    # shrinking the row budget to 100 raises the bound to √(9e18/100) ≈
    # 9.5e8 — same data no longer clamps and the planted slope returns
    out2 = grouped_linregress(
        df, "g", "x", "y", scale=1e3, max_rows_per_group=100
    ).collect()[0]
    assert out2.n_clamped == 0
    assert abs(out2.slope - 5e3) < 1.0


def test_aggregate_state_schema_contract_enforced(spark):
    """ADVICE r8: v1-format state (raw double power sums) merged into the
    v2 math would be silently off by ~1e6/1e4 — the integer dtype is the
    version marker and mismatches must raise, not compute."""
    import pytest

    from sensordatapipelines_spark.errors import StateSchemaMismatch
    from sensordatapipelines_spark.operators.utility import (
        aggregate_state,
        finalize_aggregate_state,
        merge_aggregate_states,
    )

    good = aggregate_state(
        spark.createDataFrame([("a", 1.0)], "k string, v double"), ["k"], "v"
    )
    legacy = spark.createDataFrame(
        [("a", 1, 1.0, 1.0, 1.0, 1.0)],
        "k string, n long, s1 double, s2 double, vmin double, vmax double",
    )
    with pytest.raises(StateSchemaMismatch):
        merge_aggregate_states(good, legacy, ["k"])
    with pytest.raises(StateSchemaMismatch):
        finalize_aggregate_state(legacy, ["k"])
    # the happy path still merges/finalizes
    assert finalize_aggregate_state(
        merge_aggregate_states(good, good, ["k"]), ["k"]
    ).collect()[0]["n"] == 2
