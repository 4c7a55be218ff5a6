

def test_dq_report_finds_planted_issues(spark):
    from sensordatapipelines_spark.operators.utility import dq_report
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, -1.0), (2, 99, 3.0), (3, None, 0.0), (4, 11, 2.0)],
        "pk long, fk long, amount double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "k long")
    rep = {
        (r.check): r.value
        for r in dq_report(
            fact,
            pk="pk",
            not_null=["fk"],
            domain={"nonpositive_amount": F.col("amount") <= 0},
            fks=[("fk", dim, "k")],
        ).collect()
    }
    assert rep["row_count"] == 5
    assert rep["null_fk"] == 1
    assert rep["domain_nonpositive_amount"] == 2  # -1.0 and 0.0
    assert rep["dup_pk_pk_keys"] == 1 and rep["dup_pk_pk_excess_rows"] == 1
    assert rep["orphan_fk"] == 1  # fk=99; NULL fk not counted as orphan


def test_dq_report_clean_table_all_zero(spark):
    from sensordatapipelines_spark.operators.utility import dq_report

    fact = spark.createDataFrame([(1, 10), (2, 11)], "pk long, fk long")
    dim = spark.createDataFrame([(10,), (11,)], "k long")
    rep = {
        r.check: r.value
        for r in dq_report(fact, pk="pk", not_null=["fk"], fks=[("fk", dim, "k")]).collect()
    }
    assert rep["row_count"] == 2
    assert all(v == 0 for k, v in rep.items() if k != "row_count")


def test_stratified_sample_exact_allocation(spark):
    from sensordatapipelines_spark.operators.utility import stratified_sample_alloc

    rows = (
        [("big", f"k{i}") for i in range(70)]
        + [("mid", f"m{i}") for i in range(25)]
        + [("tiny", f"t{i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "stratum string, key string")
    out = stratified_sample_alloc(df, "stratum", "key", total_n=20).collect()
    assert len(out) == 20
    by = {}
    for r in out:
        by.setdefault(r.stratum, 0)
        by[r.stratum] += 1
    # quotas: 14.0, 5.0, 1.0 exactly
    assert by == {"big": 14, "mid": 5, "tiny": 1}
    # deterministic membership
    again = {(r.stratum, r.key) for r in
             stratified_sample_alloc(df, "stratum", "key", total_n=20).collect()}
    assert again == {(r.stratum, r.key) for r in out}


def test_stratified_sample_largest_remainder_seats(spark):
    from sensordatapipelines_spark.operators.utility import stratified_sample_alloc

    # n_h = 5, 5, 5 with total_n=10: base 3×(50 div 15 = 3) = 9, one
    # leftover seat goes to the lexicographically first stratum (tie rems)
    rows = [(s, f"{s}{i}") for s in ("a", "b", "c") for i in range(5)]
    df = spark.createDataFrame(rows, "stratum string, key string")
    out = stratified_sample_alloc(df, "stratum", "key", total_n=10).collect()
    assert len(out) == 10
    allocs = {r.stratum: r.alloc for r in out}
    assert allocs == {"a": 4, "b": 3, "c": 3}


def test_abc_classification_pareto_cuts(spark):
    from sensordatapipelines_spark.operators.utility import abc_classification

    rows = [("p1", 70.0), ("p2", 15.0), ("p3", 10.0), ("p4", 5.0)]
    df = spark.createDataFrame(rows, "part string, amt double")
    out = {r.part: r for r in abc_classification(df, "part", "amt").collect()}
    assert out["p1"].abc_class == "A" and out["p1"].cum_share == 0.70
    assert out["p2"].abc_class == "B"  # cum 0.85
    assert out["p3"].abc_class == "B"  # cum 0.95 (<= b_cut)
    assert out["p4"].abc_class == "C"
    assert out["p4"].cum_share == 1.0


def test_upsert_merge_latest_wins_and_passthrough(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.utility import upsert_merge

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    chg = spark.createDataFrame(
        [
            (1, "a", 99.0, dt.datetime(2024, 1, 1), 7),
            (1, "a", 50.0, dt.datetime(2024, 2, 1), 3),   # later ts wins
            (2, "b", 11.0, dt.datetime(2024, 2, 1), 1),
            (2, "b", 12.0, dt.datetime(2024, 2, 1), 2),   # ts tie → key desc
        ],
        "k long, name string, bal double, ts timestamp, seq long",
    )
    out = {r.k: r for r in
           upsert_merge(snap, chg, "k", ts_col="ts", tiebreak_col="seq").collect()}
    assert out[1].bal == 50.0 and out[1].updated
    assert out[2].bal == 12.0 and out[2].updated
    assert out[3].bal == 30.0 and not out[3].updated
    assert len(out) == 3


def test_benford_audit_detects_uniform_digits(spark):
    from sensordatapipelines_spark.operators.utility import BENFORD_P, benford_audit

    # Benford-conforming sample: counts proportional to the law
    rows = []
    for d, p in enumerate(BENFORD_P, start=1):
        rows += [(float(d) * 10 + 0.5,)] * int(round(p * 1000))
    conforming = spark.createDataFrame(rows, "amt double")
    out_c = benford_audit(conforming, "amt").collect()
    assert {r.digit for r in out_c} == set(range(1, 10))
    assert all(r.chi2 == out_c[0].chi2 for r in out_c)
    assert out_c[0].chi2 < 5  # near-perfect fit

    # fabricated data: every amount starts with 5 → enormous chi2
    fake = spark.createDataFrame([(55.0,)] * 900, "amt double")
    out_f = benford_audit(fake, "amt").collect()
    assert len(out_f) == 1 and out_f[0].digit == 5
    assert out_f[0].chi2 > 1000
    # sub-1 amounts are excluded
    tiny = spark.createDataFrame([(0.5,), (12.0,)], "amt double")
    assert benford_audit(tiny, "amt").count() == 1


def test_log2_histogram_buckets(spark):
    from sensordatapipelines_spark.operators.utility import log2_histogram

    df = spark.createDataFrame(
        [("k", 0.000001), ("k", 0.000002), ("k", 0.000003), ("k", 0.0),
         ("k", -5.0), ("k", 4.194304)],  # e6: 1,2,3,0,-5e6, 2^22
        "key string, v double",
    )
    got = {r.bucket: r.n for r in log2_histogram(df, "key", "v").collect()}
    # e6 values 1 -> bucket 0; 2,3 -> bucket 1; <=0 -> -1; 2^22 -> 22
    assert got == {0: 1, 1: 2, -1: 2, 22: 1}


def test_weighted_median_known(spark):
    from sensordatapipelines_spark.operators.utility import weighted_median

    # values 1,2,3 with weights 1,1,10 -> half of 12 is 6: wmedian = 3
    rows = [("k", 1.0, 1, 1), ("k", 2.0, 1, 2), ("k", 3.0, 10, 3),
            ("u", 5.0, 2, 1), ("u", 7.0, 2, 2)]  # even split: LOWER median 5
    df = spark.createDataFrame(rows, "g string, v double, w long, tb long")
    out = {r.g: r for r in weighted_median(df, "g", "v", "w", "tb").collect()}
    assert (out["k"].total_weight, out["k"].wmedian_e2) == (12, 300)
    assert (out["u"].total_weight, out["u"].wmedian_e2) == (4, 500)


def test_peak_count_known(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.utility import peak_count

    t0 = dt.datetime(2024, 1, 1)
    vals = [1.0, 3.0, 2.0, 5.0, 5.0, 1.0, 4.0]  # peaks at 3 and... plateau 5,5 none strict; troughs at 2 and 1
    rows = [("k", t0 + dt.timedelta(hours=i), v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double, i long")
    out = peak_count(df, "g", "ts", "v", "i").collect()[0]
    # strict peaks: index1 (1<3>2). index3 (2<5 but 5==5 next -> not strict)
    # troughs: index2 (3>2<5), index5 (5>1<4)
    assert (out.n_points, out.n_peaks, out.n_troughs) == (7, 1, 2)


def test_gini_concentration_uniform_and_skewed(spark):
    from sensordatapipelines_spark.operators.utility import gini_concentration

    rows = []
    for u in range(4):          # uniform: every user 5 events -> G = 0
        rows += [("flat", u)] * 5
    rows += [("skew", 0)] * 97  # one user dominates
    rows += [("skew", 1), ("skew", 2), ("skew", 3)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    out = {r.event_type: r for r in gini_concentration(df, "event_type", "user_id").collect()}
    f = out["flat"]
    assert f.gini_num == 0 and f.gini_den == 4 * 20
    s = out["skew"]
    # counts sorted asc: [1,1,1,97]; num = 2*(1+2+3+4*97)-5*100 = 288
    assert (s.n_entities, s.total, s.gini_num, s.gini_den) == (4, 100, 288, 400)
