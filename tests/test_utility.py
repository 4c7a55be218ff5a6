

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
