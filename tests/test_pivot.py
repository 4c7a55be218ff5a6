"""pivot_table / unpivot_table: reshape correctness and inverse property."""

import pytest

from sensordatapipelines_spark.operators.utility import pivot_table, unpivot_table

ROWS = [
    ("d1", "a", 10.0), ("d1", "a", 5.0), ("d1", "b", 1.0),
    ("d2", "b", 2.0), ("d2", "c", 7.0),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "day string, kind string, v double")


def test_pivot_count_with_fill(spark):
    out = {
        r.day: (r.a, r.b, r.c)
        for r in pivot_table(
            _df(spark), ["day"], "kind", ["a", "b", "c"], fill_value=0
        ).collect()
    }
    assert out == {"d1": (2, 1, 0), "d2": (0, 1, 1)}


def test_pivot_sum_null_holes(spark):
    out = {
        r.day: (r.a, r.b, r.c)
        for r in pivot_table(
            _df(spark), ["day"], "kind", ["a", "b", "c"], value_col="v", agg="sum"
        ).collect()
    }
    assert out == {"d1": (15.0, 1.0, None), "d2": (None, 2.0, 7.0)}


def test_unpivot_inverts_pivot(spark):
    wide = pivot_table(
        _df(spark), ["day"], "kind", ["a", "b", "c"], value_col="v",
        agg="sum", fill_value=0.0,
    )
    long = unpivot_table(wide, ["day"], ["a", "b", "c"], "kind", "v")
    got = {(r.day, r.kind): r.v for r in long.collect()}
    assert got == {
        ("d1", "a"): 15.0, ("d1", "b"): 1.0, ("d1", "c"): 0.0,
        ("d2", "a"): 0.0, ("d2", "b"): 2.0, ("d2", "c"): 7.0,
    }


def test_pivot_validation(spark):
    with pytest.raises(ValueError):
        pivot_table(_df(spark), ["day"], "kind", ["a"], agg="median")
    with pytest.raises(ValueError):
        pivot_table(_df(spark), ["day"], "kind", ["a"], agg="sum")
