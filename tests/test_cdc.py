"""cdc_apply: upsert/delete semantics, latest-wins within a feed."""

from sensordatapipelines_spark.operators.utility import cdc_apply


def test_cdc_apply_semantics(spark):
    state = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 1, "a2"),   # update
            (2, "D", 1, None),   # delete
            (4, "I", 1, "d"),    # insert (new key)
            (3, "U", 1, "c2"),   # updated then deleted -> ends deleted
            (3, "D", 2, None),
            (5, "D", 1, None),   # delete of absent key: no-op
            (5, "I", 2, "e"),    # ...then re-inserted (seq 2 wins)
        ],
        "k long, op string, seq int, v string",
    )
    out = {r.k: r.v for r in cdc_apply(state, changes, ["k"]).collect()}
    assert out == {1: "a2", 4: "d", 5: "e"}


def test_cdc_apply_no_changes_passthrough(spark):
    state = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame([], "k long, op string, seq int, v string")
    assert {r.k: r.v for r in cdc_apply(state, changes, ["k"]).collect()} == {1: "a"}
