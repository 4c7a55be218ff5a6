"""Entity-resolution blocking match and 2-D skyline."""

from __future__ import annotations


def test_blocked_name_matches_blocks_then_edits(spark):
    from sensordatapipelines_spark.operators.utility import blocked_name_matches

    left = spark.createDataFrame(
        [(1, "Jonathan Smith"), (2, "Maria Garcia"), (3, "Wei Chen")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [
            (11, "Jonathn Smith"),    # vowel dropped: same block, dist 1
            (12, "maria garcia"),     # case only: dist 0 after... no — case
            (13, "Wei Cheng"),        # extra consonant: block differs
            (14, "Jonathan Smyth"),   # y-for-i: same skeleton? i is vowel-
        ],
        "id long, name string",
    )
    out = {(r.id_a, r.id_b): r.distance
           for r in blocked_name_matches(left, right, max_distance=3).collect()}
    assert (1, 11) in out and out[(1, 11)] == 1
    # case-insensitive skeletons match; distance counts the case edits
    assert (2, 12) in out
    # 'Wei Cheng' skeleton 'Wchng' != 'Wchn': blocked out despite dist 1
    assert not any(ida == 3 for (ida, _idb) in out)


def test_skyline_2d_pareto_front_with_ties(spark):
    from sensordatapipelines_spark.operators.utility import skyline_2d

    pts = spark.createDataFrame(
        [
            (1, 5.0, 10),   # frontier (max x)
            (2, 5.0, 7),    # same x, lower y: dominated by 1
            (3, 3.0, 20),   # frontier
            (4, 3.0, 20),   # exact duplicate of 3: both survive
            (5, 4.0, 15),   # frontier (between 1 and 3)
            (6, 4.0, 9),    # dominated by 5 (and by 1)
            (7, 2.0, 19),   # dominated by 3 (x'>x, y'>y)
            (8, 1.0, 25),   # frontier (max y)
        ],
        "id long, x double, y long",
    )
    got = sorted(r.id for r in skyline_2d(pts, "x", "y").collect())
    assert got == [1, 3, 4, 5, 8]
