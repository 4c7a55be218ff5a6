"""As-of join + salted skew join tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.joins import asof_join, salted_join
from sensordatapipelines_spark.operators.temporal import moving_average, sessionize


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0)), (1, dt.datetime(2024, 1, 1, 12, 0, 0)),
         (2, dt.datetime(2024, 1, 1, 9, 0, 0))],
        "key long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 9, 30, 0), 100.0),
         (1, dt.datetime(2024, 1, 1, 10, 0, 0), 200.0),   # ties left ts → inclusive
         (1, dt.datetime(2024, 1, 1, 11, 0, 0), 300.0),
         (2, dt.datetime(2024, 1, 1, 9, 30, 0), 999.0)],   # after left → no match
        "key long, ts timestamp, v double",
    )
    out = asof_join(left, right, on="key", right_cols=["v"]).collect()
    got = {(r["key"], r["ts"].hour): r["v_asof"] for r in out}
    assert got[(1, 10)] == 200.0  # inclusive at equal ts
    assert got[(1, 12)] == 300.0  # latest earlier
    assert got[(2, 9)] is None    # nothing at-or-before


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0, 0))], "key long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 8, 0, 0), 1.0)], "key long, ts timestamp, v double"
    )
    # match is 4h old; 1h tolerance discards it
    out = asof_join(left, right, on="key", right_cols=["v"], tolerance=3600).first()
    assert out["v_asof"] is None
    out2 = asof_join(left, right, on="key", right_cols=["v"], tolerance=5 * 3600).first()
    assert out2["v_asof"] == 1.0


def test_salted_join_matches_plain_join(spark):
    import random

    rng = random.Random(7)
    # heavy-hitter key 1 dominates
    big = spark.createDataFrame(
        [(1 if rng.random() < 0.8 else rng.randint(2, 5), i) for i in range(1000)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 6)], "k long, name string")
    plain = big.join(small, "k").groupBy("k").count().collect()
    salted = salted_join(big, small, "k", salt=4).groupBy("k").count().collect()
    assert {(r["k"], r["count"]) for r in plain} == {(r["k"], r["count"]) for r in salted}


def test_sessionize_gap_split(spark):
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 10, 0, 0)),
        (2, 1, dt.datetime(2024, 1, 1, 10, 10, 0)),   # same session (10 min)
        (3, 1, dt.datetime(2024, 1, 1, 11, 0, 0)),    # 50 min gap → new session
        (4, 2, dt.datetime(2024, 1, 1, 10, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, sensor_id long, ts timestamp")
    out = sessionize(df, gap_seconds=1800, order_tiebreak="event_id").collect()
    sess = {r["event_id"]: r["session_id"] for r in out}
    assert sess[1] == 1 and sess[2] == 1 and sess[3] == 2 and sess[4] == 1


def test_moving_average_rows_frame(spark):
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 10, 0, 0), 10.0),
        (2, 1, dt.datetime(2024, 1, 1, 10, 1, 0), 20.0),
        (3, 1, dt.datetime(2024, 1, 1, 10, 2, 0), 30.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, sensor_id long, ts timestamp, value double")
    out = moving_average(df, n_preceding=1, order_tiebreak="event_id").collect()
    ma = {r["event_id"]: r["value_ma"] for r in out}
    assert ma[1] == 10.0 and ma[2] == 15.0 and ma[3] == 25.0


def test_merge_upsert_source_wins_and_inserts(spark):
    """MERGE semantics: matched keys take the source row, unmatched target
    rows pass through, new source keys are inserted."""
    from sensordatapipelines_spark.operators.utility import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    out = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(target, source, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_range_join_boundaries_and_overlap(spark):
    """[start, end) semantics; an interval spanning a bucket boundary still
    matches (explode covers every overlapped bucket); overlapping intervals
    both match the same point."""
    from pyspark.sql import functions as F

    from sensordatapipelines_spark.operators.joins import range_join

    pts = spark.createDataFrame(
        [(1, "2024-01-01 23:59:59"), (2, "2024-01-02 00:00:00"), (3, "2024-01-05 00:00:00")],
        "pid long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    iv = spark.createDataFrame(
        [
            (10, "2024-01-01 20:00:00", "2024-01-02 04:00:00"),  # spans midnight
            (11, "2024-01-01 12:00:00", "2024-01-02 00:00:00"),  # end-exclusive
        ],
        "iid long, ws string, we string",
    ).withColumn("ws", F.to_timestamp("ws")).withColumn("we", F.to_timestamp("we"))
    out = range_join(pts, iv, "ts", "ws", "we", bucket_seconds=86400)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(1, 10), (2, 10), (1, 11)}


def test_runtime_filter_semi_join_equals_plain_semi_join(spark):
    from sensordatapipelines_spark.operators.joins import runtime_filter_semi_join

    big = spark.createDataFrame(
        [(i, i % 10) for i in range(200)], "row_id long, k long"
    )
    small = spark.createDataFrame([(2,), (7,), (999,)], "k long")
    got = {
        r["row_id"] for r in runtime_filter_semi_join(big, small, on="k").collect()
    }
    want = {
        r["row_id"] for r in big.join(small, "k", "left_semi").collect()
    }
    assert got == want and len(want) == 40
    # tiny bucket count → heavy collisions → still exact (confirm join wins)
    got_collide = {
        r["row_id"]
        for r in runtime_filter_semi_join(big, small, on="k", n_buckets=2).collect()
    }
    assert got_collide == want


def test_quality_audit_single_pass_profile(spark):
    from sensordatapipelines_spark.operators.utility import quality_audit

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", None), (3, None, 2.0), (4, "b", 2.0)],
        "id long, cat string, v double",
    )
    rows = {r["column_name"]: r for r in quality_audit(df).collect()}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_nulls"] == 0
    assert rows["cat"]["n_nulls"] == 1 and rows["cat"]["n_distinct"] == 2
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["n_distinct"] == 2
    # approx path keeps the same shape
    approx = {r["column_name"] for r in quality_audit(df, exact=False).collect()}
    assert approx == {"id", "cat", "v"}


def test_fuzzy_join_qgram_candidates_and_distance(spark):
    """Typos within the edit budget match; unrelated strings don't; a
    sub-q string yields no grams (and no crash)."""
    from sensordatapipelines_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "johnson"), (2, "smithers"), (3, "ab")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [(10, "jonhson"), (11, "smothers"), (12, "zzzzzzz")],
        "id long, name string",
    )
    out = {
        (r["left_id"], r["right_id"]): r["edit_distance"]
        for r in fuzzy_join(
            left, right, "id", "name", "id", "name", max_distance=2, q=3
        ).collect()
    }
    assert out[(1, 10)] == 2   # transposition = 2 edits
    assert out[(2, 11)] == 1   # substitution
    assert all(lid != 3 for lid, _ in out)       # sub-q string: no grams
    assert all(rid != 12 for _, rid in out)      # no spurious match


def test_triangle_count_known_graph(spark):
    """K4 minus one edge has 2 triangles; the two hub nodes sit in both."""
    from sensordatapipelines_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)],  # missing (3,4)
        "id_a long, id_b long",
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_cogroup_asof_matches_declarative_asof(spark):
    """The COGROUPED_MAP pandas merge_asof must agree with the declarative
    asof_join on the same inputs (incl. the equal-ts inclusive match and
    keys present on only one side)."""
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 11), (2, 50, 12), (3, 10, 13)],
        "k long, tus long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 100, 5.0, 20), (1, 150, 6.0, 21), (2, 60, 7.0, 22)],
        "k long, tus long, v double, rid long",
    )
    from sensordatapipelines_spark.operators.joins import cogroup_asof

    out = {
        r["lid"]: (r["r_v"], r["r_rid"])
        for r in cogroup_asof(
            left, right, on="k", left_ts="tus", right_ts="tus",
            left_cols=["lid", "tus"], right_cols=["v", "rid"],
            right_tiebreak="rid",
        ).collect()
    }
    assert out[10] == (5.0, 20)     # equal ts matches inclusively
    assert out[11] == (6.0, 21)     # latest preceding
    assert out[12] == (None, None)  # right row is later -> no match
    assert out[13] == (None, None)  # key absent on right


def test_cogroup_asof_string_key(spark):
    """The output schema derives the key's REAL type — a string key must
    not Arrow-error (regression: the key type was hardcoded long)."""
    left = spark.createDataFrame(
        [("a", 100, 10), ("b", 50, 11)], "k string, tus long, lid long"
    )
    right = spark.createDataFrame(
        [("a", 90, 1.5, 7)], "k string, tus long, v double, rid long"
    )
    from sensordatapipelines_spark.operators.joins import cogroup_asof

    out = {
        r["lid"]: (r["k"], r["r_v"])
        for r in cogroup_asof(
            left, right, on="k", left_ts="tus", right_ts="tus",
            left_cols=["lid", "tus"], right_cols=["v", "rid"],
            n_buckets=4,
        ).collect()
    }
    assert out[10] == ("a", 1.5)
    assert out[11] == ("b", None)


def test_market_basket_lift_math(spark):
    from sensordatapipelines_spark.operators.joins import market_basket_pairs

    # 4 baskets; x and y co-occur in 2 of them, z is everywhere
    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"), (2, "z"),
        (3, "x"), (3, "z"),
        (4, "z"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r for r in
           market_basket_pairs(df, "basket", "item", min_pair_count=2, top_n=10).collect()}
    # lift(x, y) = (2·4)/(3·2) = 4/3
    assert abs(out[("x", "y")].lift - 4 / 3) < 1e-12
    assert out[("x", "y")].n_baskets_both == 2
    # lift(x, z) = (3·4)/(3·4) = 1
    assert out[("x", "z")].lift == 1.0
    # duplicate item rows in one basket must not inflate counts
    df2 = spark.createDataFrame(rows + [(1, "x"), (1, "x")], "basket long, item string")
    out2 = {(r.item_a, r.item_b): r.n_baskets_both for r in
            market_basket_pairs(df2, "basket", "item", min_pair_count=2, top_n=10).collect()}
    assert out2[("x", "y")] == 2
