"""Frequent ordered subsequences: worked example, cap semantics, support
= actor count (not occurrence count)."""

import datetime as dt

import pytest

from sensordatapipelines_spark.operators.sequence import frequent_sequences


def _df(spark, seqs: dict):
    rows = []
    for a, s in seqs.items():
        for i, c in enumerate(s):
            rows.append((a, dt.datetime(2024, 1, 1, 0, i), c, i))
    return spark.createDataFrame(rows, "actor long, ts timestamp, item string, eid long")


def test_worked_example(spark):
    df = _df(spark, {1: "ABCA", 2: "ABC", 3: "AC", 4: "BAC", 5: "ABB"})
    out = {
        (r.seq, r.seq_len): r.support
        for r in frequent_sequences(
            df, "actor", "ts", "item", "eid", min_support=2
        ).collect()
    }
    assert out == {
        ("A>C", 2): 4,
        ("A>B", 2): 3,
        ("B>C", 2): 3,
        ("B>A", 2): 2,
        ("A>B>C", 3): 2,
    }


def test_support_counts_actors_not_occurrences(spark):
    # One actor with many A>B occurrences still contributes support 1.
    df = _df(spark, {1: "ABABAB", 2: "XY"})
    out = {
        r.seq: r.support
        for r in frequent_sequences(
            df, "actor", "ts", "item", "eid", min_support=1, lengths=(2,)
        ).collect()
    }
    assert out["A>B"] == 1
    assert out["B>A"] == 1
    assert out["X>Y"] == 1


def test_max_events_cap_is_time_ordered(spark):
    # Cap at 2: only the first two events per actor count.
    df = _df(spark, {1: "ABZ", 2: "ABQ"})
    out = {
        r.seq
        for r in frequent_sequences(
            df, "actor", "ts", "item", "eid", min_support=1, max_events=2,
            lengths=(2,),
        ).collect()
    }
    assert out == {"A>B"}


def test_bad_length_rejected(spark):
    df = _df(spark, {1: "AB"})
    with pytest.raises(ValueError):
        frequent_sequences(df, "actor", "ts", "item", "eid", lengths=(4,))
