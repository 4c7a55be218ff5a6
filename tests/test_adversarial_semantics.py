"""Regression pins for the round-8 adversarial-twin discoveries.

Each test reproduces, on a tiny synthetic frame, a cross-engine
divergence mechanism the adversarial twin surfaced (SURVEY.md §2
round-8 block) and asserts the FIXED semantics — so a future edit that
reintroduces the old behavior fails fast without needing the twin.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_asof_join_right_row_is_atomic(spark):
    """A NULL in one payload column of the newest right row must NOT
    tear the match apart (value from an older row, id from the newest)."""
    from sensordatapipelines_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 50, 10.0, 500), (1, 90, None, 900)],
        "k long, ts long, value double, rid long",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_cols=["value", "rid"], tiebreak="rid",
    ).collect()[0]
    # the newest (ts=90) row wins WHOLE: NULL value, rid 900 — never
    # (10.0, 900)
    assert out["rid_asof"] == 900 and out["value_asof"] is None


def test_asof_join_null_left_ts_matches_nothing(spark):
    from sensordatapipelines_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, None)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 50, 7.0)], "k long, ts long, v double"
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_cols=["v"], tiebreak="v",
    ).collect()[0]
    assert out["v_asof"] is None


def test_mad_anomaly_integer_exact_median(spark):
    """2·median and 4·MAD are exact BIGINT sums of the two middle order
    statistics — no float interpolation, NaN/NULL dropped, extremes
    clamped at ±1e10 on both engines."""
    from sensordatapipelines_spark.operators.temporal import mad_anomaly

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
         ("a", None), ("a", float("nan")), ("a", float("inf"))],
        "k string, v double",
    )
    row = mad_anomaly(df, "k", "v").collect()[0]
    # values kept: 1,2,3,100,clamp(inf)=1e10 → n=5, median 3 → med2 6
    assert row["n_rows"] == 5
    assert row["med_x2_e6"] == 2 * 3_000_000
    # deviations (e6·2-scale): |2v6−med2| → 4e6,2e6,0,194e6,(2e16−6e6)
    # MAD = middle = 4e6 → mad4 = 8e6
    assert row["mad_x4_e6"] == 8_000_000


def test_window_value_tiebreak_duplicate_ts_id(spark):
    """Duplicate (ts, tiebreak) rows with different values must pair
    deterministically (the value is the final order key)."""
    from sensordatapipelines_spark.operators.temporal import transition_matrix

    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 7, "b"), (1, t0, 7, "a"), (1, t0, 8, "c")],
        "sensor_id long, ts timestamp, event_id long, event_type string",
    )
    out = {
        (r["from_state"], r["to_state"])
        for r in transition_matrix(
            df,
            ts_col="ts",
            key_col="sensor_id",
            state_col="event_type",
            order_tiebreak="event_id",
        ).collect()
    }
    # deterministic order: a (tie, state asc), b, c
    assert out == {("a", "b"), ("b", "c")}


def test_paragraph_dedup_null_id_cannot_steal_winners(spark):
    """A NULL-id document must not become the corpus-wide keep-first
    winner (Spark's min-struct sorts NULL first; the operator's winner
    key carries a null-flag so NULL ids lose instead — ADVICE r8). The
    UNFILTERED frame goes in: the fix must live inside the operator, not
    at the call site."""
    from sensordatapipelines_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(None, "dup"), (5, "dup\nunique")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df, id_col="doc_id").collect()}
    # doc 5 keeps both paragraphs: the NULL-id doc cannot win "dup"
    assert out[5]["n_kept"] == 2
    assert out[5]["text"] == "dup\nunique"
    # the NULL-id doc loses its only paragraph but does not disappear
    assert out[None]["n_kept"] == 0


def test_quantize_e6_clamp_and_nan(spark):
    from sensordatapipelines_spark.operators.temporal import quantize_e6

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (-0.0,), (2.5,), (None,)],
        "v double",
    )
    vals = [r[0] for r in df.select(quantize_e6(F.col("v"))).collect()]
    assert vals == [None, int(1e16), 0, 2_500_000, None]


def test_hub_cap_semantics_documented_in_graph_test(spark):
    # covered in tests/test_graph.py::test_hub_cap_excludes_celebrity_mediators
    pass
