"""A4/A5 semantics tests — the corners verified in SURVEY.md §5.2/§5.4."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.temporal import (
    date_range_filter,
    hour_interval_predicate,
    time_profile,
    time_series_aggregate,
)


def _readings(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, sensor_id long, v double")


def test_hour_interval_inclusive_and_overnight_wrap(spark):
    """pandas between_time('22:00','05:00') ⇒ hours {22,23,0..5}, ends
    inclusive (reference :574); daytime window ends inclusive too."""
    rows = [
        (dt.datetime(2024, 1, 1, 21, 59, 59), 1, 1.0),
        (dt.datetime(2024, 1, 1, 22, 0, 0), 1, 2.0),   # inclusive start
        (dt.datetime(2024, 1, 2, 3, 30, 0), 1, 3.0),    # wrapped past midnight
        (dt.datetime(2024, 1, 2, 5, 0, 0), 1, 4.0),     # inclusive end
        (dt.datetime(2024, 1, 2, 5, 0, 1), 1, 5.0),     # just outside
    ]
    df = _readings(spark, rows)
    night = df.filter(hour_interval_predicate(F.col("ts"), "22:00:00", "05:00:00"))
    assert sorted(r["v"] for r in night.collect()) == [2.0, 3.0, 4.0]
    day = df.filter(hour_interval_predicate(F.col("ts"), "03:00:00", "05:00:00"))
    assert sorted(r["v"] for r in day.collect()) == [3.0, 4.0]


def test_date_range_inclusive_of_end_day(spark):
    """pandas .xs(slice(beg, end)) includes the whole end day (:329-331)."""
    rows = [
        (dt.datetime(2024, 1, 4, 23, 59, 59), 1, 1.0),
        (dt.datetime(2024, 1, 5, 0, 0, 0), 1, 2.0),
        (dt.datetime(2024, 1, 7, 23, 59, 59), 1, 3.0),
        (dt.datetime(2024, 1, 8, 0, 0, 0), 1, 4.0),
    ]
    out = date_range_filter(_readings(spark, rows), "ts", "2024-01-05", "2024-01-07")
    assert sorted(r["v"] for r in out.collect()) == [2.0, 3.0]


def test_all_intervals_survive_ledger(spark):
    """LEDGER TEST (SURVEY §5.4): the reference's get_stats_temporal
    overwrites stats per interval (:571-584) so only the LAST interval
    survives; the documented intent (:301-302) — one stat column set per
    interval — is what the engine produces."""
    rows = [
        (dt.datetime(2024, 1, 1, 10, 0, 0), 1, 10.0),  # in 09-17
        (dt.datetime(2024, 1, 1, 23, 0, 0), 1, 99.0),  # in 22-05
    ]
    sensors = spark.createDataFrame([(1,)], "sensor_id long")
    out = time_series_aggregate(
        sensors,
        _readings(spark, rows),
        ts_col="ts",
        columns=["v"],
        sensor_col="sensor_id",
        hour_intervals=(("09:00:00", "17:00:00"), ("22:00:00", "05:00:00")),
        funcs=("mean", "max"),
    )
    row = out.first()
    # BOTH intervals present — not just the last one.
    assert row["mean_v_090000_170000"] == 10.0
    assert row["mean_v_220000_050000"] == 99.0
    assert row["max_v_090000_170000"] == 10.0
    assert row["max_v_220000_050000"] == 99.0


def test_sensors_without_readings_keep_null_stats(spark):
    sensors = spark.createDataFrame([(1,), (2,)], "sensor_id long")
    rows = [(dt.datetime(2024, 1, 1, 10, 0, 0), 1, 5.0)]
    out = time_series_aggregate(
        sensors, _readings(spark, rows), "ts", ["v"], sensor_col="sensor_id"
    )
    by_id = {r["sensor_id"]: r for r in out.collect()}
    assert by_id[1]["mean_v_090000_170000"] == 5.0
    assert by_id[2]["mean_v_090000_170000"] is None


def test_time_profile(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 0), 1, 1.0),
        (dt.datetime(2024, 1, 9, 0, 0, 0), 1, 1.0),
        (dt.datetime(2024, 1, 5, 0, 0, 0), 2, 1.0),
    ]
    prof = {r["sensor_id"]: r for r in time_profile(_readings(spark, rows), "ts", "sensor_id").collect()}
    assert prof[1]["ts_min"] == dt.datetime(2024, 1, 1)
    assert prof[1]["ts_max"] == dt.datetime(2024, 1, 9)
    assert prof[1]["n_obs"] == 2
    assert prof[2]["n_obs"] == 1


def test_resample_ffill_fills_gaps_with_previous_value(spark):
    from sensordatapipelines_spark.operators.temporal import resample

    rows = [
        (dt.datetime(2024, 1, 1, 0, 1, 0), 1, 10.0),
        (dt.datetime(2024, 1, 1, 0, 14, 0), 1, 20.0),   # same 15-min bucket
        (dt.datetime(2024, 1, 1, 1, 0, 0), 1, 40.0),    # 2-bucket gap before
        (dt.datetime(2024, 1, 1, 0, 0, 0), 2, 5.0),     # second series, dense
        (dt.datetime(2024, 1, 1, 0, 15, 0), 2, 6.0),
    ]
    out = resample(
        _readings(spark, rows), "sensor_id", "ts", "v", step_seconds=900
    )
    got = {
        (r["sensor_id"], str(r["grid_ts"])): (r["value_rs"], r["n_obs"])
        for r in out.collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): (15.0, 2),   # avg of the 2 obs in bucket
        (1, "2024-01-01 00:15:00"): (15.0, 0),   # gap: carried forward
        (1, "2024-01-01 00:30:00"): (15.0, 0),
        (1, "2024-01-01 00:45:00"): (15.0, 0),
        (1, "2024-01-01 01:00:00"): (40.0, 1),
        (2, "2024-01-01 00:00:00"): (5.0, 1),    # dense series: no synth rows
        (2, "2024-01-01 00:15:00"): (6.0, 1),
    }


def test_resample_linear_blends_toward_next_observation(spark):
    from sensordatapipelines_spark.operators.temporal import resample

    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 0), 1, 10.0),
        (dt.datetime(2024, 1, 1, 1, 0, 0), 1, 50.0),    # 4 buckets later
    ]
    out = resample(
        _readings(spark, rows), "sensor_id", "ts", "v", step_seconds=900,
        how="linear",
    )
    got = {str(r["grid_ts"]): r["value_rs"] for r in out.collect()}
    assert got == {
        "2024-01-01 00:00:00": 10.0,
        "2024-01-01 00:15:00": 20.0,
        "2024-01-01 00:30:00": 30.0,
        "2024-01-01 00:45:00": 40.0,
        "2024-01-01 01:00:00": 50.0,
    }


def test_resample_single_exchange_plan(spark):
    """The lead-window reuses the bucket-agg's hash exchange: series is a
    prefix-subset of the agg keys, so exactly ONE shuffle appears in the
    plan (plus no join — gap rows come from the map-side explode)."""
    from sensordatapipelines_spark.operators.temporal import resample

    df = _readings(spark, [(dt.datetime(2024, 1, 1), 1, 1.0)])
    plan = (
        resample(df, "sensor_id", "ts", "v", step_seconds=900)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan


def test_time_rollup_three_resolutions_one_scan(spark):
    from sensordatapipelines_spark.operators.temporal import time_rollup

    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0, 10), 1.0),
            (1, dt.datetime(2024, 1, 1, 10, 0, 50), 2.0),
            (1, dt.datetime(2024, 1, 1, 10, 30, 0), 4.0),
            (1, dt.datetime(2024, 1, 1, 23, 0, 0), 8.0),
            (2, dt.datetime(2024, 1, 2, 0, 0, 0), 16.0),
        ],
        "sensor_id long, ts timestamp, value double",
    )
    out = time_rollup(df, resolutions=("day", "hour", "minute"))
    rows = {
        (r["resolution"], r["sensor_id"], str(r["bucket_start"])): (r["n"], r["sum_value"])
        for r in out.collect()
    }
    assert rows[("minute", 1, "2024-01-01 10:00:00")] == (2, 3.0)
    assert rows[("minute", 1, "2024-01-01 10:30:00")] == (1, 4.0)
    assert rows[("hour", 1, "2024-01-01 10:00:00")] == (3, 7.0)
    assert rows[("day", 1, "2024-01-01 00:00:00")] == (4, 15.0)
    assert rows[("day", 2, "2024-01-02 00:00:00")] == (1, 16.0)
    # 4 minute + 3 hour + 2 day buckets, nothing else (no grand total /
    # key-only levels leak through the grouping_id filter)
    assert len(rows) == 9
    # single scan + single aggregation: the plan must contain exactly one
    # Expand (the rollup) and no Union of per-resolution scans
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # the one rollup expand (AQE prints plan twice)
    assert "Union" not in plan


def test_detect_gaps_hand_computed(spark):
    from sensordatapipelines_spark.operators.temporal import detect_gaps

    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
            (1, dt.datetime(2024, 1, 1, 0, 10, 0)),
            (1, dt.datetime(2024, 1, 1, 3, 0, 0)),   # 2h50m gap
            (2, dt.datetime(2024, 1, 1, 0, 0, 0)),   # single obs: no gap
        ],
        "sensor_id long, ts timestamp",
    )
    gaps = detect_gaps(df, min_gap_seconds=3600).collect()
    assert len(gaps) == 1
    g = gaps[0]
    assert g["sensor_id"] == 1
    assert g["gap_seconds"] == 10200
    assert g["gap_end_epoch"] - g["gap_start_epoch"] == 10200


def test_time_weighted_average_hand_computed(spark):
    from sensordatapipelines_spark.operators.temporal import time_weighted_average

    df = spark.createDataFrame(
        [
            # value 10 holds 30s, value 20 holds 10s -> (300+200)/40 = 12.5
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 0, 0, 30), 20.0),
            (1, dt.datetime(2024, 1, 1, 0, 0, 40), 99.0),  # last: weight 0
            (2, dt.datetime(2024, 1, 1, 0, 0, 0), 7.0),    # single obs
        ],
        "sensor_id long, ts timestamp, value double",
    )
    rows = {r["sensor_id"]: r for r in time_weighted_average(df).collect()}
    assert rows[1]["twap"] == 12.5
    assert rows[1]["n_obs"] == 3
    assert rows[2]["twap"] == 7.0  # degenerate span -> plain value


def test_funnel_order_constraint(spark):
    """A stage-2 event BEFORE the user's stage-1 timestamp must not count;
    conversion is relative to the previous stage."""
    from datetime import datetime
    from sensordatapipelines_spark.operators.temporal import funnel

    t = lambda s: datetime(2024, 1, 1, s)
    rows = [
        # user 1: proper view -> click -> purchase
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: click BEFORE view -> stalls at view
        (2, t(2), "view"), (2, t(1), "click"),
        # user 3: view only
        (3, t(1), "view"),
        # user 4: never views; click+purchase must not count anywhere
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["stage"]: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conversion"] == 1.0
    assert out["click"]["conversion"] == 1 / 3  # unrounded tie-free division
    assert out["purchase"]["conversion"] == 1.0
    # same-timestamp stage events are inclusive (ts >= prev)
    df2 = spark.createDataFrame(
        [(9, t(5), "view"), (9, t(5), "click")],
        "user_id long, ts timestamp, event_type string",
    )
    out2 = {r["stage"]: r["n_users"] for r in funnel(df2, ["view", "click"]).collect()}
    assert out2 == {"view": 1, "click": 1}


def test_scd2_compress_runs_and_validity(spark):
    from datetime import datetime
    from sensordatapipelines_spark.operators.temporal import scd2_compress

    t = lambda s: datetime(2024, 1, 1, s)
    rows = [
        (1, t(1), "A", 10), (1, t(2), "A", 11), (1, t(3), "B", 12), (1, t(4), "A", 13),
        (2, t(5), "X", 20),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, st string, eid long")
    out = scd2_compress(df, key_col="k", ts_col="ts", state_col="st", order_tiebreak="eid")
    got = sorted(
        ((r["k"], r["st"], r["valid_from"].hour,
          r["valid_to"].hour if r["valid_to"] else None, r["version"])
         for r in out.collect())
    )
    assert got == [
        (1, "A", 1, 3, 1),   # run A compressed to one version, ends at B
        (1, "A", 4, None, 3),  # back to A -> NEW version (type-2, not distinct)
        (1, "B", 3, 4, 2),
        (2, "X", 5, None, 1),
    ]


# ---------------------------------------------------------------------------
# Round-3 continuation: EWMA, retention cohorts, touch attribution
# ---------------------------------------------------------------------------


def test_ewma_recurrence_matches_closed_form(spark):
    """EWMA of [1, 1, 1] is 1 regardless of alpha; a step change moves the
    smoothed value toward the new level by exactly alpha-weighted decay."""
    from sensordatapipelines_spark.operators.temporal import ewma

    rows = [
        (1, "s", "2024-01-01 00:00:00", 1.0),
        (2, "s", "2024-01-01 00:01:00", 1.0),
        (3, "s", "2024-01-01 00:02:00", 1.0),
        (4, "s", "2024-01-01 00:03:00", 11.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts string, value double")
    out = {
        r["event_id"]: r["value_ewma"]
        for r in ewma(df, key_col="k", alpha=0.3, window_rows=20,
                      order_tiebreak="event_id").collect()
    }
    assert out[1] == 1.0 and out[3] == 1.0
    # num = ((1*0.7+1)*0.7+1)*0.7+11, den = ((1*.7+1)*.7+1)*.7+1
    num = ((1 * 0.7 + 1) * 0.7 + 1) * 0.7 + 11
    den = ((1 * 0.7 + 1) * 0.7 + 1) * 0.7 + 1
    assert out[4] == pytest.approx(round(num / den, 6))


def test_ewma_window_bound_limits_history(spark):
    """window_rows=1 → only the previous row participates."""
    from sensordatapipelines_spark.operators.temporal import ewma

    rows = [
        (1, "s", "2024-01-01 00:00:00", 100.0),
        (2, "s", "2024-01-01 00:01:00", 0.0),
        (3, "s", "2024-01-01 00:02:00", 0.0),
        (4, "s", "2024-01-01 00:03:00", 0.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts string, value double")
    out = {
        r["event_id"]: r["value_ewma"]
        for r in ewma(df, key_col="k", alpha=0.5, window_rows=1,
                      order_tiebreak="event_id").collect()
    }
    assert out[3] == 0.0 and out[4] == 0.0  # row 1 aged out of the frame


def test_retention_cohorts_grid(spark):
    """Two users cohorted week 1; one returns in week 2 → retention 0.5 at
    offset 1; a week-2 user forms its own cohort at offset 0."""
    from sensordatapipelines_spark.operators.temporal import retention_cohorts

    rows = [
        (1, "2024-01-01 10:00:00"),  # Monday week 1
        (2, "2024-01-02 10:00:00"),
        (1, "2024-01-08 10:00:00"),  # user 1 returns week 2
        (3, "2024-01-09 10:00:00"),  # new cohort week 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string")
    out = {
        (r["cohort_week"], r["week_offset"]): r
        for r in retention_cohorts(df).collect()
    }
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 0)]["retention"] == 1.0
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention"] == 0.5
    assert out[("2024-01-08", 0)]["cohort_size"] == 1


def test_touch_attribution_first_last(spark):
    """Purchase attributes to first AND last prior click; a purchase with
    no prior touch keeps NULLs; later clicks don't leak backwards."""
    from sensordatapipelines_spark.operators.temporal import touch_attribution

    rows = [
        (10, 1, "click", "2024-01-01 00:00:00"),
        (11, 1, "view", "2024-01-01 00:01:00"),
        (12, 1, "click", "2024-01-01 00:02:00"),
        (13, 1, "purchase", "2024-01-01 00:03:00"),
        (14, 1, "click", "2024-01-01 00:04:00"),
        (20, 2, "purchase", "2024-01-01 00:00:30"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    )
    out = {
        r["conversion_id"]: r
        for r in touch_attribution(df, order_tiebreak="event_id").collect()
    }
    assert out[13]["first_touch_id"] == 10
    assert out[13]["last_touch_id"] == 12
    assert out[13]["n_touches"] == 2
    assert out[20]["first_touch_id"] is None and out[20]["n_touches"] == 0


def test_transition_matrix_probabilities(spark):
    """Transitions count consecutive pairs per key; probabilities
    normalize per from-state; cross-key boundaries never pair."""
    from sensordatapipelines_spark.operators.temporal import transition_matrix

    rows = [
        (1, 1, "a", "2024-01-01 00:00:00"),
        (2, 1, "b", "2024-01-01 00:01:00"),
        (3, 1, "a", "2024-01-01 00:02:00"),
        (4, 1, "b", "2024-01-01 00:03:00"),
        (5, 2, "b", "2024-01-01 00:00:30"),  # other user: no cross pair
        (6, 2, "c", "2024-01-01 00:01:30"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    )
    out = {
        (r["from_state"], r["to_state"]): r
        for r in transition_matrix(df, order_tiebreak="event_id").collect()
    }
    assert out[("a", "b")]["n"] == 2 and out[("a", "b")]["p"] == 1.0
    assert out[("b", "a")]["n"] == 1 and out[("b", "a")]["p"] == 0.5
    assert out[("b", "c")]["p"] == 0.5
    assert ("c", "a") not in out and ("a", "c") not in out


def test_time_to_convert_censoring_and_ordering(spark):
    """First signup → first purchase AT-OR-AFTER it; pre-signup purchases
    don't count; never-converting users keep a NULL delay."""
    from sensordatapipelines_spark.operators.temporal import time_to_convert

    rows = [
        (1, 1, "purchase", "2024-01-01 00:00:00"),  # before signup: ignored
        (2, 1, "signup", "2024-01-01 01:00:00"),
        (3, 1, "purchase", "2024-01-01 01:30:00"),
        (4, 2, "signup", "2024-01-01 00:00:00"),    # never converts
        (5, 3, "view", "2024-01-01 00:00:00"),      # never signs up: absent
        # user 4: ONLY pre-signup purchases — must still surface as a
        # right-censored NULL row, not vanish (the filter-vs-null bug)
        (6, 4, "purchase", "2024-01-01 00:00:00"),
        (7, 4, "signup", "2024-01-01 02:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    )
    out = {r["key"]: r for r in time_to_convert(df).collect()}
    assert out[1]["delay_s"] == 1800.0
    assert out[2]["delay_s"] is None
    assert 3 not in out
    assert 4 in out and out[4]["delay_s"] is None


def test_deseasonalized_anomalies_respects_seasonality(spark):
    """A value normal FOR ITS HOUR is not an anomaly even if globally
    extreme; a value abnormal for its hour is flagged; degenerate cells
    (n<2 or zero variance) flag nothing."""
    from sensordatapipelines_spark.operators.temporal import (
        deseasonalized_anomalies,
    )

    rows = (
        # hour 02: values near 100 (high baseline) with one low outlier
        [(i, 1, f"2024-01-0{d} 02:00:00", 100.0 + i) for d, i in zip(range(1, 8), range(7))]
        + [(100, 1, "2024-01-08 02:00:00", 10.0)]
        # hour 14: constant (zero variance -> no anomalies possible)
        + [(200 + i, 1, f"2024-01-0{i+1} 14:00:00", 50.0) for i in range(3)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    )
    out = {r["event_id"]: r["z"] for r in deseasonalized_anomalies(df, z_threshold=2.0).collect()}
    assert set(out) == {100}       # only the hour-02 outlier
    assert out[100] < -2.0


def test_scd2_lookup_point_in_time(spark):
    """Each event matches exactly the version valid at its instant; an
    event before the first version keeps NULLs; a transition-instant
    event belongs to the NEW version."""
    from sensordatapipelines_spark.operators.temporal import (
        scd2_compress,
        scd2_lookup,
    )

    rows = [
        (1, 1, "a", "2024-01-01 00:10:00"),
        (2, 1, "a", "2024-01-01 00:20:00"),
        (3, 1, "b", "2024-01-01 00:30:00"),  # transition instant
        (4, 1, "b", "2024-01-01 00:40:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    )
    hist = scd2_compress(ev, key_col="user_id", ts_col="ts",
                         state_col="event_type", order_tiebreak="event_id")
    early = spark.createDataFrame(
        [(0, 1, "x", "2024-01-01 00:00:00")],
        "event_id long, user_id long, event_type string, ts string",
    )
    out = scd2_lookup(ev.unionByName(early), hist)
    got = {
        r["event_id"]: (r["version"], r["event_type"])
        for r in out.select(
            "e.event_id", "h.version", "h.event_type"
        ).collect()
    }
    assert got[1] == (1, "a") and got[2] == (1, "a")
    assert got[3] == (2, "b")          # transition event -> new version
    assert got[4] == (2, "b")
    assert got[0] == (None, None)      # before history begins


def test_linear_attribution_shares_and_reset(spark):
    from sensordatapipelines_spark.operators.temporal import linear_attribution

    rows = [
        # user A: 2 clicks -> purchase P1 (credit 0.5 each), then click -> P2
        (1, "u", "2024-01-01 00:00:01", "click"),
        (2, "u", "2024-01-01 00:00:02", "click"),
        (3, "u", "2024-01-01 00:00:03", "purchase"),
        (4, "u", "2024-01-01 00:00:04", "click"),
        (5, "u", "2024-01-01 00:00:05", "purchase"),
        (6, "u", "2024-01-01 00:00:06", "click"),   # after last purchase -> dropped
        (7, "v", "2024-01-01 00:00:01", "view"),    # non-touch -> ignored
        (8, "v", "2024-01-01 00:00:02", "purchase"),  # conversion with no touches
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts string, event_type string"
    )
    out = {
        r.touch_id: r
        for r in linear_attribution(df, order_tiebreak="event_id").collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1].conversion_id == 3 and out[1].credit == 0.5 and out[1].n_touches == 2
    assert out[2].conversion_id == 3 and out[2].touch_rank == 2
    assert out[4].conversion_id == 5 and out[4].credit == 1.0


def test_position_attribution_u_shape(spark):
    from sensordatapipelines_spark.operators.temporal import linear_attribution

    rows = [
        (1, "u", "2024-01-01 00:00:01", "click"),
        (2, "u", "2024-01-01 00:00:02", "click"),
        (3, "u", "2024-01-01 00:00:03", "click"),
        (4, "u", "2024-01-01 00:00:04", "click"),
        (5, "u", "2024-01-01 00:00:05", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts string, event_type string"
    )
    out = {
        r.touch_id: r.credit
        for r in linear_attribution(
            df, order_tiebreak="event_id", model="position"
        ).collect()
    }
    assert out == {1: 0.4, 2: 0.1, 3: 0.1, 4: 0.4}
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_km_survival_textbook_example(spark):
    """The classic worked KM example: times 1,2+,3,4+,5 (+= censored):
    S(1)=4/5=0.8, S(3)=0.8*(2/3)=0.5333, S(5)=0."""
    from sensordatapipelines_spark.operators.temporal import km_survival

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)],
        "duration_s double, converted int",
    )
    out = {r.t: r for r in km_survival(df).collect()}
    assert set(out) == {1.0, 3.0, 5.0}  # steps at event times only
    assert (out[1.0].n_risk, out[1.0].n_events) == (5, 1)
    assert out[1.0].survival == 0.8
    assert (out[3.0].n_risk, out[3.0].survival) == (3, 0.533333)
    assert (out[5.0].n_risk, out[5.0].survival) == (1, 0.0)  # d == n pins 0


def test_cusum_matches_direct_recursion(spark):
    """Closed form S_i = P_i - min(0, min P_j) must equal the textbook
    recursion S_i = max(0, S_{i-1} + d_i), and a mean shift must alarm
    after the shift, never before."""
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import cusum_changepoints

    base = dt.datetime(2024, 1, 1)
    vals = [0.0, 1.0, -1.0, 0.5, -0.5] * 8 + [4.0] * 12  # shift at i=40
    rows = [
        ("s1", i, base + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "g string, i long, ts timestamp, v double")
    out = cusum_changepoints(
        df, "g", "ts", "v", slack_k=0.5, threshold_h=3.0, tiebreak="i"
    ).collect()
    alarmed = sorted(r.i for r in out)
    assert alarmed and min(alarmed) >= 40, alarmed

    # direct recursion on the standardized series
    import statistics

    mu = statistics.fmean(vals)
    sd = statistics.pstdev(vals)
    s, first = 0.0, None
    for i, v in enumerate(vals):
        s = max(0.0, s + ((v - mu) / sd - 0.5))
        if s > 3.0 and first is None:
            first = i
    assert first == min(alarmed)
    by_i = {r.i: r for r in out}
    # recompute s fully and compare the reported accumulator values
    s = 0.0
    for i, v in enumerate(vals):
        s = max(0.0, s + ((v - mu) / sd - 0.5))
        if i in by_i:
            assert abs(by_i[i].cusum_up - s) < 1e-5


def test_rolling_active_users_window_math(spark):
    """Hand-checkable WAU: users active on day d count for d..d+6; only
    days with their own activity emit rows."""
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import rolling_active_users

    d = lambda i: dt.datetime(2024, 3, 1 + i, 12, 0)  # noqa: E731
    rows = [
        ("a", d(0)), ("b", d(0)),      # day 0: a, b
        ("a", d(1)),                   # day 1: a
        ("c", d(9)),                   # day 9: c (gap — days 2..8 silent)
    ]
    df = spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id string, ts timestamp"
    )
    out = {str(r.day): (r.dau, r.rolling_actives) for r in
           rolling_active_users(df, "ts", "user_id", window_days=7).collect()}
    assert out == {
        "2024-03-01": (2, 2),   # a, b
        "2024-03-02": (1, 2),   # trailing: a, b
        "2024-03-10": (1, 1),   # c only — a/b expired after day 7/8
    }


def test_seasonal_decompose_recovers_planted_seasonality(spark):
    """trend+seasonal+residual == value; a planted period-4 pattern on a
    linear trend is recovered with small residuals away from the edges."""
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import seasonal_decompose

    pattern = [2.0, -1.0, 0.5, -1.5]
    rows = [
        ("g", dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
         10.0 + 0.1 * i + pattern[i % 4])
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = seasonal_decompose(df, "g", "ts", "v", period=4).collect()
    assert len(out) == 48
    for r in out:
        if r.trend is None:
            assert r.residual is None
            continue
        assert abs(r.value - (r.trend + r.seasonal + r.residual)) < 1e-5
        assert abs(r.residual) < 0.2  # MA of a linear trend is exact
    # the 4 seasonal indices match the centered pattern
    seas = sorted({round(r.seasonal, 3) for r in out if r.seasonal is not None})
    assert seas == sorted(round(p - sum(pattern) / 4, 3) for p in pattern)


def test_cohort_ltv_curve_math(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import cohort_ltv

    rows = [
        # cohort 2024-01: two customers; c1 buys 10 in Jan, 20 in Feb;
        # c2 buys 30 in Jan
        (1, dt.datetime(2024, 1, 5), 10.0),
        (1, dt.datetime(2024, 2, 10), 20.0),
        (2, dt.datetime(2024, 1, 20), 30.0),
        # cohort 2024-02: one customer
        (3, dt.datetime(2024, 2, 1), 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, amt double")
    out = {(r.cohort_month, r.age_months): r for r in
           cohort_ltv(df, "k", "ts", "amt").collect()}
    r0 = out[("2024-01", 0)]
    assert r0.n_customers == 2 and r0.cum_revenue == 40.0 and r0.ltv_per_customer == 20.0
    r1 = out[("2024-01", 1)]
    assert r1.cum_revenue == 60.0 and r1.ltv_per_customer == 30.0
    r2 = out[("2024-02", 0)]
    assert r2.n_customers == 1 and r2.cum_revenue == 5.0


def test_gaps_islands_run_compaction(spark):
    from sensordatapipelines_spark.operators.temporal import gaps_islands

    rows = [("a", s) for s in (1, 2, 3, 7, 8, 12)] + [("b", s) for s in (5, 5, 6)]
    df = spark.createDataFrame(rows, "g string, s long")
    out = {(r.g, r.start_seq): (r.end_seq, r.run_len) for r in
           gaps_islands(df, "g", "s").collect()}
    assert out == {
        ("a", 1): (3, 3), ("a", 7): (8, 2), ("a", 12): (12, 1),
        ("b", 5): (6, 2),  # duplicate 5 deduped
    }


def test_interval_overlap_join_matches_theta_join(spark):
    from sensordatapipelines_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [("x", 0, 10), ("y", 20, 25), ("z", 100, 100)],
        "name string, start_seq long, end_seq long",
    )
    right = spark.createDataFrame(
        [("p", 5, 30), ("q", 26, 27), ("r", 99, 120)],
        "name string, start_seq long, end_seq long",
    )
    out = {(r.l_name, r.r_name): (r.overlap_start, r.overlap_end, r.overlap_len)
           for r in interval_overlap_join(
               left, right, ["name"], ["name"], bucket_size=7).collect()}
    # brute-force truth
    L = [("x", 0, 10), ("y", 20, 25), ("z", 100, 100)]
    R = [("p", 5, 30), ("q", 26, 27), ("r", 99, 120)]
    truth = {}
    for ln, ls, le in L:
        for rn, rs, re_ in R:
            if ls <= re_ and rs <= le:
                truth[(ln, rn)] = (max(ls, rs), min(le, re_),
                                   min(le, re_) - max(ls, rs) + 1)
    assert out == truth


def test_seasonal_naive_mape_perfect_cycle_scores_zero(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import seasonal_naive_mape

    pattern = [10.0, 20.0, 30.0, 40.0]
    rows = [
        ("g", dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), pattern[i % 4])
        for i in range(16)
    ]
    # a second group with a drifting series → nonzero MAPE
    rows += [
        ("h", dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), 10.0 + i)
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r.g: r for r in seasonal_naive_mape(df, "g", "ts", "v", period=4).collect()}
    assert out["g"].n_scored == 12 and out["g"].mape == 0.0
    assert out["h"].n_scored == 12 and out["h"].mape > 0.0


def test_autocorr_detects_planted_period(spark):
    import datetime as dt
    import math

    from sensordatapipelines_spark.operators.temporal import grouped_autocorr

    rows = [
        ("g", dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
         math.sin(2 * math.pi * i / 8))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r.lag: r.r for r in
           grouped_autocorr(df, "g", "ts", "v", lags=(4, 8), scale=1e6).collect()}
    assert out[8] > 0.99   # full period → strong positive
    assert out[4] < -0.99  # half period → strong negative


def test_theil_sen_exact_line(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import theil_sen_trend

    # exact line v = 2.5/h with one wild outlier: the median slope holds
    base = dt.datetime(2024, 1, 1)
    rows = [("g", base + dt.timedelta(hours=i), 2.5 * i, i) for i in range(10)]
    rows[5] = ("g", rows[5][1], 1000.0, 5)
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double, i long")
    out = theil_sen_trend(df, "g", "ts", "v", "i", min_points=5).collect()
    assert len(out) == 1
    assert out[0].n_points == 10
    assert out[0].n_pairs == 45
    assert abs(out[0].slope_per_hour - 2.5) < 1e-6

    # min_points gate drops short series
    short = spark.createDataFrame(rows[:4], "g string, ts timestamp, v double, i long")
    assert theil_sen_trend(short, "g", "ts", "v", "i", min_points=5).count() == 0


def test_mann_kendall_monotone(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import mann_kendall

    base = dt.datetime(2024, 1, 1)
    inc = [("up", base + dt.timedelta(hours=i), float(i), i) for i in range(10)]
    dec = [("dn", base + dt.timedelta(hours=i), float(-i), i) for i in range(10)]
    df = spark.createDataFrame(inc + dec, "g string, ts timestamp, v double, i long")
    out = {r.g: r for r in mann_kendall(df, "g", "ts", "v", "i", min_points=5).collect()}
    assert out["up"].s_stat == 45 and out["up"].n_pairs == 45
    assert out["dn"].s_stat == -45 and out["dn"].n_pairs == 45


def test_ohlc_resample_ties(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import ohlc_resample

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        ("k", t0, 5.0, 2),
        ("k", t0, 1.0, 1),             # same second: event_id breaks the tie
        ("k", t0 + dt.timedelta(minutes=30), 9.0, 3),
        ("k", t0 + dt.timedelta(minutes=59), 4.0, 4),
        ("k", t0 + dt.timedelta(hours=1), 7.0, 5),   # next bar
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, i long")
    out = {r.bucket_epoch: r for r in
           ohlc_resample(df, "ts", "k", "v", "i").collect()}
    bars = sorted(out)
    b0 = out[bars[0]]
    assert (b0.open, b0.high, b0.low, b0.close, b0.n_obs) == (1.0, 9.0, 1.0, 4.0, 4)
    b1 = out[bars[1]]
    assert (b1.open, b1.close, b1.n_obs) == (7.0, 7.0, 1)


def test_sax_words_shape_invariance_and_determinism(spark):
    """SAX words are offset/scale invariant (z-normalization), flat
    series emit all-'b' by guard, short series are dropped."""
    from datetime import datetime, timedelta

    from sensordatapipelines_spark.operators.temporal import sax_words

    t0 = datetime(2024, 1, 1)
    rows = []
    base = [1, 2, 3, 4, 5, 6, 7, 8, 8, 7, 6, 5, 4, 3, 2, 1]
    for i, v in enumerate(base):
        rows.append((1, t0 + timedelta(hours=i), float(v), i))
        # user 2: affine transform of user 1 -> same word
        rows.append((2, t0 + timedelta(hours=i), 100.0 + 10.0 * v, 100 + i))
    for i in range(16):  # user 3: flat
        rows.append((3, t0 + timedelta(hours=i), 5.0, 200 + i))
    for i in range(8):  # user 4: too short
        rows.append((4, t0 + timedelta(hours=i), float(i), 300 + i))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    out = {r.user_id: r for r in sax_words(
        df, "user_id", "ts", "value", "event_id", segments=8, min_points=16
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].sax_word == out[2].sax_word  # affine invariance
    assert len(out[1].sax_word) == 8
    # rise-then-fall: word ascends into d then descends back
    assert out[1].sax_word[0] == "a" and "d" in out[1].sax_word
    assert out[1].sax_word == out[1].sax_word  # deterministic re-read
    assert out[3].sax_word == "b" * 8  # flat-series guard


def test_mad_anomaly_planted_outliers(spark):
    """A tight cluster plus two planted far-out points: the robust gate
    flags exactly the planted rows, and the scaled integer encodings
    carry the exact median/MAD."""
    from sensordatapipelines_spark.operators.temporal import mad_anomaly

    rows = [("a", 10.0 + 0.01 * i) for i in range(-5, 6)]  # med 10.0, MAD .03
    rows += [("a", 99.0), ("a", -50.0)]  # planted anomalies
    rows += [("b", 1.0), ("b", 1.0), ("b", 1.0)]  # zero-MAD group
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r.event_type: r for r in mad_anomaly(df, "event_type", "value").collect()}
    a = out["a"]
    assert a.n_rows == 13 and a.n_anomalies == 2
    assert a.med_x2_e6 == 2 * 10_000_000  # median exactly 10.0
    # MAD: deviations e6 = [0,1,1,2,2,3,3,4,4,5,5]e4 + two huge -> median dev 3e4
    assert a.mad_x4_e6 == 4 * 30_000
    b = out["b"]
    assert b.n_anomalies == 0 and b.mad_x4_e6 == 0  # zero MAD: no |d|>0 flags? all d=0


def test_mad_anomaly_even_odd_parity_and_plan(spark):
    """r10 fused-window rewrite: the 2·median is the SUM of the two middle
    order statistics for even n (no doubling) and double the single middle
    for odd n — pinned for both parities per key; and the whole query
    plans with ZERO joins and ONE key exchange (the r9 aggregate+join form
    carried 12 joins and rebuilt the scan per consumer)."""
    from sensordatapipelines_spark.operators.temporal import mad_anomaly

    rows = [("e", v) for v in (1.0, 2.0, 4.0, 8.0)]  # even: med2 = (2+4)e6
    rows += [("o", v) for v in (1.0, 2.0, 7.0)]  # odd: med2 = 2*2e6
    df = spark.createDataFrame(rows, "k string, value double")
    res = mad_anomaly(df, "k", "value")
    out = {r.k: r for r in res.collect()}
    assert out["e"].med_x2_e6 == (2_000_000 + 4_000_000) and out["e"].n_rows == 4
    assert out["o"].med_x2_e6 == 2 * 2_000_000 and out["o"].n_rows == 3
    # even-n MAD: devs2 = |2v-6e6| = [4,2,2,10]e6 -> sorted [2,2,4,10] -> mad4 = 2+4 = 6e6? no:
    # mad4 = sum of two middle dev2s = 2e6+4e6
    assert out["e"].mad_x4_e6 == 2_000_000 + 4_000_000
    plan = res._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan, "fused mad must not join"
    assert plan.count("Exchange hashpartitioning") == 1, "one key exchange"


def test_markov_transitions_known_sequence(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "a", "b", "c", "a"]  # a->b x2, b->a, b->c, c->a
    rows = [(1, t0 + dt.timedelta(hours=i), s, i) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, state string, event_id long")
    got = {
        (r.from_state, r.to_state): (r.n, r.p_e6)
        for r in markov_transitions(df, "user_id", "ts", "state", "event_id").collect()
    }
    assert got == {
        ("a", "b"): (2, 1_000_000),
        ("b", "a"): (1, 500_000),
        ("b", "c"): (1, 500_000),
        ("c", "a"): (1, 1_000_000),
    }


def test_runs_test_alternating_and_trending(spark):
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import runs_test

    t0 = dt.datetime(2024, 1, 1)
    # alternating around median -> many runs; trending -> exactly 2 runs
    alt = [10.0, 20.0] * 5          # median 15: sides -+-+... -> 10 runs
    trend = [float(i) for i in range(10)]  # median 4.5: 5 below then 5 above
    rows = [("alt", t0 + dt.timedelta(hours=i), v, i) for i, v in enumerate(alt)]
    rows += [("tr", t0 + dt.timedelta(hours=i), v, i) for i, v in enumerate(trend)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, i long")
    out = {r.k: r for r in runs_test(df, "k", "ts", "v", "i").collect()}
    assert (out["alt"].n_above, out["alt"].n_below, out["alt"].n_runs) == (5, 5, 10)
    assert (out["tr"].n_above, out["tr"].n_below, out["tr"].n_runs) == (5, 5, 2)


def test_burstiness_gate_shapes(spark):
    """Constant hourly rate -> Fano numerator 0; a bursty series -> > 0.
    (Gate-level aggregates; the operator is inline in the entry file.)"""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(10):
        for _ in range(3):  # constant 3/hour
            rows.append(("flat", t0 + dt.timedelta(hours=h, minutes=5)))
    rows += [("burst", t0 + dt.timedelta(hours=0, minutes=m)) for m in range(20)]
    rows += [("burst", t0 + dt.timedelta(hours=5, minutes=1))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    hourly = df.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(3600)).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    out = {
        r.event_type: r
        for r in hourly.groupBy("event_type")
        .agg(
            (F.count(F.lit(1)) * F.sum(F.col("c") * F.col("c"))
             - F.sum("c") * F.sum("c")).alias("num"),
            (F.count(F.lit(1)) * F.sum("c")).alias("den"),
        )
        .collect()
    }
    assert out["flat"].num == 0
    assert out["burst"].num > 0


def test_time_rollup_sum_survives_clamped_magnitudes(spark):
    """ADVICE r8: the rollup sum accumulates e6-quantized BIGINTs whose
    per-row terms reach 1e16 at QUANT_CLAMP; 2000 such rows overflow an
    int64 accumulator (~923-row headroom) under non-ANSI mode. The
    DECIMAL(38,0) accumulator must return the exact total instead of a
    silently wrapped one."""
    import datetime as dt

    from sensordatapipelines_spark.operators.temporal import time_rollup

    spark.conf.set("spark.sql.ansi.enabled", "false")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, i % 60), 1e10) for i in range(2000)],
        "sensor_id long, ts timestamp, value double",
    )
    out = {
        r["resolution"]: r["sum_value"]
        for r in time_rollup(df, resolutions=("day",)).collect()
    }
    assert out["day"] == 2000 * 1e10
