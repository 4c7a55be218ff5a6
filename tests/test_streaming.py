"""Streaming extension tests: the streaming interval aggregation must agree
with the batch operator on the same data (shared expression builder)."""

import datetime as dt

from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.temporal import interval_agg_exprs
from sensordatapipelines_spark.streaming import (
    read_events_stream,
    stream_interval_aggregate,
    stream_windowed_aggregate,
)


def _write_events(spark, path):
    rows = [
        (dt.datetime(2024, 1, 1, 10, 0, 0), 1, 5.0),
        (dt.datetime(2024, 1, 1, 12, 0, 0), 1, 7.0),
        (dt.datetime(2024, 1, 1, 23, 30, 0), 1, 100.0),
        (dt.datetime(2024, 1, 1, 11, 0, 0), 2, 9.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    df.write.mode("overwrite").parquet(path)
    return df


def test_stream_interval_agg_matches_batch(spark, tmp_path):
    path = str(tmp_path / "events")
    batch_df = _write_events(spark, path)
    stream = read_events_stream(spark, path)
    out = stream_interval_aggregate(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("t_interval")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r
        for r in spark.sql("select * from t_interval").collect()
    }
    # batch equivalent over the same day
    batch = {
        r["user_id"]: r
        for r in batch_df.groupBy("user_id")
        .agg(*interval_agg_exprs("ts", ["value"], (("09:00:00", "17:00:00"), ("22:00:00", "05:00:00"))))
        .collect()
    }
    for uid in (1, 2):
        assert got[uid]["mean_value_090000_170000"] == batch[uid]["mean_value_090000_170000"]
        assert got[uid]["max_value_220000_050000"] == batch[uid]["max_value_220000_050000"]


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from sensordatapipelines_spark.operators.temporal import sessionize
    from sensordatapipelines_spark.streaming import stream_sessionize

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), 101),
        (1, dt.datetime(2024, 1, 1, 10, 10, 0), 102),   # same session (gap 10m)
        (1, dt.datetime(2024, 1, 1, 12, 0, 0), 103),    # new session (gap > 30m)
        (2, dt.datetime(2024, 1, 1, 9, 0, 0), 201),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    path = str(tmp_path / "sess_events")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    out = stream_sessionize(read_events_stream(spark, path), gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sess")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["session_start_epoch"], r["session_end_epoch"]
        )
        for r in spark.sql("select * from t_sess").collect()
    }
    batch = (
        sessionize(df, ts_col="ts", sensor_col="user_id", gap_seconds=1800,
                   order_tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.unix_timestamp(F.min("ts")).alias("s"),
            F.unix_timestamp(F.max("ts")).alias("e"),
        )
    )
    expected = {
        (r["user_id"], r["session_id"]): (r["n"], r["s"], r["e"])
        for r in batch.collect()
    }
    assert got == expected


def test_stream_windowed_agg_runs(spark, tmp_path):
    path = str(tmp_path / "events2")
    _write_events(spark, path)
    out = stream_windowed_aggregate(
        read_events_stream(spark, path), window_duration="6 hours", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_window")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from t_window").collect()
    assert len(rows) >= 2  # at least two (window, sensor) groups
    cols = set(rows[0].asDict())
    assert {"window_start", "window_end", "user_id", "mean_value", "count_value"} <= cols
