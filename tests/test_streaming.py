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


def test_stream_sessionize_multibatch_state_carry(spark, tmp_path):
    """Two micro-batches: the open tail session must extend across the batch
    boundary (state carry), and a later-gap event must open a new session."""
    import os

    from sensordatapipelines_spark.streaming import stream_sessionize

    path = str(tmp_path / "sess_mb")
    os.makedirs(path)
    schema = "user_id long, ts timestamp, event_id long"
    b1 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0), 1),
         (1, dt.datetime(2024, 1, 1, 10, 10, 0), 2)], schema
    )
    b2 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 20, 0), 3),   # continues session 1
         (1, dt.datetime(2024, 1, 1, 12, 0, 0), 4)], schema  # new session
    )
    b1.coalesce(1).write.parquet(f"{path}/f1")
    b2.coalesce(1).write.parquet(f"{path}/f2")
    # Force deterministic file order: f2 strictly newer than f1.
    now = 1_700_000_000
    for i, d in enumerate(["f1", "f2"]):
        for f in os.listdir(f"{path}/{d}"):
            os.utime(f"{path}/{d}/{f}", (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/f*")
    )
    out = stream_sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sess_mb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from t_sess_mb").collect()
    # Update mode re-emits: take the final (max n_events) row per session.
    final = {}
    for r in rows:
        k = (r["user_id"], r["session_id"])
        if k not in final or r["n_events"] > final[k]["n_events"]:
            final[k] = r
    assert final[(1, 1)]["n_events"] == 3                       # extended across batches
    assert final[(1, 1)]["session_end_epoch"] == int(
        dt.datetime(2024, 1, 1, 10, 20, 0, tzinfo=dt.timezone.utc).timestamp()
    )
    assert final[(1, 2)]["n_events"] == 1                       # post-gap new session


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


def test_stream_running_stats_builds_tws_graph(spark, tmp_path):
    """transformWithStateInPandas operator: the transformation graph and
    output schema build correctly (environment-independent)."""
    from sensordatapipelines_spark.streaming import stream_running_stats

    df = spark.createDataFrame([(1, 10.0)], "user_id long, value double")
    stage = str(tmp_path / "tws_stage")
    df.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(df.schema).parquet(stage)
    out = stream_running_stats(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n", "sum_value", "min_value", "max_value",
    ]
    plan = out._jdf.queryExecution().logical().toString()
    assert "TransformWithStateInPySpark" in plan


def test_stream_running_stats_executes_and_matches_batch(spark, tmp_path):
    """EXECUTED transformWithStateInPandas: the single-batch run of the
    running-stats StatefulProcessor equals the batch aggregate — the
    equivalence claim, now exercised for real. The streaming Python runner
    needs google.protobuf; ensure_streaming_protobuf provisions it (real
    install, or the Cloud-SDK-vendored runtime through the aliasing shim)
    and the test skips only where neither exists."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sensordatapipelines_spark.streaming import stream_running_stats
    from sensordatapipelines_spark.streaming.stateful import (
        ensure_streaming_protobuf,
    )

    if not ensure_streaming_protobuf():
        _pytest.skip("no protobuf available for the streaming runner")

    df = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (2, 10.0), (2, None), (3, -1.0)],
        "user_id long, value double",
    )
    stage = str(tmp_path / "tws_exec")
    df.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(df.schema).parquet(stage)
    out = stream_running_stats(stream)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("tws_exec")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "tws_ck"))
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["user_id"]: (r["n"], r["sum_value"], r["min_value"], r["max_value"])
            for r in spark.table("tws_exec").collect()
        }
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    expect = {
        r["user_id"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == expect


def test_stream_to_zordered_clustered_landing(spark, tmp_path):
    """foreachBatch z-ordered sink: streamed points land spatially
    clustered (per-file lon ranges are narrow vs the full extent) and the
    batch subdirectory layout is idempotent-by-construction."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sensordatapipelines_spark.streaming.interval_agg import stream_to_zordered

    src = str(tmp_path / "src")
    spark.range(1024).select(
        (F.col("id") % 32 * 0.01).alias("lon"),
        (F.floor(F.col("id") / 32) * 0.01).alias("lat"),
    ).write.parquet(src)
    stream = spark.readStream.schema("lon double, lat double").parquet(src)
    out = str(tmp_path / "landing")
    q = stream_to_zordered(
        stream, out, cell_size=0.01, files_per_batch=8, query_name="z_land"
    )
    q.awaitTermination(120)
    files = glob.glob(f"{out}/batch=*/part-*.parquet")
    assert files
    total = 0
    extent = 0.31
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += md.num_rows
        st = {
            md.row_group(0).column(i).path_in_schema: md.row_group(0).column(i).statistics
            for i in range(md.row_group(0).num_columns)
        }
        # each file covers a narrow lon slice of the full extent
        assert (st["lon"].max - st["lon"].min) <= extent / 2
    assert total == 1024


def test_neardedup_batch_handler_state_versioning(spark, tmp_path):
    """foreachBatch near-dedup: versioned parquet state gives the batch
    day-over-day result, and re-running a batch (restart) is idempotent —
    it reads the same prior state version and rewrites the same output."""
    from sensordatapipelines_spark.streaming.stateful import (
        neardedup_batch_handler,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "a"),
            (3, "totally different text about calibration data", "a"),
            (2, "the quick brown fox jumps over the lazy dog", "b"),  # dup of 1
            (4, "another unrelated document entirely here now", "b"),
        ],
        "doc_id long, text string, source string",
    )
    state_dir, out_dir = str(tmp_path / "state"), str(tmp_path / "out")
    handler = neardedup_batch_handler(
        state_dir, out_dir, num_hashes=16, band_rows=2, threshold=0.5, seed=7, n=3
    )
    day1 = docs.filter("doc_id IN (1, 3)")
    day2 = docs.filter("doc_id IN (2, 4)")
    handler(day1, 0)
    handler(day2, 1)
    out = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert out == {1, 3, 4}  # doc 2 suppressed by day-1's state
    # restart of batch 1: same prior state (v0), same survivors
    handler(day2, 1)
    out2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert out2 == out
    import os

    assert sorted(d for d in os.listdir(state_dir)) == ["v0", "v1"]
