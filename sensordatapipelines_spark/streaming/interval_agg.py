"""Structured Streaming extension (SURVEY.md §2.6 "Streaming").

The reference is all batch; its A4 semantics (per-sensor stats within
hour-of-day intervals) are re-expressed over an event stream as:

- ``stream_windowed_aggregate``: event-time tumbling/sliding windows +
  watermark for late sensor data — the canonical streaming shape.
- ``stream_interval_aggregate``: A4's hour-interval conditional aggregation
  applied per (window, sensor) group, so each emitted row carries the same
  ``{func}_{col}_{interval}`` stat columns the batch operator produces.

State sizing note for scale: state is keyed by (window, sensor); the
watermark bounds state growth; skewed sensors are fine because the state
store partitions by the full grouping key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.temporal import (
    DEFAULT_HOUR_INTERVALS,
    interval_agg_exprs,
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema=None,
    fmt: str = "parquet",
    max_files_per_trigger: int = 4,
    ts_col: str = "ts",
) -> DataFrame:
    """File-based streaming source over an events directory. For production
    the same query runs off Kafka by swapping the reader; the transformation
    graph is source-agnostic.

    Any TIMESTAMP_NTZ event-time column is cast to TIMESTAMP on read:
    ``withWatermark`` hard-requires the instant type
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and with the session timezone
    pinned to UTC the cast is value-preserving."""
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def stream_windowed_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    sensor_col: str = "user_id",
    value_cols: Sequence[str] = ("value",),
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str = "2 hours",
    funcs: Sequence[str] = ("mean", "max", "count"),
) -> DataFrame:
    """Event-time windowed per-sensor aggregation with a watermark for late
    data. Output: one row per (window, sensor) with ``{func}_{col}`` stats."""
    from sensordatapipelines_spark.operators.aggregates import BUILTIN_AGGS

    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    exprs = [
        BUILTIN_AGGS[f](F.col(c)).alias(f"{f}_{c}") for f in funcs for c in value_cols
    ]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), F.col(sensor_col))
        .agg(*exprs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            sensor_col,
            *[f"{f}_{c}" for f in funcs for c in value_cols],
        )
    )


def stream_interval_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    sensor_col: str = "user_id",
    value_cols: Sequence[str] = ("value",),
    hour_intervals: Sequence[tuple[str, str]] = DEFAULT_HOUR_INTERVALS,
    funcs: Sequence[str] = ("mean", "max"),
    window_duration: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """A4-over-streams: per (daily window, sensor), conditional hour-interval
    stats identical in shape to the batch ``time_series_aggregate`` output —
    the streaming and batch operators share the same expression builder, so
    semantics cannot drift."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("window"), F.col(sensor_col))
        .agg(*interval_agg_exprs(ts_col, value_cols, hour_intervals, funcs))
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def stream_to_zordered(
    stream: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_size: float = 0.005,
    files_per_batch: int = 4,
    query_name: str = "zordered_sink",
):
    """Continuously-clustered landing table: each micro-batch is written
    through ``write_zordered`` into a batch subdirectory, so file footer
    stats stay spatially tight as data streams in (readers glob
    ``path/batch=*``). ``foreachBatch`` + per-batch directory = idempotent
    on retry (a replayed batch overwrites its own directory, never
    another's). Periodic ``compact_dir`` keeps the file count bounded —
    the standard pairing for micro-batch sinks."""
    from sensordatapipelines_spark.sources.sinks import write_zordered

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        write_zordered(
            batch_df,
            f"{path}/batch={batch_id}",
            lon_col=lon_col,
            lat_col=lat_col,
            cell_size=cell_size,
            n_files=files_per_batch,
        )

    return (
        stream.writeStream.foreachBatch(_write)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
