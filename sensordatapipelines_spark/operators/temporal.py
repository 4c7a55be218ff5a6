"""Temporal aggregation operators (reference A4/A5).

Re-expresses ``add_aggregated_time_series``
(``/root/reference/src/data_preprocessing.py:276-351`` + helper
``get_stats_temporal`` ``:563-585``) and ``do_time_analysis_sensors``
(``:619-637``) as single declarative Spark queries:

    readings → inclusive date-range filter → per-interval conditional
    aggregation (one pass, map-side partial agg) → left join onto sensors.

Semantic corners preserved from the reference (verified in SURVEY.md §2.3 A4):

- **Hour intervals are inclusive at both ends and wrap midnight**
  (pandas ``between_time('22:00','05:00')`` ⇒ hours {22,23,0..5} inclusive).
- **Date ranges are inclusive of the whole end day** (pandas partial-string
  ``.xs(slice(beg, end))`` semantics on a DatetimeIndex).
- **All intervals produce columns.** The reference's helper overwrites its
  ``stats`` accumulator per interval (``:571-584``) so only the *last*
  interval survives — a bug; the documented intent (``:301-302``) is
  per-interval columns, which is what this engine implements
  (ledger test: ``tests/test_temporal.py``).

Naming: the reference emits ``{col}('{beg}', '{end}')_{func}`` (``:341-343``);
the engine sanitizes to ``{func}_{col}_{HHMMSS}_{HHMMSS}`` so names are valid
SQL/parquet identifiers; the func-major product ordering is preserved.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sensordatapipelines_spark.operators.aggregates import BUILTIN_AGGS, agg_func_name
from sensordatapipelines_spark.registry import register

DEFAULT_HOUR_INTERVALS: tuple[tuple[str, str], ...] = (
    ("09:00:00", "17:00:00"),
    ("22:00:00", "05:00:00"),
)


def _tod_seconds(time_str: str) -> int:
    parts = [int(p) for p in time_str.split(":")]
    while len(parts) < 3:
        parts.append(0)
    h, m, s = parts[:3]
    return h * 3600 + m * 60 + s


def time_of_day_seconds(ts: Column) -> Column:
    """Seconds since local midnight of a timestamp column (JVM expression)."""
    return F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)


def hour_interval_predicate(ts: Column, beg: str, end: str) -> Column:
    """Inclusive time-of-day predicate, wrapping midnight when ``beg > end``.

    Matches pandas ``DataFrame.between_time(beg, end)`` semantics used by the
    reference (``src/data_preprocessing.py:574``): ends inclusive; a window
    like ``('22:00','05:00')`` wraps and means ``tod >= beg OR tod <= end``.
    """
    tod = time_of_day_seconds(ts)
    b, e = _tod_seconds(beg), _tod_seconds(end)
    if b <= e:
        return (tod >= F.lit(b)) & (tod <= F.lit(e))
    return (tod >= F.lit(b)) | (tod <= F.lit(e))


def interval_tag(beg: str, end: str) -> str:
    return f"{beg.replace(':', '')}_{end.replace(':', '')}"


@register("date_range_filter")
def date_range_filter(df: DataFrame, ts_col: str, beg: str, end: str) -> DataFrame:
    """Inclusive date-range filter: ``beg 00:00:00 <= ts < end + 1 day``.

    Matches the reference's index slice ``df.xs(slice(beg, end))``
    (``:329-331``) — pandas datetime partial-string slicing includes the whole
    end day.
    """
    ts = F.col(ts_col)
    return df.filter(
        (ts >= F.to_timestamp(F.lit(beg)))
        & (ts < F.to_timestamp(F.date_add(F.to_date(F.lit(end)), 1)))
    )


def interval_agg_exprs(
    ts_col: str,
    columns: Sequence[str],
    hour_intervals: Sequence[tuple[str, str]],
    funcs: Sequence[str] = ("mean", "max"),
) -> list[Column]:
    """Func-major × interval × column conditional aggregates — one scan, no
    per-interval passes; partial aggregation happens map-side for free."""
    exprs: list[Column] = []
    for func in funcs:
        fname = agg_func_name(func)
        builder = BUILTIN_AGGS[fname]
        for beg, end in hour_intervals:
            pred = hour_interval_predicate(F.col(ts_col), beg, end)
            for col in columns:
                exprs.append(
                    builder(F.when(pred, F.col(col))).alias(
                        f"{fname}_{col}_{interval_tag(beg, end)}"
                    )
                )
    return exprs


@register("time_series_aggregate")
def time_series_aggregate(
    sensors: DataFrame,
    readings: DataFrame,
    ts_col: str,
    columns: Sequence[str],
    sensor_col: str = "sensor_id",
    sensors_id_col: str = "sensor_id",
    date_range: tuple[str, str] | None = None,
    hour_intervals: Sequence[tuple[str, str]] = DEFAULT_HOUR_INTERVALS,
    funcs: Sequence[str] = ("mean", "max"),
) -> DataFrame:
    """A4: per-sensor, per-hour-interval aggregation of a readings table,
    joined back onto the sensors table (left join — sensors without readings
    keep NULL stats, matching the reference's index join ``:344``).

    ``readings[sensor_col]`` links to ``sensors[sensors_id_col]`` — the
    explicit-column replacement for the reference's
    ``column_linked_sensors``/index linkage (``:311-328``; Spark has no index,
    SURVEY.md §1.1).
    """
    if date_range is not None:
        readings = date_range_filter(readings, ts_col, date_range[0], date_range[1])
    stats = readings.groupBy(F.col(sensor_col).alias("__sid")).agg(
        *interval_agg_exprs(ts_col, columns, hour_intervals, funcs)
    )
    joined = sensors.join(
        stats, on=sensors[sensors_id_col] == stats["__sid"], how="left"
    ).drop("__sid")
    return joined


@register("sessionize")
def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    sensor_col: str = "sensor_id",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Sessionization: split each sensor's event stream into sessions at gaps
    larger than ``gap_seconds``; emits one row per event with a per-sensor
    ``session_id`` (1-based). Classic lag + running-sum-of-boundaries — one
    shuffle on the sensor key, sort within partitions, no self-join.

    (Batch twin of Structured Streaming's ``session_window``; kept as an
    explicit operator so the oracle can replay it.)"""
    # cast-to-timestamp first: tolerates TIMESTAMP_NTZ inputs (unix_micros
    # rejects NTZ; the cast is a no-op on proper TIMESTAMP columns)
    # NULL event times cannot be sessionized: dropped on both engines
    # (and in the streaming twin) rather than glued to the last session
    df = df.filter(F.col(ts_col).isNotNull())
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [ts_us.asc_nulls_last()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_last())
    w = Window.partitionBy(sensor_col).orderBy(*order)
    gap = F.lit(gap_seconds * 1_000_000)
    new_session = F.when(
        (ts_us - F.lag(ts_us).over(w)) > gap, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    )


@register("moving_average")
def moving_average(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    sensor_col: str = "sensor_id",
    n_preceding: int = 3,
    order_tiebreak: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Per-sensor rolling mean over the last ``n_preceding``+1 observations
    (ROWS frame). Window over the sensor shuffle — no self-join."""
    order = [F.unix_micros(F.col(ts_col).cast("timestamp")).asc_nulls_last()]  # NTZ-tolerant
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_last())
    # the value itself is the FINAL key: duplicate (ts, tiebreak) rows
    # would otherwise order arbitrarily and shift the ROWS frame
    order.append(F.col(value_col).asc_nulls_last())
    w = (
        Window.partitionBy(sensor_col)
        .orderBy(*order)
        .rowsBetween(-n_preceding, Window.currentRow)
    )
    return df.withColumn(out_col or f"{value_col}_ma", F.avg(value_col).over(w))


@register("time_profile")
def time_profile(df: DataFrame, ts_col: str, sensor_col: str) -> DataFrame:
    """A5 ``do_time_analysis_sensors`` (``:619-637``): per-sensor min/max of
    the time column. The reference prints and returns nothing; the engine
    returns the profile as data (one row per sensor)."""
    return df.groupBy(sensor_col).agg(
        F.min(ts_col).alias("ts_min"),
        F.max(ts_col).alias("ts_max"),
        F.count(F.lit(1)).alias("n_obs"),
    )


@register("resample")
def resample(
    df: DataFrame,
    series_col: str = "sensor_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 900,
    how: str = "ffill",
) -> DataFrame:
    """Regularize each series onto a fixed time grid (the Spark twin of
    pandas ``df.resample(step).mean().ffill()`` / ``.interpolate()`` — the
    canonical sensor-series normalization the reference's time-series model
    (SURVEY.md §1.3, ``src/data_preprocessing.py:323-328``) implies but
    never provides).

    Plan (no per-series driver loop, no spine join):

    1. epoch-aligned bucket agg: ``avg(value)``/``count`` per
       ``(series, bucket)`` — one full-data shuffle with map-side partial
       agg (deliberately NOT pre-partitioned by series alone: that would
       move raw rows and concentrate each whole series on one task);
    2. ``lead(bucket)`` / ``lead(avg)`` over the series window — a second
       exchange, but of the already-reduced (series, bucket) rows only
       (≤ series × span/step rows regardless of input size);
    3. ``explode(sequence(bucket, next_bucket - step, step))`` emits the
       grid rows *map-side*, carrying the left observation forward
       (``ffill``) or blending toward the right one (``linear``).

    Versus the join-onto-spine formulation this saves the spine build AND
    its shuffle join; gap rows materialize only in the exploding map task.
    At 100 TB the state per series is one row (the lead), and output size
    is grid-bounded: series × (span/step). Dense series (every bucket
    occupied) emit exactly one row per bucket — the explode degenerates to
    a 1-element sequence.

    Output: ``(series, grid_ts, value_rs, n_obs)`` where ``n_obs = 0``
    marks synthesized gap rows. ``how='linear'``: gap rows get
    ``v + (next_v - v) * pos / gap_steps`` (exact at both endpoints);
    trailing rows (no next observation) keep their own value, matching
    pandas ``interpolate(limit_area='inside')``.
    """
    if how not in ("ffill", "linear"):
        raise ValueError(f"unknown resample mode {how!r}")
    step = int(step_seconds)
    # DIV (trunc toward zero), matching the oracle's epoch_ns // (step·1e9)
    # on pre-1970 timestamps; FLOOR of a double division diverges there
    bucket = F.timestamp_seconds(
        F.expr(
            f"unix_timestamp(CAST({ts_col} AS TIMESTAMP)) DIV {step}"
        )
        * step
    )
    per = (
        df.groupBy(F.col(series_col).alias("__s"), bucket.alias("__b"))
        .agg(F.avg(value_col).alias("__v"), F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("__s").orderBy(F.asc_nulls_last("__b"))
    step_iv = F.expr(f"INTERVAL {step} SECONDS")
    g = per.withColumn("__nb", F.lead("__b").over(w)).withColumn(
        "__nv", F.lead("__v").over(w)
    )
    grid = g.select(
        "__s",
        "__b",
        "__v",
        "__n",
        "__nb",
        "__nv",
        F.explode(
            F.sequence(
                F.col("__b"),
                F.coalesce(F.col("__nb") - step_iv, F.col("__b")),
                step_iv,
            )
        ).alias("grid_ts"),
    )
    pos = (F.unix_timestamp("grid_ts") - F.unix_timestamp("__b")) / step
    gap_steps = (F.unix_timestamp("__nb") - F.unix_timestamp("__b")) / step
    if how == "linear":
        filled = F.col("__v") + (F.col("__nv") - F.col("__v")) * pos / gap_steps
    else:
        filled = F.col("__v")
    return grid.select(
        F.col("__s").alias(series_col),
        "grid_ts",
        F.when(F.col("grid_ts") == F.col("__b"), F.col("__v"))
        .otherwise(filled)
        .alias("value_rs"),
        F.when(F.col("grid_ts") == F.col("__b"), F.col("__n"))
        .otherwise(F.lit(0).cast("long"))
        .alias("n_obs"),
    )


@register("time_rollup")
def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "sensor_id",
    value_col: str = "value",
    resolutions: tuple[str, ...] = ("day", "hour", "minute"),
    round_digits: int = 2,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: per key, aggregates at
    EVERY resolution of a time hierarchy (e.g. minute→hour→day) in ONE scan.

    Plan shape: truncate the timestamp once per resolution (map-side
    expressions), then a single ``ROLLUP`` over (key, coarse…fine) — Spark
    expands it to one Expand + one hash aggregation with map-side partials,
    so the fact table is read and shuffled once for all resolutions (vs one
    scan per materialized view in the naive formulation). Grouping levels
    outside the hierarchy (key-only, grand total) are filtered out by
    ``grouping_id``. At 100 TB the Expand multiplies rows ×(levels+2)
    before partial aggregation — the partials collapse each level to its
    bucket cardinality, so the shuffle carries only aggregated rows.

    ``resolutions`` must be ordered coarse → fine (a hierarchy — each finer
    bucket nests inside the previous); output rows carry the resolution
    label and the bucket start for that resolution.
    """
    buckets = {f"__r_{r}": F.date_trunc(r, F.col(ts_col)) for r in resolutions}
    bcols = list(buckets)
    g = (
        df.withColumns(buckets)
        .rollup(key_col, *bcols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # order-independent sum: e6-quantized BIGINTs, divided back and
            # rounded at round_digits (raw double sums are summation-order-
            # dependent across engines). The sum accumulates in
            # DECIMAL(38,0): per-row terms reach 1e16 at QUANT_CLAMP, so an
            # int64 accumulator would wrap silently after ~923 clamped rows
            # under the session's non-ANSI mode (the DuckDB oracle already
            # sums BIGINT into HUGEINT; this matches that headroom).
            (
                F.round(
                    F.sum(
                        quantize_e6(F.col(value_col)).cast("decimal(38,0)")
                    ).cast("double")
                    / F.lit(10.0 ** (6 - round_digits))
                )
                / F.lit(10.0 ** round_digits)
            ).alias("sum_value"),
            F.grouping_id().alias("__gid"),
        )
    )
    # grouping_id bit k (from the LEFT of the rollup column list) is 0 when
    # that column is grouped. ROLLUP over (key, c1..cn) yields prefixes:
    # keep exactly the levels where the key and a non-empty bucket prefix
    # are grouped: gid = 2^m - 1 for m trailing-ungrouped buckets.
    n = len(bcols)
    keep = {(1 << m) - 1: n - m for m in range(n)}  # gid -> #grouped buckets
    lvl = F.col("__gid")
    out = g.filter(lvl.isin(list(keep)))
    res_label = F.lit(None).cast("string")
    bucket_start = F.lit(None).cast("timestamp")
    for gid, depth in keep.items():
        res_label = F.when(lvl == gid, F.lit(resolutions[depth - 1])).otherwise(res_label)
        bucket_start = F.when(lvl == gid, F.col(bcols[depth - 1])).otherwise(bucket_start)
    return out.select(
        res_label.alias("resolution"),
        F.col(key_col),
        bucket_start.alias("bucket_start"),
        "n",
        "sum_value",
    )


@register("detect_gaps")
def detect_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "sensor_id",
    min_gap_seconds: int = 3600,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Sensor-outage / missing-interval detection (the gaps half of the
    gaps-and-islands pattern; ``sessionize`` is the islands half): per key,
    emit one row for every silence longer than ``min_gap_seconds`` between
    consecutive observations → ``(key, gap_start_epoch, gap_end_epoch,
    gap_seconds)``.

    One shuffle on the key, lag window, filter — the output is bounded by
    the number of gaps, never the number of observations."""
    keep = [F.col(key_col), F.col(ts_col).cast("timestamp").alias("__ts")]
    order = [F.col("__ts").asc_nulls_last()]
    if order_tiebreak:
        keep.append(F.col(order_tiebreak))
        order.append(F.col(order_tiebreak).asc_nulls_last())
    w = Window.partitionBy(key_col).orderBy(*order)
    cur = F.unix_timestamp(F.col("__ts"))
    return (
        df.select(*keep)
        .withColumn("__cur", cur)
        .withColumn("__prev", F.lag("__cur").over(w))
        .filter(F.col("__cur") - F.col("__prev") > min_gap_seconds)
        .select(
            F.col(key_col),
            F.col("__prev").alias("gap_start_epoch"),
            F.col("__cur").alias("gap_end_epoch"),
            (F.col("__cur") - F.col("__prev")).alias("gap_seconds"),
        )
    )


@register("time_weighted_average")
def time_weighted_average(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "sensor_id",
    value_col: str = "value",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Time-weighted average per series — the correct mean for IRREGULARLY
    sampled sensors (a plain AVG over-weights bursts): each observation
    holds until the next one, so the series integral is Σ valueᵢ·(tᵢ₊₁−tᵢ)
    over the observation span, divided by the span. Single-observation
    series fall back to their value.

    One key shuffle + lead window over (ts, value); the integral folds in
    the same aggregation — no self-join, no resample grid. Equal
    timestamps make the lead order ambiguous (a tied row's weight is 0
    except the last of the tie group) — pass ``order_tiebreak`` (a unique
    column) for full determinism, exactly as ``sessionize`` does.

    Determinism: the integral accumulates e6-quantized BIGINT terms in a
    DECIMAL(38,0) — a raw double Σ v·Δt is summation-order-dependent and
    on a ~4k-row series the engines landed one 1e-6 quantum apart (seed-2
    twin). Terms: q·Δt ≤ 1e16·~1e11 s, sum < 1e38 — exact."""
    ts = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("double")
    keep = [F.col(key_col), ts.alias("__t"), F.col(value_col).cast("double").alias("__v")]
    order = [F.col("__t").asc_nulls_last()]
    if order_tiebreak:
        keep.append(F.col(order_tiebreak))
        order.append(F.col(order_tiebreak).asc_nulls_last())
    # value as the final order key: rows tied on (ts, tiebreak) — e.g.
    # NULL ts + NULL id — otherwise hand the tie group's single nonzero
    # Δt to an engine-arbitrary member (seed-2 twin); after this key the
    # remaining ties are value-identical and the integral is invariant
    order.append(F.col("__v").asc_nulls_last())
    w = Window.partitionBy(key_col).orderBy(*order)
    stepped = df.select(*keep).withColumn("__nt", F.lead("__t").over(w))
    q = quantize_e6(F.col("__v")).cast("decimal(20,0)")
    dt = (F.col("__nt") - F.col("__t")).cast("decimal(12,0)")
    integral = F.sum(F.when(F.col("__nt").isNotNull(), q * dt))
    sum_q = F.sum(quantize_e6(F.col("__v")))
    span = F.max("__t") - F.min("__t")
    return stepped.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.round(
                F.when(span > 0, integral.cast("double") / span).otherwise(
                    sum_q.cast("double")
                    / F.count(quantize_e6(F.col("__v"))).cast("double")
                )
            )
            / F.lit(1e6)
        ).alias("twap"),
    )


@register("funnel")
def funnel(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: how many users reached stage i having passed
    stages 1..i-1 IN ORDER — stage i's timestamp is the earliest event of
    that type at-or-after the user's stage-(i-1) timestamp.

    Plan shape: ONE exchange on ``user_col``, then a cascade of per-stage
    window minimums over the same partitioning (Catalyst reuses the single
    shuffle for every WindowExec), a per-user ``distinct``, and a k-row
    conditional aggregate unpivoted to ``(stage_idx, stage, n_users,
    conversion)``. No self-joins, no events-sized shuffle beyond the first.
    ``conversion`` is relative to the previous stage (stage 1 → 1.0; a
    starved stage propagates 0 users and null conversion)."""
    if not stages:
        raise ValueError("funnel requires at least one stage")
    w = Window.partitionBy(user_col)
    ts = F.col(ts_col)
    out = df.select(user_col, ts_col, type_col)
    prev_t = None
    tcols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev_t is not None:
            cond = cond & prev_t.isNotNull() & (ts >= prev_t)
        tcol = f"__t{i}"
        out = out.withColumn(tcol, F.min(F.when(cond, ts)).over(w))
        prev_t = F.col(tcol)
        tcols.append(tcol)
    per_user = out.select(user_col, *tcols).distinct()
    counts = per_user.agg(
        *[
            F.count(F.when(F.col(t).isNotNull(), F.lit(1))).alias(f"__n{i}")
            for i, t in enumerate(tcols)
        ]
    )
    rows = []
    for i, stage in enumerate(stages):
        conv = (
            F.lit(1.0)
            if i == 0
            else F.when(
                F.col(f"__n{i - 1}") > 0,
                F.col(f"__n{i}").cast("double")
                / F.col(f"__n{i - 1}").cast("double"),
            )
        )
        rows.append(
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"__n{i}").alias("n_users"),
                conv.alias("conversion"),
            )
        )
    return counts.select(
        F.explode(F.array(*rows)).alias("s")
    ).select("s.stage_idx", "s.stage", "s.n_users", "s.conversion")


@register("scd2_compress")
def scd2_compress(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Change-data-capture → slowly-changing-dimension type 2: compress a
    per-key event stream into state VERSIONS — one row per run of equal
    consecutive states, with ``valid_from`` / ``valid_to`` (null = current)
    and a 1-based ``version``.

    Plan: one exchange on ``key_col`` reused by the lag (change detection),
    the post-filter lead (validity interval) and the row_number — three
    WindowExecs, one shuffle, no self-joins. The equivalent MERGE-per-change
    formulation shuffles once per batch; this is the full-history batch
    rebuild shape."""
    order = [F.col(ts_col).asc_nulls_last()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_last())
    # state as the final key: duplicate (ts, tiebreak) rows — incl. the
    # NULL-ts tail — must version deterministically
    order.append(F.col(state_col).asc_nulls_last())
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .filter(
            F.col("__prev").isNull() | (F.col(state_col) != F.col("__prev"))
        )
        .drop("__prev")
    )
    # Re-window over the surviving change rows only: the validity interval
    # of version i ends where version i+1 begins. Same tiebreak as the
    # change-detection window, so same-timestamp versions stay ordered.
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return changed.select(
        F.col(key_col),
        F.col(state_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


@register("ewma")
def ewma(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "sensor_id",
    alpha: float = 0.3,
    window_rows: int = 20,
    order_tiebreak: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average over the last
    ``window_rows``+1 observations per key — the standard smoothing for
    irregular sensor streams where ``moving_average``'s uniform weights
    lag trend changes. Finite-window normalized EWMA:
    ``Σ (1-α)^j·x_{t-j} / Σ (1-α)^j`` (j=0 newest).

    Engine shape: ONE window shuffle on the key; the frame's values fold
    per row (``collect_list`` over a ROWS frame, then two left-folds for
    numerator and normalizer). No ``pow``: the geometric weights come from
    the recurrence ``acc*(1-α)+x`` folded oldest→newest, so Spark and any
    oracle compute bit-identical IEEE sequences (the verify gotcha about
    cross-engine pow never arises). O(window_rows) per row — bounded
    frames only, by design; an unbounded EWMA is a sequential recurrence
    that belongs to ``applyInPandas`` (SCALE.md)."""
    order = [F.unix_micros(F.col(ts_col).cast("timestamp")).asc_nulls_last()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_last())
    # final tiebreak on the VALUE itself: rows tied on (ts, tiebreak) —
    # e.g. NULL ts + NULL id — would otherwise enter the recurrence in
    # engine-arbitrary order (observed on the seed-2 twin); after this
    # key, remaining ties are value-identical and the fold is invariant
    # to their order
    order.append(F.col(value_col).cast("double").asc_nulls_last())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window_rows, Window.currentRow)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    decay = 1.0 - float(alpha)
    num = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc * F.lit(decay) + x
    )
    den = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc * F.lit(decay) + F.lit(1.0)
    )
    return df.withColumn(out_col or f"{value_col}_ewma", (F.round((num / den) * F.lit(1e6)) / F.lit(1e6)))


@register("retention_cohorts")
def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohort grid: users are cohorted by the week of
    their first event; each (cohort_week, week_offset) cell counts the
    distinct users from that cohort active ``offset`` weeks later, plus
    the retention ratio against the cohort's size — the standard
    engagement decay matrix.

    Engine shape: per-user first-event timestamp is one map-side-combined
    aggregate; distinct (user, week) activity is a second; both shuffle
    on ``user_col`` so AQE can coalesce, and the final cell aggregation
    reduces to |cohorts × offsets| rows. Cohort sizes join back
    BROADCAST (one row per cohort week). No window over the fact table."""
    ts = F.col(ts_col).cast("timestamp")
    wk = F.date_trunc("week", ts).cast("date")
    first = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(wk).alias("cohort_week")
    )
    activity = df.select(
        F.col(user_col).alias("__u"), wk.alias("act_week")
    ).distinct()
    cells = (
        activity.join(first, "__u")
        .groupBy("cohort_week", ((F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("long")).alias("week_offset"))
        .agg(F.count_distinct(F.col("__u")).alias("n_active"))
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


@register("touch_attribution")
def touch_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    touch_type: str = "click",
    convert_type: str = "purchase",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    conversion event, the id of the user's FIRST and LAST preceding touch
    event (plus the running touch count) — the marketing-attribution
    primitive, and the generalization of the as-of join
    (``events_asof_purchase`` is exactly the last-touch column).

    Engine shape: ONE window exchange on the user key serves all three
    measures (``first``/``last`` with ignorenulls over an unbounded
    preceding ROWS frame, and a conditional running count) — no
    self-join of the fact table against itself, which is the naive
    two-scan formulation. Conversions with no prior touch keep NULL
    attribution (kept, not dropped)."""
    order = [F.unix_micros(F.col(ts_col).cast("timestamp")).asc_nulls_last()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_last())
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col(type_col) == touch_type
    touch_id = F.when(is_touch, F.col(id_col))
    out = (
        df.withColumn("first_touch_id", F.first(touch_id, ignorenulls=True).over(w))
        .withColumn("last_touch_id", F.last(touch_id, ignorenulls=True).over(w))
        .withColumn("n_touches", F.sum(is_touch.cast("long")).over(w))
        .filter(F.col(type_col) == convert_type)
    )
    return out.select(
        F.col(id_col).alias("conversion_id"),
        user_col,
        "first_touch_id",
        "last_touch_id",
        F.col("n_touches").cast("long").alias("n_touches"),
    )


@register("transition_matrix")
def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for each
    (from_state, to_state) pair of CONSECUTIVE events within a key, the
    transition count and the row-normalized probability — the behavioral
    fingerprint behind next-action prediction and anomaly detection
    ('purchase after error' spikes).

    One window exchange on the key (lag), then a map-side-combined count
    to |states|² rows; the per-from normalizer joins back BROADCAST
    (|states| rows). Probabilities round at 1e-6."""
    order = [F.unix_micros(F.col(ts_col).cast("timestamp")).asc_nulls_last()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_last())
    # the state itself is the final key (markov_transitions convention):
    # duplicate (ts, tiebreak) rows pair deterministically
    order.append(F.col(state_col).asc_nulls_last())
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("__prev", F.lag(F.col(state_col)).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__t"))
    return (
        pairs.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            F.col("n").cast("long").alias("n"),
            # unrounded exact-int division: tie-free cross-engine
            (F.col("n") / F.col("__t")).alias("p"),
        )
    )


@register("time_to_convert")
def time_to_convert(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_type: str = "signup",
    convert_type: str = "purchase",
) -> DataFrame:
    """Time-to-event distribution: per key, the delay from its FIRST
    ``start_type`` event to its FIRST ``convert_type`` event at or after
    it; keys that never convert report a NULL delay (right-censored, kept
    — dropping them would bias every downstream statistic). Output is
    per-key ``(key, start_us, delay_s)``.

    One conditional aggregate per key (min over each event class,
    map-side combined) — no self-join, no window over the fact table."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.min(F.when(F.col(type_col) == start_type, ts_us)).alias("__s"),
        F.min(F.when(F.col(type_col) == convert_type, ts_us)).alias("__c0"),
    )
    # first conversion AT OR AFTER the first start (a purchase before
    # signup does not count as converting that signup)
    conv = df.select(
        F.col(key_col).alias("key"),
        F.when(F.col(type_col) == convert_type, ts_us).alias("__cts"),
    ).filter(F.col("__cts").isNotNull())
    # pre-start conversions are NULLED (not filtered): a key whose
    # conversions ALL predate its first start must still surface as a
    # right-censored NULL-delay row — a row filter would drop its every
    # joined row and silently delete the key from the output
    joined = (
        per_key.filter(F.col("__s").isNotNull())
        .join(conv, "key", "left")
        .withColumn(
            "__cts", F.when(F.col("__cts") >= F.col("__s"), F.col("__cts"))
        )
        .groupBy("key", "__s")
        .agg(F.min("__cts").alias("__c"))
    )
    return joined.select(
        "key",
        F.col("__s").alias("start_us"),
        (F.round(((F.col("__c") - F.col("__s")) / F.lit(1e6)) * F.lit(1e6)) / F.lit(1e6)).alias("delay_s"),
    )


@register("deseasonalized_anomalies")
def deseasonalized_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Season-adjusted anomaly detection: score each reading against the
    mean/std of its OWN (key, hour-of-day) cell — a 2 a.m. reading is
    compared to other 2 a.m. readings, so daily seasonality doesn't
    masquerade as anomaly (the failure mode of a flat per-key z-score).
    Returns the readings whose |z| exceeds ``z_threshold``; cells with
    fewer than 2 observations or zero variance score no anomalies
    (undefined z — excluded, not NaN).

    One map-side-combined aggregate to |keys|×24 cells, broadcast back
    onto the scan — the fact table is read once and never shuffled, so
    this is a pure scan-bandwidth operator at 100 TB."""
    hour = F.hour(F.col(ts_col).cast("timestamp"))
    v = F.col(value_col).cast("double")
    cells = (
        df.select(F.col(key_col).alias("__k"), hour.alias("__h"), v.alias("__v"))
        .groupBy("__k", "__h")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg("__v").alias("__mu"),
            F.stddev_samp("__v").alias("__sd"),
        )
        .filter((F.col("__n") >= 2) & (F.col("__sd") > 0))
    )
    scored = df.join(
        F.broadcast(cells),
        on=(F.col(key_col) == F.col("__k")) & (hour == F.col("__h")),
    ).withColumn("z", (F.round(((v - F.col("__mu")) / F.col("__sd")) * F.lit(1e6)) / F.lit(1e6)))
    return scored.filter(F.abs(F.col("z")) > F.lit(float(z_threshold))).select(
        id_col, key_col, (F.round((v) * F.lit(1e6)) / F.lit(1e6)).alias("value"), "z"
    )


@register("scd2_lookup")
def scd2_lookup(
    events: DataFrame,
    history: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time lookup against an SCD-2 history: attach to each event
    the state version VALID AT its timestamp (``valid_from ≤ ts`` and
    ``ts < valid_to``, open-ended current version matches everything
    after) — the replay primitive that lets any fact be re-joined to the
    dimension exactly as it stood ('what plan was this user on when the
    event fired').

    Plan shape: equi-join on the key with the validity window as a
    residual predicate — per-key version counts are small (state
    CHANGES, not events), so the join stays keyed and the fan-in per
    event is the per-key version count, never a range-join cross
    product. An event before its key's first version keeps NULLs."""
    ts_us = F.unix_micros(F.col(f"e.{ts_col}").cast("timestamp"))
    vf_us = F.unix_micros(F.col(f"h.{valid_from_col}").cast("timestamp"))
    vt = F.col(f"h.{valid_to_col}")
    cond = (
        (F.col(f"e.{key_col}") == F.col(f"h.{key_col}"))
        & (vf_us <= ts_us)
        & (vt.isNull() | (ts_us < F.unix_micros(vt.cast("timestamp"))))
    )
    return events.alias("e").join(history.alias("h"), on=cond, how="left")


@register("linear_attribution")
def linear_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    touch_type: str = "click",
    convert_type: str = "purchase",
    order_tiebreak: str | None = None,
    model: str = "linear",
) -> DataFrame:
    """Multi-touch LINEAR attribution — the third standard model next to
    first/last touch (``touch_attribution``): every touch preceding a
    conversion (since the user's previous conversion) shares the credit
    equally. Emits one row per ATTRIBUTED TOUCH:
    ``(touch_id, user, conversion_id, touch_rank, n_touches, credit)``
    with ``credit = round(1/n_touches, 6)``; ``model="position"`` switches
    to the U-shaped 40/20/40 weighting (first and last touch 0.4 each,
    middles share 0.2) — per-conversion credit always sums to 1.

    Engine shape — the naive formulation is a fact-fact range join
    (conversions × preceding touches, the classic 100 TB trap); instead,
    each touch finds its NEXT conversion with a FORWARD-looking window
    (first conversion id over the following frame — an as-of join as one
    window exchange), which assigns every touch to exactly one
    conversion; rank and share then come from a second window over the
    derived (user, conversion) key. Two window exchanges total, both on
    the user key family; integer-deterministic credit (no exp/pow).
    Touches after the user's last conversion stay unattributed and are
    excluded (documented; count them upstream if needed)."""
    order = [F.unix_micros(F.col(ts_col).cast("timestamp")).asc_nulls_last()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_last())
    fwd = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    conv_id = F.when(F.col(type_col) == convert_type, F.col(id_col))
    touches = (
        df.withColumn("conversion_id", F.first(conv_id, ignorenulls=True).over(fwd))
        .filter(
            (F.col(type_col) == touch_type) & F.col("conversion_id").isNotNull()
        )
    )
    grp = Window.partitionBy(user_col, "conversion_id").orderBy(*order)
    out = touches.withColumn("touch_rank", F.row_number().over(grp)).withColumn(
        "n_touches",
        F.count(F.lit(1)).over(
            Window.partitionBy(user_col, "conversion_id")
        ),
    )
    n = F.col("n_touches").cast("double")
    rank = F.col("touch_rank")
    if model == "linear":
        credit = F.lit(1.0) / n
    elif model == "position":
        # U-shaped 40/20/40: first and last touch get 0.4 each, middles
        # share the remaining 0.2; degenerate groups keep total credit 1.0
        credit = (
            F.when(F.col("n_touches") == 1, F.lit(1.0))
            .when((F.col("n_touches") == 2), F.lit(0.5))
            .when((rank == 1) | (rank == F.col("n_touches")), F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - F.lit(2.0)))
        )
    else:
        raise ValueError(f"model must be linear|position, got {model!r}")
    return out.select(
        F.col(id_col).alias("touch_id"),
        F.col(user_col),
        "conversion_id",
        F.col("touch_rank").cast("long").alias("touch_rank"),
        F.col("n_touches").cast("long").alias("n_touches"),
        # unrounded: 1/n and 0.2/(n-2) are small-denominator rationals
        credit.alias("credit"),
    )


@register("km_survival")
def km_survival(
    df: DataFrame,
    duration_col: str = "duration_s",
    event_col: str = "converted",
    group_col: str | None = None,
) -> DataFrame:
    """Kaplan-Meier survival estimator over right-censored durations —
    the standard time-to-event curve (conversion, churn, failure). Input:
    one row per subject, ``duration_col`` = observed time, ``event_col``
    1 = the event happened at that time / 0 = censored there. Output one
    row per distinct EVENT time: ``(group?, t, n_risk, n_events,
    survival)`` with ``S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)``.

    Engine shape: one (group, t) aggregate (map-side combined — the
    shuffle carries distinct times, not subjects) plus ordered windows
    for the at-risk counts and the cumulative product. Determinism: the
    product is a cumulative sum of 1e-9-scaled ``ln(1 − d/n)`` BIGINTs
    along the time order (the ``unigram_logprob`` contract), exponentiated
    once and rounded — cross-engine exact. A step where every at-risk
    subject events (``d = n``) pins survival to exactly 0.0 from there on
    (``ln(0)`` never enters the sum; Spark would NULL it, DuckDB -inf)."""
    gcols = [group_col] if group_col else []
    at_t = df.groupBy(
        *gcols, F.col(duration_col).alias("t")
    ).agg(
        F.sum(F.when(F.col(event_col) == 1, 1).otherwise(0)).alias("n_events"),
        F.count(F.lit(1)).alias("__all"),
    )
    w_all = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    w_ord = w_all.orderBy(F.asc_nulls_last("t"))
    prev = F.coalesce(
        F.sum("__all").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    n_risk = (F.sum("__all").over(w_all) - prev).cast("long")
    stepped = at_t.withColumn("n_risk", n_risk)
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    lr_e9 = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.round(F.log(F.lit(1.0) - d / n) * F.lit(1e9)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    zero_seen = F.max(
        (F.col("n_events") == F.col("n_risk")).cast("int")
    ).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    cum_e9 = F.sum(lr_e9).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    out = (
        stepped.withColumn("__z", zero_seen)
        .withColumn("__cum", cum_e9)
        .filter(F.col("n_events") > 0)
        .select(
            *gcols,
            "t",
            F.col("n_risk"),
            F.col("n_events").cast("long").alias("n_events"),
            F.when(F.col("__z") == 1, F.lit(0.0))
            .otherwise((F.round((F.exp(F.col("__cum").cast("double") / F.lit(1e9))) * F.lit(1e6)) / F.lit(1e6)))
            .alias("survival"),
        )
    )
    return out


@register("cusum_changepoints")
def cusum_changepoints(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per group: standardize the
    series against the group's mean/stddev, then run the classic
    ``S_i = max(0, S_{i-1} + (±z_i − k))`` drift accumulators and flag
    rows where either side exceeds ``threshold_h``.

    Engine shape: the recursion has the closed form
    ``S_i = P_i − min(0, min_{j≤i} P_j)`` with ``P`` the prefix sum of
    the slack-adjusted deviations, so the whole detector is ordered
    window functions over ONE group-keyed exchange — no recursion, no
    Python, no state store; it scales as any windowed aggregation does.
    Determinism: deviations are rounded to 1e-9-scaled BIGINTs before
    the prefix sums (the ``km_survival``/``unigram_logprob`` contract),
    making the accumulators and the ``> h`` comparison integer-exact
    across engines; and since r9 the group mean/stddev themselves derive
    from EXACT integer power sums of the e6-quantized values (Σv6 as
    BIGINT, Σv6² as DECIMAL(38,0)) in a fixed float expression order —
    the raw double window-AVG they replaced was summation-ORDER-
    dependent, and a scan-order change flipped a z within 5e-10 of its
    e9 rounding boundary (caught by the r9 pandas-views twin run).
    Zero-variance groups emit no alarms (z pinned to 0).

    Output: alarm rows only — ``(group, tiebreak/ts, cusum_up,
    cusum_dn, direction)``.
    """
    gw = Window.partitionBy(group_col)
    df = df.withColumn("__v6", quantize_e6(F.col(value_col)))
    # __v6 as the FINAL order key: duplicate (ts, tiebreak) rows with
    # different values would otherwise order arbitrarily and shift the
    # prefix sums (the r8 state-as-final-order-key convention; the r9
    # pandas-views twin caught exactly this via a scan-order change)
    order = [F.col(ts_col).asc_nulls_last()] + (
        [F.col(tiebreak).asc_nulls_last()] if tiebreak else []
    ) + [F.col("__v6").asc_nulls_last()]
    wo = gw.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    n = F.count("__v6").over(gw).cast("double")
    # Σv6 as DECIMAL(38,0): clamped rows contribute 1e16 each, so an
    # int64 accumulator wraps after ~922 of them (DuckDB widens to
    # HUGEINT — the same silent split the rollup fix closed)
    sum1 = F.sum(F.col("__v6").cast("decimal(38,0)")).over(gw).cast("double")
    s2 = (
        F.sum(F.col("__v6").cast("decimal(38,0)") * F.col("__v6"))
        .over(gw)
        .cast("double")
    )
    mu6 = sum1 / n
    sd6 = F.sqrt(s2 / n - mu6 * mu6)
    z = F.when(
        sd6 > 0, (F.col("__v6").cast("double") - mu6) / sd6
    ).otherwise(F.lit(0.0))
    up_e9 = F.round((z - F.lit(slack_k)) * F.lit(1e9)).cast("long")
    dn_e9 = F.round((-z - F.lit(slack_k)) * F.lit(1e9)).cast("long")
    with_d = df.withColumn("__up", up_e9).withColumn("__dn", dn_e9)
    p_up = F.sum("__up").over(wo)
    p_dn = F.sum("__dn").over(wo)
    with_p = with_d.withColumn("__pu", p_up).withColumn("__pd", p_dn)
    s_up = F.col("__pu") - F.least(F.lit(0).cast("long"), F.min("__pu").over(wo))
    s_dn = F.col("__pd") - F.least(F.lit(0).cast("long"), F.min("__pd").over(wo))
    h_e9 = F.lit(int(round(threshold_h * 1e9))).cast("long")
    scored = with_p.withColumn("__su", s_up).withColumn("__sd", s_dn).filter(
        (F.col("__su") > h_e9) | (F.col("__sd") > h_e9)
    )
    key_cols = [group_col] + ([tiebreak] if tiebreak else [ts_col])
    return scored.select(
        *key_cols,
        (F.round((F.col("__su").cast("double") / F.lit(1e9)) * F.lit(1e6)) / F.lit(1e6)).alias("cusum_up"),
        (F.round((F.col("__sd").cast("double") / F.lit(1e9)) * F.lit(1e6)) / F.lit(1e6)).alias("cusum_dn"),
        F.when(F.col("__su") > h_e9, F.lit("up"))
        .otherwise(F.lit("down"))
        .alias("direction"),
    )


@register("rolling_active_users")
def rolling_active_users(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Rolling distinct actives (the DAU/WAU/MAU family): for every day
    with activity, the count of distinct keys active in the trailing
    ``window_days`` days, next to that day's exact DAU.

    Distinct-over-sliding-window has no direct window-function form (no
    ``countDistinct`` over a frame) — the scalable shape is: dedup to
    per-(day, key) actives FIRST (bounds everything that follows by
    actives, not events), then explode each active-day into the
    ``window_days`` calendar days it keeps the key active for, dedup
    (day, key) again and count. Shuffles carry at most
    ``actives × window_days`` rows — independent of the raw event
    volume; the alternative (a range self-join events×events) is
    quadratic in hot keys. Days with zero activity of their own emit no
    row (they'd need a calendar spine — compose with ``resample``)."""
    day = F.to_date(F.col(ts_col))
    daily = df.select(day.alias("__d"), F.col(key_col).alias("__k")).distinct()
    covered = (
        daily.select(
            F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("__off"),
            "__d",
            "__k",
        )
        .select(F.date_add(F.col("__d"), F.col("__off")).alias("__day"), "__k")
        .distinct()
    )
    days = daily.select(F.col("__d").alias("__day")).distinct()
    rolling = (
        covered.join(days, "__day")
        .groupBy("__day")
        .agg(F.count(F.lit(1)).alias("rolling_actives"))
    )
    dau = daily.groupBy(F.col("__d").alias("__day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        rolling.join(dau, "__day")
        .select(
            F.col("__day").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("rolling_actives").cast("long").alias("rolling_actives"),
        )
    )


@register("seasonal_decompose")
def seasonal_decompose(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    period: int = 24,
) -> DataFrame:
    """Classic additive seasonal decomposition of a regular series per
    group: ``value = trend + seasonal + residual``.

    - trend: centered moving average — the classic 2×p MA for even
      periods (``period+1`` rows, half weight on the two ends, so a
      pure period-p pattern averages out exactly) and a plain p-row
      window for odd ones; NULL at the edges where the frame is short;
    - seasonal: the per-season-position mean of the detrended series
      (position = row index mod period), centered so the ``period``
      indices sum to ~0;
    - residual: what's left.

    Engine shape: ONE ordered window exchange on the group key carries
    the row numbering, the moving sums and the frame-completeness
    count; the seasonal table is a ``period``-rows-per-group aggregate
    joined back by broadcast.

    Determinism contract (subtler than the e9-ln trick): every mean is
    an EXACT integer numerator (sums of per-row 1e-6-scaled BIGINTs —
    order-free) over a literal denominator, emitted as the UNROUNDED
    IEEE division result. No ``round(x, 6)`` is applied to aggregate
    outputs: /24-style denominators park values exactly on 6-decimal
    half-way points, where Spark's BigDecimal HALF_UP and DuckDB's
    scaled-multiply rounding disagree (observed: 47.752061 vs
    47.752062). Scale-0 rounds of identical doubles (the per-row e6
    quantizations) are safe — both engines round half away from zero.
    Assumes a REGULAR series (compose with ``resample`` first)."""
    half = period // 2
    wo = Window.partitionBy(group_col).orderBy(F.col(ts_col).asc_nulls_last())
    frame = wo.rowsBetween(-half, half)
    base = df.select(
        F.col(group_col),
        F.col(ts_col),
        F.col(value_col).cast("double").alias("__v"),
    ).withColumn("__v6", F.round(F.col("__v") * F.lit(1e6)).cast("long")).withColumn(
        "__rn", F.row_number().over(wo)
    )
    if period % 2 == 0:
        # 2×p MA: numerator 2·S − (ends) is an exact BIGINT; one division
        num = (
            F.lit(2) * F.sum("__v6").over(frame)
            - (F.lag("__v6", half).over(wo) + F.lead("__v6", half).over(wo))
        )
        trend = F.when(
            F.count(F.lit(1)).over(frame) == period + 1,
            num.cast("double") / F.lit(float(2 * period) * 1e6),
        )
    else:
        trend = F.when(
            F.count(F.lit(1)).over(frame) == period,
            F.sum("__v6").over(frame).cast("double") / F.lit(float(period) * 1e6),
        )
    with_trend = base.withColumn("trend", trend).withColumn(
        "__pos", (F.col("__rn") - 1) % F.lit(period)
    )
    det = with_trend.withColumn("__det", F.col("__v") - F.col("trend")).withColumn(
        "__det6", F.round((F.col("__v") - F.col("trend")) * F.lit(1e6)).cast("long")
    )
    seas = (
        det.filter(F.col("__det").isNotNull())
        .groupBy(group_col, "__pos")
        .agg(
            (
                F.sum("__det6").cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double")
            ).alias("__s_raw")
        )
    )
    wg = Window.partitionBy(group_col)
    centered = (
        seas.withColumn("__s6", F.round(F.col("__s_raw") * F.lit(1e6)).cast("long"))
        .withColumn(
            "__s_mean",
            F.sum("__s6").over(wg).cast("double")
            / F.lit(1e6)
            / F.count(F.lit(1)).over(wg).cast("double"),
        )
        .select(
            group_col,
            "__pos",
            (F.col("__s_raw") - F.col("__s_mean")).alias("seasonal"),
        )
    )
    out = det.join(F.broadcast(centered), [group_col, "__pos"], "left")
    return out.select(
        F.col(group_col),
        F.col(ts_col),
        F.col("__v").alias("value"),
        "trend",
        "seasonal",
        (F.col("__v") - F.col("trend") - F.col("seasonal")).alias("residual"),
    )


@register("cohort_ltv")
def cohort_ltv(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by their first
    purchase month; for each (cohort, age-in-months) the cumulative
    revenue and per-customer LTV → ``(cohort_month, age_months,
    n_customers, cum_revenue, ltv_per_customer)``.

    Shapes: first-month is one keyed aggregate; the (cohort, age) cube
    is a second aggregate over cohort-tagged facts; the cumulative
    curve is an ordered window over the tiny cohort×age table.
    Determinism: revenue sums 1e-6-scaled BIGINTs (order-free) and both
    reported doubles are single IEEE divisions of exact integer
    numerators (the unrounded-division contract — see
    ``seasonal_decompose``). Month arithmetic is ``year·12 + month``
    integers, portable across engines."""
    mkey = lambda c: F.year(c) * F.lit(12) + F.month(c)  # noqa: E731
    firsts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.min(mkey(F.col(ts_col))).alias("__cm")
    )
    sizes = firsts.groupBy("__cm").agg(F.count(F.lit(1)).alias("__nc"))
    tagged = df.join(
        F.broadcast(firsts), F.col(key_col) == F.col("__k")
    ).select(
        "__cm",
        (mkey(F.col(ts_col)) - F.col("__cm")).alias("age_months"),
        F.round(F.col(amount_col).cast("double") * F.lit(1e6))
        .cast("long")
        .alias("__a6"),
    )
    cube = tagged.groupBy("__cm", "age_months").agg(F.sum("__a6").alias("__rev6"))
    wc = (
        Window.partitionBy("__cm")
        .orderBy(F.asc_nulls_last("age_months"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curved = cube.withColumn("__cum6", F.sum("__rev6").over(wc)).join(
        F.broadcast(sizes), "__cm"
    )
    return curved.select(
        F.concat_ws(
            "-",
            F.format_string("%04d", ((F.col("__cm") - 1) / F.lit(12)).cast("int")),
            F.format_string("%02d", ((F.col("__cm") - 1) % F.lit(12)) + 1),
        ).alias("cohort_month"),
        "age_months",
        F.col("__nc").cast("long").alias("n_customers"),
        (F.col("__cum6").cast("double") / F.lit(1e6)).alias("cum_revenue"),
        (
            F.col("__cum6").cast("double")
            / F.lit(1e6)
            / F.col("__nc").cast("double")
        ).alias("ltv_per_customer"),
    )


@register("gaps_islands")
def gaps_islands(
    df: DataFrame,
    group_col: str,
    seq_col: str,
) -> DataFrame:
    """Gaps-and-islands compaction: collapse each group's set of INTEGER
    sequence positions into contiguous runs → ``(group, start_seq,
    end_seq, run_len)``. The classic warehouse pattern (active streaks,
    coverage ranges, uptime windows) via the row_number-difference
    trick: within a group, ``seq − row_number(order by seq)`` is
    constant exactly along a contiguous run — one ordered window + one
    keyed aggregate, no self-join, no recursion."""
    w = Window.partitionBy(group_col).orderBy(F.col("__s").asc_nulls_last())
    runs = (
        df.select(F.col(group_col), F.col(seq_col).cast("long").alias("__s"))
        .distinct()
        .withColumn("__grp", F.col("__s") - F.row_number().over(w))
    )
    return (
        runs.groupBy(group_col, "__grp")
        .agg(
            F.min("__s").alias("start_seq"),
            F.max("__s").alias("end_seq"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .drop("__grp")
    )


@register("interval_overlap_join")
def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    start_col: str = "start_seq",
    end_col: str = "end_seq",
    bucket_size: int = 24,
) -> DataFrame:
    """Overlap join between two interval tables (inclusive integer
    endpoints) → pair keys + ``overlap_start/overlap_end/overlap_len``.

    The scalable range-join shape: each interval explodes to the coarse
    ``bucket_size``-wide buckets it touches, candidates pair by bucket
    EQUALITY (a shuffle Spark key-partitions — never an O(n²) theta
    join), the exact overlap predicate filters, and a distinct drops
    the multi-bucket duplicates. Fan-out is interval_span/bucket_size
    per row — bounded and tunable; AQE handles bucket skew. This is the
    temporal twin of the spatial grid-bucketed ``buffer_agg``."""
    def bucketed(df_, keys, tag):
        span = F.sequence(
            F.floor(F.col(start_col) / F.lit(bucket_size)).cast("long"),
            F.floor(F.col(end_col) / F.lit(bucket_size)).cast("long"),
        )
        return df_.select(
            *[F.col(k).alias(f"{tag}_{k}") for k in keys],
            F.col(start_col).cast("long").alias(f"{tag}_start"),
            F.col(end_col).cast("long").alias(f"{tag}_end"),
            F.explode(span).alias("__bucket"),
        )

    la = bucketed(left, left_keys, "l")
    rb = bucketed(right, right_keys, "r")
    pairs = la.join(rb, "__bucket").filter(
        (F.col("l_start") <= F.col("r_end")) & (F.col("r_start") <= F.col("l_end"))
    )
    out_keys = [f"l_{k}" for k in left_keys] + [f"r_{k}" for k in right_keys]
    return (
        pairs.select(
            *out_keys,
            "l_start",
            "l_end",
            "r_start",
            "r_end",
            F.greatest("l_start", "r_start").alias("overlap_start"),
            F.least("l_end", "r_end").alias("overlap_end"),
        )
        .distinct()
        .withColumn(
            "overlap_len",
            F.col("overlap_end") - F.col("overlap_start") + F.lit(1),
        )
    )


@register("seasonal_naive_mape")
def seasonal_naive_mape(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    period: int = 24,
) -> DataFrame:
    """Seasonal-naive backtest: forecast each point with the value one
    ``period`` earlier in its group's series and score MAPE per group →
    ``(group, n_scored, mape)``. The sanity baseline every forecasting
    pipeline must beat, as one ordered window (the lag) + one keyed
    aggregate. Determinism: absolute percentage errors are quantized to
    1e-6 BIGINTs per row (scale-0 round of identical doubles), the mean
    divides the exact integer sum once; rows with zero actuals or no
    lag are excluded and counted in ``n_scored``."""
    wo = Window.partitionBy(group_col).orderBy(F.col(ts_col).asc_nulls_last())
    v = F.col(value_col).cast("double")
    lagged = df.withColumn("__f", F.lag(v, period).over(wo))
    scored = lagged.filter(F.col("__f").isNotNull() & (v != 0))
    # FLOOR: |(v-f)/v| is a rational of round-decimal data values whose
    # e6 scaling can park exactly on .5; floor is tie-free cross-engine
    ape6 = F.floor(F.abs((v - F.col("__f")) / v) * F.lit(1e6)).cast("long")
    return (
        scored.withColumn("__a6", ape6)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            (
                F.sum("__a6").cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double")
            ).alias("mape"),
        )
    )


@register("grouped_autocorr")
def grouped_autocorr(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    lags: Sequence[int] = (1, 24),
    scale: float = 1e3,
) -> DataFrame:
    """Autocorrelation of a regular series per group at the given lags →
    ``(group, lag, n, r)``, where ``r`` is the Pearson correlation of
    ``(v_t, v_{t−lag})`` pairs. Built ON ``grouped_linregress``: each
    lag is one window-lag projection feeding the same five-moment-sum
    aggregate, and ``r = sign(slope)·√r²`` — the integer-exact
    determinism (and the overflow bound) come with the machinery. The
    periodicity diagnostic to run before ``seasonal_decompose``."""
    from sensordatapipelines_spark.operators.aggregates import grouped_linregress

    wo = Window.partitionBy(group_col).orderBy(F.col(ts_col).asc_nulls_last())
    out = None
    for lag in lags:
        pairs = (
            df.withColumn("__x", F.lag(F.col(value_col), lag).over(wo))
            .filter(F.col("__x").isNotNull())
            .select(F.col(group_col), F.col("__x"), F.col(value_col).alias("__y"))
        )
        reg = grouped_linregress(pairs, group_col, "__x", "__y", scale=scale)
        part = reg.select(
            group_col,
            F.lit(int(lag)).alias("lag"),
            F.col("n"),
            F.when(
                F.col("r2").isNotNull(),
                F.signum(F.col("slope")) * F.sqrt(F.col("r2")),
            ).alias("r"),
        )
        out = part if out is None else out.unionByName(part)
    return out

def _ordered_pairs(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    max_points: int,
) -> DataFrame:
    """All i<j observation pairs of each group's series, time-ordered →
    ``(group, __m, __dts, __dv)`` where ``__m`` is the (capped) series
    length, ``__dts`` the exact epoch-second gap and ``__dv`` the value
    delta. The shared candidate machinery for the pairwise trend
    statistics (Theil–Sen, Mann–Kendall): ONE keyed shuffle collects each
    group's sorted observation list (capped at ``max_points`` — the
    explicit scale bound; pair fan-out is m²/2 per group, never corpus²),
    then a JVM-side combination explode — the ``market_basket_pairs``
    pattern, no self-join. Ordering is (floor-epoch-second, tiebreak),
    exactly the convention the SQL oracles replay. Rows with a NULL
    group, timestamp, value or tiebreak are dropped FIRST (a NULL-group
    trend is meaningless, and SQL equi-joins drop the NULL key anyway): Spark ``sort_array``
    sorts null struct fields before non-null while SQL ``ORDER BY``
    defaults nulls last, so letting NULLs into the ``max_points`` cap
    would let the two engines select different observation subsets."""
    df = df.filter(
        F.col(group_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(tiebreak_col).isNotNull()
    )
    pts = df.select(
        F.col(group_col),
        F.struct(
            F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(tiebreak_col).alias("tb"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("__p"),
    )
    # Pin the keyed exchange feeding the list-collect (the ``spread_by``
    # pattern, placed ABOVE the aggregate): the packed per-group lists
    # are BYTE-small (≈1.2 KB/group), so AQE coalesces an
    # EnsureRequirements agg exchange to one partition — and the
    # quadratic pair Generate, slope math and median sort downstream all
    # serialize onto one core (measured: a 6 s single-task stage at
    # sf0.1; ~0.2 s/task spread). A REPARTITION_BY_NUM exchange is
    # exempt from AQE coalescing and satisfies the aggregate's
    # distribution, so the whole CPU-bound chain keeps full parallelism
    # with NO extra shuffle. (A repartition placed after the aggregate is
    # pruned as redundant by the planner — same key, same count — which
    # re-exposes the coalesce; above the aggregate it IS the exchange.)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    lists = (
        pts.repartition(n_part, F.col(group_col))
        .groupBy(group_col)
        .agg(
            F.slice(
                F.sort_array(F.collect_list("__p")), 1, int(max_points)
            ).alias("__xs")
        )
    )
    combos = lists.select(
        F.col(group_col),
        F.size("__xs").alias("__m"),
        F.explode(
            F.expr(
                "flatten(transform(__xs, (a, k) ->"
                " transform(slice(__xs, k + 2, size(__xs)),"
                " b -> struct(b.t - a.t as dts, b.v - a.v as dv))))"
            )
        ).alias("__pr"),
    )
    return combos.select(
        F.col(group_col),
        F.col("__m"),
        F.col("__pr.dts").alias("__dts"),
        F.col("__pr.dv").alias("__dv"),
    )


@register("theil_sen_trend")
def theil_sen_trend(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    max_points: int = 64,
    min_points: int = 8,
) -> DataFrame:
    """Theil–Sen robust trend per group → ``(group, n_points, n_pairs,
    slope_per_hour)``: the MEDIAN of all pairwise slopes, the standard
    outlier-resistant alternative to OLS (breakdown point 29% vs 0%).
    Pairs come from ``_ordered_pairs`` (bounded m²/2 fan-out per group);
    zero-gap pairs (same epoch second) are excluded from the slope set.
    Determinism: slope = Δv·3600/Δt in one fixed operation order from
    exact integer second gaps; the exact-median interpolation averages
    the same two doubles in both engines; ROUND(…, 6) last."""
    pairs = _ordered_pairs(df, group_col, ts_col, value_col, tiebreak_col, max_points)
    slopes = pairs.filter(F.col("__dts") > 0).withColumn(
        "__slope",
        F.col("__dv") * F.lit(3600.0) / F.col("__dts").cast("double"),
    )
    # Median of slopes via a codegen window sort + conditional aggregate
    # instead of the interpreted ``percentile()`` ObjectHashAggregate
    # (guide §1.2 step 2: the typed-buffer aggregate was 5.3 s of this
    # query's 9.4 s at sf0.1 — the sort/row_number path runs in whole-
    # stage codegen on the SAME already-keyed partitioning, no new
    # exchange). Selection replays percentile's exact arithmetic:
    # position = 0.5·(n−1), lower = ⌊position⌋, higher = ⌈position⌉
    # (1-based ranks below), result = v_lo when the position is integral
    # else 0.5·v_lo + 0.5·v_hi — the identical IEEE operations, verified
    # bit-exact against ``percentile`` on ±0.0 / ±Inf / denormal / 1e308
    # fixtures. The ``1/v`` secondary sort key pins −0.0 before +0.0 so
    # the vlo==vhi tie branch (only reachable for a mixed ±0.0 middle
    # pair, where interpolating would flip the sign bit) deterministically
    # returns the −0.0 percentile() emits.
    wsort = Window.partitionBy(group_col).orderBy(
        F.col("__slope").asc(),
        F.when(F.col("__slope") == 0.0, F.lit(1.0) / F.col("__slope"))
        .otherwise(F.lit(0.0))
        .asc(),
    )
    wcnt = Window.partitionBy(group_col)
    ranked = (
        slopes.select(group_col, "__m", "__slope")
        .withColumn("__rn", F.row_number().over(wsort))
        .withColumn("__n", F.count(F.lit(1)).over(wcnt))
    )
    lo_rk = F.expr("((__n - 1) div 2) + 1")
    hi_rk = F.expr("(__n div 2) + 1")
    mid = ranked.filter((F.col("__rn") == lo_rk) | (F.col("__rn") == hi_rk))
    agg = mid.groupBy(group_col).agg(
        F.max("__m").alias("n_points"),
        F.max("__n").alias("n_pairs"),
        F.max(F.when(F.col("__rn") == lo_rk, F.col("__slope"))).alias("__vlo"),
        F.max(F.when(F.col("__rn") == hi_rk, F.col("__slope"))).alias("__vhi"),
    )
    med = (
        F.when(F.col("n_pairs") % 2 == 1, F.col("__vlo"))
        .when(F.col("__vlo") == F.col("__vhi"), F.col("__vlo"))
        .otherwise(F.lit(0.5) * F.col("__vlo") + F.lit(0.5) * F.col("__vhi"))
    )
    return (
        agg.select(
            group_col,
            "n_points",
            "n_pairs",
            (F.round(med * F.lit(1e6)) / F.lit(1e6)).alias("slope_per_hour"),
        )
        .filter(F.col("n_points") >= F.lit(int(min_points)))
    )


@register("mann_kendall")
def mann_kendall(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    max_points: int = 64,
    min_points: int = 8,
) -> DataFrame:
    """Mann–Kendall trend test per group → ``(group, n_points, s_stat,
    n_pairs)``: S = Σ sign(v_j − v_i) over all time-ordered pairs i<j
    (value ties contribute 0). The standard nonparametric monotone-trend
    detector for sensor series — needs no distribution assumption and
    pairs share ``_ordered_pairs``' bounded explode. Every output column
    is an exact integer (S is an order-independent BIGINT sum of signs;
    ``n_pairs`` the capped pair count m(m−1)/2): a consumer derives
    Kendall's tau as ``s_stat / n_pairs`` at whatever precision it wants,
    and the gate itself has NO floating-point surface left to diverge on
    cross-engine."""
    pairs = _ordered_pairs(df, group_col, ts_col, value_col, tiebreak_col, max_points)
    return (
        pairs.groupBy(group_col)
        .agg(
            F.max("__m").alias("n_points"),
            F.sum(F.signum("__dv").cast("long")).alias("s_stat"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .filter(F.col("n_points") >= F.lit(int(min_points)))
    )


@register("pair_probe")
def pair_probe(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    max_points: int = 64,
) -> DataFrame:
    """Pair-selection bisection probe → per group ``(group, n_points,
    n_pairs, s_sum, sum_dts)`` over the SAME capped ordered-pair stream
    Theil–Sen and Mann–Kendall consume — but with NO ``min_points``
    filter and all-integer columns (pair count, Σ sign(Δv), Σ Δt
    seconds).

    Purpose: localize cross-engine divergence in ``_ordered_pairs``'
    cap-and-order machinery. ``sum_dts`` is sensitive to WHICH
    ``max_points`` observations the cap selected and their time order;
    ``s_sum`` to the value deltas. If this gate is green on a dataset,
    both engines picked identical observation subsets in identical
    order, so a red Mann–Kendall/Theil–Sen must be in that gate's own
    aggregation; if red, the selection itself diverges (ordering,
    NULLs, timestamp parsing). Same single keyed shuffle + bounded
    m²/2 explode as the trend gates."""
    pairs = _ordered_pairs(df, group_col, ts_col, value_col, tiebreak_col, max_points)
    return pairs.groupBy(group_col).agg(
        F.max("__m").alias("n_points"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.signum("__dv").cast("long")).alias("s_sum"),
        F.sum("__dts").alias("sum_dts"),
    )


@register("runs_test")
def runs_test(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs profile per key → ``(key, n_above, n_below,
    n_runs)``: order each key's series by the standard (floor-epoch,
    tiebreak) key, classify each value strictly above/below the key's
    exact median (ties AT the median drop, the standard convention), and
    count the maximal same-side runs — the classic randomness check
    (trend or oscillation both push n_runs away from its null
    expectation 2·n_a·n_b/(n_a+n_b)+1, which the consumer derives).

    Determinism: the median comparison happens in the doubled-e6 integer
    space (2·v6 vs 2·median6 — both integer-valued doubles, no rounding
    boundary); run boundaries come from one LAG window per key. All
    output columns exact BIGINTs."""
    v6 = F.round(F.col(value_col).cast("double") * F.lit(1e6)).cast("long")
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(key_col).alias("__k"),
        t.alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
        v6.alias("__v6"),
    ).filter(
        F.col("__v6").isNotNull()
        & F.col("__t").isNotNull()
        & F.col("__tb").isNotNull()
    )
    med = base.groupBy("__k").agg(
        (F.percentile(F.col("__v6"), F.lit(0.5)) * F.lit(2.0)).alias("__med2")
    )
    sided = (
        base.join(med, "__k")
        .withColumn(
            "__side",
            F.when(
                F.col("__v6").cast("double") * F.lit(2.0) > F.col("__med2"), 1
            ).when(
                F.col("__v6").cast("double") * F.lit(2.0) < F.col("__med2"), -1
            ),
        )
        .filter(F.col("__side").isNotNull())
    )
    # v6 as the third key: duplicate (t, tiebreak) rows with different
    # values would otherwise order arbitrarily and shift run boundaries
    w = Window.partitionBy("__k").orderBy(
        F.asc_nulls_last(F.col("__t")),
        F.asc_nulls_last(F.col("__tb")),
        F.asc_nulls_last(F.col("__v6")),
    )
    runs = sided.withColumn(
        "__new_run",
        F.when(
            F.lag("__side").over(w).isNull()
            | (F.lag("__side").over(w) != F.col("__side")),
            1,
        ).otherwise(0),
    )
    return runs.groupBy(F.col("__k").alias(key_col)).agg(
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("n_above"),
        F.sum(F.when(F.col("__side") == -1, 1).otherwise(0)).alias("n_below"),
        F.sum("__new_run").alias("n_runs"),
    )


@register("markov_transitions")
def markov_transitions(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition profile over per-group event
    sequences → ``(from_state, to_state, n, p_e6)``: each group's events
    order by the engine's standard (floor-epoch-second, tiebreak) key,
    consecutive states pair via one LAG window, and transition
    probabilities row-normalize as exact e6 integer division — the
    sequence-model feature (next-event prediction, anomaly scoring) with
    no float surface. One keyed window + two hash aggregates; the
    transition matrix is |states|² rows, a broadcastable dim."""
    from pyspark.sql import Window

    t = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    # Total order: (floor-epoch, tiebreak, state) — the state itself is the
    # third key so LAG stays deterministic even under duplicate
    # (group, second, tiebreak) rows, matching the pair machinery's
    # (t, tiebreak, value) convention. NULL ts/tiebreak/state rows drop
    # FIRST (Spark windows order NULLs first, SQL ORDER BY defaults last).
    w = Window.partitionBy(group_col).orderBy(
        F.asc_nulls_last(F.col("__t")), F.asc_nulls_last(F.col("__tb")), F.asc_nulls_last(F.col("to_state"))
    )
    pairs = (
        df.filter(
            F.col(ts_col).isNotNull()
            & F.col(tiebreak_col).isNotNull()
            & F.col(state_col).isNotNull()
        )
        .select(
            F.col(group_col),
            t.alias("__t"),
            F.col(tiebreak_col).alias("__tb"),
            F.col(state_col).alias("to_state"),
        )
        .withColumn("from_state", F.lag("to_state").over(w))
        .filter(F.col("from_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(totals, "from_state")
        .select(
            "from_state",
            "to_state",
            "n",
            F.expr("n * 1000000 div __tot").alias("p_e6"),
        )
    )


#: Clamp bound for the e6 quantizer: |value| caps at 1e10 so every
#: downstream integer term stays far inside int64 (v6 ≤ 1e16, 2·v6 ≤
#: 2e16, 7·mad4 ≤ 5.6e17) on BOTH engines — DuckDB raises on BIGINT
#: overflow while Spark (non-ANSI) wraps, so unbounded inputs can never
#: be allowed to reach the integer algebra. Mirrored verbatim in every
#: oracle that quantizes.
QUANT_CLAMP = 1e10


def quantize_e6(col: Column) -> Column:
    """Canonical robust e6 quantizer: NULL for NULL/NaN input, ±Inf and
    extremes clamp to ±``QUANT_CLAMP``, then ROUND(v·1e6) as BIGINT —
    deterministic, overflow-free, identical in oracle SQL as
    ``CASE WHEN v IS NULL OR isnan(v) THEN NULL ELSE
    CAST(ROUND(LEAST(GREATEST(v, -1e10), 1e10) * 1e6) AS BIGINT) END``."""
    c = col.cast("double")
    clamped = F.least(F.greatest(c, F.lit(-QUANT_CLAMP)), F.lit(QUANT_CLAMP))
    return (
        F.when(c.isNull() | F.isnan(c), F.lit(None).cast("long"))
        .otherwise(F.round(clamped * F.lit(1e6)).cast("long"))
    )


def _median_x2_window(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """Per-key EXACT 2·median of an integer column as a BIGINT **window
    column** on every row: the sum of the two middle order statistics
    (ranks ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉ — the single middle doubles for odd
    n). No float ever touches the computation — the interpolation
    freedom that made percentile/quantile_cont diverge at >2^53
    magnitudes is gone by construction.

    Plan shape: ONE exchange on ``key``, three stacked WindowExecs
    (row_number over the value sort; count + conditional sum over the
    whole partition — the unbounded frames share the sort). Emitting the
    median as a window column instead of a keyed aggregate lets the
    caller use it row-wise (MAD's ``|v − med|``) with NO join back and
    NO re-scan of the input — the r9 aggregate+join form rebuilt the
    quantize subtree once per consumer (6 scans / 12 joins / 24 window
    nodes in the executed mad_anomaly plan). Adds ``__n`` (per-key row
    count) alongside ``out``."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(val).asc_nulls_last())
    wk = Window.partitionBy(key)
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wk)
    )
    lo_rk = F.expr("(__n + 1) div 2")
    hi_rk = F.expr("(__n + 2) div 2")
    doubled = F.when(lo_rk == hi_rk, F.col(val) * F.lit(2)).otherwise(F.col(val))
    mid = F.when((F.col("__rn") == lo_rk) | (F.col("__rn") == hi_rk), doubled)
    return ranked.withColumn(out, F.sum(mid).over(wk))


@register("mad_anomaly")
def mad_anomaly(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k_times_2: int = 7,
) -> DataFrame:
    """Robust per-key outlier profile → ``(key, n_rows, med_x2_e6,
    mad_x4_e6, n_anomalies)``: a row is anomalous iff
    ``|v − median| > (k_times_2/2) · MAD`` (default 3.5·MAD, the classic
    robust z-score gate) — the telemetry-health screen that survives the
    heavy tails a mean/stddev rule drowns in.

    Determinism (VERDICT r7 #5): values pass the clamped e6 quantizer,
    then 2·median and 4·MAD are computed as EXACT BIGINT sums of the two
    middle order statistics (``_median_x2_window``) — no float
    interpolation anywhere, so engines cannot diverge at any magnitude;
    the anomaly test cross-multiplies to the pure integer comparison
    ``4·|2v − med2| > k·mad4``.

    Plan shape (r10, guide §2.4): BOTH medians ride window columns over
    the SAME hash partitioning on the key, so the whole query is one
    scan → one exchange → two sort+window stacks → one aggregate — zero
    joins, zero re-scans. The r9 aggregate+join formulation rebuilt the
    quantize subtree once per consumer: its executed plan carried 6
    parquet scans, 12 joins and 24 window nodes for the same answer (at
    100 TB use the quantile sketch instead of any exact form)."""
    base = df.select(
        F.col(key_col).alias("__k"), quantize_e6(F.col(value_col)).alias("__v6")
    ).filter(F.col("__v6").isNotNull())
    # median as a window column: every row carries med2 — the deviation
    # is a row-local expression, no join back (guide §2.4: a window
    # partitioned like the preceding exchange needs no second shuffle).
    dev = _median_x2_window(base, "__k", "__v6", "med2").select(
        "__k",
        "__v6",
        "__n",
        "med2",
        F.abs(F.col("__v6") * F.lit(2) - F.col("med2")).alias("__dev2"),
    )
    # MAD rides a second window stack over the SAME partitioning (sort by
    # deviation — a sort, not a shuffle), then one keyed aggregate folds
    # the anomaly tally and carries the per-key constants via MAX.
    scored = _median_x2_window(dev, "__k", "__dev2", "mad4")
    return (
        scored.groupBy("__k")
        .agg(
            F.max("__n").alias("n_rows"),
            F.max("med2").alias("med_x2_e6"),
            F.max("mad4").alias("mad_x4_e6"),
            F.sum(
                (
                    F.col("__dev2") * F.lit(4)
                    > F.lit(int(k_times_2)) * F.col("mad4")
                ).cast("long")
            ).alias("n_anomalies"),
        )
        .select(
            F.col("__k").alias(key_col),
            "n_rows",
            "med_x2_e6",
            "mad_x4_e6",
            "n_anomalies",
        )
    )


@register("ohlc_resample")
def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    unit: str = "hour",
) -> DataFrame:
    """OHLC bars: resample each key's irregular series into
    ``(key, bucket_epoch, open, high, low, close, n_obs)`` per calendar
    ``unit`` — the candlestick/market-data summary shape (reference
    interval-agg family, ``/root/reference/src/data_preprocessing.py:199``
    kin). One hash aggregate, no window: open/close are ``min_by`` /
    ``max_by`` over the (epoch-second, tiebreak) struct — single-pass
    order statistics with the same deterministic tie convention the
    oracles replay; high/low/n fold in the same pass."""
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    # value rides as the LAST order key: duplicate (t, tiebreak) rows
    # (adversarial ties) would otherwise make open/close arbitrary. The
    # min_by and max_by sides each get their OWN struct with NULL v
    # coalesced to the LOSING infinity — Spark struct comparison sorts a
    # NULL field first (min_by would pick it) while the SQL oracle's
    # NULLS LAST makes it lose.
    v = F.col(value_col).cast("double")
    tb = F.col(tiebreak_col).cast("long")
    omin = F.struct(
        t.alias("t"),
        F.coalesce(tb, F.lit(2**63 - 1)).alias("tb"),
        F.coalesce(v, F.lit(float("inf"))).alias("v"),
    )
    omax = F.struct(
        t.alias("t"),
        F.coalesce(tb, F.lit(-(2**63))).alias("tb"),
        F.coalesce(v, F.lit(float("-inf"))).alias("v"),
    )
    return (
        df.select(
            F.col(key_col),
            F.unix_timestamp(F.date_trunc(unit, F.col(ts_col))).alias("bucket_epoch"),
            v.alias("__v"),
            omin.alias("__omin"),
            omax.alias("__omax"),
        )
        .groupBy(key_col, "bucket_epoch")
        .agg(
            F.expr("min_by(__v, __omin)").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.expr("max_by(__v, __omax)").alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


@register("sax_words")
def sax_words(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    segments: int = 8,
    min_points: int = 16,
) -> DataFrame:
    """SAX — Symbolic Aggregate approXimation (Lin/Keogh et al. 2003) —
    per group → ``(group, n_points, sax_word)``: the series is PAA-
    reduced to ``segments`` equal-count frames (frame mean), z-normalized
    against the SERIES mean/std, and each frame mapped to a 4-letter
    alphabet at the standard Gaussian breakpoints (−0.6745, 0, 0.6745).
    The classic symbolic representation for motif/novelty mining — two
    series with the same word are shape-similar regardless of offset and
    scale.

    Determinism contract: values quantize to exact 1e-2 BIGINTs, so all
    sums (series and per-frame) are order-free integers; mean, variance
    ((S2·n − S1²)/n², exact-integer numerator), σ and each frame z-score
    are then fixed IEEE expressions over exact ints — breakpoint
    comparisons can never flip between engines. Degenerate flat series
    (σ = 0) emit all-'b' words by explicit guard, not NaN accident.

    Scale shape: one window exchange (row_number per group), one keyed
    aggregate to ``groups × segments`` rows, one ``segments``-wide
    ordered string_agg — state never exceeds the frame table."""
    vc = F.col(value_col).cast("double")
    # clamped e2 quantizer (|v2| ≤ 3e6 → squares ≤ 9e12, exact int64
    # through ~1e6 rows/group) with NULL/NaN rows dropped — unbounded
    # squares wrapped int64 on adversarial magnitudes
    v2 = F.least(
        F.greatest(F.round(vc * F.lit(100)), F.lit(-3e6)), F.lit(3e6)
    ).cast("long")
    df = df.filter(vc.isNotNull() & ~F.isnan(vc))
    rows = df.select(
        F.col(group_col).alias("__g"),
        v2.alias("__v2"),
        (F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.col(ts_col).asc_nulls_last(), F.col(tiebreak_col).asc_nulls_last()
            )
        ) - 1).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__n"),
    )
    seg = F.floor(
        F.col("__rn") * F.lit(int(segments)) / F.col("__n")
    ).cast("int")
    frames = (
        rows.filter(F.col("__n") >= F.lit(int(min_points)))
        .withColumn("__seg", seg)
        .groupBy("__g", "__seg")
        .agg(
            F.sum("__v2").alias("__s1s"),
            F.sum(F.col("__v2") * F.col("__v2")).alias("__s2s"),
            F.count(F.lit(1)).alias("__cs"),
            F.max("__n").alias("__n"),
        )
    )
    # series totals roll up from the frame table (segments rows/group) —
    # no second pass over the raw rows
    stats = frames.groupBy("__g").agg(
        F.sum("__s1s").alias("__s1"),
        F.sum("__s2s").alias("__s2"),
        F.max("__n").alias("__n"),
    ).select(
        "__g",
        "__n",
        (F.col("__s1").cast("double") / F.col("__n").cast("double")).alias(
            "__mu"
        ),
        # variance numerator in DOUBLE of the exact int sums: S1² and
        # S2·n overflow int64 on large groups (same double conversion on
        # both engines → deterministic)
        F.sqrt(
            (
                F.col("__s2").cast("double") * F.col("__n").cast("double")
                - F.col("__s1").cast("double") * F.col("__s1").cast("double")
            )
            / (F.col("__n").cast("double") * F.col("__n").cast("double"))
        ).alias("__sd"),
    )
    b1, b2, b3 = -0.6744897501960817, 0.0, 0.6744897501960817
    z = (
        F.col("__s1s").cast("double") / F.col("__cs").cast("double")
        - F.col("__mu")
    ) / F.col("__sd")
    sym = (
        F.when(F.col("__sd") == F.lit(0.0), F.lit("b"))
        .when(z < F.lit(b1), F.lit("a"))
        .when(z < F.lit(b2), F.lit("b"))
        .when(z < F.lit(b3), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    worded = (
        frames.join(F.broadcast(stats), ["__g", "__n"])
        .withColumn("__sym", sym)
        .groupBy("__g", "__n")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__seg", "__sym"))
                    ),
                    lambda s: s["__sym"],
                ),
            ).alias("sax_word")
        )
    )
    return worded.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("long").alias("n_points"),
        "sax_word",
    )


@register("column_probe")
def column_probe(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    user_col: str,
) -> DataFrame:
    """Per-key COLUMN-decomposition probe → one all-integer row per key
    with independently diagnosable bits: row count, NULL/NaN/Inf tallies
    per column, exact id/user sums, the exact epoch-second sum, and the
    value column under BOTH quantizers (Σ FLOOR(v·1e6) and Σ ROUND(v·1e6),
    finite values only).

    Purpose: when a composite gate goes red cross-engine, each column of
    this probe isolates ONE mechanism — row-set divergence (n_rows),
    id/user read (checksums), timestamp read (ts_sec_chk), non-finite
    handling (nan/inf tallies), floor- vs round-quantization of doubles.
    Every non-count column is an order-free MODULAR checksum (Σ of
    non-negative residues mod 2³¹−1): adversarial id/value magnitudes
    can never overflow int64 — Spark (non-ANSI) would wrap where DuckDB
    widens to HUGEINT, a silent cross-engine split. Quantizers go through
    the clamped ``quantize_e6`` family. Plan shape: one hash aggregate,
    map-side combined, no window/join."""
    P = 2147483647
    v = F.col(value_col).cast("double")
    inf = F.lit(float("inf"))
    is_nan = v.isNotNull() & F.isnan(v)
    is_inf = v.isNotNull() & ((v == inf) | (v == -inf))
    finite = v.isNotNull() & ~F.isnan(v) & (v != inf) & (v != -inf)
    sec = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    clamped = F.least(F.greatest(v, F.lit(-1e10)), F.lit(1e10)) * F.lit(1e6)

    def chk(col):
        return (F.sum((col % F.lit(P) + F.lit(P)) % F.lit(P)) % F.lit(P)).cast(
            "long"
        )

    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(ts_col).isNull(), 1).otherwise(0)).alias("n_null_ts"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null_value"),
        F.sum(F.when(is_nan, 1).otherwise(0)).alias("n_nan_value"),
        F.sum(F.when(is_inf, 1).otherwise(0)).alias("n_inf_value"),
        chk(F.col(id_col).cast("long")).alias("id_chk"),
        chk(F.col(user_col).cast("long")).alias("user_chk"),
        chk(sec).alias("ts_sec_chk"),
        chk(F.when(finite, F.floor(clamped).cast("long"))).alias("vfloor_chk"),
        chk(F.when(finite, F.round(clamped).cast("long"))).alias("vround_chk"),
    )


@register("order_probe")
def order_probe(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    n_buckets: int = 20,
) -> DataFrame:
    """ORDER-sensitive probe → per ``user_id mod n_buckets`` bucket: row
    count plus two position-weighted id checksums over the bucket's rows
    in (epoch-second, id, user) order — ``Σ rn·(id mod 1000003)`` and
    ``Σ (rn² mod 1000033)·(id mod 1000033)``, all exact int64 (bounded:
    rn ≤ bucket rows, each term < 1e12).

    Purpose: a red isolates cross-engine divergence to the ORDERING of
    the events stream itself (timestamp floor, tie semantics) with no
    value math involved; swapping any two non-identical rows changes at
    least one checksum. Rows with NULL ts/id/user are dropped in both
    engines first (Spark nulls-first vs SQL nulls-last). Plan shape: one
    keyed window + one hash aggregate over n_buckets groups."""
    base = df.filter(
        F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        (F.col(user_col) % F.lit(int(n_buckets))).alias("bucket"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("__t"),
        F.col(id_col).alias("__id"),
        F.col(user_col).alias("__u"),
    )
    w = Window.partitionBy("bucket").orderBy(F.asc_nulls_last("__t"), F.asc_nulls_last("__id"), F.asc_nulls_last("__u"))
    r = base.withColumn("rn", F.row_number().over(w).cast("long"))
    return r.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("rn") * (F.col("__id") % F.lit(1000003))).alias("ord_sum1"),
        F.sum(
            (F.col("rn") * F.col("rn") % F.lit(1000033))
            * (F.col("__id") % F.lit(1000033))
        ).alias("ord_sum2"),
    )
