"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface; this is charter extension territory
(SURVEY.md §2.6 "Streaming"): arbitrary per-key state machines that the
built-in windowed aggregates can't express. Sessionization is the canonical
example — per-sensor gap-based sessions whose boundaries depend on the
*previous* event, i.e. genuinely order-dependent state.

Scale notes: state is keyed by sensor, so the state store partitions by the
grouping key and skew is bounded by per-sensor event rates; Arrow batches
cross the Python boundary once per (micro-batch, key-partition) — the same
Pandas-UDF economics as ``applyInPandas``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    sensor_col: str = "user_id",
    gap_seconds: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization over a stream: per sensor, events closer than
    ``gap_seconds`` chain into one session; emits one row per session seen so
    far — ``(sensor, session_id, n_events, session_start_epoch,
    session_end_epoch)`` — carrying the open tail session in state between
    micro-batches (update semantics: the tail row re-emits extended when new
    events arrive for it).

    Single-batch runs (one staged file + ``availableNow``) produce exactly
    the batch ``sessionize`` result, which is what the oracle checks.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{sensor_col} long, session_id long, n_events long, "
        "session_start_epoch long, session_end_epoch long"
    )
    state_schema = "session_id long, start_ns long, last_ns long, n long"
    gap_ns = int(gap_seconds) * 1_000_000_000

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.exists:
            sid, start_ns, last_ns, n = state.get
        else:
            sid, start_ns, last_ns, n = 0, -1, -1, 0
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, order_tiebreak])
            ts_ns = pdf[ts_col].values.astype("datetime64[ns]").astype("int64")
            for t in ts_ns:
                t = int(t)
                if last_ns < 0:
                    sid, start_ns, n = 1, t, 1
                elif t - last_ns > gap_ns:
                    closed.append(
                        (uid, sid, n, start_ns // 10**9, last_ns // 10**9)
                    )
                    sid, start_ns, n = sid + 1, t, 1
                else:
                    n += 1
                last_ns = t
        state.update((sid, start_ns, last_ns, n))
        if last_ns >= 0:
            # The open tail session: emitted now, re-emitted (extended) if a
            # later micro-batch appends to it — standard update-mode behavior.
            closed.append((uid, sid, n, start_ns // 10**9, last_ns // 10**9))
        yield pd.DataFrame(
            closed,
            columns=[
                sensor_col,
                "session_id",
                "n_events",
                "session_start_epoch",
                "session_end_epoch",
            ],
        )

    return events.groupBy(sensor_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
