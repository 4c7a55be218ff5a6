"""Custom stateful streaming operators via ``applyInPandasWithState`` and
the Spark 4 ``transformWithStateInPandas`` StatefulProcessor API.

The reference has no streaming surface; this is charter extension territory
(SURVEY.md §2.6 "Streaming"): arbitrary per-key state machines that the
built-in windowed aggregates can't express. Sessionization is the canonical
example — per-sensor gap-based sessions whose boundaries depend on the
*previous* event, i.e. genuinely order-dependent state.

Scale notes: state is keyed by sensor, so the state store partitions by the
grouping key and skew is bounded by per-sensor event rates; Arrow batches
cross the Python boundary once per (micro-batch, key-partition) — the same
Pandas-UDF economics as ``applyInPandas``. The transformWithState variant
runs on the RocksDB state store (required by the API, bundled with Spark),
which spills state to local disk — the store that holds at 100 TB key
cardinalities where the default HDFS-backed in-memory map cannot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_SHIM_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "protobuf_shim")
# SDP_PROTOBUF_PATH overrides the SDK root (same env var the shim honors)
_SDK_PB = os.path.join(
    os.environ.get("SDP_PROTOBUF_PATH", "/usr/lib/google-cloud-sdk/lib/third_party"),
    "cloudsdk",
    "google",
    "protobuf",
)


def ensure_streaming_protobuf() -> bool:
    """Make ``google.protobuf`` available to the streaming Python runner,
    returning whether transformWithState queries can execute here.

    The runner (Spark's state-server protocol) imports
    ``google.protobuf`` in a FRESH worker process, so availability is an
    environment property, not an in-process import: if a real protobuf is
    installed, nothing to do; otherwise, when the container ships the
    Cloud SDK's vendored pure-python runtime, prepend the aliasing shim
    (``protobuf_shim/``) to ``PYTHONPATH`` — which must happen BEFORE the
    JVM launches, since worker processes inherit the gateway's
    environment. ``get_spark`` calls this; environments with neither
    protobuf nor the SDK get ``False`` and tests skip the executed path
    (graph tests still run everywhere)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(_SDK_PB):
        return False
    current = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + os.pathsep + current if current else _SHIM_DIR
        )
    return True


def _trunc_sec(ns):
    """ns → seconds truncated toward ZERO (matches Spark unix_timestamp
    and DuckDB //); Python's // floors, off by one for pre-1970 values."""
    import numpy as np

    if isinstance(ns, np.ndarray):
        return (np.abs(ns) // 10**9) * np.sign(ns)
    return -((-ns) // 10**9) if ns < 0 else ns // 10**9


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
        import numpy as np

        (uid,) = key
        if state.exists:
            sid, start_ns, last_ns, n = state.get
        else:
            sid, start_ns, last_ns, n = 0, -1, -1, 0
        cols = [
            sensor_col,
            "session_id",
            "n_events",
            "session_start_epoch",
            "session_end_epoch",
        ]
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            if last_ns >= 0:  # re-emit the open tail unchanged
                yield pd.DataFrame(
                    [(uid, sid, n, _trunc_sec(start_ns), _trunc_sec(last_ns))], columns=cols
                )
            else:
                yield pd.DataFrame([], columns=cols)
            return
        batch = pd.concat(parts)
        # NULL event times cannot be sessionized (batch twin + oracle drop
        # them too); NaT would otherwise cast to INT64_MIN and fabricate
        # phantom sessions at the sorted tail
        batch = batch[batch[ts_col].notna()]
        if not len(batch):
            if last_ns >= 0:
                yield pd.DataFrame(
                    [(uid, sid, n, _trunc_sec(start_ns), _trunc_sec(last_ns))],
                    columns=cols,
                )
            else:
                yield pd.DataFrame([], columns=cols)
            return
        batch = batch.sort_values([ts_col, order_tiebreak])
        t = batch[ts_col].values.astype("datetime64[ns]").astype("int64")
        # Vectorized segmentation: a new session starts wherever the gap to
        # the previous event exceeds gap_ns (no per-event Python loop).
        breaks = np.flatnonzero(np.diff(t) > gap_ns)
        seg_start = np.r_[0, breaks + 1]
        seg_end = np.r_[breaks, len(t) - 1]
        starts = t[seg_start]
        ends = t[seg_end]
        counts = (seg_end - seg_start + 1).astype("int64")
        continues = last_ns >= 0 and int(t[0]) - last_ns <= gap_ns
        if continues:
            # First segment extends the open state session.
            starts[0] = start_ns
            counts[0] += n
            base = sid  # first segment keeps the state session id
        else:
            base = sid + 1 if last_ns >= 0 else 1
        session_ids = np.arange(base, base + len(starts), dtype="int64")
        out = pd.DataFrame(
            {
                # object dtype: a NULL group key must emit NULL, not the
                # INT64_MIN that np.full(int64) silently casts None into
                sensor_col: np.full(len(starts), uid, dtype=object),
                "session_id": session_ids,
                "n_events": counts,
                "session_start_epoch": _trunc_sec(starts),
                "session_end_epoch": _trunc_sec(ends),
            }
        )
        if last_ns >= 0 and not continues:
            # The previous tail is now closed and final — re-emit it so update
            # mode carries its final form.
            out = pd.concat(
                [
                    pd.DataFrame(
                        [(uid, sid, n, _trunc_sec(start_ns), _trunc_sec(last_ns))],
                        columns=cols,
                    ),
                    out,
                ]
            )
        state.update(
            (int(session_ids[-1]), int(starts[-1]), int(ends[-1]), int(counts[-1]))
        )
        yield out

    return events.groupBy(sensor_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_running_stats(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running statistics (count / sum / min / max) as a
    ``transformWithStateInPandas`` StatefulProcessor — the Spark 4 arbitrary
    -state API. Each micro-batch re-emits the key's updated running row
    (update semantics), so the latest emission per key equals the batch
    aggregate; running aggregates over non-negative counts are monotone,
    which is what makes the memory-sink MAX fold exact for oracles.

    Versus ``applyInPandasWithState``: named state variables (ValueState)
    with per-variable schemas and TTL support, timers for event-/processing
    -time callbacks, and the RocksDB state store (disk-spilling, scales to
    key cardinalities the in-memory map store cannot). State here is ONE
    fixed-width row per key regardless of event volume.

    Environment note: executing a transformWithState query needs
    ``google.protobuf`` in the streaming Python workers (Spark's
    state-server protocol). ``ensure_streaming_protobuf`` provisions it —
    either a real install or the Cloud-SDK-vendored runtime via the
    aliasing shim (``protobuf_shim/``) — and the executed single-batch ≡
    batch-aggregate equivalence is asserted by tests/test_streaming.py;
    graph/schema tests remain environment-independent. Requires
    ``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider`` at query start.

    Not in the external driver's ``queries()`` set: the state-server
    runner inherits the JVM's environment, fixed at JVM launch — a session
    created before ``ensure_streaming_protobuf`` ran (the external
    driver's vanilla session) cannot execute TWS in this container
    (verified: ``addPyFile`` shipping does NOT reach the runner, which
    imports the proto before py-files processing). The executed coverage
    is the pytest equivalence test, which provisions the environment via
    ``get_spark``.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        f"{key_col} long, n long, sum_value double, min_value double, "
        "max_value double"
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n long, s double, mn double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, s = 0, 0.0
            mn, mx = float("inf"), float("-inf")
            if self._agg.exists():
                n, s, mn, mx = self._agg.get()
            for pdf in rows:
                v = pdf[value_col].dropna()
                if len(v):
                    n += int(len(v))
                    s += float(v.sum())
                    mn = min(mn, float(v.min()))
                    mx = max(mx, float(v.max()))
            self._agg.update((n, s, mn, mx))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n": [n],
                    "sum_value": [s],
                    "min_value": [mn if n else None],
                    "max_value": [mx if n else None],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def neardedup_batch_handler(
    state_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
):
    """``foreachBatch`` handler running INCREMENTAL near-dedup with a
    parquet-persisted LSH-signature state — the production day-over-day
    drop driven by Structured Streaming: each micro-batch signs once,
    banded-joins yesterday's index, lands its survivors under
    ``batch=<id>/`` (idempotent overwrite) and writes the UPDATED state as
    a new version directory.

    State versioning makes the handler restart-safe without ever
    overwriting a directory it is reading: batch ``b`` reads the highest
    ``v<k>`` with ``k < b`` (None on the first batch) and writes ``v<b>``
    with overwrite — a re-run of batch ``b`` reads the same prior state
    and rewrites the same outputs. State holds survivors' signatures only
    (O(survivors × num_hashes) longs), so day N+1 never re-signs or
    rescans days 1..N — the same contract as the batch
    ``incremental_neardedup``, which this wraps verbatim."""
    import os

    from sensordatapipelines_spark.operators.dedup import incremental_neardedup

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = [
            int(d[1:])
            for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
        ]
        state = (
            spark.read.parquet(f"{state_dir}/v{max(prior)}") if prior else None
        )
        survivors, new_state = incremental_neardedup(
            batch_df, state, id_col=id_col, text_col=text_col, **kw
        )
        survivors.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        new_state.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    return handle
