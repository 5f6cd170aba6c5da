"""Custom stateful streaming operators via ``applyInPandasWithState``
(the arbitrary-state API — for semantics the built-in windowed/session
aggregations can't express).

State is partitioned by the grouping key, lives in the state store, and
is updated one Arrow batch at a time; per-key state here is a constant
few counters, so state size is O(distinct keys) regardless of input
volume — the property that keeps it viable on an unbounded stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id long, n_events long, sum_value double"
_STATE_SCHEMA = "n bigint, s double"


def _update_user_counters(key, pdfs, state: GroupState):
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def stateful_user_counters(events: DataFrame) -> DataFrame:
    """Running per-user event count + value sum with explicit state —
    the plumbing a custom sessionizer / anomaly tracker drops into.
    Emits the refreshed totals for every user seen in each micro-batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_counters,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESS_OUT = "user_id long, session_start timestamp, session_end timestamp, n_events long"
_SESS_STATE = "start_ms bigint, end_ms bigint, n bigint"


def _finalize_idle_session(gap_ms: int):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms", tz="UTC")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms", tz="UTC")],
                    "n_events": [n],
                }
            )
            return
        start_ms, end_ms, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            # __ms is TRUE epoch ms computed JVM-side (unix_millis):
            # applyInPandasWithState hands timestamps over as tz-naive
            # SESSION-LOCAL wall time, so deriving epoch from ts here
            # would shift by the session-timezone offset and set a
            # timeout before/after the (true-epoch) watermark — a
            # confirmed INVALID_TIMEOUT_TIMESTAMP crash under
            # non-UTC session timezones
            ms = pdf["__ms"].astype("int64").tolist()
            if ms:
                lo, hi = min(ms), max(ms)
                start_ms = lo if start_ms is None else min(start_ms, lo)
                end_ms = hi if end_ms is None else max(end_ms, hi)
                n += len(ms)
        state.update((start_ms, end_ms, n))
        # fire when the EVENT-TIME watermark passes last-seen + gap
        state.setTimeoutTimestamp(end_ms + gap_ms)
        yield from ()

    return fn


def idle_session_finalizer(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session FINALIZATION via event-time state timeout — the
    arbitrary-state pattern ``NoTimeout`` counters cannot express: a
    user's running session accumulates silently, and the summary row
    is emitted exactly once, when the WATERMARK passes the user's last
    event plus ``gap`` (``GroupStateTimeout.EventTimeTimeout`` +
    ``setTimeoutTimestamp``); the state is removed on firing, so state
    size tracks only the OPEN sessions.  This differs from
    ``F.session_window`` aggregation in that the callback can carry
    arbitrary per-session state (counters here; a fraud score or
    model-feature vector in production) and decides its own emission.

    ``gap`` must be a ``"<n> minutes|hours|seconds"`` string (parsed
    to ms here, not sent to Spark).
    """
    qty, unit = gap.split()
    mult = {"seconds": 1_000, "minutes": 60_000, "hours": 3_600_000}[
        unit.rstrip("s") + "s"
    ]
    gap_ms = int(qty) * mult
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .withColumn("__ms", F.unix_millis("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _finalize_idle_session(gap_ms),
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
