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
