"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only state is "the previous output file" (SURVEY.md §2.11);
its monitoring block keeps running API-health counters
(reference raw_data.py:360-426). This operator generalizes that: arbitrary
per-key running aggregates maintained incrementally across micro-batches
with GroupState — the escape hatch for stateful logic that
watermarked built-in aggregations can't express (here: running count/sum/
max plus a high-value-event counter, emitted per batch with state carried
forward).

Scale: state is per-key and O(1) per key; keys are hash-partitioned across
executors. Idle-key eviction is OPT-IN via ``idle_timeout_ms`` (processing-
time timeout: a key whose state goes untouched that long is dropped,
bounding total state like a watermark bounds windows); the default keeps
every key, which is correct for running-forever totals but unbounded under
key churn — pick per use case.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("n_high", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("n_high", T.LongType()),
    ]
)


def _make_update_user_state(idle_timeout_ms: int | None):
    """Build the state-update function with the timeout BAKED IN as a
    closure constant: the function ships to executor python workers by
    pickle, so a driver-side module global would not propagate."""

    def _update_user_state(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # With a processing-time timeout configured, a timed-out key's
        # state is REMOVED (and nothing emitted) — the eviction half of
        # the bounded-state story.
        if state.hasTimedOut:
            state.remove()
            return
        n, total, mx, n_high = (
            state.get if state.exists else (0, 0.0, float("-inf"), 0)
        )
        for pdf in batches:
            vals = pdf["value"].dropna()
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
            n_high += int((vals > 150.0).sum())
        state.update((n, total, mx, n_high))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [None if mx == float("-inf") else mx],
                "n_high": [n_high],
            }
        )

    return _update_user_state


def running_user_stats(
    stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running statistics maintained across micro-batches.

    Works on a streaming DataFrame of (user_id, value, ...); each trigger
    emits one updated row per user seen in the batch ("update"-style
    output). State is one tuple per LIVE user: pass ``idle_timeout_ms``
    to evict keys idle that long (bounded state under key churn);
    default None keeps every key's totals forever."""
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user_state(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if idle_timeout_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
