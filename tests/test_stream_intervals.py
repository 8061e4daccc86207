"""Incremental sweep-line (streaming/intervals.py): the concurrency
report from the sum-folded net store after N ticks must be BIT-EQUAL
to the batch operator (operators/intervals.interval_concurrency) run
over the union of all folded batches — including under tick replay and
a checkpointed availableNow drain."""

from __future__ import annotations

from datetime import date

import pytest

from big_data_project_datapipeline_spark.operators.intervals import (
    interval_concurrency,
)
from big_data_project_datapipeline_spark.streaming import intervals as SI


def _iv(spark, rows):
    return spark.createDataFrame(rows, "start date, end date")


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "net_store")


def _steps(df):
    return {r["ts"]: (r["net"], r["concurrent"]) for r in df.collect()}


def test_two_ticks_bit_equal_batch(spark, store):
    """Tick 2 closes concurrency tick 1 opened (its interval overlaps
    wave 1's) and cancels a boundary exactly (net-0 row retained)."""
    w1 = _iv(spark, [
        (date(2024, 1, 1), date(2024, 1, 5)),
        (date(2024, 1, 3), date(2024, 1, 3)),
    ])
    w2 = _iv(spark, [
        (date(2024, 1, 4), date(2024, 1, 8)),
        (date(2024, 1, 6), date(2024, 1, 2)),  # inverted: dropped
    ])
    SI.maintain_interval_nets(spark, w1, store, batch_id="t1")
    SI.maintain_interval_nets(spark, w2, store, batch_id="t2")
    got = _steps(SI.concurrency_report(spark, store))
    want = _steps(interval_concurrency(w1.unionByName(w2), "start", "end"))
    assert got == want
    assert got[date(2024, 1, 4)][0] == 0  # +1 open cancels the -1 close


def test_replayed_tick_is_idempotent(spark, store):
    w = _iv(spark, [(date(2024, 2, 1), date(2024, 2, 3))])
    SI.maintain_interval_nets(spark, w, store, batch_id="t1")
    once = _steps(SI.concurrency_report(spark, store))
    SI.maintain_interval_nets(spark, w, store, batch_id="t1")
    twice = _steps(SI.concurrency_report(spark, store))
    assert once == twice == _steps(interval_concurrency(w, "start", "end"))


def test_structured_stream_drain_matches_batch(spark, store, tmp_path):
    w = _iv(spark, [
        (date(2024, 3, 1), date(2024, 3, 10)),
        (date(2024, 3, 5), date(2024, 3, 5)),
        (date(2024, 3, 8), date(2024, 3, 20)),
    ])
    landed = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    w.write.mode("overwrite").parquet(landed)
    q = SI.stream_interval_monitor(spark, landed, store, ckpt)
    q.awaitTermination(120)
    got = _steps(SI.concurrency_report(spark, store))
    assert got == _steps(interval_concurrency(w, "start", "end"))
    # a second drain with nothing new lands no new deltas
    q2 = SI.stream_interval_monitor(spark, landed, store, ckpt)
    q2.awaitTermination(120)
    assert _steps(SI.concurrency_report(spark, store)) == got


def test_bootstrap_empty_store_then_first_tick(spark, store, tmp_path):
    """concurrency_report on a never-written store raises (no counts
    dir yet — the q176 bootstrap contract is maintain-first); the
    first tick creates it."""
    w = _iv(spark, [(date(2024, 4, 1), date(2024, 4, 2))])
    with pytest.raises(Exception):
        SI.concurrency_report(spark, store).collect()
    SI.maintain_interval_nets(spark, w, store, batch_id="t1")
    assert _steps(SI.concurrency_report(spark, store)) == _steps(
        interval_concurrency(w, "start", "end")
    )
