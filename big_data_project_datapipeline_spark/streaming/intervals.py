"""Incremental interval-concurrency monitoring across cron ticks.

The batch sweep-line (operators/intervals.interval_concurrency, q205)
rescans every interval per run. In production the intervals arrive in
daily batches, and the sweep-line's per-date NET deltas are perfectly
mergeable state — nets are additive over any partition of the input —
so each tick folds only the NEW batch's (ts, net) rows into a
persistent store (the streaming/drift.py sum-merge machinery on the
crash-safe batch-keyed delta/ledger) and the concurrency report runs
the SAME running-sum tail the batch operator uses over the folded
store. A stream fed batch-by-batch therefore reports BIT-equal steps
to the batch operator on the union — including under batch replay
(the ledger blocks refolds; pinned by tests/test_stream_intervals.py).

Scale shape per tick: two projected columns from the new batch, one
map-side-combinable groupBy(date) with O(distinct dates) output, one
sum-merge of two calendar-bounded frames. History is never rescanned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_datapipeline_spark.operators.intervals import (
    concurrency_from_net,
    interval_net_deltas,
)
from big_data_project_datapipeline_spark.streaming.corpus import (
    _fold_pending_deltas,
)

NET_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.DateType()),
        T.StructField("net", T.LongType()),
    ]
)


def _merge_nets(prev: DataFrame, delta: DataFrame) -> DataFrame:
    # net-0 rows stay: the batch groupBy emits a row for every
    # boundary date, including dates whose opens and closes cancel,
    # so the fold keeps them for bit-parity with the union.
    return (
        prev.unionByName(delta)
        .groupBy("ts")
        .agg(F.sum("net").cast("long").alias("net"))
    )


def maintain_interval_nets(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    batch_id: str,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """One cron tick: compute the NEW batch's per-date net deltas (the
    batch operator's own code path), land them under a batch-keyed
    delta subdir (replay overwrites, the fold ledger prevents
    double-sums), sum-fold all pending deltas, and return the folded
    store."""
    nets = interval_net_deltas(batch_df, start_col, end_col).select(
        F.col("ts").cast("date").alias("ts"),
        F.col("net").cast("long").alias("net"),
    )
    delta_path = os.path.join(store_dir, "deltas", str(batch_id))
    nets.write.mode("overwrite").parquet(delta_path)
    return _fold_pending_deltas(spark, store_dir, NET_SCHEMA, _merge_nets)


def concurrency_report(spark: SparkSession, store_dir: str) -> DataFrame:
    """The step frame (ts, net, concurrent) from the folded net store
    alone — no interval rescans: folded nets over all ticks equal the
    batch groupBy on the union, and the running-sum tail is the SAME
    code path (operators/intervals.concurrency_from_net), so the
    report is bit-equal to interval_concurrency on every interval
    seen so far."""
    net = spark.read.schema(NET_SCHEMA).parquet(
        os.path.join(store_dir, "counts")
    )
    return concurrency_from_net(net)


def stream_interval_monitor(
    spark: SparkSession,
    intervals_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    start_col: str = "start",
    end_col: str = "end",
    query_name: str = "engine_stream_intervals",
    schema=None,
):
    """Structured-Streaming front end: an availableNow drain over a
    landed intervals directory — every parquet file not yet seen by
    the checkpoint flows through one maintain_interval_nets tick
    (keyed by the streaming batch id, so a replayed batch overwrites
    its delta instead of re-folding). The (checkpoint_dir, store_dir)
    pair is ONE unit of state. Pass ``schema`` explicitly to start the
    monitor before the first file lands."""
    if schema is None:
        schema = spark.read.parquet(intervals_dir).schema
    stream = spark.readStream.schema(schema).parquet(intervals_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: maintain_interval_nets(
                batch_df.sparkSession,
                batch_df,
                store_dir,
                f"b{batch_id}",
                start_col=start_col,
                end_col=end_col,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
