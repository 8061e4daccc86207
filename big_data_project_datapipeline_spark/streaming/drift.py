"""Incremental PSI drift monitoring across cron ticks.

The batch PSI operator (functions/quality.psi_drift, q141) re-bins both
populations every run. In production the reference window is FROZEN
(that is the PSI convention — bins come from the reference) and the
current population arrives as a stream of daily batches; per-(group,
bin) counts are a MERGEABLE state (associative sums), so each tick
should fold the new batch's bin counts into a persistent store instead
of rescanning history. This module is that fold — the drift sibling of
streaming/corpus.py's token-count store, sharing its crash-safe
batch-keyed delta/ledger machinery (_fold_pending_deltas).

Bit-parity with batch: the bin expression (quality.psi_bin) and the
PSI tail (quality.psi_from_bin_counts) are the SAME code paths the
batch operator uses, so a stream fed batch-by-batch produces the exact
PSI the batch operator computes on the union (pinned by
tests/test_stream_drift.py).

Scale shape per tick: one map-side-combinable groupBy over the NEW
batch only (broadcast of the O(groups) frozen ranges), then one merge
of two O(groups × bins) frames. Replay-safe via the per-batch delta
subdir + fold ledger.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_datapipeline_spark.functions.quality import (
    psi_bin,
    psi_from_bin_counts,
)
from big_data_project_datapipeline_spark.streaming.corpus import (
    _fold_pending_deltas,
)

REFERENCE_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("cr", T.LongType()),
        T.StructField("rmin", T.DoubleType()),
        T.StructField("rmax", T.DoubleType()),
    ]
)

CUR_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("cc", T.LongType()),
    ]
)


def _clean(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    v = F.col(value_col)
    return df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("grp"), v.alias("v")
    )


def freeze_reference(
    ref_df: DataFrame,
    store_dir: str,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = 10,
) -> DataFrame:
    """Compute the frozen reference: per-group ranges + the complete
    (grp, bin) reference histogram (zeros included — the Laplace terms
    need empty bins), written once under ``<store>/reference``.
    Overwrite-idempotent: re-freezing the same reference is a no-op in
    content."""
    clean = _clean(ref_df, value_col, group_col)
    ranges = clean.groupBy("grp").agg(
        F.min("v").alias("rmin"), F.max("v").alias("rmax")
    )
    binned = clean.join(F.broadcast(ranges), "grp").select(
        "grp",
        psi_bin(F.col("v"), F.col("rmin"), F.col("rmax"), n_bins).alias(
            "bin"
        ),
    )
    counts = binned.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cr")
    )
    grid = ranges.select(
        "grp",
        "rmin",
        "rmax",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    ref = grid.join(counts, ["grp", "bin"], "left").select(
        "grp",
        "bin",
        F.coalesce(F.col("cr"), F.lit(0)).cast("long").alias("cr"),
        "rmin",
        "rmax",
    )
    path = os.path.join(store_dir, "reference")
    ref.write.mode("overwrite").parquet(path)
    return ref.sparkSession.read.schema(REFERENCE_SCHEMA).parquet(path)


def _merge_cur_counts(prev: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        prev.unionByName(delta)
        .groupBy("grp", "bin")
        .agg(F.sum("cc").cast("long").alias("cc"))
    )


def maintain_drift_counts(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    batch_id: str,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = 10,
) -> DataFrame:
    """One cron tick: bin the NEW batch against the frozen reference
    ranges, land its (grp, bin) counts under a batch-keyed delta
    subdir (replay overwrites, never duplicates), fold all pending
    deltas into the current-population store, and return the folded
    store. Rows whose group has no frozen reference are dropped (no
    bins exist for them — same as the batch operator, whose grid comes
    from the reference side)."""
    ref = spark.read.schema(REFERENCE_SCHEMA).parquet(
        os.path.join(store_dir, "reference")
    )
    ranges = ref.select("grp", "rmin", "rmax").distinct()
    clean = _clean(batch_df, value_col, group_col)
    binned = clean.join(F.broadcast(ranges), "grp").select(
        "grp",
        psi_bin(F.col("v"), F.col("rmin"), F.col("rmax"), n_bins).alias(
            "bin"
        ),
    )
    delta = binned.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cc")
    )
    delta_path = os.path.join(store_dir, "deltas", str(batch_id))
    delta.write.mode("overwrite").parquet(delta_path)
    return _fold_pending_deltas(
        spark, store_dir, CUR_SCHEMA, _merge_cur_counts
    )


def psi_report(
    spark: SparkSession,
    store_dir: str,
    group_col: str = "event_type",
    n_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """The drift report from the stores alone — no raw-data rescans:
    frozen reference histogram ⊕ folded current counts through the
    SAME PSI tail the batch operator uses (bit-equal by construction)."""
    ref = spark.read.schema(REFERENCE_SCHEMA).parquet(
        os.path.join(store_dir, "reference")
    )
    cur = spark.read.schema(CUR_SCHEMA).parquet(
        os.path.join(store_dir, "counts")
    )
    full = (
        ref.select("grp", "bin", "cr")
        .join(cur, ["grp", "bin"], "left")
        .select(
            "grp",
            "bin",
            "cr",
            F.coalesce(F.col("cc"), F.lit(0)).cast("long").alias("cc"),
        )
    )
    return psi_from_bin_counts(
        full, group_col=group_col, n_bins=n_bins, smoothing=smoothing
    )


def stream_drift_monitor(
    spark: SparkSession,
    events_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = 10,
    query_name: str = "engine_stream_drift",
    schema=None,
):
    """Structured-Streaming front end for the drift store: an
    availableNow drain over a landed events directory — every parquet
    file not yet seen by the checkpoint flows through one
    maintain_drift_counts tick (keyed by the streaming batch id, so a
    replayed batch overwrites its delta instead of double-counting —
    the same idempotence contract the cron entry point has).

    freeze_reference must have run once against this store first; the
    (checkpoint_dir, store_dir) pair is ONE unit of state — batch ids
    are unique per checkpoint, so never pair a fresh checkpoint with
    an existing delta store.

    Pass ``schema`` explicitly to start the monitor BEFORE the first
    file lands (review fix: the eager batch-read inference below
    throws on an empty/absent landing dir — a valid zero-file drain
    otherwise).
    """
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: maintain_drift_counts(
                batch_df.sparkSession,
                batch_df,
                store_dir,
                f"b{batch_id}",
                value_col=value_col,
                group_col=group_col,
                n_bins=n_bins,
            )
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def jsd_report(
    spark: SparkSession,
    store_dir: str,
    group_col: str = "event_type",
    n_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Jensen–Shannon drift from the SAME stores psi_report reads — the
    batch q172 operator shares the reference-frozen binning convention
    with PSI (one `_drift_bin_counts` scaffold), so its tail
    (quality.jsd_from_bin_counts) runs bit-equal off the frozen
    reference histogram ⊕ folded current counts, no raw-data rescans.
    One store, two drift scores.

    (Binned KS is deliberately NOT store-served: q171's convention
    pools the [min, max] span over BOTH sides, and a frozen-reference
    monitor cannot know the current side's bounds in advance — its
    grid is reference-frozen by design.)"""
    from big_data_project_datapipeline_spark.functions.quality import (
        jsd_from_bin_counts,
    )

    ref = spark.read.schema(REFERENCE_SCHEMA).parquet(
        os.path.join(store_dir, "reference")
    )
    cur = spark.read.schema(CUR_SCHEMA).parquet(
        os.path.join(store_dir, "counts")
    )
    full = (
        ref.select("grp", "bin", "cr")
        .join(cur, ["grp", "bin"], "left")
        .select(
            "grp",
            "bin",
            "cr",
            F.coalesce(F.col("cc"), F.lit(0)).cast("long").alias("cc"),
        )
    )
    return jsd_from_bin_counts(
        full, group_col=group_col, n_bins=n_bins, smoothing=smoothing
    )
