"""Incremental categorical-association monitoring across cron ticks.

The batch Cramér's V matrix (functions/quality.cramers_v_matrix, q211)
rescans every row per run. Contingency CELL COUNTS are perfectly
mergeable state — counts are additive over any partition of the input —
so each tick folds only the NEW batch's stacked pair cells (the SAME
expression the batch matrix uses, functions/quality.stacked_pair_cells)
into a persistent store on the crash-safe batch-keyed delta/ledger,
and the association report runs the SAME χ²/V tail
(functions/quality.cramers_v_from_cells) over the folded store. A
stream fed batch-by-batch therefore reports BIT-equal matrices to the
batch operator on the union — including under batch replay (the ledger
blocks refolds; pinned by tests/test_stream_crosstab.py). This is the
drift monitor a feed contract wants: a column pair whose V moves
between ticks changed its joint distribution, with zero row rescans.

Scale shape per tick: one map-only stack of the new batch (|pairs|
projections), one map-side-combinable groupBy with
O(levels_x · levels_y · pairs) output, one sum-merge of two
level-bounded frames. History is never rescanned.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_datapipeline_spark.functions.quality import (
    cramers_v_from_cells,
    stacked_pair_cells,
)
from big_data_project_datapipeline_spark.streaming.corpus import (
    _fold_pending_deltas,
)

CELL_SCHEMA = T.StructType(
    [
        T.StructField("col_x", T.StringType()),
        T.StructField("col_y", T.StringType()),
        T.StructField("x", T.StringType()),
        T.StructField("y", T.StringType()),
        T.StructField("o", T.LongType()),
    ]
)


def _merge_cells(prev: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        prev.unionByName(delta)
        .groupBy("col_x", "col_y", "x", "y")
        .agg(F.sum("o").cast("long").alias("o"))
    )


def maintain_contingency(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    batch_id: str,
    cols: Sequence[str],
) -> DataFrame:
    """One cron tick: stack the NEW batch's pair cells (the batch
    matrix's own expression), land them under a batch-keyed delta
    subdir (replay overwrites; the fold ledger prevents double-sums),
    sum-fold all pending deltas, and return the folded store."""
    cells = stacked_pair_cells(batch_df, cols)
    delta_path = os.path.join(store_dir, "deltas", str(batch_id))
    cells.write.mode("overwrite").parquet(delta_path)
    return _fold_pending_deltas(spark, store_dir, CELL_SCHEMA, _merge_cells)


def cramers_v_report(spark: SparkSession, store_dir: str) -> DataFrame:
    """The per-pair Cramér's V matrix from the folded cell store alone
    — no row rescans: folded cells over all ticks equal the batch
    stack's groupBy on the union, and the χ²/V tail is the SAME code
    path (functions/quality.cramers_v_from_cells), so the report is
    bit-equal to cramers_v_matrix on every row seen so far."""
    cells = spark.read.schema(CELL_SCHEMA).parquet(
        os.path.join(store_dir, "counts")
    )
    return cramers_v_from_cells(cells)


def stream_contingency_monitor(
    spark: SparkSession,
    rows_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    cols: Sequence[str],
    query_name: str = "engine_stream_crosstab",
    schema=None,
):
    """Structured-Streaming front end: an availableNow drain over a
    landed rows directory — every parquet file not yet seen by the
    checkpoint flows through one maintain_contingency tick (keyed by
    the streaming batch id, so a replayed batch overwrites its delta
    instead of re-folding). The (checkpoint_dir, store_dir) pair is
    ONE unit of state. Pass ``schema`` explicitly to start the monitor
    before the first file lands."""
    if schema is None:
        schema = spark.read.parquet(rows_dir).schema
    stream = spark.readStream.schema(schema).parquet(rows_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: maintain_contingency(
                batch_df.sparkSession,
                batch_df,
                store_dir,
                f"b{batch_id}",
                cols=cols,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
