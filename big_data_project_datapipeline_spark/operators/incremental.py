"""Incremental-processing primitives: anti-join delta + empty-state bootstrap.

The reference's incremental core is ``raw[~raw.datetime.isin(prev.datetime)]``
(reference data_engineering.py:107, F5/J5) plus an existence-guarded scan that
falls back to an empty frame when no previous output exists (reference
raw_data.py:245,266-269 and data_engineering.py:23-28, S7).

Spark-first design: the delta is a ``left_anti`` join — one shuffle on the
key, map-side combinable, and at 100 TB the previous-output side is pruned
to the trailing partitions by a partition filter *before* the shuffle
(the reference re-reads its whole history file every run).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException


def anti_join_delta(
    new: DataFrame,
    previous: DataFrame,
    keys: Sequence[str] = ("datetime",),
) -> DataFrame:
    """Rows of ``new`` whose key is absent from ``previous`` (F5/J5).

    ``left_anti`` has null-safe-enough semantics for our keys (a null key in
    ``new`` survives unless matched; pandas ``isin`` treats NaN the same way).
    """
    return new.join(previous.select(*keys), on=list(keys), how="left_anti")


def load_or_empty(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
) -> DataFrame:
    """Existence-guarded scan (S7): previous output, or empty frame with the
    declared schema when the sink doesn't exist yet (bootstrap run)."""
    try:
        reader = spark.read.schema(schema)
        if fmt == "csv":
            return reader.csv(path, header=True)
        return reader.format(fmt).load(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)
