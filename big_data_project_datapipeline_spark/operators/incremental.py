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
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException


def anti_join_delta(
    new: DataFrame,
    previous: DataFrame,
    keys: Sequence[str] = ("datetime",),
) -> DataFrame:
    """Rows of ``new`` whose key is absent from ``previous`` (F5/J5).

    NULL-SAFE on the keys (eqNullSafe join condition): a plain left_anti
    equi-join never matches null keys, so a null-keyed row that already
    landed in the sink would re-survive the anti join on EVERY later run
    and duplicate monotonically (review fix). pandas ``isin`` — the
    reference semantics — matches NaT to NaT, which eqNullSafe mirrors.
    """
    prev = previous.select(
        *[F.col(k).alias(f"__prev_{k}") for k in keys]
    ).dropDuplicates()
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__prev_{k}"))
        cond = c if cond is None else (cond & c)
    return new.join(prev, on=cond, how="left_anti")


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
    except AnalysisException as e:
        # ONLY the path-missing bootstrap case may fall back to empty:
        # swallowing every AnalysisException (corrupt footer, bad fmt)
        # would make an established sink look like a first run and
        # re-append the whole input (review fix)
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return spark.createDataFrame([], schema)
        raise


AGG_STATE_COLS = ["n", "sum_dec", "vmin", "vmax", "users_hll"]


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    distinct_col: str | None = None,
) -> DataFrame:
    """Mergeable per-key aggregate STATE — the incremental
    materialized-view pattern: instead of recomputing a summary over
    100 TB of history each day, keep (count, decimal sum, min, max, HLL
    sketch) per key and fold each new partition's state in with
    ``merge_aggregate_state``. Every component is associative and
    commutative: decimal sums are exact (so merge order can't change a
    bit), min/max are lattice joins, and the HLL sketch is the
    classic mergeable distinct-count summary.
    """
    dec = F.col(value_col).cast("decimal(28,6)")
    aggs = [
        F.count(value_col).alias("n"),
        F.sum(dec).alias("sum_dec"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    ]
    if distinct_col:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("users_hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    prev: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a new partition's state into the running state: one groupBy
    over the UNION of the two O(keys) frames — never touches raw rows.
    """
    both = prev.unionByName(new, allowMissingColumns=True)
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    ]
    if "users_hll" in both.columns:
        aggs.append(F.hll_union_agg("users_hll").alias("users_hll"))
    return both.groupBy(*keys).agg(*aggs)


def read_aggregate_state(state: DataFrame) -> DataFrame:
    """Materialize user-facing metrics from the state: mean from the
    exact decimal sum, distinct estimate from the sketch."""
    out = state.select(
        *[c for c in state.columns if c != "users_hll"],
        (F.col("sum_dec").cast("double") / F.col("n")).alias("mean"),
        *(
            [F.hll_sketch_estimate("users_hll").alias("approx_distinct")]
            if "users_hll" in state.columns
            else []
        ),
    )
    return out
