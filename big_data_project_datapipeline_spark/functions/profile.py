"""Data profiling: per-column statistics and functional-dependency
audits — the discovery pass a pipeline runs over an unfamiliar feed
before wiring it in (the reference consumes fixed, known APIs —
raw_data.py:22-206 — so it never needed one; at lake scale, schema
drift and silently-broken keys are routine and a profiling operator is
the standard first responder).

Scale notes: ``column_profile`` deliberately issues one tiny-output
aggregate PER COLUMN instead of a single multi-distinct aggregate —
Spark plans N simultaneous COUNT(DISTINCT) via Expand (N× row
multiplication through one shuffle), while per-column jobs each read
ONE parquet column (pruned scan) with a map-side-combinable partial
aggregate; at 100 TB the pruned per-column scans are the cheaper and
more memory-stable shape, and they parallelize across the cluster one
after another with O(1) output each. ``fd_audit`` is one
groupBy(lhs).countDistinct(rhs) per pair — O(distinct lhs) intermediate,
O(1) output.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format per-column profile: (col_name, n_rows, n_null,
    n_distinct, is_candidate_key) — one row per profiled column.

    ``n_distinct`` is the EXACT distinct count of non-NULL values
    (COUNT(DISTINCT) semantics in both engines); ``is_candidate_key``
    holds iff the column has no NULLs and every row is distinct — the
    uniqueness+totality definition of a candidate key. Column order in
    the output follows ``cols`` (or ``df.columns``); rows are
    self-identifying via ``col_name``, so downstream order never
    matters.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("column_profile(): no columns to profile")
    parts = []
    for c in cols:
        agg = df.agg(
            F.count(F.lit(1)).alias("_rows"),
            F.count(F.col(c)).alias("_nonnull"),
            F.countDistinct(F.col(c)).alias("_distinct"),
        )
        parts.append(
            agg.select(
                F.lit(c).alias("col_name"),
                F.col("_rows").cast("long").alias("n_rows"),
                (F.col("_rows") - F.col("_nonnull"))
                .cast("long")
                .alias("n_null"),
                F.col("_distinct").cast("long").alias("n_distinct"),
                (
                    (F.col("_rows") == F.col("_nonnull"))
                    & (F.col("_distinct") == F.col("_rows"))
                ).alias("is_candidate_key"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def fd_audit(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency audit: for each (lhs, rhs) pair, does
    lhs → rhs hold? Returns (lhs, rhs, n_groups, violating_groups,
    holds) — a group violates when its lhs value maps to MORE than one
    distinct non-NULL rhs value. NULL lhs values form their own group
    (GROUP BY semantics, identical in both engines); NULL rhs values
    never count toward distinctness (COUNT(DISTINCT) semantics), so a
    group of all-NULL rhs trivially holds.

    The readout a key-discovery / schema-contract check reads: a
    violated "FD" that used to hold is upstream data corruption
    (q155's referential-integrity twin, for intra-table invariants).
    """
    if not pairs:
        raise ValueError("fd_audit(): no (lhs, rhs) pairs to audit")
    parts = []
    for lhs, rhs in pairs:
        nd = df.groupBy(F.col(lhs)).agg(
            F.countDistinct(F.col(rhs)).alias("_nd")
        )
        agg = nd.agg(
            F.count(F.lit(1)).alias("_groups"),
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).alias("_bad"),
        )
        parts.append(
            agg.select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col("_groups").cast("long").alias("n_groups"),
                F.col("_bad").cast("long").alias("violating_groups"),
                (F.col("_bad") == 0).alias("holds"),
            )
        )
    return reduce(DataFrame.unionByName, parts)
