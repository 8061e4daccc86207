"""Data-quality metrics (A1–A3, §2.11 monitoring; reference raw_data.py:316-345).

The reference computes row counts, per-column null counts, and the timestamp
range with eager pandas calls and prints warnings. Spark-first: the same
metrics ride along the main action as a single ``df.observe`` (zero extra
jobs) or as one explicit aggregate (one job, map-side combined) — never one
job per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def null_count(c: str):
    """A2: ``count(when(isnull(c), 1))`` — one expression per column."""
    return F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"missing_{c}")


def quality_aggregates(df: DataFrame, cols: Sequence[str] | None = None):
    """One-job quality summary: total rows, per-column nulls, key range."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("row_count")] + [null_count(c) for c in cols]
    return df.agg(*aggs)


def observe_quality(
    df: DataFrame, name: str, cols: Sequence[str]
) -> tuple[DataFrame, Observation]:
    """Attach quality metrics to the plan itself — collected for free when
    the next action runs (the streaming-compatible analog of the reference's
    post-hoc checks, SURVEY.md §2.11)."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("row_count"),
        *[null_count(c) for c in cols],
    )
    return observed, obs


def completeness_warnings(
    metrics: dict[str, int], thresholds: dict[str, int]
) -> list[str]:
    """Threshold check mirroring ``missing_carbon > 2 or missing_prices > 5``
    (reference raw_data.py:330-339); returns warning strings."""
    return [
        f"{key}: {metrics.get(key, 0)} missing > {limit}"
        for key, limit in thresholds.items()
        if metrics.get(key, 0) > limit
    ]


def fixed_bin_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram (width_bucket semantics): values clamp into
    [lo, hi) bins, with per-group counts and bin bounds.

    One groupBy over (groups, bin) — bin assignment is pure arithmetic on
    the scan, so the whole op is a single map-side-combined aggregate; no
    per-group sort, no driver-side binning. The bin id from floor() is
    exact for IEEE doubles, hence engine-reproducible bit-for-bit.
    """
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_id = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    out = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.select(
        *group_cols,
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
        "n",
    )
