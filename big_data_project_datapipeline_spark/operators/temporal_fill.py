"""Time-series gap fill: dense time grid per series + LOCF forward fill.

The reference builds its half-hourly grid eagerly with
``pd.date_range(...)`` and leaves unmatched slots NaN (raw_data.py, the
merge_all_sources grid); a Timescale/InfluxDB-style engine additionally
offers *gap fill with last-observation-carried-forward*. This module is
that operator, Spark-first:

- The grid is generated WITH ``F.sequence`` + ``explode`` per series —
  the span bounds come from the series' own min/max (one aggregate), so
  nothing is collected to the driver and a series with a week of data
  doesn't get a year of empty slots.
- LOCF is ``last(value, ignorenulls=True)`` over
  (series ORDER BY slot ROWS UNBOUNDED PRECEDING) — one window per
  series partition, the canonical Spark forward-fill.

Scale: the window sort is per-series; with many series (the normal shape:
sensor/meter/region keys) partitions are uniform and parallel. For ONE
pathological giant series, chunk by calendar range first, LOCF within
chunks, then fix up chunk heads with a per-chunk "last value" frame
(documented here; not needed at this surface where series count >> cores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_grid(
    df: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    step: str = "1 hour",
) -> DataFrame:
    """Dense per-series slot grid from each series' own [min, max] span.

    One groupBy(series) for the bounds, then sequence+explode — the grid
    never leaves the executors. Slots are truncated to the step so the
    sequence endpoints align with observation buckets.
    """
    unit = step.split()[1].rstrip("s")
    bounds = df.groupBy(series_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("__hi"),
    )
    return bounds.select(
        series_col,
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.col("__hi"),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias("slot"),
    )


def gap_fill_locf(
    df: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    value: Column | None = None,
    step: str = "1 hour",
    agg_alias: str = "value",
) -> DataFrame:
    """Densify each series to a fixed step and forward-fill missing slots.

    Observations falling in the same slot aggregate with a decimal-exact
    mean (order-independent across partitions — the parity rule for any
    double sum). Output: one row per (series, slot) with the filled value
    and ``filled`` = 1 where the slot had no observation.
    """
    value = value if value is not None else F.col("value")
    unit = step.split()[1].rstrip("s")
    slot = F.date_trunc(unit, F.col(ts_col))
    dec = value.cast("decimal(18,4)")
    observed = df.groupBy(
        F.col(series_col), slot.alias("slot")
    ).agg(
        (F.sum(dec).cast("double") / F.count(value)).alias("__obs")
    )
    grid = time_grid(df, series_col, ts_col, step)
    w = (
        Window.partitionBy(series_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(observed, [series_col, "slot"], "left")
    return joined.select(
        series_col,
        "slot",
        F.last("__obs", ignorenulls=True).over(w).alias(agg_alias),
        F.col("__obs").isNull().cast("int").alias("filled"),
    )
