"""Interaction + math features (X10–X14, SURVEY.md §2.9).

Replicates ``create_interaction_features`` (reference
data_engineering.py:50-60) and ``apply_log_transforms`` (:63-78):

- ``clip(lower=0)`` → ``greatest(0, expr)``;
- the epsilon-guarded divide keeps the exact ``1e-6`` constant for parity;
- ``np.log1p(col.fillna(0))`` → ``log1p(coalesce(col, 0.0))``;
- log transforms are schema-tolerant: absent columns are skipped
  (reference :76 ``if col in df.columns``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPSILON = 1e-6

# The reference's 8 log-transform targets (data_engineering.py:65-74).
DEFAULT_LOG_COLS = [
    "so2",
    "pm2_5",
    "co",
    "no2",
    "pm10",
    "solar_radiation_Wm2",
    "uk_gen_solar_%",
    "aqi_us",
]


def clip_lower(expr: Column, lower: float = 0.0) -> Column:
    """pandas ``.clip(lower=x)`` — null stays null (greatest propagates it
    only when all args are null, so coalesce is NOT applied here; pandas
    keeps NaN through clip too)."""
    return F.when(expr.isNull(), F.lit(None)).otherwise(
        F.greatest(F.lit(float(lower)), expr)
    )


def eps_divide(num: Column, den: Column, epsilon: float = EPSILON) -> Column:
    """X13: ``num / (den + 1e-6)`` — exact constant for hash parity."""
    return num / (den + F.lit(float(epsilon)))


def add_interaction_features(
    df: DataFrame,
    specs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """X10–X13. Default specs mirror the reference's energy-domain features
    when their inputs exist; pass explicit ``specs`` for other schemas."""
    if specs is None:
        # Exact reference formulas (data_engineering.py:50-60):
        # renewable_pct = wind + solar (no biomass); fossil_pct = gas only
        # (no imports); wind_solar_combined = wind * solar RADIATION, not
        # wind * solar generation.
        cols = set(df.columns)
        specs = {}
        if {"uk_gen_wind_%", "uk_gen_solar_%"} <= cols:
            specs["renewable_pct"] = F.col("uk_gen_wind_%") + F.col("uk_gen_solar_%")
        if "uk_gen_gas_%" in cols:
            specs["fossil_pct"] = F.col("uk_gen_gas_%")
        if "temperature_C" in cols:
            specs["heating_demand"] = clip_lower(F.lit(18.0) - F.col("temperature_C"))
            specs["cooling_demand"] = clip_lower(F.col("temperature_C") - F.lit(22.0))
        if {"uk_gen_wind_%", "solar_radiation_Wm2"} <= cols:
            specs["wind_solar_combined"] = F.col("uk_gen_wind_%") * F.col("solar_radiation_Wm2")
        if {"carbon_intensity_actual", "retail_price_£_per_kWh"} <= cols:
            specs["carbon_per_price"] = eps_divide(
                F.col("carbon_intensity_actual"), F.col("retail_price_£_per_kWh")
            )
    return df.withColumns(dict(specs))


def add_log_transforms(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    prefix: str = "log_",
) -> DataFrame:
    """X14: ``log1p(coalesce(c, 0))`` → ``log_{c}`` for each present col."""
    targets = [c for c in (cols or DEFAULT_LOG_COLS) if c in df.columns]
    return df.withColumns(
        {f"{prefix}{c}": F.log1p(F.coalesce(F.col(c).cast("double"), F.lit(0.0))) for c in targets}
    )
