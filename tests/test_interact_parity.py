"""Parity: default interaction specs must match the reference's
``create_interaction_features`` (data_engineering.py:50-60) value-for-value,
including the exact input columns each feature uses (renewable = wind+solar
with NO biomass; fossil = gas only; wind_solar_combined uses solar
RADIATION, not solar generation)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from big_data_project_datapipeline_spark.functions.interact import (
    add_interaction_features,
    add_log_transforms,
)

FEATURES = [
    "renewable_pct",
    "fossil_pct",
    "heating_demand",
    "cooling_demand",
    "wind_solar_combined",
    "carbon_per_price",
]


def _reference_interactions(df: pd.DataFrame) -> pd.DataFrame:
    """Verbatim re-statement of the reference pandas formulas."""
    df = df.copy()
    df["renewable_pct"] = df["uk_gen_wind_%"] + df["uk_gen_solar_%"]
    df["fossil_pct"] = df["uk_gen_gas_%"]
    df["heating_demand"] = (18 - df["temperature_C"]).clip(lower=0)
    df["cooling_demand"] = (df["temperature_C"] - 22).clip(lower=0)
    df["wind_solar_combined"] = df["uk_gen_wind_%"] * df["solar_radiation_Wm2"]
    df["carbon_per_price"] = df["carbon_intensity_actual"] / (
        df["retail_price_£_per_kWh"] + 1e-6
    )
    return df


def _fixture() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    n = 48
    return pd.DataFrame(
        {
            "uk_gen_wind_%": rng.uniform(0, 40, n).round(3),
            "uk_gen_solar_%": rng.uniform(0, 20, n).round(3),
            "uk_gen_biomass_%": rng.uniform(0, 10, n).round(3),
            "uk_gen_gas_%": rng.uniform(10, 60, n).round(3),
            "uk_gen_imports_%": rng.uniform(0, 15, n).round(3),
            "temperature_C": rng.uniform(-5, 30, n).round(2),
            "solar_radiation_Wm2": rng.uniform(0, 800, n).round(1),
            "carbon_intensity_actual": rng.uniform(40, 300, n).round(1),
            "retail_price_£_per_kWh": rng.uniform(0.05, 0.45, n).round(4),
        }
    )


def test_all_six_interaction_features_match_reference(spark):
    pdf = _fixture()
    expected = _reference_interactions(pdf)
    got = add_interaction_features(spark.createDataFrame(pdf)).toPandas()
    for feat in FEATURES:
        assert feat in got.columns, feat
        np.testing.assert_allclose(
            got[feat].to_numpy(),
            expected[feat].to_numpy(),
            rtol=0,
            atol=1e-12,
            err_msg=feat,
        )


def test_clip_keeps_null_and_log_fills_null(spark):
    pdf = _fixture().head(4)
    pdf.loc[0, "temperature_C"] = None  # clip must keep NaN (pandas semantics)
    pdf.loc[1, "solar_radiation_Wm2"] = None  # log1p fills 0 first (reference :77)
    out = add_log_transforms(add_interaction_features(spark.createDataFrame(pdf))).toPandas()
    assert math.isnan(out.loc[0, "heating_demand"])
    assert out.loc[1, "log_solar_radiation_Wm2"] == 0.0
