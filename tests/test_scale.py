"""z-score scaling: population std (ddof=0), fillna(0) before fit+transform,
fit-on-delta (SURVEY.md §2.10 / §7.4.3,6). Verified against numpy, which is
exactly what sklearn's StandardScaler computes."""

from __future__ import annotations

import numpy as np

from big_data_project_datapipeline_spark.operators.scale import (
    compute_stats,
    zscore_scale,
)


def test_population_std_and_fillna(spark):
    vals = [1.0, 2.0, None, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = zscore_scale(df, ["x"]).orderBy("x").collect()

    filled = np.array([0.0 if v is None else v for v in vals])
    mean, std = filled.mean(), filled.std()  # ddof=0 — sklearn semantics
    expected = {(v if v is not None else None): ((0.0 if v is None else v) - mean) / std for v in vals}
    for r in out:
        assert abs(r["scaled_x"] - expected[r["x"]]) < 1e-12


def test_zero_variance_divides_by_one(spark):
    df = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    rows = zscore_scale(df, ["x"]).collect()
    assert all(r["scaled_x"] == 0.0 for r in rows)  # (5-5)/1


def test_fit_transform_split(spark):
    fit_batch = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    stats = compute_stats(fit_batch, ["x"])
    other = spark.createDataFrame([(5.0,), (20.0,)], "x double")
    out = {r["x"]: r["scaled_x"] for r in zscore_scale(other, ["x"], stats=stats).collect()}
    assert out[5.0] == 0.0  # (5-5)/5
    assert out[20.0] == 3.0  # (20-5)/5


def test_absent_columns_skipped(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    out = zscore_scale(df, ["x", "nope"])
    assert "scaled_x" in out.columns and "scaled_nope" not in out.columns
