"""Temporal features vs pandas dt accessors — the reference's ground truth
(data_engineering.py:31-47). Catches the Mon=0 weekday trap and the
is_night between(23,23) quirk."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from big_data_project_datapipeline_spark.functions.temporal import (
    add_cyclical_features,
    add_temporal_features,
)

UTC = dt.timezone.utc

# A spread of timestamps crossing week/month/year boundaries + all day hours.
STAMPS = (
    [dt.datetime(2024, 1, 1, h, tzinfo=UTC) for h in range(24)]
    + [
        dt.datetime(2023, 12, 31, 23, tzinfo=UTC),  # ISO week 52, Sunday
        dt.datetime(2024, 2, 29, 12, tzinfo=UTC),   # leap day
        dt.datetime(2024, 6, 15, 17, tzinfo=UTC),   # Saturday, peak hour
        dt.datetime(2025, 1, 1, 0, tzinfo=UTC),     # ISO week 1
        dt.datetime(2024, 12, 30, 6, tzinfo=UTC),   # ISO week 1 of next year
    ]
)


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame([(t,) for t in STAMPS], "datetime timestamp")
    out = add_cyclical_features(add_temporal_features(df), "datetime")
    return out.orderBy("datetime").toPandas()


def pandas_reference():
    s = pd.Series(sorted(STAMPS)).dt.tz_convert("UTC") if False else pd.Series(sorted(STAMPS))
    s = pd.to_datetime(s, utc=True)
    return pd.DataFrame(
        {
            "hour": s.dt.hour,
            "day_of_week": s.dt.dayofweek,
            "month": s.dt.month,
            "day_of_month": s.dt.day,
            "week_of_year": s.dt.isocalendar().week.astype(int),
            "is_weekend": (s.dt.dayofweek >= 5).astype(int),
            "is_peak_hour": s.dt.hour.between(17, 21).astype(int),
            "is_night": (s.dt.hour.between(23, 23) | s.dt.hour.between(0, 6)).astype(int),
            "hour_sin": np.sin(2 * math.pi * s.dt.hour / 24),
            "hour_cos": np.cos(2 * math.pi * s.dt.hour / 24),
            "month_sin": np.sin(2 * math.pi * s.dt.month / 12),
            "month_cos": np.cos(2 * math.pi * s.dt.month / 12),
        }
    )


def test_matches_pandas(result):
    exp = pandas_reference()
    for col in exp.columns:
        got = result[col].to_numpy(dtype=float)
        want = exp[col].to_numpy(dtype=float)
        assert np.allclose(got, want, atol=1e-12), f"{col}: {got} != {want}"


def test_is_night_quirk(result):
    """Hours 23 and 0–6 only — 22:00 is NOT night (reference :40)."""
    by_hour = result.set_index(result["datetime"].dt.hour)["is_night"].to_dict()
    assert by_hour[23] == 1 and by_hour[0] == 1 and by_hour[6] == 1
    assert by_hour[22] == 0 and by_hour[7] == 0
