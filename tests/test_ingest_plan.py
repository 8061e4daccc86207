"""Ingestion pipeline (SURVEY.md §3.1) as one lazy plan: full-outer grid
merge, as-of price stamp, broadcast mix row, hourly-grid day filter,
keep-last upsert into history."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.plans.ingest import (
    daily_ingest,
    merge_all_sources,
)

UTC = dt.timezone.utc
DAY = dt.date(2024, 1, 2)


def ts(h, m=0):
    return dt.datetime(2024, 1, 2, h, m, tzinfo=UTC)


@pytest.fixture(scope="module")
def merged(spark):
    weather = spark.createDataFrame(
        [(ts(h), 10.0 + h) for h in range(24)], "datetime timestamp, temperature_C double"
    )
    aq = spark.createDataFrame(
        [(ts(h), 5.0) for h in range(24)], "datetime timestamp, pm10 double"
    )
    carbon = spark.createDataFrame(
        [(ts(h, m), 100.0 + h) for h in range(24) for m in (0, 30)],
        "datetime timestamp, carbon_intensity_actual double",
    )
    mix = spark.createDataFrame(
        [(ts(9), 30.0, 25.0)],
        "datetime timestamp, `uk_gen_gas_%` double, `uk_gen_wind_%` double",
    )
    prices = spark.createDataFrame(
        [(ts(h, 30), 0.2 + h / 100) for h in range(24)],
        "datetime timestamp, `retail_price_£_per_kWh` double",
    )
    return merge_all_sources(weather, aq, carbon, mix, prices)


def test_merge_shape(merged):
    # 24 hourly + 24 half-hourly-only rows in the full-outer grid
    assert merged.count() == 48
    assert set(merged.columns) == {
        "datetime",
        "temperature_C",
        "pm10",
        "carbon_intensity_actual",
        "retail_price_£_per_kWh",
        "uk_gen_gas_%",
        "uk_gen_wind_%",
    }


def test_asof_and_broadcast_stamp(merged):
    r = merged.filter(F.minute("datetime") == 0).filter(F.hour("datetime") == 3).first()
    # nearest half-hourly price within 30 min of 03:00 is 02:30 (tie with
    # 03:30 → earlier wins, pandas semantics)
    assert r["retail_price_£_per_kWh"] == 0.2 + 2 / 100
    assert r["uk_gen_gas_%"] == 30.0  # mix row stamped on every row


def test_daily_ingest_grid_and_upsert(spark, merged):
    history = spark.createDataFrame([], merged.schema)
    out = daily_ingest(merged, history, DAY)
    assert out.count() == 24  # half-hourly rows dropped by minute==0
    assert out.filter(F.minute("datetime") != 0).count() == 0

    # re-running the same day is a no-op; a corrected merge wins per key
    again = daily_ingest(merged, out, DAY)
    assert again.count() == 24
    corrected = merged.withColumn("temperature_C", F.col("temperature_C") + 100)
    updated = daily_ingest(corrected, out, DAY)
    assert updated.count() == 24
    assert updated.agg(F.min("temperature_C")).first()[0] >= 110.0


def test_price_target_date_excludes_prev_day_boundary(spark):
    """Reference filters prices to the target day BEFORE merge_asof
    (raw_data.py:203-206): a 00:00 grid row must NOT pick up the previous
    day's 23:30 price — it stays null."""
    prev_day_2330 = dt.datetime(2024, 1, 1, 23, 30, tzinfo=UTC)
    weather = spark.createDataFrame(
        [(ts(0), 10.0), (ts(2), 12.0)], "datetime timestamp, temperature_C double"
    )
    aq = spark.createDataFrame([(ts(0), 5.0)], "datetime timestamp, pm10 double")
    carbon = spark.createDataFrame(
        [(ts(0), 100.0)], "datetime timestamp, carbon_intensity_actual double"
    )
    mix = spark.createDataFrame(
        [(ts(9), 30.0, 25.0)],
        "datetime timestamp, `uk_gen_gas_%` double, `uk_gen_wind_%` double",
    )
    prices = spark.createDataFrame(
        [(prev_day_2330, 0.99), (ts(0, 30), 0.20)],
        "datetime timestamp, `retail_price_£_per_kWh` double",
    )
    unfiltered = merge_all_sources(weather, aq, carbon, mix, prices)
    filtered = merge_all_sources(
        weather, aq, carbon, mix, prices, price_target_date=DAY
    )
    get = lambda df, h: {  # noqa: E731
        r["datetime"].hour: r["retail_price_£_per_kWh"] for r in df.collect()
    }[h]
    # without the filter, 00:00 grabs the 23:30 prev-day price (both 30 min)
    assert get(unfiltered, 0) in (0.99, 0.20)
    # with the filter (reference behavior), only same-day prices qualify
    assert get(filtered, 0) == 0.20
    assert get(filtered, 2) is None  # 90 min from the only same-day price
