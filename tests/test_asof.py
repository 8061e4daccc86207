"""As-of join vs ``pd.merge_asof`` — incl. the trap cases (SURVEY.md §7.4.1):
exact 30-min tolerance boundary (inclusive), equidistant tie (earlier right
row wins), gap > tolerance (null)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from big_data_project_datapipeline_spark.operators.asof import asof_join

UTC = dt.timezone.utc


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m, tzinfo=UTC)


@pytest.fixture(scope="module")
def frames(spark):
    left_rows = [(ts(h),) for h in range(6)]
    right_rows = [
        (ts(0, 30), 10.0),   # 30 min from both 00:00 and 01:00 → tie cases
        (ts(1, 30), 11.0),
        (ts(2, 0), 12.0),    # exact match for 02:00
        # nothing within 30 min of 04:00 or 05:00 except:
        (ts(4, 31), 14.0),   # 31 min from 04:00 → outside tolerance
    ]
    left = spark.createDataFrame(left_rows, "datetime timestamp")
    right = spark.createDataFrame(right_rows, "datetime timestamp, price double")
    return left, right, left_rows, right_rows


def _pandas_expected(left_rows, right_rows, direction):
    lpdf = pd.DataFrame({"datetime": [r[0] for r in left_rows]})
    rpdf = pd.DataFrame(
        {"datetime": [r[0] for r in right_rows], "price": [r[1] for r in right_rows]}
    )
    return pd.merge_asof(
        lpdf.sort_values("datetime"),
        rpdf.sort_values("datetime"),
        on="datetime",
        direction=direction,
        tolerance=pd.Timedelta(minutes=30),
    )


@pytest.mark.parametrize("direction", ["nearest", "backward", "forward"])
def test_matches_pandas_merge_asof(spark, frames, direction):
    left, right, left_rows, right_rows = frames
    got = (
        asof_join(left, right, tolerance_seconds=1800, direction=direction)
        .orderBy("datetime")
        .toPandas()
    )
    exp = _pandas_expected(left_rows, right_rows, direction).reset_index(drop=True)
    got["datetime"] = pd.to_datetime(got["datetime"], utc=True)
    exp["datetime"] = pd.to_datetime(exp["datetime"], utc=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tie_prefers_earlier_right_row(spark, frames):
    left, right, *_ = frames
    out = {
        r["datetime"].hour: r["price"]
        for r in asof_join(left, right, tolerance_seconds=1800).collect()
    }
    # 01:00 is 30 min from both 00:30 (10.0) and 01:30 (11.0) → earlier wins
    assert out[1] == 10.0


def test_gap_beyond_tolerance_is_null(spark, frames):
    left, right, *_ = frames
    rows = {
        r["datetime"].hour: r["price"]
        for r in asof_join(left, right, tolerance_seconds=1800).collect()
    }
    assert rows[4] is None  # nearest right row is 31 min away
    assert rows[5] == 14.0  # 04:31 is 29 min from 05:00 → within tolerance


def test_every_left_row_survives(spark, frames):
    left, right, *_ = frames
    assert asof_join(left, right).count() == left.count()


def test_right_payload_collision_raises(spark, frames):
    left, right, _, _ = frames
    shadowing = right.withColumnRenamed("price", "datetime2").withColumnRenamed(
        "datetime", "ts"
    ).withColumnRenamed("datetime2", "datetime")
    # right payload column named like the left key column → must raise
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, shadowing, on="datetime", right_on="ts")


def test_asof_zero_tolerance_rejected(spark):
    import pytest

    from big_data_project_datapipeline_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1,)], "datetime long")
    with pytest.raises(ValueError, match="tolerance_seconds"):
        asof_join(df, df.withColumnRenamed("datetime", "dt2"),
                  right_on="dt2", tolerance_seconds=0)
