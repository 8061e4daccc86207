"""Streaming twin of the feature-engineering job (reference
data_engineering.yml:4-7 workflow_run chain): land raw parquet, drain
with availableNow through foreachBatch → incremental_feature_run, land
MORE raw, drain again — the feature store after each drain must equal
the batch CLI's sequential incremental runs bit-for-bit, and replayed
raw rows must not change already-computed features (fit-on-delta)."""

from __future__ import annotations

import datetime as dt

from big_data_project_datapipeline_spark.plans.features import (
    incremental_feature_run,
)
from big_data_project_datapipeline_spark.streaming.features import (
    stream_feature_runs,
)

UTC = dt.timezone.utc


def ts(h):
    return dt.datetime(2024, 1, 1, h, tzinfo=UTC)


def _raw(spark, hours_vals):
    return spark.createDataFrame(
        [(ts(h), float(v)) for h, v in hours_vals],
        "datetime timestamp, temperature_C double",
    )


def _rows(df):
    return sorted(
        (r["datetime"], r["temperature_C"], r["scaled_temperature_C"])
        for r in df.collect()
    )


def _drain(spark, raw_store, feat, cp):
    """Drain and SNAPSHOT eagerly — the next drain rewrites the store's
    files, so a lazy frame kept across drains would go stale."""
    q = stream_feature_runs(spark, raw_store, feat, cp)
    q.awaitTermination(120)
    df = spark.read.parquet(feat)
    return sorted(df.columns), _rows(df)


def test_stream_equals_sequential_batch_runs(spark, tmp_path):
    raw_store = str(tmp_path / "raw")
    feat = str(tmp_path / "features")
    cp = str(tmp_path / "cp")

    wave1 = [(0, 10.0), (1, 20.0), (2, 30.0)]
    _raw(spark, wave1).write.mode("append").parquet(raw_store)
    cols1, rows1 = _drain(spark, raw_store, feat, cp)

    batch1 = incremental_feature_run(
        _raw(spark, wave1), _raw(spark, wave1).limit(0).select("datetime")
    )
    batch1_rows = _rows(batch1)
    assert cols1 == sorted(batch1.columns)
    assert rows1 == batch1_rows

    # wave 2: one replayed hour (key 2 — must keep its wave-1 features)
    # plus two new hours; scaler fits on the NEW delta only
    wave2 = [(2, 99.0), (3, 40.0), (4, 50.0)]
    _raw(spark, wave2).write.mode("append").parquet(raw_store)
    _, rows2 = _drain(spark, raw_store, feat, cp)

    assert rows2 == _rows(incremental_feature_run(_raw(spark, wave2), batch1))
    assert len(rows2) == 5

    by_hour = {r[0].hour: r for r in rows2}
    # keep-first: hour 2 kept its wave-1 value and scaled feature
    assert by_hour[2][1] == 30.0
    w1 = {r[0].hour: r[2] for r in rows1}
    for h in (0, 1, 2):
        assert by_hour[h][2] == w1[h]

    # an empty drain (no new files under the same checkpoint) leaves the
    # store untouched
    _, rows3 = _drain(spark, raw_store, feat, cp)
    assert rows3 == rows2


def test_stream_bootstrap_then_idempotent_replay(spark, tmp_path):
    """Replaying the SAME raw files through a fresh checkpoint (the
    dynamic-partition-rewrite scenario: old rows resurface as new files)
    must not duplicate or alter any feature row."""
    raw_store = str(tmp_path / "raw")
    feat = str(tmp_path / "features")

    _raw(spark, [(0, 5.0), (1, 15.0)]).write.mode("append").parquet(raw_store)
    _, rows1 = _drain(spark, raw_store, feat, str(tmp_path / "cp1"))
    # fresh checkpoint: every file replays as a brand-new micro-batch
    _, rows2 = _drain(spark, raw_store, feat, str(tmp_path / "cp2"))
    assert rows1 == rows2
