"""Incremental PSI drift monitoring (streaming/drift.py): the report
from the frozen-reference + folded-current stores after N ticks must be
BIT-EQUAL to the batch operator (quality.psi_drift) run over reference ∪
all folded batches — including under batch replay and for values outside
the frozen reference range (edge-bin clamping)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.functions.quality import psi_drift
from big_data_project_datapipeline_spark.streaming import drift as SD

REF_T = dt.datetime(2024, 1, 1)
CUR_T = dt.datetime(2024, 1, 20)


def _split():
    return F.col("ts") < F.lit("2024-01-16").cast("timestamp")


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "drift_store")


def _ref_rows():
    return [("a", REF_T, float(v)) for v in range(60)] + [
        ("b", REF_T, float(v) / 10.0) for v in range(40)
    ]


def test_two_ticks_bit_equal_batch(spark, store):
    ref = _ev(spark, _ref_rows())
    # wave2 drifts group a upward and lands OUT-OF-RANGE values that
    # must clamp into the edge bins exactly like the batch operator
    wave1 = _ev(spark, [("a", CUR_T, float(v) + 20.0) for v in range(30)])
    wave2 = _ev(
        spark,
        [("a", CUR_T, float(v) + 55.0) for v in range(30)]
        + [("b", CUR_T, -5.0), ("b", CUR_T, 99.0)],
    )
    SD.freeze_reference(ref, store)
    SD.maintain_drift_counts(spark, wave1, store, batch_id="t1")
    SD.maintain_drift_counts(spark, wave2, store, batch_id="t2")
    got = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in SD.psi_report(spark, store).collect()
    }
    batch = ref.unionByName(wave1).unionByName(wave2)
    expected = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in psi_drift(batch, _split()).collect()
    }
    assert got == expected
    assert got["a"][2] > 0.25  # the injected shift is detected


def test_replayed_tick_is_idempotent(spark, store):
    ref = _ev(spark, _ref_rows())
    wave = _ev(spark, [("a", CUR_T, float(v)) for v in range(25)])
    SD.freeze_reference(ref, store)
    SD.maintain_drift_counts(spark, wave, store, batch_id="t1")
    SD.maintain_drift_counts(spark, wave, store, batch_id="t1")
    got = {
        r["event_type"]: r["n_cur"]
        for r in SD.psi_report(spark, store).collect()
    }
    assert got["a"] == 25  # not 50


def test_unknown_group_and_nan_dropped(spark, store):
    ref = _ev(spark, _ref_rows())
    wave = _ev(
        spark,
        [
            ("a", CUR_T, 5.0),
            ("ghost", CUR_T, 1.0),  # no frozen reference -> dropped
            ("a", CUR_T, float("nan")),
            ("a", CUR_T, None),
        ],
    )
    SD.freeze_reference(ref, store)
    SD.maintain_drift_counts(spark, wave, store, batch_id="t1")
    rep = {r["event_type"]: r for r in SD.psi_report(spark, store).collect()}
    assert rep["a"]["n_cur"] == 1
    assert "ghost" not in rep


def test_structured_stream_drain_matches_batch(spark, store, tmp_path):
    """availableNow readStream drain over a landed events dir produces
    the same report as the batch operator on the union, and a second
    drain with the SAME checkpoint is a no-op (no double-count)."""
    ref = _ev(spark, _ref_rows())
    wave = _ev(spark, [("a", CUR_T, float(v) + 20.0) for v in range(30)])
    events_dir = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    wave.write.mode("overwrite").parquet(events_dir)
    SD.freeze_reference(ref, store)
    q = SD.stream_drift_monitor(spark, events_dir, store, ckpt)
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in SD.psi_report(spark, store).collect()
    }
    expected = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in psi_drift(ref.unionByName(wave), _split()).collect()
    }
    assert got == expected
    # re-drain: checkpoint already saw every file -> state unchanged
    q2 = SD.stream_drift_monitor(spark, events_dir, store, ckpt)
    q2.awaitTermination(120)
    got2 = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in SD.psi_report(spark, store).collect()
    }
    assert got2 == got


def test_jsd_report_bit_equal_batch(spark, store):
    """jsd_report reads the SAME stores as psi_report and must be
    bit-equal to the batch q172 operator over the folded union —
    one store, two drift scores."""
    from big_data_project_datapipeline_spark.functions.quality import (
        jsd_drift,
    )

    ref = _ev(spark, _ref_rows())
    wave1 = _ev(spark, [("a", CUR_T, float(v) + 20.0) for v in range(30)])
    wave2 = _ev(
        spark,
        [("a", CUR_T, float(v) + 55.0) for v in range(30)]
        + [("b", CUR_T, -5.0), ("b", CUR_T, 99.0)],
    )
    SD.freeze_reference(ref, store)
    SD.maintain_drift_counts(spark, wave1, store, batch_id="t1")
    SD.maintain_drift_counts(spark, wave2, store, batch_id="t2")
    got = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["jsd"])
        for r in SD.jsd_report(spark, store).collect()
    }
    batch = ref.unionByName(wave1).unionByName(wave2)
    expected = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["jsd"])
        for r in jsd_drift(batch, _split()).collect()
    }
    assert got == expected
