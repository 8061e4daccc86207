"""Incremental HLL monitoring (streaming/sketches.py): the report from
the max-folded register store after N ticks must be BIT-EQUAL to the
batch estimator (functions/sketches) run over the union of all folded
batches — including under tick replay and a checkpointed re-drain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.functions.sketches import (
    hll_estimate,
    hll_registers,
)
from big_data_project_datapipeline_spark.streaming import sketches as SS


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "hll_store")


def _batch_estimate(spark, df):
    return {
        r["event_type"]: (r["n_empty"], r["estimate"])
        for r in hll_estimate(
            hll_registers(df, "user_id", ["event_type"], p=6),
            ["event_type"],
            p=6,
        ).collect()
    }


def test_two_ticks_bit_equal_batch(spark, store):
    wave1 = _ev(spark, [("a", v) for v in range(300)] + [("b", 1), ("b", 2)])
    wave2 = _ev(
        spark,
        [("a", v) for v in range(150, 500)]  # overlap: max-merge, not sum
        + [("b", 2), ("b", 3)],
    )
    SS.maintain_hll_registers(spark, wave1, store, batch_id="t1")
    SS.maintain_hll_registers(spark, wave2, store, batch_id="t2")
    got = {
        r["event_type"]: (r["n_empty"], r["estimate"])
        for r in SS.hll_report(spark, store).collect()
    }
    assert got == _batch_estimate(spark, wave1.unionByName(wave2))


def test_replayed_tick_is_idempotent(spark, store):
    wave = _ev(spark, [("a", v) for v in range(100)])
    SS.maintain_hll_registers(spark, wave, store, batch_id="t1")
    once = {
        r["event_type"]: r["estimate"]
        for r in SS.hll_report(spark, store).collect()
    }
    SS.maintain_hll_registers(spark, wave, store, batch_id="t1")
    twice = {
        r["event_type"]: r["estimate"]
        for r in SS.hll_report(spark, store).collect()
    }
    assert once == twice == {
        k: v[1] for k, v in _batch_estimate(spark, wave).items()
    }


def test_structured_stream_drain_matches_batch(spark, store, tmp_path):
    wave = _ev(spark, [("a", v) for v in range(2000)] + [("c", 7)])
    events_dir = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    wave.write.mode("overwrite").parquet(events_dir)
    q = SS.stream_hll_monitor(spark, events_dir, store, ckpt)
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["n_empty"], r["estimate"])
        for r in SS.hll_report(spark, store).collect()
    }
    assert got == _batch_estimate(spark, wave)
    # re-drain with the same checkpoint: no state movement (max is
    # idempotent AND the ledger skips folded ids)
    q2 = SS.stream_hll_monitor(spark, events_dir, store, ckpt)
    q2.awaitTermination(120)
    got2 = {
        r["event_type"]: (r["n_empty"], r["estimate"])
        for r in SS.hll_report(spark, store).collect()
    }
    assert got2 == got


def test_null_keys_dropped(spark, store):
    wave = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)],
        "event_type string, user_id long",
    )
    SS.maintain_hll_registers(spark, wave, store, batch_id="t1")
    rep = SS.hll_report(spark, store).collect()
    clean = wave.filter(F.col("user_id").isNotNull())
    assert {
        r["event_type"]: (r["n_empty"], r["estimate"]) for r in rep
    } == _batch_estimate(spark, clean)


class TestKmvMonitor:
    """Incremental KMV (streaming/sketches.py): the bottom-k fold
    after N ticks must be BIT-EQUAL to the batch sketch over the
    union — including the set-expression reads and tick replay."""

    def test_two_ticks_bit_equal_batch(self, spark, tmp_path):
        from big_data_project_datapipeline_spark.functions.sketches import (
            kmv_sketch,
        )

        store = str(tmp_path / "kmv_store")
        wave1 = _ev(
            spark, [("a", v) for v in range(300)] + [("b", 1), ("b", 2)]
        )
        wave2 = _ev(
            spark,
            [("a", v) for v in range(150, 500)] + [("b", 2), ("b", 3)],
        )
        SS.maintain_kmv_sketch(spark, wave1, store, "t1", k=64, hll_p=6)
        SS.maintain_kmv_sketch(spark, wave2, store, "t2", k=64, hll_p=6)
        import os

        folded = {
            (r["grp"], r["h"])
            for r in spark.read.schema(SS.KMV_SCHEMA)
            .parquet(os.path.join(store, "counts"))
            .collect()
        }
        batch = {
            (r["event_type"], r["h"])
            for r in kmv_sketch(
                wave1.unionByName(wave2),
                "user_id",
                ["event_type"],
                k=64,
                hll_p=6,
            )
            .withColumnRenamed("event_type", "grp")
            .selectExpr("grp as event_type", "h")
            .collect()
        }
        assert folded == batch

    def test_report_and_difference_from_store(self, spark, tmp_path):
        from big_data_project_datapipeline_spark.functions.sketches import (
            kmv_set_difference,
        )

        store = str(tmp_path / "kmv_store2")
        # A = {1..10}, B = {6..20}, split across two ticks
        SS.maintain_kmv_sketch(
            spark,
            _ev(spark, [("a", i) for i in range(1, 6)]
                + [("b", i) for i in range(6, 12)]),
            store, "t1", k=64, hll_p=6,
        )
        SS.maintain_kmv_sketch(
            spark,
            _ev(spark, [("a", i) for i in range(6, 11)]
                + [("b", i) for i in range(12, 21)]),
            store, "t2", k=64, hll_p=6,
        )
        rep = {
            r["event_type"]: r["estimate"]
            for r in SS.kmv_report(spark, store, k=64).collect()
        }
        # below k -> exact
        assert rep == {"a": 10.0, "b": 15.0}
        import os

        sk = spark.read.schema(SS.KMV_SCHEMA).parquet(
            os.path.join(store, "counts")
        )
        d = kmv_set_difference(sk, "grp", k=64).collect()[0]
        assert (d["only_a_est"], d["only_b_est"], d["symdiff_est"]) == (
            5.0,
            10.0,
            15.0,
        )

    def test_replayed_tick_is_idempotent(self, spark, tmp_path):
        store = str(tmp_path / "kmv_store3")
        wave = _ev(spark, [("a", v) for v in range(100)])
        SS.maintain_kmv_sketch(spark, wave, store, "t1", k=32, hll_p=6)
        once = {
            r["event_type"]: r["estimate"]
            for r in SS.kmv_report(spark, store, k=32).collect()
        }
        SS.maintain_kmv_sketch(spark, wave, store, "t1", k=32, hll_p=6)
        again = {
            r["event_type"]: r["estimate"]
            for r in SS.kmv_report(spark, store, k=32).collect()
        }
        assert once == again
