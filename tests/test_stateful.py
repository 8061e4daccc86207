"""applyInPandasWithState: per-key running aggregates carried across
micro-batches. Two sequential availableNow drains against a growing file
source must show the state accumulating (not resetting)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from big_data_project_datapipeline_spark.streaming.stateful import running_user_stats

UTC = dt.timezone.utc

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ts(h):
    return dt.datetime(2024, 1, 1, h, tzinfo=UTC)


def _drain(spark, src, ckpt, name):
    # memory sink can't recover from a checkpoint; foreachBatch can — and
    # restart-with-existing-checkpoint is exactly what's under test
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    rows = []

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        running_user_stats(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["user_id"]: r for r in rows}


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(1, ts(0), 100.0), (1, ts(1), 200.0), (2, ts(0), 10.0)]
    spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(src)
    out1 = _drain(spark, src, ckpt, "state1")
    assert out1[1]["n_events"] == 2 and out1[1]["total_value"] == 300.0
    assert out1[1]["n_high"] == 1  # 200 > 150
    assert out1[2]["max_value"] == 10.0

    # second batch: same checkpoint → state carries forward
    batch2 = [(1, ts(2), 50.0), (2, ts(1), 300.0)]
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(src)
    out2 = _drain(spark, src, ckpt, "state2")
    assert out2[1]["n_events"] == 3 and out2[1]["total_value"] == 350.0
    assert out2[2]["n_events"] == 2 and out2[2]["n_high"] == 1
    assert out2[2]["max_value"] == 300.0


def test_null_values_counted_not_summed(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(5, ts(0), None), (5, ts(1), 20.0)], SCHEMA
    ).write.mode("append").parquet(src)
    out = _drain(spark, src, str(tmp_path / "ck"), "state3")
    assert out[5]["n_events"] == 2       # null row still counted
    assert out[5]["total_value"] == 20.0  # but not summed
