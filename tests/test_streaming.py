"""Structured Streaming equivalents (SURVEY.md §2.11): file source →
availableNow drain → memory sink, checked against the equivalent batch
aggregation on the same data."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_datapipeline_spark.streaming import (
    hourly_grid_counts,
    run_available_now,
    sessionized_values,
    streaming_dedup_keep_first,
)

UTC = dt.timezone.utc

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m, tzinfo=UTC)


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    rows = [
        (0, ts(0, 5), 1, 10.0),
        (1, ts(0, 40), 1, 20.0),
        (2, ts(1, 10), 1, 30.0),   # >30min gap → new session for user 1
        (3, ts(0, 15), 2, 5.0),
        (4, ts(3, 0), 2, 7.0),
        (5, ts(0, 5), 3, 1.0),     # duplicate key (user 3, same ts) below
        (6, ts(0, 5), 3, 2.0),
    ]
    path = str(tmp_path_factory.mktemp("stream_src"))
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)
    return path


def _drain(spark, df, tmp_path_factory, name, mode="append"):
    q = run_available_now(
        df,
        str(tmp_path_factory.mktemp(f"ckpt_{name}")),
        query_name=name,
        output_mode=mode,
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_grid_counts(spark, source_dir, tmp_path_factory):
    stream = spark.readStream.schema(SCHEMA).parquet(source_dir)
    out = _drain(
        spark, hourly_grid_counts(stream), tmp_path_factory, "hourly", mode="complete"
    )
    got = {r["hour"].hour: (r["n_events"], r["total_value"]) for r in out.collect()}
    assert got == {0: (5, 38.0), 1: (1, 30.0), 3: (1, 7.0)}


def test_sessionized_values(spark, source_dir, tmp_path_factory):
    stream = spark.readStream.schema(SCHEMA).parquet(source_dir)
    out = _drain(
        spark, sessionized_values(stream), tmp_path_factory, "sessions", mode="complete"
    )
    sessions = {
        (r["user_id"], r["session_start"].hour, r["session_start"].minute): r[
            "n_events"
        ]
        for r in out.collect()
    }
    # user 1: 00:05→00:40 is a 35-min gap (split); 00:40→01:10 is exactly
    # 30 min and the boundary is inclusive (merged)
    assert sessions[(1, 0, 5)] == 1
    assert sessions[(1, 0, 40)] == 2
    assert (1, 1, 10) not in sessions
    assert sessions[(2, 0, 15)] == 1 and sessions[(2, 3, 0)] == 1
    assert sessions[(3, 0, 5)] == 2


def test_streaming_dedup(spark, source_dir, tmp_path_factory):
    stream = spark.readStream.schema(SCHEMA).parquet(source_dir)
    out = _drain(
        spark,
        streaming_dedup_keep_first(stream, keys=["user_id", "ts"]),
        tmp_path_factory,
        "dedup",
    )
    assert out.count() == 6  # events 5 & 6 share (user 3, 00:05) → one kept
    assert out.filter((F.col("user_id") == 3)).count() == 1


def test_watermark_drops_late_data(spark, tmp_path):
    """Two availableNow drains over one checkpoint: run 1 finalizes early
    windows (append mode emits below-watermark windows); run 2 delivers an
    event far older than the advanced watermark plus a fresh one — the
    late event's window must NOT re-emit, the fresh one must."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(
            str(src)
        )

    out = str(tmp_path / "out")

    def drain(name):
        # parquet sink: supports checkpoint recovery (memory sink does not)
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        agg = hourly_grid_counts(stream, watermark="1 hour")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        counts = {}
        for r in rows:
            counts[r["hour"].hour] = counts.get(r["hour"].hour, 0) + r["n_events"]
        return counts

    write_batch("b1", [(0, ts(0, 10), 1, 1.0), (1, ts(5, 0), 1, 2.0)])
    first = drain("wm_run1")
    # the availableNow drain ends with a flush batch: hour-0 (window end
    # 01:00 ≤ watermark 04:00) is finalized and emitted within run 1
    assert first == {0: 1}

    write_batch(
        "b2",
        [
            (2, ts(0, 20), 1, 99.0),  # 4h40m behind the checkpointed wm
            (3, ts(6, 0), 1, 3.0),    # fresh: advances watermark to 05:00
        ],
    )
    second = drain("wm_run2")
    # hour-0 stays at count 1: the late 00:20 row was DROPPED by the
    # recovered watermark and its already-emitted window never re-opens
    # (2, or a second hour-0 row, would mean the late row leaked in)
    assert second.get(0) == 1
    assert 5 not in second           # hour-5 window still open (wm == 05:00)

    write_batch("b3", [(4, ts(7, 0), 1, 4.0)])
    third = drain("wm_run3")
    assert third.get(0) == 1         # emitted exactly once across runs
    assert third.get(5) == 1         # now past the watermark → finalized


def test_stream_stream_attribution_join(spark, tmp_path):
    """Stream-stream interval join: pairs only within the horizon and
    strictly before the conversion; state bounded by watermark+interval."""
    import datetime as dt

    from big_data_project_datapipeline_spark.streaming.incremental import (
        stream_touch_conversions,
    )

    src = tmp_path / "events"
    src.mkdir()
    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 10), 1, "click", 1.0),
        (2, T(2024, 1, 5, 9), 1, "purchase", 1.0),    # click within 7d
        (3, T(2024, 1, 20, 9), 1, "purchase", 1.0),   # outside horizon
        (4, T(2024, 1, 2, 9), 2, "purchase", 1.0),    # no touch for user 2
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    batch.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    touches = stream.filter(F.col("event_type").isin("click", "view"))
    convs = stream.filter(F.col("event_type") == "purchase")
    joined = stream_touch_conversions(touches, convs)
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["conversion_id"], r["touch_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert got == {(2, 1)}


def test_stream_attribution_custom_type_col(spark, tmp_path):
    """type_col is parameterized (round-2 ADVICE): a schema without an
    event_type column works when the touch-type column is named."""
    import datetime as dt

    from big_data_project_datapipeline_spark.streaming.incremental import (
        stream_touch_conversions,
    )

    src = tmp_path / "events"
    src.mkdir()
    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 10), 1, "ad"),
        (2, T(2024, 1, 3, 9), 1, "buy"),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, kind string"
    )
    batch.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    joined = stream_touch_conversions(
        stream.filter(F.col("kind") == "ad"),
        stream.filter(F.col("kind") == "buy"),
        type_col="kind",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_kind")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["touch_id"], r["touch_type"])
        for r in spark.sql("SELECT * FROM attrib_kind").collect()
    ]
    assert got == [(1, "ad")]
