"""Streaming operators mirroring the reference's incremental semantics.

Mapping (SURVEY.md §2.11):

- daily cron micro-batch            → ``trigger(availableNow=True)``
- trailing-days late-data re-fetch  → ``withWatermark`` (48 h default — the
  reference re-queries carbon for 2 days, raw_data.py:88-91)
- hourly grid alignment (minute==0) → tumbling ``window(ts, "1 hour")``
- keep-last upsert into history     → ``dropDuplicatesWithinWatermark``
- previous-output-as-state          → the streaming checkpoint

All transformations are expressed on an unbounded DataFrame; the same
column logic is reused by the batch pipelines (one definition, two
runtimes — the reason to keep them as plain column expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def hourly_grid_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "48 hours",
) -> DataFrame:
    """Tumbling 1-hour event-time aggregation with late-data bound.

    The watermark plays the reference's "re-fetch 2 trailing days, then
    filter back" role: rows later than 48 h are dropped, state for closed
    windows is evicted — bounded memory at any scale.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "n_events",
            "total_value",
        )
    )


def sessionized_values(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "48 hours",
) -> DataFrame:
    """Session windows (30-min inactivity gap) — the streaming-native form
    of the batch lag+cumsum sessionization (q12)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup_keep_first(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "48 hours",
) -> DataFrame:
    """Streaming key-dedup with bounded state — the D1/D2 analog. Within
    the watermark horizon the first arrival wins (state evicted after)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_carbon_payloads(spark, landing_dir: str) -> DataFrame:
    """Streaming twin of the fetch→ingest loop: a file-source stream over
    the payload landing dir (`sources.fetch.write_payload_dir`'s layout —
    one single-line JSON document per fetch, ``carbon_*.json``), exploded
    to records and normalized through the SAME column recipe as the batch
    path (`json_payloads.carbon_record_columns`).

    File-source semantics give the cron loop its exactly-once story for
    free: each landed file is processed in exactly one micro-batch
    (checkpointed file log), so re-running the drain after new fetches
    appends only the new payloads' rows. Schema is EXPLICIT — no inference
    pass, and malformed documents yield null-`data` rows that explode to
    zero records rather than failing the stream."""
    from big_data_project_datapipeline_spark.sources.json_payloads import (
        CARBON_RECORD,
        carbon_record_columns,
    )
    from pyspark.sql import types as T

    payload_schema = T.StructType(
        [T.StructField("data", T.ArrayType(CARBON_RECORD), True)]
    )
    raw = (
        spark.readStream.schema(payload_schema)
        .option("pathGlobFilter", "carbon_*.json")
        .json(landing_dir)
    )
    recs = raw.select(F.explode("data").alias("r")).select("r.*")
    return carbon_record_columns(recs)


def run_available_now_to_parquet(
    result: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "engine_stream_sink",
) -> StreamingQuery:
    """Drain-to-parquet with checkpointed exactly-once file tracking — the
    production shape of the cron fetch→ingest loop (the memory-sink variant
    above is for tests/inspection)."""
    return (
        result.writeStream.format("parquet")
        .queryName(query_name)
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    result: DataFrame,
    checkpoint_dir: str,
    query_name: str = "engine_stream",
    output_mode: str = "append",
) -> StreamingQuery:
    """Drain everything currently available, then stop — the cron-batch
    cadence (reference raw_data_collection.yml:5) on a streaming plan.
    Writes to a named in-memory sink; production would target parquet/Delta
    with the same trigger.

    output_mode: windowed aggregations need ``complete`` (or ``update``) on
    a finite drain — in ``append`` a window only emits once the watermark
    passes it, and the watermark never advances past the final batch.
    Stateless transforms and watermark-dedup use ``append``.
    """
    return (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_touch_conversions(
    touches: DataFrame,
    conversions: DataFrame,
    horizon: str = "7 days",
    watermark: str = "48 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Stream-stream attribution join — the streaming-native form of the
    batch last-touch window (q81): every (touch, conversion) pair of the
    same user where the touch lands in ``[conversion − horizon,
    conversion)``. Watermarks on BOTH sides + the time-range predicate
    bound the join state: a touch can be evicted once its ts falls
    ``horizon`` past the conversion watermark, which is exactly the
    state bound Spark derives from this interval condition.

    Emits one row per qualifying pair (the "all touches" form);
    downstream batch jobs reduce to last-touch if needed — keeping the
    stream append-only (no per-key aggregation state beyond the join).
    """
    t = touches.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("t_user"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
    )
    c = conversions.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("c_user"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
    )
    return t.join(
        c,
        (F.col("t_user") == F.col("c_user"))
        & (F.col("touch_ts") < F.col("conversion_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conversion_ts") - F.expr(f"INTERVAL {horizon}")
        ),
    ).select(
        F.col("c_user").alias(key_col),
        "conversion_id",
        "conversion_ts",
        "touch_id",
        "touch_type",
        "touch_ts",
    )
