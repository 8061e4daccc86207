"""Loaders for the driver testdata tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. These are plain
``spark.read.parquet`` scans — column pruning and predicate pushdown happen in
the queries that consume them (check with ``.explain``: ``PushedFilters`` /
``ReadSchema`` must reflect the query, not the full table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    Timestamp normalization: generator vintages differ — TIMESTAMP(NANOS)
    (no native Spark type; with ``spark.sql.legacy.parquet.nanosAsLong``
    it arrives as epoch-nanos LONG and is converted via `ts div 1000` —
    exact, the generator emits whole microseconds) and TIMESTAMP_NTZ
    (micros, isAdjustedToUTC=false). Both are normalized to the session
    TIMESTAMP type (LTZ, session TZ pinned UTC, so wall-clock fields are
    identical to DuckDB's naive read of the same file) — every operator
    downstream then sees one timestamp semantics regardless of vintage.
    The confs are runtime-settable, so this also works on a
    driver-provided SparkSession.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # calendar features & oracle parity assume UTC rendering — a driver-
        # provided session may carry a different TZ (both runtime-settable)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001 — conf may be locked; reads then fail loudly
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(
                field.name, F.col(field.name).cast(T.TimestampType())
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
