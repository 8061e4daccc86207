"""Loaders for the driver testdata tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. These are plain
``spark.read.parquet`` scans — column pruning and predicate pushdown happen in
the queries that consume them (check with ``.explain``: ``PushedFilters`` /
``ReadSchema`` must reflect the query, not the full table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
