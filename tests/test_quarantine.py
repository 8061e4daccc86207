"""quarantine_split: bad records routed, not dropped; null predicate goes
to quarantine; partition = good ∪ bad."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.sources.json_payloads import quarantine_split


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01T00:00"), (2, "garbage"), (3, None)],
        "id long, raw string",
    )
    parsed = df.withColumn("ts", F.try_to_timestamp("raw"))
    good, bad = quarantine_split(parsed, F.col("ts").isNotNull())
    assert [r["id"] for r in good.collect()] == [1]
    assert sorted(r["id"] for r in bad.collect()) == [2, 3]
    assert good.count() + bad.count() == df.count()
