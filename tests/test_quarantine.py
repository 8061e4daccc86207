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


def test_read_landed_json_splits_corrupt(spark, tmp_path):
    from pyspark.sql import types as T

    from big_data_project_datapipeline_spark.sources.json_payloads import (
        read_landed_json,
    )

    p = tmp_path / "landed"
    p.mkdir()
    (p / "batch1.jsonl").write_text(
        '{"ts": "2024-01-15T00:00:00", "v": 1.5}\n'
        '{"ts": "2024-01-15T01:00:00", "v": 2.5}\n'
        "this is not json at all\n"
        '{"ts": "2024-01-15T02:00:00", "v": "not-a-number"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("ts", T.StringType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    good, quarantine = read_landed_json(spark, str(p), schema)
    assert good.columns == ["ts", "v"]
    assert good.count() == 2
    bad = quarantine.collect()
    assert len(bad) == 2
    assert all(r["source_file"].endswith("batch1.jsonl") for r in bad)
    assert any("not json" in r["_corrupt_record"] for r in bad)
