"""Salted join: result equivalence with a plain join + actual spread of
the hot key across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.operators.skew import salted_join


def _tables(spark):
    # 10k rows of hot key 0 + 1k spread over keys 1..100
    large = spark.range(11000).select(
        F.when(F.col("id") < 10000, 0).otherwise((F.col("id") % 100) + 1).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(101).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    return large, small


def test_salted_equals_plain_join(spark):
    large, small = _tables(spark)
    plain = large.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(large, small, "k", salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_hot_key_only_salting(spark):
    large, small = _tables(spark)
    out = salted_join(large, small, "k", salt=8, hot_keys=[0])
    plain = large.join(small, "k")
    assert out.count() == plain.count() == 11000


def test_hot_key_spreads_over_buckets(spark):
    large, _ = _tables(spark)
    salted = large.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    buckets = (
        salted.filter("k = 0").groupBy("__salt").count().collect()
    )
    assert len(buckets) == 8  # hot key occupies all 8 salt buckets
    counts = [r["count"] for r in buckets]
    assert max(counts) < 10000 * 0.25  # no bucket holds the whole key


def test_key_skew_profile_hand_computed(spark):
    import pytest
    import math

    from big_data_project_datapipeline_spark.operators.skew import (
        key_skew_profile,
    )

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, ["k"], top_n=2).collect()
    assert [(r["rank"], r["k"], r["cnt"]) for r in out] == [
        (1, "hot", 6),
        (2, "warm", 3),
    ]
    r = out[0]
    assert r["share"] == 0.6 and r["n_keys"] == 3
    # max/mean: 6 / (10/3)
    assert r["max_over_mean"] == pytest.approx(6 / (10 / 3), abs=1e-6)
    want_h = -sum(p * math.log(p) for p in (0.6, 0.3, 0.1))
    assert r["entropy"] == pytest.approx(want_h, abs=1e-6)


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    from big_data_project_datapipeline_spark.operators.skew import salted_join

    large = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(2, "y")], "k long, b string")
    with pytest.raises(ValueError, match="duplicate unmatched"):
        salted_join(large, small, on="k", how="full")
