"""Anti-join delta (F5/J5), empty-state bootstrap (S7), end-to-end
incremental feature run (reference data_engineering.py:100-132)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from big_data_project_datapipeline_spark.operators.incremental import (
    anti_join_delta,
    load_or_empty,
)
from big_data_project_datapipeline_spark.plans.features import incremental_feature_run

UTC = dt.timezone.utc


def ts(h):
    return dt.datetime(2024, 1, 1, h, tzinfo=UTC)


def test_anti_join_delta(spark):
    raw = spark.createDataFrame(
        [(ts(0), 1.0), (ts(1), 2.0), (ts(2), 3.0)], "datetime timestamp, v double"
    )
    prev = spark.createDataFrame([(ts(0),), (ts(1),)], "datetime timestamp")
    out = anti_join_delta(raw, prev)
    assert [r["datetime"].hour for r in out.collect()] == [2]


def test_load_or_empty_missing_path(spark, tmp_path):
    schema = T.StructType([T.StructField("x", T.DoubleType())])
    df = load_or_empty(spark, str(tmp_path / "nope"), schema)
    assert df.count() == 0 and df.schema == schema


def test_load_or_empty_roundtrip(spark, tmp_path):
    schema = T.StructType([T.StructField("x", T.DoubleType())])
    path = str(tmp_path / "t")
    spark.createDataFrame([(1.0,), (2.0,)], schema).write.parquet(path)
    assert load_or_empty(spark, path, schema).count() == 2


def test_incremental_feature_run_processes_only_delta(spark):
    raw = spark.createDataFrame(
        [(ts(h), float(h)) for h in range(4)], "datetime timestamp, temperature_C double"
    )
    first = incremental_feature_run(raw, raw.limit(0).select("datetime"))
    assert first.count() == 4
    assert "hour" in first.columns and "heating_demand" in first.columns

    # Re-run with the same raw: empty delta → previous returned unchanged.
    second = incremental_feature_run(raw, first)
    assert second is first or sorted(second.collect()) == sorted(first.collect())


def test_incremental_scaler_fits_on_delta_only(spark):
    """Scaled values of already-processed rows must NOT change when new rows
    arrive (reference trap: fit-on-delta, SURVEY.md §7.4.6)."""
    raw1 = spark.createDataFrame(
        [(ts(0), 10.0), (ts(1), 20.0)], "datetime timestamp, temperature_C double"
    )
    out1 = incremental_feature_run(raw1, raw1.limit(0).select("datetime"))
    v0_before = {r["datetime"].hour: r["scaled_temperature_C"] for r in out1.collect()}

    raw2 = raw1.union(
        spark.createDataFrame([(ts(2), 99.0)], "datetime timestamp, temperature_C double")
    )
    out2 = incremental_feature_run(raw2, out1)
    after = {r["datetime"].hour: r["scaled_temperature_C"] for r in out2.collect()}
    for k, v in v0_before.items():
        assert after[k] == v  # keep-first: old rows untouched
    assert after[2] == 0.0  # delta of one row → (99-99)/1


def test_aggregate_state_merge_equals_full_recompute(spark):
    """Incremental MV maintenance: merging per-partition states must be
    BIT-equal to the state computed over the full data (decimal sums are
    exact, min/max lattice, HLL sketch mergeable)."""
    from big_data_project_datapipeline_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_state,
        read_aggregate_state,
    )

    rows = [
        ("a", float(v), u)
        for v, u in [(1, 10), (2, 11), (3, 10), (100, 12), (5, 13)]
    ] + [("b", 7.0, 20), ("b", 9.0, 21)]
    df = spark.createDataFrame(rows, "k string, value double, user long")
    part1, part2 = df.filter("value <= 3"), df.filter("value > 3")
    full = aggregate_state(df, ["k"], "value", "user")
    merged = merge_aggregate_state(
        aggregate_state(part1, ["k"], "value", "user"),
        aggregate_state(part2, ["k"], "value", "user"),
        ["k"],
    )
    f = {r["k"]: r for r in read_aggregate_state(full).collect()}
    m = {r["k"]: r for r in read_aggregate_state(merged).collect()}
    for k in ("a", "b"):
        assert m[k]["n"] == f[k]["n"]
        assert m[k]["sum_dec"] == f[k]["sum_dec"]  # decimal: bit-equal
        assert m[k]["vmin"] == f[k]["vmin"] and m[k]["vmax"] == f[k]["vmax"]
        assert m[k]["mean"] == f[k]["mean"]
        assert m[k]["approx_distinct"] == f[k]["approx_distinct"]


def test_anti_join_delta_null_keys_do_not_reaccumulate(spark):
    from big_data_project_datapipeline_spark.operators.incremental import (
        anti_join_delta,
    )

    prev = spark.createDataFrame([(None,), (1,)], "k long")
    new = spark.createDataFrame([(None, "a"), (1, "b"), (2, "c")],
                                "k long, v string")
    out = anti_join_delta(new, prev, keys=("k",)).collect()
    # pandas-isin semantics: the null key already in the sink matches,
    # so only the genuinely new key survives
    assert [(r.k, r.v) for r in out] == [(2, "c")]
