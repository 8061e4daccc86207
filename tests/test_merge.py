"""Keep-last / keep-first upsert (D1/D2) — explicit-priority dedup,
idempotency (SURVEY.md §7.4.2)."""

from __future__ import annotations

import datetime as dt

from big_data_project_datapipeline_spark.operators.merge import (
    upsert_keep_first,
    upsert_keep_last,
)

UTC = dt.timezone.utc


def ts(h):
    return dt.datetime(2024, 1, 1, h, tzinfo=UTC)


def test_keep_last_new_wins(spark):
    existing = spark.createDataFrame(
        [(ts(0), 1.0), (ts(1), 2.0)], "datetime timestamp, v double"
    )
    new = spark.createDataFrame(
        [(ts(1), 99.0), (ts(2), 3.0)], "datetime timestamp, v double"
    )
    out = {r["datetime"].hour: r["v"] for r in upsert_keep_last(existing, new).collect()}
    assert out == {0: 1.0, 1: 99.0, 2: 3.0}


def test_keep_first_previous_wins(spark):
    prev = spark.createDataFrame([(ts(1), 2.0)], "datetime timestamp, v double")
    recomputed = spark.createDataFrame(
        [(ts(1), 99.0), (ts(2), 3.0)], "datetime timestamp, v double"
    )
    out = {
        r["datetime"].hour: r["v"] for r in upsert_keep_first(prev, recomputed).collect()
    }
    assert out == {1: 2.0, 2: 3.0}


def test_idempotent_reappend(spark):
    existing = spark.createDataFrame(
        [(ts(0), 1.0), (ts(1), 2.0)], "datetime timestamp, v double"
    )
    new = spark.createDataFrame([(ts(1), 9.0)], "datetime timestamp, v double")
    once = upsert_keep_last(existing, new)
    twice = upsert_keep_last(once, new)
    assert sorted(once.collect()) == sorted(twice.collect())


def test_schema_widening_union(spark):
    """unionByName(allowMissingColumns) — pandas concat null-fills (U1)."""
    existing = spark.createDataFrame([(ts(0), 1.0)], "datetime timestamp, v double")
    new = spark.createDataFrame(
        [(ts(1), 2.0, "x")], "datetime timestamp, v double, extra string"
    )
    out = upsert_keep_last(existing, new)
    assert set(out.columns) == {"datetime", "v", "extra"}
    row = {r["datetime"].hour: r for r in out.collect()}
    assert row[0]["extra"] is None and row[1]["extra"] == "x"


def test_merge_deterministic_with_intra_side_duplicate_keys(spark):
    from big_data_project_datapipeline_spark.operators.merge import (
        upsert_keep_last,
    )

    # two NEW rows share the key and the (empty) tiebreak — the keeper
    # must be decided by the value fallback, identically on every run
    existing = spark.createDataFrame([(1, "old")], "k long, v string")
    new = spark.createDataFrame(
        [(1, "zzz"), (1, "aaa"), (2, "solo")], "k long, v string"
    )
    outs = {
        tuple(sorted(map(tuple, upsert_keep_last(existing, new, keys=("k",)).collect())))
        for _ in range(3)
    }
    assert len(outs) == 1  # identical across repeated plans
    rows = dict(next(iter(outs)))
    assert rows[1] == "aaa"  # ascending-value fallback picks 'aaa'
    assert rows[2] == "solo"
