"""Hand-computed fixtures for the round-9 profiling + sweep-line wave:
column_profile's candidate-key rule, fd_audit's NULL semantics, and
interval_concurrency / monthly_peak_concurrency including the
carry-in-across-months case the per-month max alone would get wrong.
"""

from __future__ import annotations

from datetime import date

import pytest

from big_data_project_datapipeline_spark.functions.profile import (
    column_profile,
    fd_audit,
)
from big_data_project_datapipeline_spark.operators.intervals import (
    interval_concurrency,
    monthly_peak_concurrency,
)


def test_column_profile_counts_and_key_rule(spark):
    """id is a candidate key; v has a NULL (distinct excludes it) so it
    cannot be a key; w is total but duplicated so it cannot be a key."""
    df = spark.createDataFrame(
        [(1, "a", 7), (2, "b", 7), (3, None, 8)],
        "id long, v string, w long",
    )
    got = {r["col_name"]: r for r in column_profile(df).collect()}
    assert (got["id"]["n_rows"], got["id"]["n_null"], got["id"]["n_distinct"],
            got["id"]["is_candidate_key"]) == (3, 0, 3, True)
    assert (got["v"]["n_null"], got["v"]["n_distinct"],
            got["v"]["is_candidate_key"]) == (1, 2, False)
    assert (got["w"]["n_null"], got["w"]["n_distinct"],
            got["w"]["is_candidate_key"]) == (0, 2, False)


def test_column_profile_subset_and_empty_raises(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    assert [r["col_name"] for r in column_profile(df, ["v"]).collect()] == ["v"]
    with pytest.raises(ValueError):
        column_profile(df, [])


def test_fd_audit_holds_violated_and_null_rules(spark):
    """b -> m holds; b -> s is violated by exactly one group (b=1 maps
    to sizes {10, 11}); NULL lhs forms its own group; all-NULL rhs
    counts zero distinct values and therefore holds."""
    df = spark.createDataFrame(
        [
            (1, "M1", 10),
            (1, "M1", 11),
            (2, "M2", 20),
            (None, "M3", 30),
            (3, None, None),
        ],
        "b long, m string, s long",
    )
    got = {(r["lhs"], r["rhs"]): r for r in
           fd_audit(df, [("b", "m"), ("b", "s"), ("m", "s")]).collect()}
    bm = got[("b", "m")]
    assert (bm["n_groups"], bm["violating_groups"], bm["holds"]) == (4, 0, True)
    bs = got[("b", "s")]
    assert (bs["n_groups"], bs["violating_groups"], bs["holds"]) == (4, 1, False)
    # m -> s: M1 maps to {10, 11} (1 violation); the m=None group's
    # rhs is {NULL} -> 0 distinct -> NOT a second violation
    ms = got[("m", "s")]
    assert (ms["n_groups"], ms["violating_groups"], ms["holds"]) == (4, 1, False)
    with pytest.raises(ValueError):
        fd_audit(df, [])


def _iv(spark, rows):
    return spark.createDataFrame(rows, "s date, e date")


def test_interval_concurrency_steps_hand_traced(spark):
    """Intervals [1,3], [2,2], [5,5] (days of 2024-01): steps
    +1@1, +1@2, -1@3, -1@4, +1@5, -1@6 -> concurrency 1,2,1,0,1,0.
    End dates are INCLUSIVE; the 2-2 one-day interval counts."""
    rows = [
        (date(2024, 1, 1), date(2024, 1, 3)),
        (date(2024, 1, 2), date(2024, 1, 2)),
        (date(2024, 1, 5), date(2024, 1, 5)),
    ]
    got = {r["ts"]: (r["net"], r["concurrent"]) for r in
           interval_concurrency(_iv(spark, rows), "s", "e").collect()}
    assert got == {
        date(2024, 1, 1): (1, 1),
        date(2024, 1, 2): (1, 2),
        date(2024, 1, 3): (-1, 1),
        date(2024, 1, 4): (-1, 0),
        date(2024, 1, 5): (1, 1),
        date(2024, 1, 6): (-1, 0),
    }


def test_interval_concurrency_drops_null_and_inverted(spark):
    rows = [
        (date(2024, 1, 1), date(2024, 1, 2)),
        (None, date(2024, 1, 2)),
        (date(2024, 1, 2), None),
        (date(2024, 1, 9), date(2024, 1, 1)),  # end < start
    ]
    out = interval_concurrency(_iv(spark, rows), "s", "e").collect()
    assert sum(r["net"] for r in out) == 0
    assert max(r["concurrent"] for r in out) == 1


def test_monthly_peak_carry_in_across_quiet_month(spark):
    """One long interval spanning Jan 5 .. Mar 10 plus a Jan 6-7
    spike: Jan peaks at 2; February has NO step rows (nothing opens or
    closes) so it is absent; March's only steps are the -1 close
    (value 0), and without the carry-in its reported peak would be 0 —
    the carry-in from January's last standing value (1) must win."""
    rows = [
        (date(2024, 1, 5), date(2024, 3, 10)),
        (date(2024, 1, 6), date(2024, 1, 7)),
    ]
    got = {r["month"]: r["peak"] for r in
           monthly_peak_concurrency(_iv(spark, rows), "s", "e").collect()}
    assert got == {date(2024, 1, 1): 2, date(2024, 3, 1): 1}
