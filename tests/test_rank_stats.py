"""Rank/association statistics (round 9 third wave): spearman_corr,
kruskal_wallis, theil_sen_trend, cramers_v_matrix — hand-computed
fixtures, tie handling, NULL/NaN contracts, and the guard raises."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.functions.quality import (
    cramers_v_matrix,
    kruskal_wallis,
    spearman_corr,
    theil_sen_trend,
)


# ---------------------------------------------------------------- spearman


def test_spearman_hand_computed_with_ties(spark):
    """Group a: x = (1,2,2,4,5), y = (2,1,5,4,4.5). Mid-ranks
    x → (1, 2.5, 2.5, 4, 5), y → (2, 1, 5, 3.5, 3.5)... wait y sorted:
    1,2,4,4.5,5 → ranks y=(2:2, 1:1, 5:5, 4:3, 4.5:4). No y ties.
    Pearson on (1,2.5,2.5,4,5) vs (2,1,5,3,4) = 0.410391 (hand moment
    arithmetic, matches the doubled-unit integer device exactly).
    Group b is strictly monotone → 1.0."""
    data = [
        ("a", 1.0, 2.0),
        ("a", 2.0, 1.0),
        ("a", 2.0, 5.0),
        ("a", 4.0, 4.0),
        ("a", 5.0, 4.5),
        ("b", 1.0, 1.0),
        ("b", 2.0, 2.0),
        ("b", 3.0, 3.0),
    ]
    df = spark.createDataFrame(data, ["g", "x", "y"])
    rows = {
        r["g"]: r
        for r in spearman_corr(df, "x", "y", ["g"]).collect()
    }
    assert rows["a"]["n"] == 5
    assert rows["a"]["spearman_rho"] == pytest.approx(0.410391, abs=1e-9)
    assert rows["b"]["spearman_rho"] == 1.0


def test_spearman_anti_monotone_is_minus_one(spark):
    df = spark.createDataFrame(
        [(float(i), float(10 - i)) for i in range(6)], ["x", "y"]
    )
    assert spearman_corr(df, "x", "y").first()["spearman_rho"] == -1.0


def test_spearman_null_nan_rows_drop_and_constant_is_null(spark):
    """NULL/NaN in EITHER column drops the row (the rank universe must
    be pairwise complete); an all-tied x column has zero rank variance
    → NULL rho, never NaN."""
    df = spark.createDataFrame(
        [
            ("a", 1.0, 1.0),
            ("a", 2.0, float("nan")),
            ("a", None, 3.0),
            ("a", 3.0, 2.0),
            ("c", 7.0, 1.0),
            ("c", 7.0, 2.0),
            ("c", 7.0, 3.0),
        ],
        ["g", "x", "y"],
    )
    rows = {r["g"]: r for r in spearman_corr(df, "x", "y", ["g"]).collect()}
    assert rows["a"]["n"] == 2  # two clean rows survive
    assert rows["a"]["spearman_rho"] == 1.0
    assert rows["c"]["spearman_rho"] is None


# ---------------------------------------------------------- kruskal-wallis


def test_kruskal_wallis_hand_computed(spark):
    """x=(1,3,5), y=(2,2,6), z=(4,7); pooled mid-ranks
    1→1, 2→2.5 (tie pair), 3→4, 4→5, 5→6, 6→7, 7→8.
    R_x=11, R_y=12, R_z=13; H = 12/(8·9)·(121/3+144/3+169/2) − 27
    = 1.805556; tie term Σ(t³−t) = 6 → divisor 1 − 6/504 and
    H_corr = 1.827309 (hand arithmetic)."""
    kw = [
        ("x", 1.0),
        ("x", 3.0),
        ("x", 5.0),
        ("y", 2.0),
        ("y", 2.0),
        ("y", 6.0),
        ("z", 4.0),
        ("z", 7.0),
    ]
    r = kruskal_wallis(
        spark.createDataFrame(kw, ["lvl", "v"]), "v", "lvl"
    ).first()
    assert r["n"] == 8 and r["n_levels"] == 3 and r["dof"] == 2
    assert r["h"] == pytest.approx(1.805556, abs=1e-9)
    assert r["h_tie_corrected"] == pytest.approx(1.827309, abs=1e-9)


def test_kruskal_wallis_all_tied_emits_null_corrected(spark):
    """Every value identical: the tie-correction divisor is 0 → the
    corrected stat is NULL (0/0 would otherwise surface as NaN), and
    the uncorrected H collapses to 0 exactly."""
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)], ["lvl", "v"]
    )
    r = kruskal_wallis(df, "v", "lvl").first()
    assert r["h"] == 0.0
    assert r["h_tie_corrected"] is None


def test_kruskal_wallis_single_level_h_zero(spark):
    """One level: its rank sum is the total N(N+1)/2, so H is
    identically 0 with dof 0 — the no-information case, not an
    error."""
    df = spark.createDataFrame(
        [("only", float(i)) for i in range(1, 6)], ["lvl", "v"]
    )
    r = kruskal_wallis(df, "v", "lvl").first()
    assert r["n_levels"] == 1 and r["dof"] == 0
    assert r["h"] == 0.0


def test_kruskal_wallis_grouped_and_null_levels_drop(spark):
    """Outer group_cols partition independent tests; NULL between
    levels drop (they are unlabeled, not a level)."""
    df = spark.createDataFrame(
        [
            ("g1", "x", 1.0),
            ("g1", "x", 2.0),
            ("g1", "y", 3.0),
            ("g1", "y", 4.0),
            ("g1", None, 99.0),
            ("g2", "x", 1.0),
            ("g2", "y", 1.0),
        ],
        ["g", "lvl", "v"],
    )
    rows = {
        r["g"]: r
        for r in kruskal_wallis(df, "v", "lvl", ["g"]).collect()
    }
    assert rows["g1"]["n"] == 4  # the NULL-level row is gone
    # g1 has no ties: ranks x={1,2}, y={3,4}; H = 12/20·(9/2+49/2)−15
    # = 12/20·29 − 15 = 2.4
    assert rows["g1"]["h"] == pytest.approx(2.4, abs=1e-9)
    assert rows["g2"]["n"] == 2


# -------------------------------------------------------------- theil-sen


def test_theil_sen_outlier_day_does_not_move_median(spark):
    """Daily means (1,2,10,4) on days 0-3: the 6 pairwise slopes sort
    to (-6, 1, 1, 1, 4.5, 8) → median 1.0 — the wild day-2 value moves
    an OLS slope but not the slope median. The single-day group b
    stays in the output with n_pairs=0 and NULL slope."""
    ts = [
        ("a", dt.datetime(2024, 1, 1, 3), 1.0),
        ("a", dt.datetime(2024, 1, 2, 5), 2.0),
        ("a", dt.datetime(2024, 1, 3, 7), 10.0),
        ("a", dt.datetime(2024, 1, 4, 9), 4.0),
        ("b", dt.datetime(2024, 1, 1), 5.0),
    ]
    df = spark.createDataFrame(ts, ["g", "ts", "v"])
    rows = {
        r["g"]: r
        for r in theil_sen_trend(df, "ts", "v", ["g"]).collect()
    }
    assert rows["a"]["n_days"] == 4 and rows["a"]["n_pairs"] == 6
    assert rows["a"]["slope_per_day"] == 1.0
    assert rows["b"]["n_pairs"] == 0
    assert rows["b"]["slope_per_day"] is None


def test_theil_sen_intraday_rows_collapse_to_daily_mean(spark):
    """Two rows on the same day average before the pair build: days
    (0: mean 2.0, 1: 5.0) → slope 3.0 from ONE pair."""
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 1), 1.0),
            (dt.datetime(2024, 1, 1, 23), 3.0),
            (dt.datetime(2024, 1, 2, 12), 5.0),
        ],
        ["ts", "v"],
    )
    r = theil_sen_trend(df, "ts", "v").first()
    assert r["n_days"] == 2 and r["n_pairs"] == 1
    assert r["slope_per_day"] == 3.0


def test_theil_sen_max_points_guard_raises(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(i)) for i in range(5)],
        ["ts", "v"],
    )
    with pytest.raises(ValueError, match="max_points"):
        theil_sen_trend(df, "ts", "v", max_points=3)


# -------------------------------------------------------------- cramers v


def test_cramers_v_hand_computed_2x2(spark):
    """Table [[2,1],[1,2]], n=6: χ² = n(ad−bc)²/(R₁R₂C₁C₂) =
    6·9/81 = 0.666667, V = sqrt(χ²/(n·1)) = 0.333333."""
    cv = [("r", "u"), ("r", "u"), ("r", "w"), ("s", "w"), ("s", "w"), ("s", "u")]
    r = cramers_v_matrix(
        spark.createDataFrame(cv, ["p", "q"]), ["p", "q"]
    ).first()
    assert (r["col_x"], r["col_y"]) == ("p", "q")
    assert r["n"] == 6 and r["dof"] == 1
    assert r["chi2"] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert r["cramers_v"] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_cramers_v_perfect_association_is_one(spark):
    df = spark.createDataFrame(
        [("a", "A"), ("a", "A"), ("b", "B"), ("b", "B"), ("c", "C")],
        ["p", "q"],
    )
    r = cramers_v_matrix(df, ["p", "q"]).first()
    assert r["cramers_v"] == 1.0
    # χ² for perfect association = n·min(r−1,c−1) = 5·2
    assert r["chi2"] == pytest.approx(10.0, abs=1e-6)


def test_cramers_v_null_is_a_level_and_single_level_is_null(spark):
    """NULLs become the '__NULL__' sentinel level (they carry
    association signal; a bare NULL key would fall out of the totals
    joins); a constant column has min(r−1,c−1)=0 → NULL V."""
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", "w"), ("b", "w")],
        ["p", "q"],
    ).withColumn("const", F.lit("k"))
    out = {
        (r["col_x"], r["col_y"]): r
        for r in cramers_v_matrix(df, ["p", "q", "const"]).collect()
    }
    pq = out[("p", "q")]
    assert pq["c_levels"] == 2  # NULL counted as a level
    assert pq["cramers_v"] == 1.0  # p determines q (incl. the NULLs)
    assert out[("p", "const")]["cramers_v"] is None
    assert out[("p", "const")]["dof"] == 0


def test_cramers_v_three_column_matrix_has_three_pairs(spark):
    df = spark.createDataFrame(
        [("a", "x", "1"), ("b", "y", "2")], ["c1", "c2", "c3"]
    )
    pairs = {
        (r["col_x"], r["col_y"])
        for r in cramers_v_matrix(df, ["c1", "c2", "c3"]).collect()
    }
    assert pairs == {("c1", "c2"), ("c1", "c3"), ("c2", "c3")}
    with pytest.raises(ValueError, match=">= 2"):
        cramers_v_matrix(df, ["c1"])


def test_spearman_matches_pearson_identity_on_permutation(spark):
    """Sanity cross-check: for a tie-free permutation, Spearman via
    the moment device equals 1 − 6Σd²/(n(n²−1)) (the shortcut is valid
    exactly when no ties exist)."""
    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    ys = [3.0, 1.0, 4.0, 2.0, 6.0, 5.0]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    got = spearman_corr(df, "x", "y").first()["spearman_rho"]
    rx = {v: i + 1 for i, v in enumerate(sorted(xs))}
    ry = {v: i + 1 for i, v in enumerate(sorted(ys))}
    d2 = sum((rx[a] - ry[b]) ** 2 for a, b in zip(xs, ys))
    n = len(xs)
    expect = 1.0 - 6.0 * d2 / (n * (n * n - 1))
    # the operator rounds at the surface to 6 decimals
    assert got == round(expect, 6)
