"""operators.prefix: the distributed zipWithIndex device must be
bit-identical to the single-partition global window it replaces
(ranks, running sums, and the arithmetic ntile reconstruction) —
the round-5 scale fix for q166/q128/q135 rests on this equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.operators.prefix import (
    ntile_from_rank,
    partitioned_prefix,
)


def _frame(spark, n=97):
    # Deterministic pseudo-random values with ties, unique id tiebreak.
    return spark.range(n).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") * 37 % 11).cast("double").alias("v"),
        (F.col("id") * 13 % 7).cast("long").alias("w"),
    )


class TestPartitionedPrefix:
    def test_rank_matches_global_row_number(self, spark):
        df = _frame(spark)
        got = {
            r["id"]: r["rk"]
            for r in partitioned_prefix(
                df, ["v", "id"], rank_col="rk", num_partitions=8
            ).collect()
        }
        want = {
            r["id"]: r["rk"]
            for r in df.select(
                "id", F.row_number().over(Window.orderBy("v", "id")).alias("rk")
            ).collect()
        }
        assert got == want

    def test_running_sum_matches_global_window(self, spark):
        df = _frame(spark)
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["id"]: r["cs"]
            for r in df.select("id", F.sum("w").over(w).alias("cs")).collect()
        }
        got = {
            r["id"]: r["w__cum"]
            for r in partitioned_prefix(
                df, ["id"], sum_cols=["w"], num_partitions=8
            ).collect()
        }
        assert got == want

    def test_single_row_and_empty(self, spark):
        one = _frame(spark, 1)
        row = partitioned_prefix(
            one, ["id"], sum_cols=["w"], rank_col="rk", num_partitions=4
        ).collect()
        assert len(row) == 1 and row[0]["rk"] == 1 and row[0]["w__cum"] == 0
        empty = _frame(spark).filter(F.lit(False))
        assert (
            partitioned_prefix(empty, ["id"], rank_col="rk").count() == 0
        )

    def test_more_partitions_than_rows(self, spark):
        df = _frame(spark, 3)
        got = sorted(
            r["rk"]
            for r in partitioned_prefix(
                df, ["id"], rank_col="rk", num_partitions=16
            ).collect()
        )
        assert got == [1, 2, 3]

    def test_requires_order_cols(self, spark):
        with pytest.raises(ValueError):
            partitioned_prefix(_frame(spark), [])


class TestNtileFromRank:
    @pytest.mark.parametrize("n", [1, 2, 4, 5, 6, 7, 13, 50])
    @pytest.mark.parametrize("tiles", [2, 5])
    def test_matches_window_ntile(self, spark, n, tiles):
        df = _frame(spark, n)
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id",
                F.ntile(tiles)
                .over(Window.orderBy("v", "id"))
                .alias("t"),
            ).collect()
        }
        ranked = partitioned_prefix(
            df, ["v", "id"], rank_col="rk", num_partitions=4
        ).crossJoin(
            F.broadcast(
                df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
            )
        )
        got = {
            r["id"]: r["t"]
            for r in ranked.select(
                "id",
                ntile_from_rank(F.col("rk"), F.col("__n"), tiles).alias(
                    "t"
                ),
            ).collect()
        }
        assert got == want


def _gframe(spark, n=211):
    # Deterministic frame with a LOW-CARDINALITY group key (the funnel
    # class grouped_prefix exists for), value ties within and across
    # groups, and a unique id tiebreak.
    return spark.range(n).select(
        F.col("id").cast("long").alias("id"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
        (F.col("id") * 37 % 13).cast("double").alias("v"),
        (F.col("id") * 13 % 7 + 1).cast("long").alias("w"),
    )


class TestGroupedPrefix:
    """grouped_prefix must be bit-identical to the
    Window.partitionBy(group) forms it replaces (the q166 sf10 fix)."""

    def test_ranks_and_counts_match_group_windows(self, spark):
        from big_data_project_datapipeline_spark.operators.prefix import (
            grouped_prefix,
        )

        df = _gframe(spark)
        got = {
            r["id"]: r
            for r in grouped_prefix(
                df,
                ["v", "id"],
                "grp",
                rank_col="p",
                group_rank_col="r",
                group_count_col="ng",
            ).collect()
        }
        wg = Window.partitionBy("grp").orderBy("v", "id")
        wa = Window.orderBy("v", "id")
        want = {
            r["id"]: r
            for r in df.select(
                "id",
                F.row_number().over(wa).cast("long").alias("p"),
                F.row_number().over(wg).cast("long").alias("r"),
                F.count(F.lit(1))
                .over(Window.partitionBy("grp"))
                .cast("long")
                .alias("ng"),
            ).collect()
        }
        assert len(got) == len(want)
        for i, w in want.items():
            g = got[i]
            assert (g["p"], g["r"], g["ng"]) == (w["p"], w["r"], w["ng"]), i

    def test_group_running_sums_match_group_windows(self, spark):
        from big_data_project_datapipeline_spark.operators.prefix import (
            grouped_prefix,
        )

        df = _gframe(spark)
        got = {
            r["id"]: r
            for r in grouped_prefix(
                df,
                ["v", "id"],
                "grp",
                rank_col=None,
                group_rank_col=None,
                group_count_col=None,
                sum_cols=["w"],
            ).collect()
        }
        wgs = (
            Window.partitionBy("grp")
            .orderBy("v", "id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want = {
            r["id"]: r
            for r in df.select(
                "id",
                F.sum("w").over(wgs).alias("w__gcum"),
                F.sum("w").over(Window.partitionBy("grp")).alias("w__gtot"),
            ).collect()
        }
        assert len(got) == len(want)
        for i, w in want.items():
            g = got[i]
            assert (g["w__gcum"], g["w__gtot"]) == (
                w["w__gcum"],
                w["w__gtot"],
            ), i

    def test_null_group_rows_kept_and_ranked(self, spark):
        """ADVICE r6 (high): the emit join must be null-safe on the
        group key — NULL-group rows are ordinary groups to the window
        forms this device replaces AND to the DuckDB oracles' GROUP BY,
        and the offsets pass counts them, so dropping them at the join
        corrupted every later group's ranks/cumsums."""
        from big_data_project_datapipeline_spark.operators.prefix import (
            grouped_prefix,
        )

        df = _gframe(spark, 101).withColumn(
            "grp",
            F.when(F.col("id") % 4 == 0, F.lit(None)).otherwise(
                F.col("grp")
            ),
        )
        got = {
            r["id"]: r
            for r in grouped_prefix(
                df,
                ["v", "id"],
                "grp",
                rank_col="p",
                group_rank_col="r",
                group_count_col="ng",
                sum_cols=["w"],
            ).collect()
        }
        wg = Window.partitionBy("grp").orderBy("v", "id")
        wgs = wg.rowsBetween(Window.unboundedPreceding, 0)
        wa = Window.orderBy("v", "id")
        want = {
            r["id"]: r
            for r in df.select(
                "id",
                F.row_number().over(wa).cast("long").alias("p"),
                F.row_number().over(wg).cast("long").alias("r"),
                F.count(F.lit(1))
                .over(Window.partitionBy("grp"))
                .cast("long")
                .alias("ng"),
                F.sum("w").over(wgs).alias("w__gcum"),
                F.sum("w").over(Window.partitionBy("grp")).alias("w__gtot"),
            ).collect()
        }
        assert len(got) == len(want) == 101
        for i, w in want.items():
            g = got[i]
            assert (
                g["p"],
                g["r"],
                g["ng"],
                g["w__gcum"],
                g["w__gtot"],
            ) == (w["p"], w["r"], w["ng"], w["w__gcum"], w["w__gtot"]), i

    def test_single_group_and_empty(self, spark):
        from big_data_project_datapipeline_spark.operators.prefix import (
            grouped_prefix,
        )

        one = spark.createDataFrame(
            [(1, "g", 2.0)], "id long, grp string, v double"
        )
        row = grouped_prefix(
            one, ["v", "id"], "grp", rank_col="p", group_rank_col="r"
        ).collect()[0]
        assert (row["p"], row["r"], row["__gcnt"]) == (1, 1, 1)
        empty = one.filter(F.lit(False))
        assert (
            grouped_prefix(
                empty, ["v", "id"], "grp", rank_col="p"
            ).count()
            == 0
        )


def test_group_rank_frame_empty_by_matches_global(spark):
    """group_rank_frame([]) — the global fallback — must match the
    unpartitioned window forms (rank, cumsum, totals)."""
    from big_data_project_datapipeline_spark.operators.prefix import (
        group_rank_frame,
    )

    df = _frame(spark, 53)
    got = {
        r["id"]: r
        for r in group_rank_frame(
            df, [], ["v", "id"], group_rank_col="r",
            group_count_col="n", sum_cols=["w"],
        ).collect()
    }
    wa = Window.orderBy("v", "id")
    was = wa.rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r
        for r in df.select(
            "id",
            F.row_number().over(wa).cast("long").alias("r"),
            F.sum("w").over(was).alias("w__gcum"),
        ).collect()
    }
    assert len(got) == 53
    for i, w in want.items():
        g = got[i]
        assert (g["r"], g["w__gcum"], g["n"]) == (
            w["r"],
            w["w__gcum"],
            53,
        ), i
        assert g["w__gtot"] == sum((j * 13) % 7 for j in range(53))


def test_group_rank_frame_multi_col_group(spark):
    """Multi-column group keys route through an ordered struct key and
    must match the two-key window forms."""
    from big_data_project_datapipeline_spark.operators.prefix import (
        group_rank_frame,
    )

    df = spark.range(97).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % 3).cast("string").alias("g1"),
        (F.col("id") % 2).cast("string").alias("g2"),
        (F.col("id") * 37 % 11).cast("double").alias("v"),
    )
    got = {
        r["id"]: r
        for r in group_rank_frame(
            df, ["g1", "g2"], ["v", "id"],
            group_rank_col="r", group_count_col="n",
        ).collect()
    }
    wg = Window.partitionBy("g1", "g2").orderBy("v", "id")
    want = {
        r["id"]: r
        for r in df.select(
            "id",
            F.row_number().over(wg).cast("long").alias("r"),
            F.count(F.lit(1))
            .over(Window.partitionBy("g1", "g2"))
            .cast("long")
            .alias("n"),
        ).collect()
    }
    for i, w in want.items():
        assert (got[i]["r"], got[i]["n"]) == (w["r"], w["n"]), i


def test_group_rank_frame_multi_col_null_keys(spark):
    """NULL fields inside a multi-column group key must form ordinary
    groups (struct-key null-safety, the ADVICE r6 join fix)."""
    from big_data_project_datapipeline_spark.operators.prefix import (
        group_rank_frame,
    )

    df = spark.range(89).select(
        F.col("id").cast("long").alias("id"),
        F.when(F.col("id") % 3 == 0, F.lit(None))
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("g1"),
        F.when(F.col("id") % 5 == 0, F.lit(None))
        .otherwise((F.col("id") % 2).cast("string"))
        .alias("g2"),
        (F.col("id") * 37 % 11).cast("double").alias("v"),
    )
    got = {
        r["id"]: r
        for r in group_rank_frame(
            df, ["g1", "g2"], ["v", "id"],
            group_rank_col="r", group_count_col="n",
        ).collect()
    }
    wg = Window.partitionBy("g1", "g2").orderBy("v", "id")
    want = {
        r["id"]: r
        for r in df.select(
            "id",
            F.row_number().over(wg).cast("long").alias("r"),
            F.count(F.lit(1))
            .over(Window.partitionBy("g1", "g2"))
            .cast("long")
            .alias("n"),
        ).collect()
    }
    assert len(got) == 89
    for i, w in want.items():
        assert (got[i]["r"], got[i]["n"]) == (w["r"], w["n"]), i


def test_ranged_frame_single_materialization_contract(spark):
    """Round-8 sf10 finding: repartitionByRange SAMPLES its boundaries
    per execution (RDD-id-seeded), and column pruning gives the totals
    pass and the emit pass each their OWN physical range exchange — two
    executions can disagree on boundaries, after which the emit join
    reads offsets from a foreign __pid space (observed: thousands of
    wrong, even negative, q184 group ranks at sf10; invisible at gate
    SFs where AQE coalesces to one partition). The fix pins ONE lazy
    localCheckpoint materialization both passes read. Structural pin:
    the executed plan must contain ZERO RangePartitioning exchanges
    (the ranged frame hides behind one pre-materialized ExistingRDD
    leaf, so the plan CANNOT resample), and it must scan that leaf for
    both passes."""
    from big_data_project_datapipeline_spark.operators.prefix import (
        grouped_prefix,
        partitioned_prefix,
    )

    rows = [(i, i % 7, (i * 37) % 1000) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, g long, v long")

    out_g = grouped_prefix(
        df, ["v", "id"], "g", rank_col="r", group_rank_col="gr",
        group_count_col="gn", sum_cols=["v"],
    )
    out_g.count()
    plan = out_g._jdf.queryExecution().executedPlan().toString()
    assert "RangePartitioning" not in plan, plan
    assert plan.count("Scan ExistingRDD") >= 2, plan

    out_p = partitioned_prefix(df, ["v", "id"], rank_col="r", sum_cols=["v"])
    out_p.count()
    plan = out_p._jdf.queryExecution().executedPlan().toString()
    assert "RangePartitioning" not in plan, plan

    # rank invariants survive repeated executions (each action re-reads
    # the SAME checkpointed blocks — never a fresh boundary sample)
    import pyspark.sql.functions as SF

    for _ in range(3):
        agg = out_g.agg(
            SF.min("r").alias("lo"), SF.max("r").alias("hi"),
            SF.countDistinct("r").alias("nd"), SF.count(SF.lit(1)).alias("n"),
            SF.min("gr").alias("glo"),
        ).first()
        assert (agg["lo"], agg["hi"]) == (1, 5000)
        assert agg["nd"] == agg["n"] == 5000
        assert agg["glo"] == 1


def test_partitioned_prefix_strict_min_across_forced_partitions(spark):
    """Strict-predecessor running min must hold across range-partition
    boundaries (3 forced partitions over 9 rows): the first row in the
    total order is NULL, every other row sees min over everything
    strictly before it — including a partition whose local minimum
    arrives mid-partition."""
    from big_data_project_datapipeline_spark.operators.prefix import (
        partitioned_prefix_strict_min,
    )

    vals = [(1, 5.0), (2, 3.0), (3, 7.0), (4, 2.0), (5, 9.0),
            (6, 1.0), (7, 8.0), (8, 0.5), (9, 4.0)]
    df = spark.createDataFrame(vals, ["k", "v"])
    out = {
        r["k"]: r["__pmin"]
        for r in partitioned_prefix_strict_min(
            df, ["k"], "v", num_partitions=3
        ).collect()
    }
    run = None
    for k, v in vals:
        assert out[k] == run, (k, out[k], run)
        run = v if run is None else min(run, v)


def test_partitioned_prefix_strict_min_single_row_is_null(spark):
    from big_data_project_datapipeline_spark.operators.prefix import (
        partitioned_prefix_strict_min,
    )

    df = spark.createDataFrame([(1, 9.0)], ["k", "v"])
    assert (
        partitioned_prefix_strict_min(df, ["k"], "v").first()["__pmin"]
        is None
    )
