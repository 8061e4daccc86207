"""Fourth-decade value invariants over the PREPARED graph path
(VERDICT r10 item 4). The sf30 smoke cannot run the in-session
support-edge build (its measured sf10 spill is ~46-59 GB and grows
~linearly — the projected ~140-180 GB exceeds this host's disk, the
ceiling make_scale_smoke300.py documents), so the fourth-decade graph
rows are collected on the prepared path — and THESE checks prove the
prepared outputs are right, from scratch, at that scale:

1. pagerank (q87 graph, prepared=True over the landed ab_pr_edges
   table): node uniqueness, rank range, and total mass == 1 within
   the rounding bound — rank conservation.
2. connected components over the prepared support edges: every edge
   endpoint labeled exactly once, and NO edge crosses two components
   (the CC definition checked from scratch) — plus idempotence: one
   more min-label propagation round changes nothing.
3. LPA coverage over prepared edges: node universe exactly once,
   every label is a node id.
4. modularity refold over prepared edges + LPA labels: sum(degree)
   == 2m with m recounted INDEPENDENTLY from the landed pair-stats
   table, inner_edges <= m, contributions refold to Q, Q in range.
5. (round 12) local_clustering + degree_assortativity over prepared
   edges: per-node coverage, coefficient in [0,1], triangle counts
   within the degree bound; assortativity's n_edges == 2m against the
   independent recount and r in [-1, 1].

Assumes `ab_pair_stats` (tools/ab_prepared_pairs.py prep) and
`ab_pr_edges` (tools/ab_prepared_edges.py prep) are landed for the
target sf_dir.

Usage: python tools/scale_validate_prepared.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.session import get_spark


def _register(spark) -> None:
    from big_data_project_datapipeline_spark import sinks

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    sinks.register_bucketed_table(
        spark, "ab_pair_stats", os.path.join(wh, "ab_pair_stats"),
        "item_a BIGINT, item_b BIGINT, pair_n BIGINT, n_a BIGINT, "
        "n_b BIGINT, n_baskets BIGINT", "item_a", 32, "item_a",
    )
    sinks.register_bucketed_table(
        spark, "ab_pr_edges", os.path.join(wh, "ab_pr_edges"),
        "src BIGINT, dst BIGINT, deg BIGINT", "src", 32, "src",
    )


def check_pagerank_prepared(spark) -> list[str]:
    from big_data_project_datapipeline_spark.operators.graph import pagerank

    out = pagerank(spark.table("ab_pr_edges"), n_iter=3, prepared=True)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("node").alias("nd"),
        F.min("pr").alias("lo"),
        F.max("pr").alias("hi"),
        F.sum("pr").alias("mass"),
    ).first()
    problems = []
    if agg["n"] == 0 or agg["nd"] != agg["n"]:
        problems.append(
            f"pagerank: node multiplicity ({agg['nd']} vs {agg['n']})"
        )
        return problems
    lo = -1.0 if agg["lo"] is None else agg["lo"]
    hi = 9.0 if agg["hi"] is None else agg["hi"]
    if lo < 0 or hi > 1.0:
        problems.append(f"pagerank: rank out of range ({lo}, {hi})")
    # mass == 1 up to the round(6) output quantization (n * 5e-7 —
    # at sf30's ~10.5M nodes uniform ranks legitimately floor to
    # 0.000000, the same documented behavior as check_pagerank_family
    # at sf10, so this bound is what conservation MEANS post-rounding)
    if abs((agg["mass"] or 0.0) - 1.0) > max(0.01, agg["n"] * 5.1e-7):
        problems.append(f"pagerank: total mass {agg['mass']} != 1")
    return problems


def _prepared_edges(spark):
    from big_data_project_datapipeline_spark.operators.market import (
        support_graph_edges,
    )

    return support_graph_edges(
        prepared_stats=spark.table("ab_pair_stats")
    ).select("src", "dst").localCheckpoint(eager=False)


def check_cc_prepared(spark, ed) -> list[str]:
    from big_data_project_datapipeline_spark.operators.graph import (
        connected_components,
    )

    # bind the CC result for the check's lifetime (round-12 caching
    # contract: a chained temporary would release the materialized
    # final-round snapshot before the derived lazy checkpoint below
    # ever computes from it)
    cc = connected_components(ed)
    labels = cc.localCheckpoint(eager=False)
    problems = []
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
    )
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("node").alias("nd")
    ).first()
    n_nodes = nodes.count()
    if agg["n"] != n_nodes or agg["nd"] != agg["n"]:
        problems.append(
            f"cc: coverage broken ({agg['n']} rows, {agg['nd']} distinct, "
            f"{n_nodes} nodes)"
        )
    lab = labels.select("node", F.col("component").alias("c"))
    crossing = (
        ed.join(lab.withColumnRenamed("node", "src")
                   .withColumnRenamed("c", "cs"), "src")
        .join(lab.withColumnRenamed("node", "dst")
                 .withColumnRenamed("c", "cd"), "dst")
        .filter(F.col("cs") != F.col("cd"))
        .count()
    )
    if crossing:
        problems.append(f"cc: {crossing} edges cross components")
    # idempotence: one more min-label propagation round is a no-op
    sym = ed.union(ed.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    prop = (
        sym.join(lab.withColumnRenamed("node", "src")
                    .withColumnRenamed("c", "cs"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min("cs").alias("c_min"))
    )
    moved = (
        lab.join(prop, "node")
        .filter(F.col("c_min") < F.col("c"))
        .count()
    )
    if moved:
        problems.append(f"cc: not a fixpoint ({moved} nodes would move)")
    return problems


def check_lpa_modularity_prepared(spark, ed) -> list[str]:
    from big_data_project_datapipeline_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    labels = label_propagation(ed, n_rounds=3).localCheckpoint(eager=False)
    problems = []
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
    )
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("node").alias("nd")
    ).first()
    n_nodes = nodes.count()
    if agg["n"] != n_nodes or agg["nd"] != agg["n"]:
        problems.append(
            f"lpa: coverage broken ({agg['n']} rows, {agg['nd']} distinct, "
            f"{n_nodes} nodes)"
        )
    alien = labels.join(
        nodes.withColumnRenamed("node", "label"), "label", "left_anti"
    ).count()
    if alien:
        problems.append(f"lpa: {alien} labels are not node ids")
    out = modularity(ed, labels).collect()
    # m recounted INDEPENDENTLY from the landed stats table (pair rows
    # with pair_n >= 2 ARE the canonical edges)
    m = spark.table("ab_pair_stats").filter(F.col("pair_n") >= 2).count()
    if sum(r["degree_sum"] for r in out) != 2 * m:
        problems.append("modularity: sum(degree) != 2m (independent m)")
    if sum(r["inner_edges"] for r in out) > m:
        problems.append("modularity: inner edges exceed m")
    q = out[0]["modularity"]
    if abs(sum(r["contribution"] for r in out) - q) > len(out) * 1e-9 + 1e-6:
        problems.append("modularity: contributions do not refold to Q")
    if not (-0.5 <= q <= 1.0):
        problems.append(f"modularity: Q {q} out of range")
    return problems


def check_clustering_assortativity_prepared(spark, ed) -> list[str]:
    """Round-12 (VERDICT r11 item 5): the q198/q199 consumers over the
    prepared support edges — from-scratch value invariants at the
    fourth decade."""
    from big_data_project_datapipeline_spark.operators.graph import (
        degree_assortativity,
        local_clustering,
    )

    problems = []
    lc = local_clustering(ed)
    agg = lc.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("node").alias("nd"),
        F.min("clustering").alias("lo"),
        F.max("clustering").alias("hi"),
        F.sum(
            (
                F.lit(2) * F.col("triangles")
                > F.col("degree") * (F.col("degree") - 1)
            ).cast("int")
        ).alias("overfull"),
    ).first()
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
        .count()
    )
    if agg["n"] != nodes or agg["nd"] != agg["n"]:
        problems.append(
            f"clustering: coverage broken ({agg['n']} rows, "
            f"{agg['nd']} distinct, {nodes} nodes)"
        )
    if (agg["lo"] or 0.0) < 0.0 or (agg["hi"] or 0.0) > 1.0:
        problems.append(
            f"clustering: coefficient out of [0,1] ({agg['lo']}, "
            f"{agg['hi']})"
        )
    if agg["overfull"]:
        problems.append(
            f"clustering: {agg['overfull']} nodes count more triangles "
            "than their degree admits"
        )
    # assortativity: n_edges over the symmetrized list must equal 2m
    # with m recounted INDEPENDENTLY from the landed stats table, and
    # a Pearson correlation lives in [-1, 1]
    r = degree_assortativity(ed).first()
    m = spark.table("ab_pair_stats").filter(F.col("pair_n") >= 2).count()
    if r["n_edges"] != 2 * m:
        problems.append(
            f"assortativity: n_edges {r['n_edges']} != 2m (m={m} "
            "recounted from the landed table)"
        )
    if r["assortativity"] is not None and not (
        -1.0 <= r["assortativity"] <= 1.0
    ):
        problems.append(
            f"assortativity: r {r['assortativity']} out of [-1, 1]"
        )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale_smoke/sf30"
    spark = get_spark(app_name="scale-validate-prepared")
    spark.sparkContext.setLogLevel("ERROR")
    _register(spark)
    ed = _prepared_edges(spark)
    failures = 0
    for name, problems in (
        ("pagerank_prepared", check_pagerank_prepared(spark)),
        ("cc_prepared", check_cc_prepared(spark, ed)),
        ("lpa_modularity_prepared", check_lpa_modularity_prepared(spark, ed)),
        (
            "clustering_assortativity_prepared",
            check_clustering_assortativity_prepared(spark, ed),
        ),
    ):
        if problems:
            failures += 1
            print(f"FAIL {name} @ {sf_dir}: " + "; ".join(problems))
        else:
            print(f"PASS {name} @ {sf_dir}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
