"""A/B: pre-landed bucketed pair-stats table vs in-session build for
the wedge/pair family at sf10 (VERDICT r9 item 4).

The round-9 sf10 attribution put the family's two largest spills on
the shared within-basket pair / support-edge build (q213 37.7 GB,
q214 59.2 GB — the landmark BFS itself adds sub-GB). This measures the
alternative: land ``market.basket_pair_stats`` ONCE as a bucketed+
sorted table (`sinks.write_bucketed`), then run
``item_item_cosine(prepared_stats=)`` and
``harmonic_centrality(edges=<landed table>)`` so the pair explosion
never happens in-session — the pagerank ``prepared=True`` story for
this family.

Method (the r9 ab_prepared_edges protocol): each variant runs in its
OWN subprocess session (heap accumulation across consecutive sf10
graph runs OOMs a shared session) with 2 timed runs, clearCache + JVM
GC drain between; the one-time landing is timed separately (it
amortizes across the deployment window). Shuffle/spill via UI REST,
windowed per run.

Round 11 (VERDICT r10 item 3) extends the A/B to the graph-family
consumers of the SAME landed table via market.support_graph_edges:
LPA (q203), LPA+modularity (q226, at its post-fix single-build
default), and k-truss (q207) — prepared edges are a bucket-local scan
per consumer instead of the in-session pair explosion.

Usage:
  python tools/ab_prepared_pairs.py orchestrate [sf_dir]
  python tools/ab_prepared_pairs.py orchestrate_graph [sf_dir]
  python tools/ab_prepared_pairs.py prep [sf_dir]
  python tools/ab_prepared_pairs.py <variant> [sf_dir]
  variants: q213_default q213_prepared q214_default q214_prepared
            q203_default q203_prepared q226_default q226_prepared
            q207_default q207_prepared q198_default q198_prepared
            q199_default q199_prepared

Round 12 (VERDICT r11 item 5) extends orchestrate_graph with the last
two support-graph consumers: local_clustering (q198) and
degree_assortativity (q199, factored into operators/graph this round).
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def shuffle_totals() -> tuple[int, int]:
    app = rest("applications")[0]["id"]
    w = s = 0
    for st in rest(f"applications/{app}/stages?status=complete"):
        w += st.get("shuffleWriteBytes", 0)
        s += st.get("memoryBytesSpilled", 0) + st.get("diskBytesSpilled", 0)
    return w, s


def drain(spark):
    spark.catalog.clearCache()
    for _ in range(3):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)


def seeds_frame(spark, sf_dir):
    from big_data_project_datapipeline_spark.tables import load_table

    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select(F.col("p_partkey").alias("node"))
        .orderBy("node")
        .limit(8)
    )


def do_prep(spark, sf_dir) -> None:
    from big_data_project_datapipeline_spark import sinks
    from big_data_project_datapipeline_spark.operators.market import (
        basket_pair_stats,
    )
    from big_data_project_datapipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    t0 = time.perf_counter()
    sinks.write_bucketed(
        basket_pair_stats(li, "l_orderkey", "l_partkey", min_pair_count=2),
        "ab_pair_stats",
        "item_a",
        num_buckets=32,
        sort_col="item_a",
    )
    print(
        json.dumps({"prep_sec": round(time.perf_counter() - t0, 2)}),
        flush=True,
    )


def run_variant(spark, variant: str, sf_dir: str) -> None:
    import __spark_entry__ as em
    from big_data_project_datapipeline_spark import sinks
    from big_data_project_datapipeline_spark.operators.graph import (
        harmonic_centrality,
    )
    from big_data_project_datapipeline_spark.operators.market import (
        item_item_cosine,
    )
    from big_data_project_datapipeline_spark.tables import load_table

    if variant.endswith("_prepared"):
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        sinks.register_bucketed_table(
            spark,
            "ab_pair_stats",
            os.path.join(wh, "ab_pair_stats"),
            "item_a BIGINT, item_b BIGINT, pair_n BIGINT, n_a BIGINT, "
            "n_b BIGINT, n_baskets BIGINT",
            "item_a",
            32,
            "item_a",
        )

    def build():
        if variant == "q213_default":
            return item_item_cosine(
                load_table(spark, sf_dir, "lineitem"),
                "l_orderkey",
                "l_partkey",
                min_pair_count=2,
                top_k=100,
            )
        if variant == "q213_prepared":
            # the landed table's threshold governs (round-12 guard:
            # an explicit min_pair_count here would raise)
            return item_item_cosine(
                None,
                top_k=100,
                prepared_stats=spark.table("ab_pair_stats"),
            )
        if variant == "q214_default":
            ed = em._copurchase_support_edges(spark, sf_dir).select(
                "src", "dst"
            )
            return harmonic_centrality(
                ed, seeds_frame(spark, sf_dir), n_rounds=3
            )
        if variant == "q214_prepared":
            ed = spark.table("ab_pair_stats").select(
                F.col("item_a").alias("src"), F.col("item_b").alias("dst")
            )
            return harmonic_centrality(
                ed, seeds_frame(spark, sf_dir), n_rounds=3
            )
        from big_data_project_datapipeline_spark.operators.graph import (
            degree_assortativity,
            ktruss_peel,
            label_propagation,
            local_clustering,
            modularity,
        )
        from big_data_project_datapipeline_spark.operators.market import (
            support_graph_edges,
        )

        if variant.startswith(("q203", "q226", "q207", "q198", "q199")):
            if variant.endswith("_prepared"):
                ed = support_graph_edges(
                    prepared_stats=spark.table("ab_pair_stats")
                ).select("src", "dst")
            else:
                ed = em._copurchase_support_edges(spark, sf_dir).select(
                    "src", "dst"
                )
                if variant == "q226_default":
                    # the post-fix gate default: ONE localCheckpoint
                    # before the two consumers
                    ed = ed.localCheckpoint(eager=False)
            if variant.startswith("q203"):
                return label_propagation(ed, n_rounds=3)
            if variant.startswith("q226"):
                return modularity(ed, label_propagation(ed, n_rounds=3))
            if variant.startswith("q198"):
                return local_clustering(ed)
            if variant.startswith("q199"):
                return degree_assortativity(ed)
            return ktruss_peel(ed, k=3, n_rounds=1)
        raise SystemExit(f"unknown variant {variant}")

    for i in range(2):
        drain(spark)
        w0, s0 = shuffle_totals()
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        w1, s1 = shuffle_totals()
        print(
            json.dumps(
                {
                    "run": f"{variant}_{i}",
                    "sec": round(el, 2),
                    "shuffle_mb": round((w1 - w0) / 1e6, 1),
                    "spill_mb": round((s1 - s0) / 1e6, 1),
                }
            ),
            flush=True,
        )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "orchestrate"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else ".scale_smoke/sf10"
    if mode in ("orchestrate", "orchestrate_graph"):
        subprocess.run([sys.executable, __file__, "prep", sf_dir], check=True)
        variants = (
            ["q213_default", "q213_prepared", "q214_default",
             "q214_prepared"]
            if mode == "orchestrate"
            else ["q203_default", "q203_prepared", "q226_default",
                  "q226_prepared", "q207_default", "q207_prepared",
                  "q198_default", "q198_prepared", "q199_default",
                  "q199_prepared"]
        )
        for v in variants:
            subprocess.run([sys.executable, __file__, v, sf_dir], check=True)
        return
    from big_data_project_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"ab-pairs-{mode}", extra_conf={"spark.ui.enabled": "true"}
    )
    if mode == "prep":
        do_prep(spark, sf_dir)
    else:
        run_variant(spark, mode, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
