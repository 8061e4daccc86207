"""A/B: pre-landed bucketed edge tables vs in-session persist for the
iterative graph ops at sf10 (VERDICT r8 item 5).

The round-8 sf10 attribution showed the one-time edge prep
(distinct + degree join + repartition + sort + cache fill under the
shared 8 GB heap) owns roughly half the PageRank/HITS spill. This
measures the alternative: land the symmetrized, degree-annotated edge
table ONCE as a bucketed+sorted managed table (`sinks.write_bucketed`
with the round-9 partition-aligned write — one file per bucket), then
run the sweeps with ``pagerank(prepared=True)`` / ``hits(prepared_dst=)``
so every iteration starts from a bucket-local parquet scan instead of
the in-memory cache.

Method (the round-8 q119/q175 protocol, hardened): each variant runs
in its OWN subprocess session — a first single-session attempt OOMed
the shared 8 GB heap on the 4th consecutive sf10 graph run (heap
accumulation across runs, not a per-run cost) — with 2 timed runs per
session, `clearCache()` + JVM GC drain between, interleaved
A/B/A/B by the orchestrator. The one-time landing is timed separately
(it amortizes across sessions/jobs). Spill/shuffle via the UI REST
totals, windowed per run.

Usage:
  python tools/ab_prepared_edges.py orchestrate [sf_dir]   # everything
  python tools/ab_prepared_edges.py prep [sf_dir]          # land tables
  python tools/ab_prepared_edges.py <variant> [sf_dir]     # one session
  variants: pagerank_default pagerank_prepared hits_default hits_prepared
"""

from __future__ import annotations

import gc
import json
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


def sym_edges(spark, sf_dir):
    """q87's symmetrized customer-part co-purchase edge list."""
    from big_data_project_datapipeline_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ed = (
        o.select("o_orderkey", "o_custkey")
        .join(
            li.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
    )
    return ed.union(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def drain(spark):
    spark.catalog.clearCache()
    for _ in range(3):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)


def do_prep(spark, sf_dir) -> None:
    from big_data_project_datapipeline_spark import sinks

    edges = sym_edges(spark, sf_dir)
    t0 = time.perf_counter()
    e0 = edges.select("src", "dst").distinct()
    deg = e0.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    sinks.write_bucketed(
        e0.join(deg, "src").select("src", "dst", "deg"),
        "ab_pr_edges",
        "src",
        num_buckets=32,
        sort_col="src",
    )
    prep_pr = time.perf_counter() - t0
    t0 = time.perf_counter()
    sinks.write_bucketed(e0, "ab_hits_src", "src", num_buckets=32, sort_col="src")
    sinks.write_bucketed(e0, "ab_hits_dst", "dst", num_buckets=32, sort_col="dst")
    prep_hits = time.perf_counter() - t0
    print(
        json.dumps(
            {"prep_pr_sec": round(prep_pr, 2), "prep_hits_sec": round(prep_hits, 2)}
        ),
        flush=True,
    )


def run_variant(spark, variant: str, sf_dir: str) -> None:
    import os

    from big_data_project_datapipeline_spark import sinks
    from big_data_project_datapipeline_spark.operators.graph import hits, pagerank

    # the prep subprocess's managed-table registrations die with its
    # in-memory catalog; re-register the directories as EXTERNAL
    # bucketed tables (the persistent-metastore role, locally)
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    if variant == "pagerank_prepared":
        sinks.register_bucketed_table(
            spark, "ab_pr_edges", os.path.join(wh, "ab_pr_edges"),
            "src BIGINT, dst BIGINT, deg BIGINT", "src", 32, "src",
        )
    if variant == "hits_prepared":
        sinks.register_bucketed_table(
            spark, "ab_hits_src", os.path.join(wh, "ab_hits_src"),
            "src BIGINT, dst BIGINT", "src", 32, "src",
        )
        sinks.register_bucketed_table(
            spark, "ab_hits_dst", os.path.join(wh, "ab_hits_dst"),
            "src BIGINT, dst BIGINT", "dst", 32, "dst",
        )

    def build():
        if variant == "pagerank_default":
            return pagerank(sym_edges(spark, sf_dir), n_iter=3)
        if variant == "pagerank_prepared":
            return pagerank(spark.table("ab_pr_edges"), n_iter=3, prepared=True)
        if variant == "hits_default":
            return hits(sym_edges(spark, sf_dir), n_iter=3)
        if variant == "hits_prepared":
            return hits(
                spark.table("ab_hits_src"),
                n_iter=3,
                prepared_dst=spark.table("ab_hits_dst"),
            )
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
    if mode == "orchestrate":
        variants = [
            "pagerank_default",
            "pagerank_prepared",
            "hits_default",
            "hits_prepared",
        ]
        subprocess.run(
            [sys.executable, __file__, "prep", sf_dir], check=True
        )
        for v in variants:
            subprocess.run(
                [sys.executable, __file__, v, sf_dir], check=True
            )
        return
    from big_data_project_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"ab-{mode}", extra_conf={"spark.ui.enabled": "true"}
    )
    if mode == "prep":
        do_prep(spark, sf_dir)
    else:
        run_variant(spark, mode, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
