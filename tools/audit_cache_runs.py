"""Cross-run cache-accumulation audit for the heavy graph family
(VERDICT r11 item 4): run each heavy query N times back-to-back in ONE
session — the bench.py in-session mode — and record the persisted-RDD
storage profile after every run (post-GC), flagging any query whose
storage does not return to its pre-run baseline.

The round-11 finding this audits: the second in-session sf30 PageRank
run OOMed at 8 GB heap (SCALING.md r11) — attach_cache_release frees
the persisted edge/node handles on result GC, but (a) the unpersist
was NON-blocking (async block removal races the next run's allocation)
and (b) per-sweep localCheckpoint snapshots are not handles at all and
drain only via ContextCleaner GC.

Usage: python tools/audit_cache_runs.py [sf_dir] [n_runs] [query ...]
       (defaults: .scale_smoke/sf1, 3 runs, the heavy graph family)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = [
    "q87_pagerank",
    "q175_hits",
    "q187_connected_components",
    "q226_lpa_modularity",
    "q214_harmonic_centrality",
]


def storage(spark) -> tuple[int, int, int]:
    """(n_persisted_rdds, mem_bytes, disk_bytes) from the JVM block
    manager — counts BOTH Dataset-cache entries and localCheckpoint
    RDD blocks (catalog.clearCache reaches only the former)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    n = len(infos)
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return n, mem, disk


def drain(spark, budget_s: float = 5.0) -> None:
    """Settle the post-run state the way bench.py's steady state does:
    drop Python refs, one GC cycle each side, then a SHORT bounded
    wait for async removals. Deliberately small — a leak that needs a
    long drain is exactly what this audit exists to flag."""
    deadline = time.monotonic() + budget_s
    prev = None
    while time.monotonic() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        cur = storage(spark)
        if cur == prev:
            return
        prev = cur
        time.sleep(0.25)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args else os.path.join(REPO, ".scale_smoke", "sf1")
    n_runs = int(args[1]) if len(args) > 1 else 3
    names = args[2:] or HEAVY

    import __spark_entry__ as entrymod
    from big_data_project_datapipeline_spark.session import get_spark
    from big_data_project_datapipeline_spark.tables import (
        TABLE_NAMES,
        load_table,
    )

    spark = get_spark(app_name="audit_cache_runs")
    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass  # derived decades carry only the heavy-family tables
    queries = entrymod.queries()
    report: dict[str, list[dict]] = {}
    flagged: list[str] = []
    for name in names:
        fn = queries[name]
        drain(spark)
        base = storage(spark)
        rows = []
        for run in range(1, n_runs + 1):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = round(time.perf_counter() - t0, 2)
            drain(spark)
            n, mem, disk = storage(spark)
            rows.append(
                {
                    "run": run,
                    "wall_s": wall,
                    "rdds": n - base[0],
                    "mem_mb": round((mem - base[1]) / 2**20, 1),
                    "disk_mb": round((disk - base[2]) / 2**20, 1),
                }
            )
            print(f"{name} run {run}: {rows[-1]}", flush=True)
        report[name] = rows
        if rows[-1]["rdds"] > 0 or rows[-1]["mem_mb"] > 1.0:
            flagged.append(name)
    print(json.dumps({"sf_dir": sf_dir, "flagged": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
