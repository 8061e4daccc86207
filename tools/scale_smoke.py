"""Heavy-operator scale smoke (VERDICT r3 item #7): run the expensive
dedup/ANN/graph queries at sf0.1 and at the derived 10x sf1
(.scale_smoke/sf1, built by tools/make_scale_smoke.py) and report
wall-time + shuffle-write bytes per query, so SCALING.md's claims about
shuffle growth one decade up are measured, not asserted.

Usage: python tools/scale_smoke.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

import __spark_entry__ as E
from big_data_project_datapipeline_spark.session import get_spark

QUERIES = ["q99_substring_dedup", "q115_simhash_neardup",
           "q117_ann_ivfpq", "q121_triangle_count",
           # drift/window family (SCALING.md second decade table;
           # needs the 10x jittered events from make_scale_smoke.py)
           "q141_psi_drift", "q144_ks_drift", "q147_mean_shift",
           "q154_acf", "q142_ngram_novelty", "q150_robust_means",
           # stats/eval family (SCALING.md third decade table)
           "q152_auc", "q158_bootstrap_ci", "q159_log_odds",
           "q160_km_conversion",
           # round-5 heavy additions (VERDICT r4 item #6)
           "q133_collapse_neardup", "q138_containment_dedup",
           # round-5 distributed-prefix rewrites + binned KS
           "q128_rfm_segments", "q135_heaps_law",
           "q166_quantile_normalize", "q171_ks_drift_binned",
           # round-5 additions: drift/similarity/graph/sketch families
           "q172_jsd_drift", "q173_allpairs_jaccard", "q175_hits",
           "q176_hll_distinct", "q177_countmin",
           "q178_kmv_overlap", "q179_bloom_membership",
           "q180_markov_attribution", "q181_rolling_hll"]
SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", ".scale_smoke/sf1")]


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def shuffle_totals() -> tuple[int, int]:
    """Cumulative (shuffle_write_bytes, spill_bytes) across all stages."""
    app = rest("applications")[0]["id"]
    w = s = 0
    for st in rest(f"applications/{app}/stages?status=complete"):
        w += st.get("shuffleWriteBytes", 0)
        s += st.get("memoryBytesSpilled", 0) + st.get("diskBytesSpilled", 0)
    return w, s


def main() -> None:
    # optional argv filter: run only the named queries (fresh rows for
    # an existing SCALING.md table without re-measuring the rest)
    only = set(sys.argv[1:])
    queries = [q for q in QUERIES if not only or q in only]
    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    qs = E.queries()
    rows = []
    for sf_name, sf_dir in SFS:
        # warm the session per SF so JVM/codegen cold-start isn't charged
        qs["q20_exact_dedup"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        for name in queries:
            w0, s0 = shuffle_totals()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            w1, s1 = shuffle_totals()
            rows.append(
                {
                    "query": name,
                    "sf": sf_name,
                    "sec": round(el, 2),
                    "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                    "spill_mb": round((s1 - s0) / 1e6, 1),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    print("\n| query | sf0.1 s | sf1 s | x | sf0.1 shufMB | sf1 shufMB | x | spill sf1 MB |")
    print("|---|---|---|---|---|---|---|---|")
    by = {(r["query"], r["sf"]): r for r in rows}
    for q in queries:
        a, b = by[(q, "sf0.1")], by[(q, "sf1")]
        tx = round(b["sec"] / a["sec"], 1) if a["sec"] else float("nan")
        sx = round(b["shuffle_write_mb"] / a["shuffle_write_mb"], 1) if a["shuffle_write_mb"] else float("nan")
        print(f"| {q} | {a['sec']} | {b['sec']} | {tx} | "
              f"{a['shuffle_write_mb']} | {b['shuffle_write_mb']} | {sx} | {b['spill_mb']} |")


if __name__ == "__main__":
    main()
