"""Second-decade scale smoke (VERDICT r5 item #5): run the flagship
devices at the derived sf1 (10x) AND sf10 (100x, built by
tools/make_scale_smoke100.py) and report wall + shuffle-write bytes,
so SCALING.md's linear-shuffle claims are measured over TWO decades.

Queries: the three devices carrying the most weight — q166 quantile
normalize (partitioned_prefix pooled rank), q173 AllPairs Jaccard
(Bayardo prefix filter), q176 explicit-register HLL — plus the other
two partitioned_prefix carriers q128 (RFM ntile) and q135 (Heaps
cumsum).

Usage: python tools/scale_smoke2.py [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

import __spark_entry__ as E
from big_data_project_datapipeline_spark.session import get_spark

QUERIES = [
    "q166_quantile_normalize",
    "q173_allpairs_jaccard",
    "q176_hll_distinct",
    "q128_rfm_segments",
    "q135_heaps_law",
    # round-6 funnel-sweep conversions (events-table carriers; q152
    # AUC shares the device but reads lineitem, which the sf10
    # dataset does not replicate)
    "q124_gini_dispersion",
    "q127_inter_event_stats",
    "q154_acf",
    "q147_mean_shift",
    "q84_equal_freq_bins",
    # round-7 additions (VERDICT r6 item #5): the remaining heavy
    # families not yet measured at the third decade
    "q117_ann_ivfpq",
    "q99_substring_dedup",
    "q138_containment_dedup",
    "q61_chunk_dedup",
    # round-7 new queries
    "q186_dedup_yield_curve",
    "q187_connected_components",
    # round-8 (VERDICT r7 item #5): q188 composes the two heaviest
    # checkpoint loops (dedup decision + resolve) — confirm the
    # composition stays zero-spill/linear like its parts; q184 re-row
    # at the post-persist plan; q175/q87 decade rows at the new
    # per-sweep-localCheckpoint default
    "q188_cluster_aware_split",
    "q184_rrf_fusion",
    "q175_hits",
    "q87_pagerank",
    "q190_weighted_pagerank",
    "q191_quality_yield_curve",
    "q192_kcore",
    # round-9 (VERDICT r8 item 3): the sf10 dir now symlinks the
    # unreplicated dimension tables (make_scale_smoke100.py), so the
    # two dim-reading graph queries run at both decades — q189's part
    # universe and q193's customer seed cohort stay the fixed copy-0
    # sets while the fact-side graph grows (the realistic decade
    # shape; PPR's message-pass cost is rank-value-independent, so a
    # fixed seed cohort measures the same per-sweep joins).
    "q189_cc_isolates",
    "q193_personalized_pagerank",
    # round-9 second wave: wedge-enumeration link prediction (the
    # O(sum d^2) pivot cost under disjoint-copy growth), frontier BFS
    # (fixed copy-0 seed cohort while the fact graph grows), LPA
    # (per-round join + window), and the sweep-line step fold
    "q201_link_prediction",
    "q202_seed_bfs_distance",
    "q203_label_propagation",
    "q205_open_order_peaks",
    # k-truss: per-round wedge enumeration over disjoint-copy growth
    # (fixpoint stays 1 round — copies are isomorphic to sf0.1)
    "q207_ktruss",
    # round-9 third wave: the doubled-mid-rank device (two collapses +
    # two join-backs) over 10x/100x lineitem (q208) and the pooled
    # variant over events (q209); the calendar-bounded day-pair family
    # (q210/q212 — expected FLAT like q205: pair cost fixed by span);
    # the level-bounded contingency stack (q211); the within-basket
    # pair device at growing basket density (q213); landmark BFS with
    # the fixed copy-0 Brand#13 cohort over the grown graph (q214)
    "q208_spearman_corr",
    "q209_kruskal_wallis",
    "q210_theil_sen",
    "q212_mann_kendall",
    "q211_cramers_v",
    "q213_item_item_cosine",
    "q214_harmonic_centrality",
    # relational Newton: 4 pruned scans + O(groups) broadcast state —
    # expected near-linear in rows with zero extra shuffle growth
    "q215_logistic_irls",
    # NB decode: token stream × |classes| through a constant-key
    # broadcast join; model joins on the token key
    "q216_naive_bayes",
    # AR(2): calendar-bounded daily collapse (the q210/q212 flat class);
    # PMI: arrays_zip pair build + vocab-keyed joins
    "q217_ar2_daily",
    "q218_pmi_collocations",
    # Huber IRLS: 5 pruned scans + two percentile aggs, O(groups) state
    "q219_huber_regression",
    # session-path fold: two user-partitioned windows + string agg
    "q220_top_session_paths",
    # skyline sweep: per-x collapse + one strict-prefix-min exchange
    "q221_supplier_skyline",
    # round-10 additions: map-only line cascade (expected ~linear in
    # docs); calendar-bounded day-pair tau (the q210/q212 flat class);
    # the 120-hypothesis ECDF battery (collapsed per-(hyp,value)
    # frame); k-means + rank threshold; LPA + modularity closing
    # aggregates; vocab-bounded sampling table and BPE rounds
    "q222_c4_line_filter",
    "q223_kendall_tau",
    "q224_fdr_bh",
    "q225_embedding_outliers",
    "q226_lpa_modularity",
    "q227_negative_sampling",
    "q228_bpe_train",
    # shared band index, train-vs-eval bucket join, bounded verify
    "q229_neardup_decontaminate",
    "q230_bpe_compression",
    "q231_good_turing",
    # round-11: the post-fix q226 (single-build localCheckpoint), the
    # per-source Gini rank device (group_rank_frame range exchange over
    # the O(vocab) type frame), and the batched BPE trainer
    # (vocab-bounded rounds like q228)
    "q232_token_gini",
    "q233_bpe_train_batched",
]
SFS = [("sf1", ".scale_smoke/sf1"), ("sf10", ".scale_smoke/sf10")]
# sf1 lacks a replicated documents/orders variant with the sf10
# scheme? No: make_scale_smoke.py's sf1 has documents (10 verbatim
# copies), orders and events — all five queries run there. The
# documents construction differs between decades (verbatim clones at
# sf1, isomorphic token-renamed copies at sf10), so q173/q135 sf1->
# sf10 rows are read against that difference (see SCALING.md).


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


def main() -> None:
    only = set(sys.argv[1:])
    queries = [q for q in QUERIES if not only or q in only]
    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    qs = E.queries()
    rows = []
    for sf_name, sf_dir in SFS:
        # warm the JVM/codegen per SF so cold-start isn't charged
        qs["q20_exact_dedup"](spark, "/root/testdata/sf0.1").write.mode(
            "overwrite"
        ).format("noop").save()
        for name in queries:
            w0, s0 = shuffle_totals()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
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
    print()
    print("| query | sf1 s | sf10 s | x | sf1 shufMB | sf10 shufMB | x | spill sf10 MB |")
    print("|---|---|---|---|---|---|---|---|")
    for name in queries:
        a = next(r for r in rows if r["query"] == name and r["sf"] == "sf1")
        b = next(r for r in rows if r["query"] == name and r["sf"] == "sf10")
        tx = round(b["sec"] / a["sec"], 1) if a["sec"] else float("nan")
        sx = (
            round(b["shuffle_write_mb"] / a["shuffle_write_mb"], 1)
            if a["shuffle_write_mb"]
            else float("nan")
        )
        print(
            f"| {name} | {a['sec']} | {b['sec']} | {tx} | "
            f"{a['shuffle_write_mb']} | {b['shuffle_write_mb']} | {sx} | "
            f"{b['spill_mb']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
