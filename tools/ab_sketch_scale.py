"""Decade A/B for the round-11 scale swaps (VERDICT r10 items 5/6):

1. mad_outlier_summary exact (two rank-device range sorts over the
   per-group distinct-value frames) vs scale_estimator="sketch" (the
   mergeable O(groups x bins) histogram path) over the events table at
   sf1 and sf10 — wall, shuffle-write, spill, plus the value deltas so
   the within-bin-width contract is checked on real decade data, not
   just the unit fixture.

2. BPE merge-budget parity: exact bpe_train_merges at n_merges=8
   (8 driver rounds) vs bpe_train_merges_batched at n_rounds=2,
   batch_k=4 (2 rounds for the same budget ceiling) over the sf10
   documents — the measured argument that batching divides the
   round count (and therefore the per-merge wall cost) at realistic
   budgets.

Usage: python tools/ab_sketch_scale.py [sf_dir ...]
(default: .scale_smoke/sf1 .scale_smoke/sf10)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from big_data_project_datapipeline_spark.session import get_spark
from big_data_project_datapipeline_spark.tables import load_table


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


def timed(build):
    w0, s0 = shuffle_totals()
    t0 = time.perf_counter()
    df = build()
    df.write.mode("overwrite").format("noop").save()
    el = time.perf_counter() - t0
    w1, s1 = shuffle_totals()
    return {
        "sec": round(el, 2),
        "shuffle_mb": round((w1 - w0) / 1e6, 1),
        "spill_mb": round((s1 - s0) / 1e6, 1),
    }


def main() -> None:
    from big_data_project_datapipeline_spark.functions.corpus import (
        bpe_train_merges,
        bpe_train_merges_batched,
    )
    from big_data_project_datapipeline_spark.functions.quality import (
        mad_outlier_summary,
    )

    sf_dirs = sys.argv[1:] or [".scale_smoke/sf1", ".scale_smoke/sf10"]
    spark = get_spark(
        app_name="ab-sketch-scale", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        ev = load_table(spark, sf_dir, "events")
        for est in ("exact", "sketch"):
            m = timed(
                lambda: mad_outlier_summary(
                    ev, "value", ["event_type"], scale_estimator=est
                )
            )
            print(json.dumps({"op": f"mad_{est}", "sf": sf_dir, **m}),
                  flush=True)
        # value deltas: sketch medians/MADs within one bin width of
        # exact on the real decade data
        ex = {
            r["event_type"]: r
            for r in mad_outlier_summary(
                ev, "value", ["event_type"]
            ).collect()
        }
        sk = {
            r["event_type"]: r
            for r in mad_outlier_summary(
                ev, "value", ["event_type"], scale_estimator="sketch"
            ).collect()
        }
        worst = max(
            abs(sk[k]["median"] - ex[k]["median"]) for k in ex
        )
        worst_mad = max(abs(sk[k]["mad"] - ex[k]["mad"]) for k in ex)
        rate_delta = max(
            abs(sk[k]["outlier_rate"] - ex[k]["outlier_rate"]) for k in ex
        )
        print(
            json.dumps(
                {
                    "op": "mad_value_delta",
                    "sf": sf_dir,
                    "worst_median_delta": round(worst, 4),
                    "worst_mad_delta": round(worst_mad, 4),
                    "worst_outlier_rate_delta": round(rate_delta, 6),
                }
            ),
            flush=True,
        )
    # BPE budget parity at the largest requested SF
    docs = load_table(spark, sf_dirs[-1], "documents")
    m = timed(lambda: bpe_train_merges(docs, n_merges=8))
    print(json.dumps({"op": "bpe_exact_8_merges", "sf": sf_dirs[-1], **m}),
          flush=True)
    m = timed(
        lambda: bpe_train_merges_batched(docs, n_rounds=2, batch_k=4)
    )
    print(
        json.dumps(
            {"op": "bpe_batched_2x4", "sf": sf_dirs[-1], **m}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
