"""Batched-BPE budget-256 feasibility measurement (VERDICT r11 item 6):
run bpe_compression_curve_batched at a production-shaped merge budget
(16 rounds x batch_k=16 -> up to 256 merges) on the sf1 documents and
compare against the exact trainer's measured per-round cost projected
to the same budget — the driver-round bottleneck the batched trainer
exists to kill.

Usage: python tools/measure_bpe_budget.py [sf_dir] [n_rounds] [batch_k]
       (defaults: .scale_smoke/sf1, 16, 16)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".scale_smoke", "sf1")
    )
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch_k = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from big_data_project_datapipeline_spark.functions import corpus as CO
    from big_data_project_datapipeline_spark.session import get_spark
    from big_data_project_datapipeline_spark.tables import load_table

    spark = get_spark(app_name="measure_bpe_budget")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm the scan

    t0 = time.perf_counter()
    curve = CO.bpe_compression_curve_batched(
        docs, n_rounds=n_rounds, batch_k=batch_k
    ).collect()
    batched_s = time.perf_counter() - t0
    print(f"batched {n_rounds}x{batch_k}: {batched_s:.1f}s")
    for r in curve:
        print(
            f"  round {r['round']:>2}: kept {r['n_merges_in_round']:>2} "
            f"budget {r['budget_spent']:>3} symbols {r['total_symbols']} "
            f"compression {r['compression']}"
        )

    # exact trainer per-round cost, measured at a small budget and
    # projected linearly (each exact round is one candidate TakeOrdered
    # + one rewrite pass — the same per-round plan at any round index)
    exact_budget = 8
    t0 = time.perf_counter()
    CO.bpe_train_merges(docs, n_merges=exact_budget).collect()
    exact_s = time.perf_counter() - t0
    spent = curve[-1]["budget_spent"] if curve else 0
    proj = exact_s / exact_budget * spent
    print(
        f"exact at budget {exact_budget}: {exact_s:.1f}s "
        f"-> projected to budget {spent}: {proj:.0f}s "
        f"({proj / batched_s:.1f}x the batched wall)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
