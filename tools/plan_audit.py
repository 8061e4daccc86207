"""Physical-plan audit across the whole query registry: for every
query in __spark_entry__.queries(), count the plan features that decide
100 TB behavior — join strategies, exchanges, Python evaluation nodes,
cartesian products — and verify the global hygiene rules:

- no CartesianProduct anywhere (BroadcastNestedLoopJoin is allowed only
  for 1-row broadcast totals frames, which is how decimal/total scalars
  ride along);
- no row-at-a-time PythonUDF on any oracle-backed path (ArrowEvalPython
  is permitted in the explicitly-Arrow extension ops);
- every parquet scan prunes columns (ReadSchema never *).

Writes PLAN_AUDIT.json next to the repo root and prints a summary line.
Plans are BUILT, not executed — the audit runs in seconds.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from big_data_project_datapipeline_spark.session import get_spark

FEATURES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
    "WholeStageCodegen",
    "ArrowEvalPython",
    "BatchEvalPython",  # row-at-a-time python — must be zero
    "InMemoryTableScan",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    violations: list[str] = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {f: plan.count(f) for f in FEATURES}
        counts = {k: v for k, v in counts.items() if v}
        scans_all_cols = len(re.findall(r"ReadSchema: struct<[^>]{400,}", plan))
        report[name] = counts
        if counts.get("CartesianProduct"):
            violations.append(f"{name}: CartesianProduct")
        if counts.get("BatchEvalPython"):
            violations.append(f"{name}: row-at-a-time PythonUDF")
        if scans_all_cols:
            report[name]["wide_scans"] = scans_all_cols
            violations.append(f"{name}: unpruned wide scan")
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "violations": violations,
        "queries": report,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    totals = {}
    for c in report.values():
        for k, v in c.items():
            totals[k] = totals.get(k, 0) + v
    print(
        json.dumps(
            {
                "n_queries": len(report),
                "violations": violations,
                "totals": totals,
            }
        )
    )
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
