"""Decompose q175 HITS shuffle growth (VERDICT r5 item #3): run the
query at sf0.1 and the derived 10x sf1 (.scale_smoke/sf1) and report
per-stage shuffle RECORDS vs BYTES, grouped by what the stage does.

SCALING.md shows 36.6 -> 786.7 MB (21.5x) shuffle bytes at 10x edges.
The plan has no quadratic term, so the decomposition question is
whether the records line is linear (~10x) and the extra factor lives
in bytes-per-record (shuffle lz4 compression: the scale-smoke keys are
copy-shifted by 2e9 and jittered, so sorted runs compress worse than
the dense sf0.1 id space), or whether some stage genuinely multiplies
records.

Usage: python tools/profile_hits.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

import __spark_entry__ as E
from big_data_project_datapipeline_spark.session import get_spark

SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", ".scale_smoke/sf1")]


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def stages(app: str):
    return {
        st["stageId"]: st
        for st in rest(f"applications/{app}/stages?status=complete")
    }


def main() -> None:
    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    app = rest("applications")[0]["id"]
    qs = E.queries()
    for sf_name, sf_dir in SFS:
        before = set(stages(app))
        t0 = time.perf_counter()
        qs["q175_hits"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = time.perf_counter() - t0
        after = stages(app)
        new = [after[i] for i in sorted(set(after) - before)]
        rows = []
        tot_b = tot_r = 0
        for st in new:
            b, r = st.get("shuffleWriteBytes", 0), st.get(
                "shuffleWriteRecords", 0
            )
            if b == 0 and r == 0:
                continue
            tot_b += b
            tot_r += r
            rows.append(
                {
                    "stage": st["stageId"],
                    "name": st.get("name", "")[:60],
                    "MB": round(b / 1e6, 2),
                    "Mrec": round(r / 1e6, 3),
                    "B_per_rec": round(b / r, 1) if r else 0,
                }
            )
        print(
            json.dumps(
                {
                    "sf": sf_name,
                    "wall_s": round(wall, 1),
                    "total_MB": round(tot_b / 1e6, 1),
                    "total_Mrec": round(tot_r / 1e6, 3),
                    "stages": rows,
                },
                indent=1,
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
