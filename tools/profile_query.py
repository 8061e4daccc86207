"""Per-job/stage wall+metric decomposition for one query at one SF.

Usage: python tools/profile_query.py <sf_dir> <query> [n_runs=2]

Runs the query warm (noop sink), then dumps every job of the LAST run
with its stages: duration, task time, shuffle read/write bytes, input
bytes, and the stage's first line of description — enough to see which
phase of a multi-job query the time lives in.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

import __spark_entry__ as E
from big_data_project_datapipeline_spark.session import get_spark
from big_data_project_datapipeline_spark.tables import TABLE_NAMES, load_table


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir, query = sys.argv[1], sys.argv[2]
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    app = rest("applications")[0]["id"]
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    fn = E.queries()[query]
    for r in range(n_runs):
        jobs_before = {j["jobId"] for j in rest(f"applications/{app}/jobs")}
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        print(f"RUN {r} total={el:.3f} build(driver construction)={t_build:.3f}")
        if r != n_runs - 1:
            continue
        stages = {
            s["stageId"]: s
            for s in rest(f"applications/{app}/stages?status=complete")
        }
        jobs = [
            j
            for j in rest(f"applications/{app}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            print(
                f"  job {j['jobId']} [{j.get('status')}] "
                f"{sub[11:23]}..{comp[11:23]} stages={sorted(j['stageIds'])}"
            )
            for sid in sorted(j["stageIds"]):
                s = stages.get(sid)
                if not s:
                    continue
                print(
                    f"    stage {sid}: tasks={s['numCompleteTasks']} "
                    f"runTime={s['executorRunTime']/1000:.2f}s "
                    f"cpuTime={s.get('executorCpuTime',0)/1e9:.2f}s "
                    f"in={s['inputBytes']/1e6:.1f}MB "
                    f"sh_r={s['shuffleReadBytes']/1e6:.1f}MB "
                    f"sh_w={s['shuffleWriteBytes']/1e6:.1f}MB  "
                    f"{s['name'].splitlines()[0][:80]}"
                )


if __name__ == "__main__":
    main()
