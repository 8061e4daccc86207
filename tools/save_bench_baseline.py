"""Run bench.py and persist its per-query numbers as the committed
baseline (.benchmarks/baseline_sf{sf}.json) that bench.py compares
against on later runs.

Usage: python tools/save_bench_baseline.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        check=False,
    )
    line = next(
        (
            ln
            for ln in reversed(proc.stdout.splitlines())
            if ln.startswith('{"metric"')
        ),
        None,
    )
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        return 1
    result = json.loads(line)
    # the printed line carries only the slowest queries (kept short so
    # the driver capture can parse it); the full per-query map is in the
    # detail file bench.py writes next to itself
    with open(os.path.join(REPO, result["detail_file"])) as fh:
        result["queries"] = json.load(fh)["queries"]
    os.makedirs(os.path.join(REPO, ".benchmarks"), exist_ok=True)
    path = os.path.join(REPO, ".benchmarks", f"baseline_sf{result['sf']}.json")
    with open(path, "w") as fh:
        json.dump(
            {
                "total": result["value"],
                "queries": result["queries"],
                "sf": result["sf"],
            },
            fh,
            indent=2,
            sort_keys=True,
        )
    print(f"saved {path}: total {result['value']}s, {len(result['queries'])} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
