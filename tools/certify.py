"""One-command certification: the exact sequence a round should end
with — full DuckDB-oracle sweep at both gate SFs, the unit suite, and
the plan audit. Exits non-zero on the first red artifact.

Usage: python tools/certify.py [--skip-tests]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], expect: str) -> None:
    """Run one leg and require ITS OWN success token in stdout — a
    shared OR-list could false-green a leg whose output merely
    contains another leg's token (r4 advice fix)."""
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-3:])
    print(tail, flush=True)
    if proc.returncode != 0 or expect not in proc.stdout:
        print(f"RED: {label}", flush=True)
        sys.exit(1)


def wiring_check() -> None:
    """Fail FAST (before the minutes-long sweeps) when a registered
    query is not wired end-to-end — the round-8 failure mode was an
    end-of-round commit registering queries in ``queries()`` after
    the closing certification had already run, leaving them
    bench-invisible and driver-uncertified (VERDICT r8 item 7). Every
    ``queries()`` entry must have: a bench.BENCH_QUERIES row, a
    committed sf0.1 baseline, and an oracle (or adjudicated
    rows-only slot)."""
    import json

    sys.path.insert(0, REPO)
    import bench
    import __spark_entry__ as entrymod
    from tests.test_contract import ROWS_ONLY

    qs = set(entrymod.queries())
    problems = []
    missing_bench = qs - set(bench.BENCH_QUERIES)
    if missing_bench:
        problems.append(f"not in bench.BENCH_QUERIES: {sorted(missing_bench)}")
    extra_bench = set(bench.BENCH_QUERIES) - qs
    if extra_bench:
        problems.append(f"benched but unregistered: {sorted(extra_bench)}")
    base_path = os.path.join(REPO, ".benchmarks", "baseline_sf0.1.json")
    with open(base_path) as fh:
        baseline = set(json.load(fh)["queries"])
    missing_base = qs - baseline
    if missing_base:
        problems.append(f"no sf0.1 baseline: {sorted(missing_base)}")
    missing_oracle = qs - set(entrymod.oracle_sql()) - ROWS_ONLY
    if missing_oracle:
        problems.append(f"no oracle_sql entry: {sorted(missing_oracle)}")
    if problems:
        for p in problems:
            print(f"WIRING RED: {p}", flush=True)
        sys.exit(1)
    print(f"wiring: {len(qs)} queries fully wired", flush=True)


def main() -> int:
    py = sys.executable
    wiring_check()
    run("oracle sweep sf0.001",
        [py, "tools/compare_oracle.py", "/root/testdata/sf0.001"],
        expect="FAILURES: 0")
    run("oracle sweep sf0.01",
        [py, "tools/compare_oracle.py", "/root/testdata/sf0.01"],
        expect="FAILURES: 0")
    run("plan audit", [py, "tools/plan_audit.py"],
        expect='"violations": []')
    if "--skip-tests" not in sys.argv:
        run("unit suite", [py, "-m", "pytest", "tests/", "-q"],
            expect=" passed")
    print("CERTIFIED: all green", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
