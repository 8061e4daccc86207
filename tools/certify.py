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


def run(label: str, cmd: list[str]) -> None:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-3:])
    print(tail, flush=True)
    ok = proc.returncode == 0 and (
        "FAILURES: 0" in proc.stdout or "passed" in proc.stdout
        or "violations\": []" in proc.stdout or '"violations": []' in proc.stdout
    )
    if not ok:
        print(f"RED: {label}", flush=True)
        sys.exit(1)


def main() -> int:
    py = sys.executable
    run("oracle sweep sf0.001",
        [py, "tools/compare_oracle.py", "/root/testdata/sf0.001"])
    run("oracle sweep sf0.01",
        [py, "tools/compare_oracle.py", "/root/testdata/sf0.01"])
    run("plan audit", [py, "tools/plan_audit.py"])
    if "--skip-tests" not in sys.argv:
        run("unit suite", [py, "-m", "pytest", "tests/", "-q"])
    print("CERTIFIED: all green", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
