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


def main() -> int:
    py = sys.executable
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
