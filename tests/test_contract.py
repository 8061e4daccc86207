"""Driver-contract surface guards: every query wired end-to-end, no
silent rows-only downgrades from a typo'd oracle key."""

from __future__ import annotations

import __spark_entry__ as entrymod
import bench

# Round 4 closed the rows-only class: the approximate family
# (q90/q91/q93/q94/q109/q117) is gated via in-plan property checks
# whose expected values are plain SQL, so EVERY query is oracle-backed.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs), f"orphan oracles: {set(osql) - set(qs)}"
    assert set(qs) - set(osql) == ROWS_ONLY


def test_bench_covers_every_query():
    assert set(bench.BENCH_QUERIES) == set(entrymod.queries())


def test_baseline_covers_every_query():
    """Every registered query carries a committed sf0.1 baseline —
    without one a perf regression is invisible to bench.py's flag
    pass (the round-8 q193/q194 wiring gap, closed via
    tools/certify.wiring_check; this is the pytest-side witness)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
        "baseline_sf0.1.json",
    )
    with open(path) as fh:
        baseline = set(json.load(fh)["queries"])
    missing = set(entrymod.queries()) - baseline
    assert not missing, sorted(missing)


def test_oracle_sql_mentions_no_spark_syntax():
    for name, sql in entrymod.oracle_sql().items():
        assert "F." not in sql and "pyspark" not in sql, name


def test_gate_prefix_rotation_invariants():
    """The driver certifies only the FIRST 50 queries() entries — pin
    the rotation rules so a reorder can't silently waste the gate:
    at least 50 entries, every prefix entry oracle-backed, the
    composite pipelines (q92/q37) re-certified every round, and the
    round-8 rotation itself: the three round-7 additions q186–q188
    (the only registry entries with zero driver rows), plus every
    plan round 8 touched — q175/q87 (sticky per-sweep overflow flags
    + measured per-sweep localCheckpoint default) and q51/q119
    (resolve_dup_clusters non-convergence guard). Nothing the driver
    has never checked sits past the cap."""
    names = list(entrymod.queries())
    assert len(names) >= 50
    prefix = set(names[:50])
    assert "q92_feature_pipeline" in prefix
    assert "q37_ingest_pipeline" in prefix
    # round 4 closed this: every prefix entry has an oracle (the
    # approximate family via property gates)
    osql = set(entrymod.oracle_sql())
    assert all(n in osql for n in prefix), sorted(prefix - osql)
    # round-12 contract: the never-certified round-12 registrations
    # (q234–q236, staged in r11), every plan round 12 touches
    # (graph.py connected_components eager snapshot release →
    # q187/q189; market.py prepared_stats threshold guard →
    # q79/q213; q198/q199 degree_assortativity factoring + prepared
    # support edges), and the round-5 cohort — the stalest driver
    # rows in the registry (VERDICT r11 item 3) — must occupy
    # certified slots
    must_certify = {
        "q234_", "q235_", "q236_", "q237_",
        "q187_", "q189_", "q79_", "q213_", "q198_", "q199_",
        "q20_", "q21_", "q25_", "q54_", "q59_", "q90_", "q91_",
        "q93_", "q94_", "q99_",
    }
    stranded = [
        n
        for n in names[50:]
        if any(n.startswith(p) for p in must_certify)
    ]
    assert stranded == [], stranded
