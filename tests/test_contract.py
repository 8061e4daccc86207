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


def test_oracle_sql_mentions_no_spark_syntax():
    for name, sql in entrymod.oracle_sql().items():
        assert "F." not in sql and "pyspark" not in sql, name


def test_gate_prefix_rotation_invariants():
    """The driver certifies only the FIRST 50 queries() entries — pin
    the rotation rules so a reorder can't silently waste the gate:
    at least 50 entries, every prefix entry oracle-backed, the
    composite pipelines (q92/q37) re-certified every round, and the
    round-7 rotation itself (the four round-6 additions q182–q185
    with zero driver rows, plus every grouped_prefix consumer — whose
    plans changed again this round with the null-safe struct group
    key — including the 8 conversions the round-6 gate never saw on
    their new plans, and q175 whose state join gained the
    overflow-NULL markers; nothing the driver has never checked sits
    past the cap)."""
    names = list(entrymod.queries())
    assert len(names) >= 50
    prefix = set(names[:50])
    assert "q92_feature_pipeline" in prefix
    assert "q37_ingest_pipeline" in prefix
    # round 4 closed this: every prefix entry has an oracle (the
    # approximate family via property gates)
    osql = set(entrymod.oracle_sql())
    assert all(n in osql for n in prefix), sorted(prefix - osql)
    # round-7 rotation: the never-driver-certified round-6 additions,
    # the 19 grouped_prefix consumers (null-safe struct-key plans),
    # and q175 (overflow-marker state join) must occupy certified
    # slots
    must_certify = {
        "q182_", "q183_", "q184_", "q185_",
        "q38_", "q78_", "q82_", "q84_", "q102_", "q124_", "q126_",
        "q127_", "q144_", "q147_", "q148_", "q150_", "q152_", "q154_",
        "q157_", "q162_", "q163_", "q166_", "q174_", "q175_",
    }
    stranded = [
        n
        for n in names[50:]
        if any(n.startswith(p) for p in must_certify)
    ]
    assert stranded == [], stranded
