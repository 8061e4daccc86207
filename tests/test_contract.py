"""Driver-contract surface guards: every query wired end-to-end, no
silent rows-only downgrades from a typo'd oracle key."""

from __future__ import annotations

import __spark_entry__ as entrymod
import bench

# The only queries intentionally lacking a DuckDB oracle (approximate by
# nature); everything else MUST be oracle-checked.
ROWS_ONLY = {
    "q90_ann_lsh",
    "q91_pca",
    "q93_ann_ivf",
    "q94_approx_stats",
    "q109_pq_audit",
    "q117_ann_ivfpq",
}


def test_every_query_has_oracle_or_is_documented_rows_only():
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
    at least 50 entries, no never-checked query stranded past the cap
    unless a certified one holds its family slot, and the composite
    feature pipeline (q92) re-certified every round."""
    names = list(entrymod.queries())
    assert len(names) >= 50
    prefix = set(names[:50])
    assert "q92_feature_pipeline" in prefix
    # every prefix entry is either oracle-backed or documented rows-only
    osql = set(entrymod.oracle_sql())
    assert all(n in osql or n in ROWS_ONLY for n in prefix)
    # round-3 rotation: the 48 queries with no CORRECTNESS_r02 row (plus
    # the new q99) must occupy the certified slots this round
    previously_unchecked = {
        f"q{i:02d}_" for i in [15, 16, 17, 30, 31, 35, 38, 39, 45, 46, 48, 50]
    } | {f"q{i}_" for i in range(62, 99)}
    stranded = [
        n
        for n in names[50:]
        if any(n.startswith(p) for p in previously_unchecked)
    ]
    assert stranded == [], stranded
