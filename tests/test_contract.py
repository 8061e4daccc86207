"""Driver-contract surface guards: every query wired end-to-end, no
silent rows-only downgrades from a typo'd oracle key."""

from __future__ import annotations

import __spark_entry__ as entrymod
import bench

# The only queries intentionally lacking a DuckDB oracle (approximate by
# nature); everything else MUST be oracle-checked.
ROWS_ONLY = {"q90_ann_lsh", "q91_pca", "q93_ann_ivf", "q94_approx_stats"}


def test_every_query_has_oracle_or_is_documented_rows_only():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs), f"orphan oracles: {set(osql) - set(qs)}"
    assert set(qs) - set(osql) == ROWS_ONLY


def test_bench_covers_every_query():
    assert set(bench.BENCH_QUERIES) == set(entrymod.queries())


def test_oracle_sql_mentions_no_spark_syntax():
    for name, sql in entrymod.oracle_sql().items():
        assert "F." not in sql and "pyspark" not in sql, name
