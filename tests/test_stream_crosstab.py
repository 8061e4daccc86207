"""Incremental contingency store (streaming/crosstab.py): the Cramér's
V report from the sum-folded cell store after N ticks must be
BIT-EQUAL to the batch matrix (functions/quality.cramers_v_matrix) on
the union of all folded batches — including under tick replay and a
checkpointed availableNow drain."""

from __future__ import annotations

import pytest

from big_data_project_datapipeline_spark.functions.quality import (
    cramers_v_matrix,
)
from big_data_project_datapipeline_spark.streaming import crosstab as SC

COLS = ["lang", "source"]


def _rows(spark, rows):
    return spark.createDataFrame(rows, "lang string, source string")


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "cell_store")


def _matrix(df):
    return {
        (r["col_x"], r["col_y"]): (
            r["n"],
            r["r_levels"],
            r["c_levels"],
            r["dof"],
            r["chi2"],
            r["cramers_v"],
        )
        for r in df.collect()
    }


def test_two_ticks_bit_equal_batch(spark, store):
    """Tick 2 adds a new level AND reweights existing cells — both the
    level-count and χ² paths must fold, including a NULL level (the
    batch stack's '__NULL__' sentinel must round-trip the store)."""
    w1 = _rows(spark, [("en", "web"), ("en", "web"), ("de", "book")])
    w2 = _rows(spark, [("fr", "web"), ("de", "book"), ("en", None)])
    SC.maintain_contingency(spark, w1, store, "t1", COLS)
    SC.maintain_contingency(spark, w2, store, "t2", COLS)
    got = _matrix(SC.cramers_v_report(spark, store))
    want = _matrix(cramers_v_matrix(w1.unionByName(w2), COLS))
    assert got == want
    assert got[("lang", "source")][0] == 6


def test_replayed_tick_is_idempotent(spark, store):
    w = _rows(spark, [("en", "web"), ("de", "web"), ("de", "book")])
    SC.maintain_contingency(spark, w, store, "t1", COLS)
    once = _matrix(SC.cramers_v_report(spark, store))
    SC.maintain_contingency(spark, w, store, "t1", COLS)
    twice = _matrix(SC.cramers_v_report(spark, store))
    assert once == twice == _matrix(cramers_v_matrix(w, COLS))


def test_structured_stream_drain_matches_batch(spark, store, tmp_path):
    w = _rows(
        spark,
        [("en", "web"), ("en", "book"), ("de", "book"), ("fr", "web")],
    )
    landed = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    w.write.mode("overwrite").parquet(landed)
    q = SC.stream_contingency_monitor(spark, landed, store, ckpt, COLS)
    q.awaitTermination(120)
    got = _matrix(SC.cramers_v_report(spark, store))
    assert got == _matrix(cramers_v_matrix(w, COLS))
    # a second drain with nothing new lands no new deltas
    q2 = SC.stream_contingency_monitor(spark, landed, store, ckpt, COLS)
    q2.awaitTermination(120)
    assert _matrix(SC.cramers_v_report(spark, store)) == got


def test_bootstrap_empty_store_then_first_tick(spark, store):
    """cramers_v_report on a never-written store raises (no counts dir
    yet — the maintain-first bootstrap contract); the first tick
    creates it."""
    w = _rows(spark, [("en", "web"), ("de", "book")])
    with pytest.raises(Exception):
        SC.cramers_v_report(spark, store).collect()
    SC.maintain_contingency(spark, w, store, "t1", COLS)
    assert _matrix(SC.cramers_v_report(spark, store)) == _matrix(
        cramers_v_matrix(w, COLS)
    )
