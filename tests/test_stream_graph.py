"""Incremental connected components across cron ticks: drain wave 1,
land merging edges, drain wave 2 — the stored label table must equal
batch CC over all edges seen (the union-find merge property:
CC(star(old labels) ∪ new edges) == CC(all edges)), and a replayed
batch must overwrite its shard against the pre-batch state."""

from __future__ import annotations

from big_data_project_datapipeline_spark.operators.graph import (
    connected_components,
)
from big_data_project_datapipeline_spark.streaming.graph import (
    apply_cc_batch,
    load_labels,
    stream_connected_components,
)

# wave 1: components {1,2,3} (cycle), {10,11}, {20,21}
WAVE1 = [(1, 2), (2, 3), (3, 1), (10, 11), (20, 21)]
# wave 2: MERGES {1..3} with {10,11} via 3-10; adds {30,31};
# self-loop and reverse-dup are dropped/absorbed
WAVE2 = [(3, 10), (30, 31), (31, 30), (7, 7)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _batch_cc(spark, rows):
    return {
        r["node"]: r["component"]
        for r in connected_components(_mk(spark, rows)).collect()
    }


def _labels(spark, labels_dir):
    return {
        r["node"]: r["comp"] for r in load_labels(spark, labels_dir).collect()
    }


def test_two_ticks_equal_batch_cc(spark, tmp_path):
    edges = str(tmp_path / "edges")
    labels = str(tmp_path / "labels")
    cp = str(tmp_path / "cp")

    _mk(spark, WAVE1).write.mode("append").parquet(edges)
    q = stream_connected_components(spark, edges, labels, cp)
    q.awaitTermination(120)
    assert _labels(spark, labels) == _batch_cc(spark, WAVE1)

    _mk(spark, WAVE2).write.mode("append").parquet(edges)
    q = stream_connected_components(spark, edges, labels, cp)
    q.awaitTermination(120)
    got = _labels(spark, labels)
    assert got == _batch_cc(spark, WAVE1 + WAVE2)
    # the wave-2 merge relabeled the {10,11} component to root 1
    assert got[10] == 1 and got[11] == 1 and got[30] == 30


def test_replay_overwrites_against_pre_batch_state(spark, tmp_path):
    labels = str(tmp_path / "labels")
    apply_cc_batch(_mk(spark, WAVE1), 0, labels)
    before = _labels(spark, labels)
    # replay batch 1 twice: must read state < 1 (batch 0) both times
    # and overwrite its own shard, not accumulate
    apply_cc_batch(_mk(spark, WAVE2), 1, labels)
    first = _labels(spark, labels)
    apply_cc_batch(_mk(spark, WAVE2), 1, labels)
    assert _labels(spark, labels) == first == _batch_cc(
        spark, WAVE1 + WAVE2
    )
    assert before == _batch_cc(spark, WAVE1)


def test_bootstrap_empty_state(spark, tmp_path):
    labels = str(tmp_path / "labels")
    assert _labels(spark, labels) == {}
    apply_cc_batch(_mk(spark, [(5, 6)]), 0, labels)
    assert _labels(spark, labels) == {5: 5, 6: 5}


def test_stray_shardlike_entry_does_not_reset_state(spark, tmp_path):
    """ADVICE r7: one unparseable 'labels_*' entry (labels_old, editor
    droppings) must be skipped individually — the old whole-generator
    try/except discarded EVERY shard id and silently returned
    bootstrap (empty) state, forgetting all accumulated components."""
    ldir = str(tmp_path / "labels")
    apply_cc_batch(_mk(spark, WAVE1), 0, ldir)
    (tmp_path / "labels" / "labels_old").mkdir()
    (tmp_path / "labels" / "labels_9zz").mkdir()
    assert _labels(spark, ldir) == _batch_cc(spark, WAVE1)


def test_unreadable_newest_shard_falls_back_to_previous(spark, tmp_path):
    """ADVICE r7: an unreadable NEWEST shard (half-deleted dir with no
    parquet footer) must fall back to the next-newest readable shard —
    stale-but-consistent labels re-merge on the next tick, while the
    old behavior (empty frame) dropped every past component."""
    ldir = str(tmp_path / "labels")
    apply_cc_batch(_mk(spark, WAVE1), 0, ldir)
    (tmp_path / "labels" / "labels_5").mkdir()  # empty: unreadable
    assert _labels(spark, ldir) == _batch_cc(spark, WAVE1)
    # and a tick replayed ON TOP of the broken shard still merges
    # against readable state, not bootstrap
    apply_cc_batch(_mk(spark, WAVE2), 6, ldir)
    assert _labels(spark, ldir) == _batch_cc(spark, WAVE1 + WAVE2)
