"""Incremental MinHash-LSH near-dup maintenance: the folded decision
shards must BIT-equal `minhash_dedup_decision` over every doc seen
(arrival-ordered ids make the per-bucket minima append-stable), the
fed CC label store must equal batch cluster resolution on the union's
decision forest, and a replayed batch must fold only pre-batch state."""

from __future__ import annotations

import pytest

from big_data_project_datapipeline_spark.functions.dedup import (
    minhash_dedup_decision,
    resolve_dup_clusters,
)
from big_data_project_datapipeline_spark.streaming.graph import load_labels
from big_data_project_datapipeline_spark.streaming.neardup import (
    apply_neardup_batch,
    load_decisions,
    stream_neardup_index,
)

# batch 0: 1/2 near-identical (J=9/11), 3 distinct, 4 empty-ish short
WAVE1 = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3, "one two three four five six seven eight nine ten"),
    (4, "solo"),
]
# batch 1 (LARGER ids — the arrival-order contract): 5 near-dups doc 1
# (chains the 1-2 cluster), 6 near-dups doc 3, 7 distinct
WAVE2 = [
    (5, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
    (6, "one two three four five six seven eight nine eleven"),
    (7, "completely different words with no overlap whatsoever here"),
]

KW = dict(num_hashes=16, band_size=4, threshold=0.7)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r["doc_id"], r["dup_of"], r["jaccard"], r["is_kept"])
        for r in df.collect()
    )


def _batch_decision(spark, rows):
    return _rows(minhash_dedup_decision(_mk(spark, rows), **KW))


def test_two_tick_equals_batch_decision(spark, tmp_path):
    state = str(tmp_path / "state")
    labels = str(tmp_path / "labels")
    apply_neardup_batch(_mk(spark, WAVE1), 0, state, labels, **KW)
    assert _rows(load_decisions(spark, state)) == _batch_decision(
        spark, WAVE1
    )
    apply_neardup_batch(_mk(spark, WAVE2), 1, state, labels, **KW)
    union_expected = _batch_decision(spark, WAVE1 + WAVE2)
    assert _rows(load_decisions(spark, state)) == union_expected
    # the corpus actually exercises the path: cross-tick dups exist
    assert any(d is not None for (_, d, _, _) in union_expected)

    # the fed CC store equals batch cluster resolution on the union's
    # decision forest (restricted to docs with a duplicate link —
    # singletons never enter the edge stream)
    dec = minhash_dedup_decision(_mk(spark, WAVE1 + WAVE2), **KW)
    resolved = {
        r["doc_id"]: r["cluster_root"]
        for r in resolve_dup_clusters(dec).collect()
    }
    linked = {
        r["doc_id"]
        for r in dec.filter("dup_of is not null").collect()
    } | {
        r["dup_of"]
        for r in dec.filter("dup_of is not null").collect()
    }
    got = {
        r["node"]: r["comp"] for r in load_labels(spark, labels).collect()
    }
    assert got == {n: resolved[n] for n in linked}
    # doc 5 (tick-1 arrival) joined the tick-0 {1,2} cluster
    assert got[5] == 1


def test_replay_folds_pre_batch_state_only(spark, tmp_path):
    state = str(tmp_path / "state")
    labels = str(tmp_path / "labels")
    apply_neardup_batch(_mk(spark, WAVE1), 0, state, labels, **KW)
    apply_neardup_batch(_mk(spark, WAVE2), 1, state, labels, **KW)
    first = _rows(load_decisions(spark, state))
    # replay tick 1: must overwrite its own shards against the
    # pre-batch (tick-0) state — not see its crashed attempt's output,
    # not accumulate
    apply_neardup_batch(_mk(spark, WAVE2), 1, state, labels, **KW)
    assert _rows(load_decisions(spark, state)) == first
    assert first == _batch_decision(spark, WAVE1 + WAVE2)


def test_bootstrap_and_stream_drain(spark, tmp_path):
    docs = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    labels = str(tmp_path / "labels")
    cp = str(tmp_path / "cp")
    assert _rows(load_decisions(spark, state)) == []

    _mk(spark, WAVE1).write.mode("append").parquet(docs)
    q = stream_neardup_index(spark, docs, state, cp, labels, **KW)
    q.awaitTermination(120)
    assert _rows(load_decisions(spark, state)) == _batch_decision(
        spark, WAVE1
    )

    _mk(spark, WAVE2).write.mode("append").parquet(docs)
    q = stream_neardup_index(spark, docs, state, cp, labels, **KW)
    q.awaitTermination(120)
    assert _rows(load_decisions(spark, state)) == _batch_decision(
        spark, WAVE1 + WAVE2
    )


def test_stray_state_entry_skipped(spark, tmp_path):
    """A stray dir that merely looks like a shard must not discard
    real shards (the ADVICE-r7 labels-parsing contract, applied to
    all three shard families)."""
    import os

    state = str(tmp_path / "state")
    apply_neardup_batch(_mk(spark, WAVE1), 0, state, None, **KW)
    os.makedirs(os.path.join(state, "buckets_old"))
    os.makedirs(os.path.join(state, "decisions_junk"))
    apply_neardup_batch(_mk(spark, WAVE2), 1, state, None, **KW)
    assert _rows(load_decisions(spark, state)) == _batch_decision(
        spark, WAVE1 + WAVE2
    )


def test_store_served_reports_equal_batch(spark, tmp_path):
    """One store, all reads: the folded bucket shards serve the q197
    index-health report (counts decompose as SUMs) and the label +
    decision stores serve the q196 cluster-size histogram — both equal
    their batch twins over every doc seen."""
    from big_data_project_datapipeline_spark.functions.dedup import (
        banded_rows,
        minhash_signatures,
    )
    from big_data_project_datapipeline_spark.streaming.neardup import (
        neardup_bucket_stats,
        neardup_cluster_sizes,
    )
    from pyspark.sql import functions as F

    state = str(tmp_path / "state")
    labels = str(tmp_path / "labels")
    apply_neardup_batch(_mk(spark, WAVE1), 0, state, labels, **KW)
    apply_neardup_batch(_mk(spark, WAVE2), 1, state, labels, **KW)

    got_buckets = sorted(
        (r["band"], r["bucket_size"], r["n_buckets"], r["candidate_pairs"])
        for r in neardup_bucket_stats(spark, state).collect()
    )
    union = _mk(spark, WAVE1 + WAVE2)
    sigs = minhash_signatures(union, num_hashes=KW["num_hashes"])
    bs = banded_rows(
        sigs, "doc_id", KW["num_hashes"], KW["band_size"]
    ).groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    want_buckets = sorted(
        (r["band"], r["bucket_size"], r["n_buckets"], r["candidate_pairs"])
        for r in bs.groupBy("band", "bucket_size")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(
                F.expr("(bucket_size * (bucket_size - 1)) div 2")
            ).alias("candidate_pairs"),
        )
        .collect()
    )
    assert got_buckets == want_buckets

    got_sizes = sorted(
        (r["cluster_size"], r["n_clusters"])
        for r in neardup_cluster_sizes(spark, state, labels).collect()
    )
    dec = minhash_dedup_decision(union, **KW)
    want_sizes = sorted(
        (r["cluster_size"], r["n_clusters"])
        for r in resolve_dup_clusters(dec)
        .groupBy("cluster_root")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .collect()
    )
    assert got_sizes == want_sizes


def test_custom_id_column_round_trips(spark, tmp_path):
    """Shards store canonical column names regardless of the caller's
    id_col — a custom id must fold across ticks (it used to poison the
    bootstrap-schema union on tick 2)."""
    state = str(tmp_path / "state")
    w1 = spark.createDataFrame(WAVE1, "item long, text string")
    w2 = spark.createDataFrame(WAVE2, "item long, text string")
    apply_neardup_batch(w1, 0, state, None, id_col="item", **KW)
    apply_neardup_batch(w2, 1, state, None, id_col="item", **KW)
    assert _rows(load_decisions(spark, state)) == _batch_decision(
        spark, WAVE1 + WAVE2
    )
