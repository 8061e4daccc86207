"""Incremental corpus-stats maintenance (streaming/corpus.py): the
maintained (token, cnt) store after N ticks must equal the batch
aggregate over everything folded, bit-for-bit — including under batch
replay (idempotent per batch_id)."""

from __future__ import annotations

import pytest

from big_data_project_datapipeline_spark.functions import corpus as CO
from big_data_project_datapipeline_spark.streaming import corpus as SC


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "token_store")


def test_two_ticks_equal_batch_recompute(spark, store):
    wave1 = _docs(spark, [(0, "a b a"), (1, "b c")])
    wave2 = _docs(spark, [(2, "a d d d")])
    SC.maintain_token_counts(spark, wave1, store, batch_id="t1")
    SC.maintain_token_counts(spark, wave2, store, batch_id="t2")
    got = {
        r.token: r.cnt
        for r in SC.zipf_report(spark, store, top_ranks=10)
        .sparkSession.read.parquet(store + "/counts")
        .collect()
    }
    full = CO.token_counts(wave1.unionByName(wave2))
    expected = {r.token: r.cnt for r in full.collect()}
    assert got == expected == {"a": 3, "b": 2, "c": 1, "d": 3}


def test_replayed_tick_is_idempotent(spark, store):
    wave1 = _docs(spark, [(0, "x x y")])
    SC.maintain_token_counts(spark, wave1, store, batch_id="t1")
    # Replay the SAME batch id (cron retry): counts must not double.
    SC.maintain_token_counts(spark, wave1, store, batch_id="t1")
    got = {
        r.token: r.cnt
        for r in spark.read.parquet(store + "/counts").collect()
    }
    assert got == {"x": 2, "y": 1}


def test_zipf_report_matches_batch_fit(spark, store):
    rows = []
    did = 0
    texts = []
    for r in range(1, 11):
        for _ in range(101 - 10 * r):
            texts.append(f"w{r:02d}")
    # split the same corpus into two waves, one doc per token
    half = len(texts) // 2
    wave1 = _docs(spark, [(i, t) for i, t in enumerate(texts[:half])])
    wave2 = _docs(
        spark, [(half + i, t) for i, t in enumerate(texts[half:])]
    )
    SC.maintain_token_counts(spark, wave1, store, batch_id="a")
    SC.maintain_token_counts(spark, wave2, store, batch_id="b")
    inc = SC.zipf_report(spark, store, top_ranks=10).collect()[0]
    batch = CO.zipf_fit(
        wave1.unionByName(wave2), top_ranks=10
    ).collect()[0]
    assert inc == batch  # bit-for-bit, decimal-accumulated both paths


def _sdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_dsir_maintained_equals_batch(spark, tmp_path):
    store = str(tmp_path / "dsir_store")
    wave1 = _sdocs(
        spark,
        [(0, "tgt", "aa bb aa"), (1, "raw", "aa zz"), (2, "raw", "yy")],
    )
    wave2 = _sdocs(
        spark, [(3, "tgt", "bb bb cc"), (4, "raw", "aa bb qq")]
    )
    SC.maintain_dsir_counts(
        spark, wave1, store, "t1", target_source="tgt", n_buckets=64
    )
    counts = SC.maintain_dsir_counts(
        spark, wave2, store, "t2", target_source="tgt", n_buckets=64
    )
    # maintained counts == batch counts over the union, bit-for-bit
    batch_counts = CO.dsir_bucket_counts(
        wave1.unionByName(wave2), "tgt", n_buckets=64
    )
    assert sorted(map(tuple, counts.collect())) == sorted(
        map(tuple, batch_counts.collect())
    )
    # ... and scoring current candidates off the maintained store is
    # bit-identical to the one-shot batch dsir_importance
    all_docs = wave1.unionByName(wave2)
    weights = CO.dsir_weights_from_counts(counts, 64, alpha=1.0)
    inc = CO.dsir_score_docs(
        all_docs.filter("source <> 'tgt'"), weights, n_buckets=64
    )
    batch = CO.dsir_importance(all_docs, "tgt", n_buckets=64, alpha=1.0)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_dsir_replayed_tick_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "dsir_store")
    wave = _sdocs(spark, [(0, "tgt", "aa aa"), (1, "raw", "aa bb")])
    SC.maintain_dsir_counts(
        spark, wave, store, "t1", target_source="tgt", n_buckets=16
    )
    counts = SC.maintain_dsir_counts(
        spark, wave, store, "t1", target_source="tgt", n_buckets=16
    )
    totals = counts.agg({"ct": "sum", "cr": "sum"}).collect()[0]
    assert sorted(totals) == [2, 2]  # replay did not double-count
    got = {(r.bucket): (r.ct, r.cr) for r in counts.collect()}
    batch = {
        (r.bucket): (r.ct, r.cr)
        for r in CO.dsir_bucket_counts(wave, "tgt", n_buckets=16).collect()
    }
    assert got == batch


def test_fold_ledger_is_atomic_with_store_and_deltas_pruned(spark, store):
    import json
    import os

    wave1 = _docs(spark, [(0, "a b")])
    SC.maintain_token_counts(spark, wave1, store, batch_id="t1")
    # ledger rides INSIDE the promoted store dir (atomic with the swap)
    ledger = os.path.join(store, "counts", "_folded.json")
    assert json.load(open(ledger)) == ["t1"]
    assert not os.path.exists(os.path.join(store, "_folded.txt"))
    # folded delta shards are pruned
    assert os.listdir(os.path.join(store, "deltas")) == []
    # second tick folds only its own delta and prunes it too
    SC.maintain_token_counts(
        spark, _docs(spark, [(1, "b c")]), store, batch_id="t2"
    )
    assert json.load(open(ledger)) == ["t1", "t2"]
    assert os.listdir(os.path.join(store, "deltas")) == []
    got = {
        r.token: r.cnt
        for r in spark.read.parquet(store + "/counts").collect()
    }
    assert got == {"a": 1, "b": 2, "c": 1}


def test_negative_sampling_report_matches_batch_table(spark, store):
    """Round-10: the store-served q227 sampling table must be
    bit-equal to the batch negative_sampling_table over every doc
    ever folded (same sampling_table_from_counts tail, same exact
    integer-scaled weights)."""
    wave1 = _docs(spark, [(0, "a b a"), (1, "b c")])
    wave2 = _docs(spark, [(2, "a d d d")])
    SC.maintain_token_counts(spark, wave1, store, batch_id="t1")
    SC.maintain_token_counts(spark, wave2, store, batch_id="t2")
    inc = sorted(
        map(tuple, SC.negative_sampling_report(spark, store).collect())
    )
    batch = sorted(
        map(
            tuple,
            CO.negative_sampling_table(
                wave1.unionByName(wave2)
            ).collect(),
        )
    )
    assert inc == batch and len(inc) == 4


def test_gini_report_matches_batch_recount(spark, store):
    """Round-11: the store-served corpus Gini must be bit-equal to
    gini_from_counts over a batch recount of every doc ever folded
    (same _gini_tail expressions), and consistent with the per-source
    token_gini device when the corpus is one source."""
    wave1 = _docs(spark, [(0, "a b a"), (1, "b c")])
    wave2 = _docs(spark, [(2, "a d d d")])
    SC.maintain_token_counts(spark, wave1, store, batch_id="t1")
    SC.maintain_token_counts(spark, wave2, store, batch_id="t2")
    inc = SC.gini_report(spark, store).first()
    batch = CO.gini_from_counts(
        CO.token_counts(wave1.unionByName(wave2)).selectExpr(
            "token", "cnt AS n"
        )
    ).first()
    assert tuple(inc) == tuple(batch)
    # counts: a3 b2 c1 d3 -> asc ranks c1 b2 (a,d tie by token) a3 d4
    # S = 1*1 + 2*2 + 3*3 + 4*3 = 26; T=9, n=4
    # gini = (52 - 45)/36; top ceil(4/10)=1 type (d, rank 4) share 3/9
    assert inc["n_types"] == 4 and inc["n_tokens"] == 9
    assert inc["gini"] == round(7 / 36, 6) or abs(
        inc["gini"] - 7 / 36
    ) < 1e-6
    assert abs(inc["top_decile_share"] - 3 / 9) < 1e-6


def test_good_turing_report_matches_batch_recount(spark, store):
    """Round-11: the store-served Good-Turing table must be bit-equal
    to good_turing over every doc ever folded (same
    good_turing_from_counts tail) — P0 repriced per tick without a
    corpus pass."""
    wave1 = _docs(spark, [(0, "a b a"), (1, "b c")])
    wave2 = _docs(spark, [(2, "a d d d")])
    SC.maintain_token_counts(spark, wave1, store, batch_id="t1")
    SC.maintain_token_counts(spark, wave2, store, batch_id="t2")
    inc = sorted(
        map(tuple, SC.good_turing_report(spark, store).collect())
    )
    batch = sorted(
        map(tuple, CO.good_turing(wave1.unionByName(wave2)).collect())
    )
    assert inc == batch
    # counts a3 b2 c1 d3: N_1=1 N_2=1 N_3=2, N=9 -> P0 = 1/9
    rows = {r[0]: r for r in inc}
    assert set(rows) == {1, 2, 3}
    assert rows[1][1] == 1 and rows[2][1] == 1 and rows[3][1] == 2


@pytest.fixture()
def bigram_store(tmp_path):
    return str(tmp_path / "bigram_store")


def test_kneser_ney_report_matches_batch_model(spark, bigram_store):
    """Round-12 (VERDICT r11 item 7): the store-served KN model must
    be bit-equal to kneser_ney_bigram over every doc ever folded —
    exact (w1, w2, c12) longs admit one value however summed, and the
    kneser_ney_from_counts tail is the batch expressions verbatim."""
    wave1 = _docs(spark, [(0, "a b a b c"), (1, "b c b")])
    wave2 = _docs(spark, [(2, "a b a"), (3, "c a b")])
    SC.maintain_bigram_counts(spark, wave1, bigram_store, batch_id="t1")
    SC.maintain_bigram_counts(spark, wave2, bigram_store, batch_id="t2")
    inc = sorted(
        map(tuple, SC.kneser_ney_report(spark, bigram_store).collect())
    )
    batch = sorted(
        map(
            tuple,
            CO.kneser_ney_bigram(wave1.unionByName(wave2)).collect(),
        )
    )
    assert inc == batch and len(inc) > 0


def test_kn_bigram_replayed_tick_is_idempotent(spark, bigram_store):
    wave1 = _docs(spark, [(0, "x y x y")])
    SC.maintain_bigram_counts(spark, wave1, bigram_store, batch_id="t1")
    # cron retry of the SAME batch id: c12 must not double
    SC.maintain_bigram_counts(spark, wave1, bigram_store, batch_id="t1")
    got = {
        (r.w1, r.w2): r.c12
        for r in spark.read.parquet(bigram_store + "/counts").collect()
    }
    assert got == {("x", "y"): 2, ("y", "x"): 1}


def test_kn_doc_scores_report_matches_batch(spark, bigram_store):
    """Scoring the folded corpus under the store-served model is
    bit-equal to the batch kneser_ney_doc_scores (the scoring tail is
    corpus.kn_score_doc_pairs verbatim; the model counts are the same
    exact longs)."""
    wave1 = _docs(spark, [(0, "a b a b c"), (1, "b c b")])
    wave2 = _docs(spark, [(2, "a b a c a b")])
    SC.maintain_bigram_counts(spark, wave1, bigram_store, batch_id="t1")
    SC.maintain_bigram_counts(spark, wave2, bigram_store, batch_id="t2")
    docs = wave1.unionByName(wave2)
    inc = sorted(
        map(
            tuple,
            SC.kn_doc_scores_report(spark, docs, bigram_store).collect(),
        )
    )
    batch = sorted(map(tuple, CO.kneser_ney_doc_scores(docs).collect()))
    assert inc == batch and len(inc) == 3
