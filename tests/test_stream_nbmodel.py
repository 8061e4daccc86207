"""Incremental NB model store (streaming/nbmodel.py): the folded
class/token counts after N ticks must be BIT-EQUAL to nb_fit on the
union of all folded batches, and the store-served decode must
reproduce the batch confusion matrix on the union — including under
tick replay and a checkpointed availableNow drain."""

from __future__ import annotations

import pytest

from big_data_project_datapipeline_spark.functions.corpus import (
    naive_bayes_confusion,
    nb_fit,
)
from big_data_project_datapipeline_spark.streaming import nbmodel as SN


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "nb_store")


def _model_sets(classes, tc):
    return (
        {(r["__c"], r["__ndocs"]) for r in classes.collect()},
        {(r["__c"], r["__t"], r["__cnt"]) for r in tc.collect()},
    )


def _conf(df):
    return {
        (r["lang"], r["predicted"]): r["n_docs"] for r in df.collect()
    }


def test_two_tick_model_and_decode_equal_batch(spark, store):
    """Tick 2 adds a new class AND reweights existing token counts;
    the folded model must equal the batch fit on the union, and the
    store-served decode of the union must equal the batch confusion
    matrix (same argmax tail, same model — bit-equal scores)."""
    w1 = _docs(spark, [(1, "x x y", "en"), (2, "z z", "de")])
    w2 = _docs(spark, [(3, "x y y", "en"), (4, "w z", "de"), (5, "q q", "fr")])
    SN.maintain_nb_model(spark, w1, store, "t1")
    SN.maintain_nb_model(spark, w2, store, "t2")
    union = w1.unionByName(w2)
    got = _model_sets(*SN.nb_model(spark, store))
    want = _model_sets(*nb_fit(union))
    assert got == want
    assert _conf(SN.nb_model_confusion(spark, store, union)) == _conf(
        naive_bayes_confusion(union)
    )


def test_replayed_tick_is_idempotent(spark, store):
    w = _docs(spark, [(1, "x y", "en"), (2, "z", "de")])
    SN.maintain_nb_model(spark, w, store, "t1")
    once = _model_sets(*SN.nb_model(spark, store))
    SN.maintain_nb_model(spark, w, store, "t1")
    assert _model_sets(*SN.nb_model(spark, store)) == once == _model_sets(
        *nb_fit(w)
    )


def test_structured_stream_drain_matches_batch(spark, store, tmp_path):
    w = _docs(
        spark,
        [(1, "x x", "en"), (2, "x y", "en"), (3, "z w", "de"), (4, "w w", "de")],
    )
    landed = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    w.write.mode("overwrite").parquet(landed)
    q = SN.stream_nb_model_monitor(spark, landed, store, ckpt)
    q.awaitTermination(120)
    assert _model_sets(*SN.nb_model(spark, store)) == _model_sets(*nb_fit(w))
    assert _conf(SN.nb_model_confusion(spark, store, w)) == _conf(
        naive_bayes_confusion(w)
    )
    # second drain with nothing new: no refold
    q2 = SN.stream_nb_model_monitor(spark, landed, store, ckpt)
    q2.awaitTermination(120)
    assert _model_sets(*SN.nb_model(spark, store)) == _model_sets(*nb_fit(w))


def test_bootstrap_empty_store_then_first_tick(spark, store):
    w = _docs(spark, [(1, "x", "en")])
    with pytest.raises(Exception):
        SN.nb_model(spark, store)[0].collect()
    SN.maintain_nb_model(spark, w, store, "t1")
    assert _model_sets(*SN.nb_model(spark, store)) == _model_sets(*nb_fit(w))
