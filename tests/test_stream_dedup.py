"""Incremental substring dedup across cron ticks: drain wave 1, land
more docs, drain wave 2 — the union of per-batch outputs must equal the
corpus-wide q99 dedup on all docs (first-arrival == global keep-first
when ids are assigned in arrival order), and replaying a batch must
overwrite, not duplicate, its output and gram shard."""

from __future__ import annotations

from big_data_project_datapipeline_spark.functions.dedup import (
    exact_substring_dedup,
)
from big_data_project_datapipeline_spark.streaming.dedup import (
    apply_substring_dedup_batch,
    load_gram_index,
    stream_substring_dedup,
)

WAVE1 = [
    (1, "a b c d e f"),      # owns "a b c"
    (2, "q r s t u v"),
]
WAVE2 = [
    (3, "a b c x y z"),      # "a b c" seen in wave 1 -> scrubbed
    (4, "x y z x y z x y"),  # internal repeat, first occurrence kept
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out_rows(spark, out_dir):
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
        for r in spark.read.parquet(f"{out_dir}/docs_*").collect()
    }


def test_incremental_equals_global_dedup(spark, tmp_path):
    docs = str(tmp_path / "docs")
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    w = 3

    _mk(spark, WAVE1).write.mode("append").parquet(docs)
    q = stream_substring_dedup(spark, docs, index, out, cp, window=w)
    q.awaitTermination(120)
    _mk(spark, WAVE2).write.mode("append").parquet(docs)
    q = stream_substring_dedup(spark, docs, index, out, cp, window=w)
    q.awaitTermination(120)

    got = _out_rows(spark, out)
    want = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
        for r in exact_substring_dedup(
            _mk(spark, WAVE1 + WAVE2), window=w
        ).collect()
    }
    assert got == want
    # the index holds every gram ever seen (not only duplicated ones)
    assert load_gram_index(spark, index).count() > 0
    # doc 3's leading span was scrubbed against wave-1 state
    assert got[3][2] == "x y z"


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch may re-run a batch after a crash: the same batch_id
    must overwrite its own subdirs, leaving identical state."""
    index = str(tmp_path / "index")
    out = str(tmp_path / "out")

    apply_substring_dedup_batch(_mk(spark, WAVE1), 0, index, out, window=3)
    first = _out_rows(spark, out)
    n_grams = load_gram_index(spark, index).count()

    apply_substring_dedup_batch(_mk(spark, WAVE1), 0, index, out, window=3)
    assert _out_rows(spark, out) == first
    assert load_gram_index(spark, index).count() == n_grams
