"""Incremental ANN index maintenance (streaming/ann.py): two-wave
index growth must equal a one-shot index built with the same frozen
model, searches must see vectors from every wave, and a replayed batch
must not duplicate index rows."""

from __future__ import annotations

from big_data_project_datapipeline_spark.functions import similarity as SIM
from big_data_project_datapipeline_spark.streaming import ann as SA
from big_data_project_datapipeline_spark.tables import load_table


def _waves(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    return emb, emb.filter("vec_id < 250"), emb.filter("vec_id >= 250")


def test_two_wave_index_equals_oneshot(spark, tmp_path):
    emb, w1, w2 = _waves(spark)
    store = str(tmp_path / "ann")
    model = SA.maintain_ann_index(w1, store, "t1", n_lists=8)
    SA.maintain_ann_index(w2, store, "t2", n_lists=8)
    # maintained index == one-shot encode of the union with the SAME
    # (frozen, first-wave-trained) model; shards are hive-partitioned
    # roots, so read them individually (the search path's convention)
    import os

    shards = [
        spark.read.parquet(os.path.join(store, d))
        for d in sorted(os.listdir(store))
        if d.startswith("codes_")
    ]
    idx = shards[0]
    for s in shards[1:]:
        idx = idx.unionByName(s)
    got = sorted(
        map(
            tuple,
            idx.select(
                "vec_id", idx.list_id.cast("int").alias("list_id"), "codes"
            ).collect(),
        )
    )
    want = sorted(map(tuple, SIM.ivfpq_encode(emb, model).collect()))
    assert got == want
    # search sees BOTH waves
    queries = emb.filter("vec_id IN (0, 400)")
    out = SA.search_ann_index(
        spark, store, queries, corpus=emb, k=5, refine=4
    ).collect()
    assert {r.query_id for r in out} == {0, 400}
    neighbors = {r.neighbor_id for r in out}
    assert any(n < 250 for n in neighbors)
    assert any(n >= 250 for n in neighbors)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    _, w1, _ = _waves(spark)
    store = str(tmp_path / "ann")
    import os

    SA.maintain_ann_index(w1, store, "t1", n_lists=8)

    def store_count():
        n = 0
        for d in os.listdir(store):
            if d.startswith("codes_"):
                n += spark.read.parquet(os.path.join(store, d)).count()
        return n

    n1 = store_count()
    SA.maintain_ann_index(w1, store, "t1", n_lists=8)  # replay
    assert store_count() == n1
