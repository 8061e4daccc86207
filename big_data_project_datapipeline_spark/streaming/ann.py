"""Incremental ANN index maintenance across cron ticks.

The IVF-PQ split (functions/similarity.ivfpq_train / ivfpq_encode /
ivfpq_search) makes index maintenance a streaming-shaped problem: the
MODEL is trained once on the first drop and frozen (retraining would
silently re-code the whole history — FAISS's own add-with-ids posture),
while the INDEX grows by one map-only encode pass per arriving batch.

State layout mirrors streaming/dedup.py's per-batch shard device: each
batch encodes into ``codes_<batch_id>/`` with overwrite semantics, so a
crashed-and-replayed tick rewrites its own shard instead of appending
duplicates — exactly-once without reading-while-appending a directory.
Searches read the union of shards (one `spark.read.parquet` over the
store) against the frozen JSON model.

Scale: per tick the work is one bounded-sample train (first tick only)
plus a map-only encode of the NEW batch; the store is m bytes + a list
id per vector ever indexed. Compact shards periodically with
sinks.compact_parquet; lay a very large store out partitioned by
list_id so probes prune partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from big_data_project_datapipeline_spark.functions import similarity as SIM

MODEL_FILE = "model.json"


def maintain_ann_index(
    batch: DataFrame,
    store_dir: str,
    batch_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    m: int = 8,
    k_sub: int = 16,
) -> dict:
    """One cron tick: train-and-freeze the model if this is the first
    batch (bounded-sample Lloyd, persisted as JSON), then map-only
    encode the batch into its own ``codes_<batch_id>/`` shard
    (overwrite — replay-idempotent), hive-partitioned by list_id so
    searches prune to the probed lists' files (the layout
    ivfpq_encode's contract prescribes). Returns the model dict."""
    os.makedirs(store_dir, exist_ok=True)
    model_path = os.path.join(store_dir, MODEL_FILE)
    if os.path.exists(model_path):
        model = SIM.load_ivfpq_model(model_path)
    else:
        model = SIM.ivfpq_train(
            batch,
            id_col=id_col,
            vec_col=vec_col,
            n_lists=n_lists,
            m=m,
            k_sub=k_sub,
        )
        SIM.save_ivfpq_model(model, model_path)
    SIM.ivfpq_encode(
        batch, model, id_col=id_col, vec_col=vec_col
    ).write.mode("overwrite").partitionBy("list_id").parquet(
        os.path.join(store_dir, f"codes_{batch_id}")
    )
    return model


def search_ann_index(
    spark: SparkSession,
    store_dir: str,
    queries: DataFrame,
    corpus: DataFrame | None = None,
    k: int = 5,
    n_probe: int = 4,
    refine: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search every shard ever landed against the frozen model. Pass
    ``corpus`` (the raw vectors of everything indexed) to enable the
    exact refine step; pure-ADC (refine=1) needs only the store."""
    model = SIM.load_ivfpq_model(os.path.join(store_dir, MODEL_FILE))
    # per-shard reads + union: each shard is its own hive-partitioned
    # root (list_id=N subdirs), and Spark's multi-root partition
    # discovery rejects mixed structures — reading roots separately
    # keeps list_id a real partition column, so probe filters prune
    # files instead of scanning every shard fully
    shard_paths = sorted(
        os.path.join(store_dir, d)
        for d in os.listdir(store_dir)
        if d.startswith("codes_")
    )
    frames = [spark.read.parquet(p) for p in shard_paths]
    index = frames[0]
    for f in frames[1:]:
        index = index.unionByName(f)
    return SIM.ivfpq_search(
        index,
        model,
        queries,
        k=k,
        n_probe=n_probe,
        refine=refine,
        corpus=corpus,
        id_col=id_col,
        vec_col=vec_col,
    )
