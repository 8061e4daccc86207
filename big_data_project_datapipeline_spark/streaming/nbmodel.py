"""Incremental Naive Bayes model maintenance across cron ticks.

The batch NB fit (functions/corpus.nb_fit, q216) rescans every document
per run. Both halves of the model state are SUMS — per-class doc counts
and per-(class, token) occurrence counts are additive over any
partition of the corpus — so each tick folds only the NEW batch's
counts into two persistent stores (the crash-safe batch-keyed
delta/ledger machinery), and a model folded batch-by-batch is
BIT-equal to `nb_fit` on the union of all folded batches. The decode
(`nb_model_confusion`) runs the SAME argmax tail
(functions/corpus.nb_confusion_from_model) against the folded model —
classifying any document frame with zero training-corpus rescans, the
production "model store" shape (a classifier whose training set only
ever grows never refits from scratch).

Scale shape per tick: one explode + two map-side-combinable groupBys
over the new batch, two sum-merges of vocab-bounded frames. History is
never rescanned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_datapipeline_spark.functions.corpus import (
    nb_confusion_from_model,
    nb_doc_tokens,
    nb_fit,
)
from big_data_project_datapipeline_spark.streaming.corpus import (
    _fold_pending_deltas,
)

CLASS_SCHEMA = T.StructType(
    [
        T.StructField("__c", T.StringType()),
        T.StructField("__ndocs", T.LongType()),
    ]
)
TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("__c", T.StringType()),
        T.StructField("__t", T.StringType()),
        T.StructField("__cnt", T.LongType()),
    ]
)


def _merge_classes(prev: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        prev.unionByName(delta)
        .groupBy("__c")
        .agg(F.sum("__ndocs").cast("long").alias("__ndocs"))
    )


def _merge_tokens(prev: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        prev.unionByName(delta)
        .groupBy("__c", "__t")
        .agg(F.sum("__cnt").cast("long").alias("__cnt"))
    )


def maintain_nb_model(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    batch_id: str,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> None:
    """One cron tick: fit the NEW batch's class/token counts (the
    batch fit's own code path), land them under batch-keyed delta
    subdirs of the two sub-stores, and sum-fold all pending deltas.
    Replay overwrites its deltas; each sub-store's ledger prevents
    double-counting."""
    classes, tc = nb_fit(batch_df, text_col, label_col, id_col)
    cls_store = os.path.join(store_dir, "classes")
    tok_store = os.path.join(store_dir, "tokens")
    classes.select(
        F.col("__c").cast("string"), F.col("__ndocs").cast("long")
    ).write.mode("overwrite").parquet(
        os.path.join(cls_store, "deltas", str(batch_id))
    )
    tc.select(
        F.col("__c").cast("string"),
        F.col("__t").cast("string"),
        F.col("__cnt").cast("long"),
    ).write.mode("overwrite").parquet(
        os.path.join(tok_store, "deltas", str(batch_id))
    )
    _fold_pending_deltas(spark, cls_store, CLASS_SCHEMA, _merge_classes)
    _fold_pending_deltas(spark, tok_store, TOKEN_SCHEMA, _merge_tokens)


def nb_model(spark: SparkSession, store_dir: str):
    """The folded (classes, tc) model frames — bit-equal to
    `nb_fit` on the union of all folded batches."""
    classes = spark.read.schema(CLASS_SCHEMA).parquet(
        os.path.join(store_dir, "classes", "counts")
    )
    tc = spark.read.schema(TOKEN_SCHEMA).parquet(
        os.path.join(store_dir, "tokens", "counts")
    )
    return classes, tc


def nb_model_confusion(
    spark: SparkSession,
    store_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Classify ``docs`` against the FOLDED model — the same argmax
    tail as the batch operator, so decoding the union of all folded
    batches reproduces `naive_bayes_confusion` on that union
    bit-for-bit, with zero training rescans."""
    classes, tc = nb_model(spark, store_dir)
    dt = nb_doc_tokens(docs, text_col, label_col, id_col)
    return nb_confusion_from_model(dt, classes, tc, alpha=alpha).select(
        F.col("__y").alias(label_col), "predicted", "n_docs"
    )


def stream_nb_model_monitor(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    query_name: str = "engine_stream_nbmodel",
    schema=None,
):
    """Structured-Streaming front end: an availableNow drain over a
    landed documents directory — every parquet file not yet seen by
    the checkpoint flows through one maintain_nb_model tick (keyed by
    the streaming batch id). The (checkpoint_dir, store_dir) pair is
    ONE unit of state."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: maintain_nb_model(
                batch_df.sparkSession,
                batch_df,
                store_dir,
                f"b{batch_id}",
                text_col=text_col,
                label_col=label_col,
                id_col=id_col,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
