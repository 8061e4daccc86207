"""Incremental MinHash-LSH near-dup maintenance across cron ticks.

At 100 TB you cannot re-run corpus-wide near-dup detection
(`functions/dedup.minhash_dedup_decision`, q21/q51's input) on every
arrival — production pipelines dedup each incoming BATCH against a
persisted band-bucket signature index, then feed the new duplicate
links into incremental connected components (`streaming/graph`) so the
cluster partition stays current. This module is that pattern on
Spark's runtime, bit-reproducing the batch decision on the union:

- semantics: EXACTLY ``minhash_dedup_decision`` over all docs seen.
  The decision's candidate-ancestor device is a per-bucket MIN over
  doc ids — a decomposable aggregate — and when doc ids are assigned
  in ARRIVAL ORDER (the ``streaming/dedup`` convention) a later batch
  can only add LARGER ids, so existing buckets' minima never change:
  every already-emitted decision stays valid verbatim, and a new
  doc's ancestor is the min over its buckets' stored minima folded
  with the batch's own contributions. Stream ≡ batch equality on any
  tick prefix is pinned in the tests. (Without arrival-ordered ids
  the batch decision is still a valid dedup — smaller-id ancestors
  exist — but it is no longer bit-identical to a monolithic re-run.)
- state, per batch-id subdir (the ``streaming/dedup`` exactly-once
  story — a crashed-and-replayed batch overwrites its OWN subdirs and
  folds only shards with a SMALLER batch id):
  * ``buckets_<id>``: the batch's (band, band_key, bucket_min, cnt)
    contributions — O(new buckets) rows; the candidate step folds the
    MINs, the q197-twin index-health report folds the SUMs (both
    decomposable, one map-side-combinable groupBy each).
  * ``toks_<id>``: (doc_id, tokset) 60-bit token-hash sets — the
    verify join's right side (an old ancestor's token set must be
    readable without re-reading its text). This is the corpus-sized
    state; lay it out bucketed on doc_id (`sinks.write_bucketed`)
    and compact periodically at deployment scale.
  * ``decisions_<id>``: the batch's (doc_id, dup_of, jaccard,
    is_kept) rows — append-only because old decisions never change.
- cluster maintenance: the batch's verified (dup_of → doc_id) links
  feed ``streaming/graph.apply_cc_batch`` — the folded label table is
  the live near-dup cluster partition (equal to batch
  ``resolve_dup_clusters`` on the union's decision forest, restricted
  to non-singleton docs).
- scale, per tick: one map-only signature pass over the BATCH, one
  O(batch bands) groupBy, one join against the O(buckets) folded
  index, ≤ |batch| verify pairs, one CC tick over O(prev nodes +
  batch links) — never the doc history. The banding expression
  mirrors ``functions/dedup._verified_ancestors`` exactly (including
  its deliberate non-filtering of all-NULL signatures) so the folded
  decisions stay bit-identical to the batch operator.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from big_data_project_datapipeline_spark.functions.dedup import (
    banded_rows,
    minhash_signatures,
    token_hash_set,
)
from big_data_project_datapipeline_spark.streaming.graph import (
    apply_cc_batch,
)


def _load_shards(
    spark: SparkSession,
    state_dir: str,
    prefix: str,
    schema: str,
    exclude_batch_id: int | None,
) -> DataFrame:
    """Union of the ``<prefix>_<id>`` subdirs with id < exclude (all
    of them when None); typed empty frame on bootstrap. Shard names
    parse individually (a stray ``buckets_old`` entry is skipped, not
    allowed to discard real shards — the ADVICE-r7 labels fix)."""
    try:
        entries = os.listdir(state_dir)
    except FileNotFoundError:
        entries = []
    ids: list[int] = []
    for d in entries:
        if not d.startswith(f"{prefix}_"):
            continue
        try:
            ids.append(int(d.rsplit("_", 1)[1]))
        except ValueError:
            continue
    if exclude_batch_id is not None:
        ids = [i for i in ids if i < exclude_batch_id]
    if not ids:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(state_dir, f"{prefix}_{i}") for i in sorted(ids)]
    try:
        return spark.read.parquet(*paths)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def load_bucket_index(
    spark: SparkSession,
    state_dir: str,
    exclude_batch_id: int | None = None,
) -> DataFrame:
    """Folded (band, band_key, bucket_min) index over the prior
    shards — the global per-bucket id minimum (each shard already
    carries its batch's min, and MIN folds associatively)."""
    raw = _load_shards(
        spark,
        state_dir,
        "buckets",
        "band int, band_key string, bucket_min long, cnt long",
        exclude_batch_id,
    )
    return raw.groupBy("band", "band_key").agg(
        F.min("bucket_min").alias("bucket_min")
    )


def load_tokset_store(
    spark: SparkSession,
    state_dir: str,
    exclude_batch_id: int | None = None,
) -> DataFrame:
    return _load_shards(
        spark,
        state_dir,
        "toks",
        "doc_id long, tokset array<bigint>",
        exclude_batch_id,
    )


def load_decisions(spark: SparkSession, state_dir: str) -> DataFrame:
    """All decisions so far — bit-equal to
    ``minhash_dedup_decision`` over every doc seen (arrival-ordered
    ids; same num_hashes/band_size/threshold every tick)."""
    return _load_shards(
        spark,
        state_dir,
        "decisions",
        "doc_id long, dup_of long, jaccard double, is_kept int",
        None,
    )


def apply_neardup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    labels_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 8,
    threshold: float = 0.8,
) -> None:
    """One incremental near-dup tick: decide the batch's docs against
    the folded bucket index + the batch's own buckets, land the
    decisions/tokset/bucket shards, and (optionally) feed the new
    duplicate links into the incremental CC label store. Also
    callable directly on a batch frame (the stream ≡ batch
    equivalence the tests pin).

    The (num_hashes, band_size, threshold) triple must be constant
    across ticks — it parameterizes the stored index."""
    spark = batch_df.sparkSession
    prev_buckets = load_bucket_index(
        spark, state_dir, exclude_batch_id=batch_id
    )
    prev_toks = load_tokset_store(
        spark, state_dir, exclude_batch_id=batch_id
    )
    sigs = minhash_signatures(batch_df, text_col, id_col, num_hashes)
    # the _verified_ancestors banding expression (shared helper) —
    # including concat_ws's NULL-skipping on empty-token docs
    # (all-NULL signatures share the '' key per band there too)
    banded = banded_rows(sigs, id_col, num_hashes, band_size)
    batch_buckets = banded.groupBy("band", "band_key").agg(
        F.min(id_col).alias("bucket_min"),
        F.count(F.lit(1)).alias("cnt"),
    )
    all_buckets = (
        prev_buckets.unionByName(
            batch_buckets.select("band", "band_key", "bucket_min")
        )
        .groupBy("band", "band_key")
        .agg(F.min("bucket_min").alias("bucket_min"))
    )
    anc = (
        banded.join(all_buckets, ["band", "band_key"])
        .groupBy(id_col)
        .agg(F.min("bucket_min").alias("candidate_ancestor"))
    )
    cand = anc.filter(F.col("candidate_ancestor") < F.col(id_col)).select(
        F.col("candidate_ancestor").alias("left_id"),
        F.col(id_col).alias("right_id"),
    )
    batch_toks = batch_df.select(
        F.col(id_col), token_hash_set(F.col(text_col)).alias("tokset")
    )
    toks_all = prev_toks.unionByName(
        batch_toks.select(
            F.col(id_col).alias("doc_id"), F.col("tokset")
        )
    )
    # the jaccard_pairs verify expression verbatim (zero-union guard
    # via nullif; old ancestors' sets come from the store — computed
    # by the identical token_hash_set at their own tick)
    verified = (
        cand.join(
            toks_all.select(
                F.col("doc_id").alias("left_id"),
                F.col("tokset").alias("l_toks"),
            ),
            "left_id",
        )
        .join(
            toks_all.select(
                F.col("doc_id").alias("right_id"),
                F.col("tokset").alias("r_toks"),
            ),
            "right_id",
        )
        .select(
            "left_id",
            "right_id",
            F.coalesce(
                F.size(F.array_intersect("l_toks", "r_toks")).cast("double")
                / F.nullif(
                    F.size(F.array_union("l_toks", "r_toks")), F.lit(0)
                ),
                F.lit(0.0),
            ).alias("jaccard"),
        )
    )
    # the minhash_dedup_decision tail verbatim
    decisions = (
        batch_df.select(id_col)
        .join(
            verified.select(
                F.col("right_id").alias(id_col),
                F.col("left_id").alias("_anc"),
                "jaccard",
            ),
            on=id_col,
            how="left",
        )
        .select(
            id_col,
            F.when(F.col("jaccard") >= threshold, F.col("_anc")).alias(
                "dup_of"
            ),
            F.round("jaccard", 6).alias("jaccard"),
            F.when(F.col("jaccard") >= threshold, F.lit(0))
            .otherwise(F.lit(1))
            .alias("is_kept"),
        )
    )
    # decisions feeds two writes + the CC tick; the signature pass and
    # index join — the tick's expensive stages — must run once
    decisions = decisions.persist()
    try:
        # shards store the CANONICAL column names the loaders declare
        # (a custom id_col would otherwise poison the bootstrap-schema
        # union on the next tick)
        decisions.select(
            F.col(id_col).alias("doc_id"), "dup_of", "jaccard", "is_kept"
        ).write.mode("overwrite").parquet(
            f"{state_dir}/decisions_{batch_id}"
        )
        batch_toks.select(
            F.col(id_col).alias("doc_id"), "tokset"
        ).write.mode("overwrite").parquet(
            f"{state_dir}/toks_{batch_id}"
        )
        batch_buckets.write.mode("overwrite").parquet(
            f"{state_dir}/buckets_{batch_id}"
        )
        if labels_dir is not None:
            links = decisions.filter(F.col("dup_of").isNotNull()).select(
                F.col("dup_of").alias("src"), F.col(id_col).alias("dst")
            )
            apply_cc_batch(links, batch_id, labels_dir)
    finally:
        decisions.unpersist()


def stream_neardup_index(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    labels_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 8,
    threshold: float = 0.8,
    query_name: str = "engine_stream_neardup",
) -> StreamingQuery:
    """availableNow drain: every docs parquet file not yet seen by the
    checkpoint flows through one incremental near-dup tick. The
    (checkpoint_dir, state_dir, labels_dir) triple is ONE unit of
    state — batch ids are unique per checkpoint; recover by reusing
    the checkpoint, never by replacing it."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: apply_neardup_batch(
                batch_df,
                batch_id,
                state_dir,
                labels_dir,
                text_col,
                id_col,
                num_hashes,
                band_size,
                threshold,
            )
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def neardup_bucket_stats(spark: SparkSession, state_dir: str) -> DataFrame:
    """q197's LSH index-health report served FROM the folded store
    (the kmv_report pattern — one store, all reads): per-bucket sizes
    are the SUM of the per-batch ``cnt`` contributions (counts
    decompose exactly), so the result equals the batch
    ``q197_lsh_bucket_stats`` shape over every doc seen, with no
    signature recompute. Returns (band, bucket_size, n_buckets,
    candidate_pairs)."""
    raw = _load_shards(
        spark,
        state_dir,
        "buckets",
        "band int, band_key string, bucket_min long, cnt long",
        None,
    )
    bs = raw.groupBy("band", "band_key").agg(
        F.sum("cnt").alias("bucket_size")
    )
    return bs.groupBy("band", "bucket_size").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            F.expr("(bucket_size * (bucket_size - 1)) div 2")
        ).alias("candidate_pairs"),
    )


def neardup_cluster_sizes(
    spark: SparkSession, state_dir: str, labels_dir: str
) -> DataFrame:
    """q196's cluster-size histogram served from the folded state:
    linked clusters from the CC label store (every cluster there has
    >= 2 docs — singletons never enter the edge stream), singleton
    count = docs seen (decision store) minus labeled docs. Equals the
    batch histogram over `resolve_dup_clusters` of the union's
    decision forest. Returns (cluster_size, n_clusters)."""
    from big_data_project_datapipeline_spark.streaming.graph import (
        load_labels,
    )

    labels = load_labels(spark, labels_dir)
    linked = labels.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = linked.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
    n_docs = load_decisions(spark, state_dir).count()
    n_linked = labels.count()
    singletons = spark.createDataFrame(
        [(1, n_docs - n_linked)], "cluster_size long, n_clusters long"
    )
    return hist.unionByName(singletons).filter(F.col("n_clusters") > 0)
