"""Incremental connected components across cron ticks.

At 100 TB you cannot re-run graph-wide CC (q187) over the full edge
history on every arrival. The union-find merge property makes the
incremental tick cheap: a component partition is fully encoded by its
label assignment, so CC(star(old labels) ∪ new edges) equals CC(every
edge ever seen) — each old component collapses to a star around its
min-id root, new edges merge stars, and the min label of a merged
component is the min over its parts. Per-tick cost is therefore
O(previous nodes + batch edges), never O(edge history).

State layout follows streaming/dedup.py's exactly-once story with one
twist: labels are a REPLACED-not-appended state (a new edge can merge
two old components and relabel old nodes), so each tick writes the
FULL label table to its own ``labels_<batch_id>`` subdir and a reader
takes the LATEST shard. A crashed-and-replayed batch reads the latest
shard with id < its own (never the half-written output of the crashed
attempt) and overwrites its own subdir — replay-idempotent. Old shards
double as free time-travel; compact with :func:`compact_label_ledger`
(keeps the newest TWO — the newest batch can replay and must find its
predecessor).

Semantics match operators/graph.connected_components: nodes are
DEFINED by the (NULL-free, self-loop-free) edges seen so far; the
component label is the smallest node id in the component. Stream ≡
batch equality on any prefix of ticks is pinned in the tests.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from big_data_project_datapipeline_spark.operators.graph import (
    connected_components,
)


def load_labels(
    spark: SparkSession,
    labels_dir: str,
    exclude_batch_id: int | None = None,
) -> DataFrame:
    """Latest full label table (node, comp); empty frame on bootstrap.

    ``exclude_batch_id`` restricts to shards with a SMALLER batch id —
    a replayed batch must merge against the pre-batch state, not the
    shard its crashed attempt wrote. Local-FS listing; an object-store
    deployment swaps in the FileSystem API.

    Robustness (ADVICE r7): stray entries that merely LOOK like shards
    (``labels_old``, editor droppings) are skipped individually — one
    unparseable name must not discard every real shard id and silently
    reset accumulated component labels to bootstrap. Likewise an
    unreadable NEWEST shard (half-deleted dir, missing footer) falls
    back to the next-newest readable shard rather than to empty state:
    stale-but-consistent labels merge correctly on the next tick,
    while an empty frame would forget every past component."""
    import os

    try:
        entries = os.listdir(labels_dir)
    except FileNotFoundError:
        entries = []
    ids: list[int] = []
    for d in entries:
        if not d.startswith("labels_"):
            continue
        try:
            ids.append(int(d.split("_", 1)[1]))
        except ValueError:
            continue  # stray non-shard entry: skip it, keep the rest
    ids.sort()
    if exclude_batch_id is not None:
        ids = [i for i in ids if i < exclude_batch_id]
    for i in reversed(ids):
        try:
            return spark.read.parquet(
                os.path.join(labels_dir, f"labels_{i}")
            ).select("node", "comp")
        except AnalysisException:
            continue  # unreadable shard: fall back to next-newest
    return spark.createDataFrame([], "node long, comp long")


def apply_cc_batch(
    batch_df: DataFrame,
    batch_id: int,
    labels_dir: str,
    src: str = "src",
    dst: str = "dst",
) -> None:
    """One incremental CC tick: merge the batch's edges into the
    stored partition and land the updated full label table. Also
    callable directly on a batch frame (the stream ≡ batch
    equivalence the tests pin)."""
    spark = batch_df.sparkSession
    prev = load_labels(spark, labels_dir, exclude_batch_id=batch_id)
    clean = (
        batch_df.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
    )
    # each old component rides in as a star around its root; the root
    # self-edge (node == comp) is a self-loop CC drops, so singleton
    # survival is restored by the node-completion join below
    star = prev.select(F.col("node").alias("u"), F.col("comp").alias("v"))
    merged = connected_components(
        clean.unionByName(star), src="u", dst="v"
    )
    nodes = (
        prev.select("node")
        .unionByName(clean.select(F.col("u").alias("node")))
        .unionByName(clean.select(F.col("v").alias("node")))
        .distinct()
    )
    labels = nodes.join(merged, "node", "left").select(
        "node",
        F.coalesce(F.col("component"), F.col("node")).alias("comp"),
    )
    labels.write.mode("overwrite").parquet(
        f"{labels_dir}/labels_{batch_id}"
    )


def stream_connected_components(
    spark: SparkSession,
    edges_dir: str,
    labels_dir: str,
    checkpoint_dir: str,
    src: str = "src",
    dst: str = "dst",
    query_name: str = "engine_stream_cc",
) -> StreamingQuery:
    """availableNow drain: every edges parquet file not yet seen by
    the checkpoint flows through one incremental CC tick. The
    (checkpoint_dir, labels_dir) pair is ONE unit of state — batch ids
    are unique per checkpoint; recover by reusing the checkpoint."""
    schema = spark.read.parquet(edges_dir).schema
    stream = spark.readStream.schema(schema).parquet(edges_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: apply_cc_batch(
                batch_df, batch_id, labels_dir, src, dst
            )
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_label_ledger(labels_dir: str, keep_latest: int = 2) -> int:
    """The documented ledger compaction, as code (VERDICT r9 item 8):
    delete every ``labels_<id>`` shard except the ``keep_latest``
    newest. Labels are a REPLACED state — only the newest shard is
    ever read — so old shards are pure time-travel history.

    ``keep_latest`` defaults to 2, NOT 1: the latest batch can replay
    after a crash between its shard write and its checkpoint commit,
    and a replayed batch reads the latest shard with a SMALLER id —
    keeping only the newest shard would send that replay to bootstrap
    and silently forget every accumulated component. Stray
    non-shard entries are ignored (the load_labels contract).
    Returns the number of shards deleted."""
    import os
    import shutil

    if keep_latest < 2:
        raise ValueError(
            "keep_latest must be >= 2: the newest shard's batch can "
            "replay and must find its predecessor"
        )
    try:
        entries = os.listdir(labels_dir)
    except FileNotFoundError:
        return 0
    shards = []
    for d in entries:
        if d.startswith("labels_"):
            tail = d[len("labels_"):]
            if tail.isdigit():
                shards.append((int(tail), d))
    shards.sort()
    doomed = shards[:-keep_latest] if len(shards) > keep_latest else []
    for _, d in doomed:
        shutil.rmtree(os.path.join(labels_dir, d), ignore_errors=True)
    return len(doomed)
