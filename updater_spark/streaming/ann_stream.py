"""Streaming ANN serving: a query-vector stream searched against a
persistent ``IvfIndex`` per micro-batch.

The batch indexes (ann_index.py) cover the MAINTENANCE side of the
ANN lifecycle; this is the SERVING side for workloads where queries
arrive continuously (retrieval-augmented pipelines, online
near-neighbor lookups against a curated corpus): ``readStream`` over
query drops → ``foreachBatch`` → ``IvfIndex.search`` → idempotent
partitioned sink.

Why ``foreachBatch`` and not a stream-stream join: the search is a
bounded-state, stateless-per-batch operation against a STATIC (or
slowly maintained) index — exactly the shape Structured Streaming
documents for reusing batch-only operators inside a stream. Each
micro-batch pays one probe-pruned index read (nprobe/k of the cell
partitions, the ``ivf_topk`` story); no state store, so restarts
replay only unconsumed source files. foreachBatch itself is only
at-least-once (a batch that fails after a partial sink write is
replayed), so the sink writes each batch into its own ``batch_id=N``
partition with dynamic partition overwrite — a replay rewrites
exactly its own partition, making the replayed output idempotent and
the source+sink pair effectively exactly-once FOR A GIVEN CHECKPOINT
(the mitigation the Structured Streaming docs prescribe for
foreachBatch sinks). The guarantee is scoped to batch-id stability:
if the checkpoint itself is lost and recreated against a sink that
already holds a multi-batch history, the restart renumbers batches
(the whole backlog can become one batch 0) and stale higher-numbered
partitions survive the overwrite — recovering from a LOST checkpoint
requires clearing the sink (or a new out_dir), same as every
batch-id-keyed foreachBatch sink.

Scale: per-batch work is O(|batch queries| x probed-cell rows) GEMM
inside the fused bucket engine — the corpus is never shuffled, and
the batch's queries ride the same bounded driver collect as batch
search (``MAX_QUERY_ROWS``). Index maintenance (upserts / retrain)
interleaves between micro-batches under the store's table lock: a
batch searches either the old or the new generation, never a torn
mix, because ``search`` re-reads codebook + cells per batch and the
identity guard rejects skew.

Reference context: the reference engine (/root/reference) has no
streaming or embedding operators; this composes the repo's own
IvfIndex with Structured Streaming's documented foreachBatch
pattern.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def run_ann_search_stream(
    spark,
    source_dir: str,
    source_schema: str,
    index,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    nprobe: int = 4,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Search every arriving query vector against ``index`` (an
    ``IvfIndex``), writing (query_id, neighbor_id, sim, rank) rows
    to ``out_dir`` partitioned by ``batch_id`` — each micro-batch
    overwrites ONLY its own partition (dynamic overwrite), so a
    replayed batch after a partial write leaves no duplicates.
    Readers that want the plain result set ``drop("batch_id")``.
    ``source_schema`` must name the index's ``id_col``/``vec_col``
    columns (e.g. ``"vec_id long, embedding array<double>"``).
    ``trigger_once`` processes the backlog and stops — the probe/test
    mode; pass False for a continuous micro-batch trigger."""
    from pyspark.sql import functions as F

    def search_batch(batch_df, batch_id: int) -> None:
        if not batch_df.isEmpty():
            (
                index.search(batch_df, k=k, nprobe=nprobe)
                .withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )

    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(search_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
