"""Streaming DSIR scoring: an arriving-document stream scored against
a persistent ``DsirIndex`` per micro-batch — the serving side of the
selection model whose maintenance side is ``dsir_incremental``.

The shape real ingestion pipelines want: the bucket model is slowly
maintained state (epoch updates under the store lock, O(|delta|) each,
operators/dsir_index.py); arriving documents get their importance
weight stamped at ingest time, so downstream mixture/selection steps
can filter on it without ever re-scoring the corpus.

Same foreachBatch discipline as the ANN serving stream
(streaming/ann_stream.py, where the idempotence contract is spelled
out): scoring is stateless per batch against stored state, so there is
no state store; each batch writes its own ``batch_id=N`` partition
with dynamic overwrite, making replays idempotent for a given
checkpoint. Per-batch cost is one token scan of the BATCH plus a
B-row broadcast — the corpus and the model never shuffle.

Reference context: the reference engine has no streaming or selection
operators; this composes the repo's own DsirIndex with Structured
Streaming's documented foreachBatch pattern.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def run_dsir_score_stream(
    spark,
    source_dir: str,
    source_schema: str,
    index,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stamp every arriving document with its DSIR log importance
    weight under ``index`` (a ``DsirIndex``), writing (id, n_feats,
    log_weight) rows to ``out_dir`` partitioned by ``batch_id``.
    ``source_schema`` must name ``id_col``/``text_col``.
    ``trigger_once`` drains the backlog and stops (probe/test mode);
    pass False for a continuous micro-batch trigger."""
    from pyspark.sql import functions as F

    def score_batch(batch_df, batch_id: int) -> None:
        if not batch_df.isEmpty():
            (
                index.weights(batch_df, id_col=id_col, text_col=text_col)
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
    writer = stream.writeStream.foreachBatch(score_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
