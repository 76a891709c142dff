"""applyInPandasWithState first-seen dedup: state persists across
micro-batches (two AvailableNow runs over a growing file source)."""

import os

from pyspark.sql import Row

from updater_spark.streaming.dedup_stream import streaming_first_seen


def _run(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    def sink(batch_df, epoch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        streaming_first_seen(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if not os.path.exists(out_dir):
        return set()
    return {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}


def test_first_seen_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        Row(doc_id=1, text="alpha beta"),
        Row(doc_id=2, text="gamma delta"),
        Row(doc_id=3, text="alpha beta"),  # same-batch dup of 1
    ]
    spark.createDataFrame(batch1).coalesce(1).write.mode("append").parquet(src)
    out1 = str(tmp_path / "out1")
    assert _run(spark, src, ckpt, out1) == {1, 2}  # 3 suppressed

    batch2 = [
        Row(doc_id=4, text="alpha beta"),  # cross-batch dup → suppressed
        Row(doc_id=5, text="epsilon zeta"),  # new → admitted
    ]
    spark.createDataFrame(batch2).coalesce(1).write.mode("append").parquet(src)
    out2 = str(tmp_path / "out2")
    # state remembered 'alpha beta' from batch 1 via the checkpoint
    assert _run(spark, src, ckpt, out2) == {5}
