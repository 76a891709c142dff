"""Streaming DSIR scoring (streaming/dsir_stream.py): micro-batched
document drops scored against a persistent DsirIndex must produce
exactly the batch weights, accumulated across batches, idempotently
under replay."""

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.dsir_index import DsirIndex
from updater_spark.streaming.dsir_stream import run_dsir_score_stream


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"tok{i % 11} tok{i % 7} tok{(i * 3) % 11} filler word", "en" if i % 3 else "fr")
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stream_matches_batch_weights(spark, corpus, tmp_store, tmp_path):
    idx = DsirIndex(tmp_store, "m", hash_bits=8)
    idx.bootstrap(corpus, corpus.filter(F.col("lang") == "en"))

    src = str(tmp_path / "drops")
    out = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    d1 = corpus.filter("doc_id % 10 = 0").select("doc_id", "text")
    d2 = corpus.filter("doc_id % 10 = 3").select("doc_id", "text")
    d1.coalesce(1).write.mode("append").parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)

    sq = run_dsir_score_stream(
        spark, src, "doc_id long, text string", idx, out, ckpt
    )
    sq.awaitTermination(300)

    got = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    want = sorted(
        tuple(r) for r in idx.weights(d1.unionByName(d2)).collect()
    )
    assert got == want

    # replay with the same checkpoint: availableNow finds nothing new,
    # the sink is unchanged (idempotence of the batch_id partitions)
    sq2 = run_dsir_score_stream(
        spark, src, "doc_id long, text string", idx, out, ckpt
    )
    sq2.awaitTermination(300)
    again = sorted(
        tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    assert again == got
