"""Streaming ANN serving (streaming/ann_stream.py): micro-batched
query drops searched against a persistent IvfIndex must produce
exactly the batch search's results, accumulated across batches."""

import os

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.ann_index import IvfIndex
from updater_spark.streaming.ann_stream import run_ann_search_stream


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(200, 16).astype(np.float64)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in vecs[i]])
        for i in range(200)
    ]
    return spark.createDataFrame(rows), vecs


def test_stream_matches_batch_search(spark, corpus, tmp_store, tmp_path):
    df, vecs = corpus
    cents = [[float(x) for x in vecs[i]] for i in range(0, 64, 4)]
    idx = IvfIndex(tmp_store, "served")
    idx.bootstrap(df, cents)

    src = str(tmp_path / "qdrops")
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    q1 = df.filter("vec_id % 20 = 0")
    q2 = df.filter("vec_id % 20 = 7")
    q1.coalesce(1).write.mode("append").parquet(src)
    q2.coalesce(1).write.mode("append").parquet(src)

    sq = run_ann_search_stream(
        spark,
        src,
        "vec_id long, embedding array<double>",
        idx,
        out,
        ckpt,
        k=3,
        nprobe=4,
    )
    sq.awaitTermination(300)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    want = sorted(
        tuple(r)
        for r in idx.search(q1.unionByName(q2), k=3, nprobe=4).collect()
    )
    assert got == want and len(got) > 0

    # restart with a NEW drop: only the unconsumed file is searched
    # (checkpointed source offsets), results accumulate
    q3 = df.filter("vec_id % 20 = 13")
    q3.coalesce(1).write.mode("append").parquet(src)
    sq = run_ann_search_stream(
        spark,
        src,
        "vec_id long, embedding array<double>",
        idx,
        out,
        ckpt,
        k=3,
        nprobe=4,
    )
    sq.awaitTermination(300)
    got2 = sorted(
        tuple(r)
        for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    want2 = sorted(
        want
        + [tuple(r) for r in idx.search(q3, k=3, nprobe=4).collect()]
    )
    assert got2 == want2
    assert os.path.exists(ckpt)


def test_replayed_batch_is_idempotent(spark, corpus, tmp_store, tmp_path):
    """foreachBatch is at-least-once: simulate a replay of an already-
    written batch (same batch_id, e.g. after a crash between the sink
    write and the checkpoint commit) and assert the partitioned
    dynamic-overwrite sink leaves NO duplicate rows — the sink-side
    idempotence that upgrades the pipeline to exactly-once output."""
    df, vecs = corpus
    cents = [[float(x) for x in vecs[i]] for i in range(0, 64, 4)]
    idx = IvfIndex(tmp_store, "replayed")
    idx.bootstrap(df, cents)

    src = str(tmp_path / "qdrops")
    out = str(tmp_path / "results")
    q1 = df.filter("vec_id % 20 = 3")
    q1.coalesce(1).write.mode("append").parquet(src)
    sq = run_ann_search_stream(
        spark,
        src,
        "vec_id long, embedding array<double>",
        idx,
        out,
        str(tmp_path / "ckpt"),
        k=3,
        nprobe=4,
    )
    sq.awaitTermination(300)
    once = sorted(
        tuple(r)
        for r in spark.read.parquet(out).drop("batch_id").collect()
    )

    # replay batch 0 by hand: a fresh checkpoint re-delivers the same
    # file as batch_id=0 against the SAME sink directory
    sq = run_ann_search_stream(
        spark,
        src,
        "vec_id long, embedding array<double>",
        idx,
        out,
        str(tmp_path / "ckpt2"),
        k=3,
        nprobe=4,
    )
    sq.awaitTermination(300)
    twice = sorted(
        tuple(r)
        for r in spark.read.parquet(out).drop("batch_id").collect()
    )
    assert twice == once and len(once) > 0
