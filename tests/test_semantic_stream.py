"""Streaming semantic first-seen (semantic_stream.py): per-cell
state persists across micro-batches and restarts; the output is
micro-batch-slicing-invariant and equals the batch ground truth
``dup_of(v) = min {u < v : cell(u) = cell(v), round(cos, d) >= t}``.
"""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.streaming.semantic_stream import run_semantic_stream

CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
SCHEMA = "vec_id long, embedding array<double>"


def _vecs():
    # cell 0: 1 ~ 2 (twin), 3 isolated; 5 later twin of 1
    # cell 1: 10 ~ 11 (twin), 12 isolated
    return [
        Row(vec_id=1, embedding=[1.0, 0.01, 0.0, 0.0]),
        Row(vec_id=2, embedding=[1.0, 0.011, 0.0, 0.0]),
        Row(vec_id=3, embedding=[0.5, -1.0, 0.0, 0.0]),
        Row(vec_id=10, embedding=[0.0, 0.0, 0.02, 1.0]),
        Row(vec_id=11, embedding=[0.0, 0.0, 0.021, 1.0]),
        Row(vec_id=12, embedding=[0.0, 1.0, 0.0, 0.9]),
        Row(vec_id=5, embedding=[1.0, 0.012, 0.0, 0.0]),
    ]


def _oneshot_expected(spark, rows):
    """Batch ground truth via plain DataFrame ops (the oracle shape:
    a self-join on earlier ids in the same cell)."""
    from updater_spark.operators.similarity import (
        as_double,
        dot,
        ivf_assign,
        unit,
    )
    import math

    cents = []
    for c in CENTS:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        cents.append([x / n for x in c])
    df = spark.createDataFrame(rows, SCHEMA)
    u = df.select(
        "vec_id", unit(as_double(F.col("embedding"))).alias("u")
    )
    a = ivf_assign(u, cents, id_col="vec_id", vec_col="u", out_col="cell")
    e = a.select(
        F.col("vec_id").alias("eid"),
        F.col("u").alias("eu"),
        F.col("cell").alias("ecell"),
    )
    sim = F.round(dot(F.col("u"), F.col("eu")), 4)
    dup = (
        a.join(e, (F.col("ecell") == F.col("cell")) & (F.col("eid") < F.col("vec_id")))
        .filter(sim >= 0.9)
        .groupBy("vec_id")
        .agg(F.min("eid").alias("dup_of"))
    )
    out = a.join(dup, "vec_id", "left").select(
        "vec_id",
        "cell",
        "dup_of",
        F.col("dup_of").isNull().alias("is_new"),
    )
    return sorted(tuple(r) for r in out.collect())


def _drain(spark, src, ckpt, out):
    q = run_semantic_stream(
        spark, src, SCHEMA, CENTS, out, ckpt, threshold=0.9
    )
    q.awaitTermination(180)
    if not os.path.exists(out):
        return []
    return sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )


def test_matches_batch_truth_and_slicing_invariant(spark, tmp_path):
    rows = _vecs()
    want = _oneshot_expected(spark, rows)

    # slicing A: ids 1-3 | 10-12 | 5  (id order across drops)
    src = str(tmp_path / "a_src")
    for i, sl in enumerate((rows[0:3], rows[3:6], rows[6:])):
        spark.createDataFrame(sl, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    got = _drain(
        spark, src, str(tmp_path / "a_ck"), str(tmp_path / "a_out")
    )
    assert got == want
    # the late twin 5 was caught against state from an earlier batch
    assert any(r[0] == 5 and r[2] == 1 and not r[3] for r in got)

    # slicing B: everything in ONE drop — identical output
    src_b = str(tmp_path / "b_src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src_b)
    got_b = _drain(
        spark, src_b, str(tmp_path / "b_ck"), str(tmp_path / "b_out")
    )
    assert got_b == want


def _drain_foreach(spark, src, ckpt, out_dir):
    """Per-run collection sink: the parquet file sink won't replay
    already-committed batches into a NEW directory under the same
    checkpoint, so restart assertions use foreachBatch appends (the
    dedup_stream test pattern)."""
    from updater_spark.streaming.semantic_stream import semantic_first_seen

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(batch_df, epoch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        semantic_first_seen(stream, CENTS, threshold=0.9)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if not os.path.exists(out_dir):
        return []
    return sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())


def test_state_survives_restart(spark, tmp_path):
    """A second AvailableNow run over NEW drops resumes from the
    checkpointed per-cell state — earlier vectors still suppress."""
    rows = _vecs()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame(rows[:6], SCHEMA).coalesce(1).write.parquet(src)
    out1 = str(tmp_path / "o1")
    _drain_foreach(spark, src, ckpt, out1)

    # new drop: twin of 1 (id 5) plus a fresh isolated vector
    late = [
        Row(vec_id=5, embedding=[1.0, 0.012, 0.0, 0.0]),
        Row(vec_id=20, embedding=[-1.0, 0.5, 0.0, 0.0]),
    ]
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = str(tmp_path / "o2")
    got2 = {
        r[0]: (r[2], r[3]) for r in _drain_foreach(spark, src, ckpt, out2)
    }
    assert set(got2) == {5, 20}  # only the new drop re-emits
    assert got2[5] == (1, False)  # suppressed by restored state
    assert got2[20][1] is True
