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
        # defaults retain every vector
        F.lit(True).alias("retained"),
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


def _run_stream(spark, src, ckpt, out, **kw):
    q = run_semantic_stream(
        spark, src, SCHEMA, CENTS, out, ckpt, threshold=0.9, **kw
    )
    q.awaitTermination(180)
    if not os.path.exists(out):
        return []
    return sorted(tuple(r) for r in spark.read.parquet(out).collect())


def test_max_cell_caps_state_hot_cell(spark, tmp_path):
    """VERDICT r5 #1: a hot cell's retained state is BOUNDED at
    ``max_cell`` across micro-batches — overflow vectors are still
    scored and emitted (retained=False telemetry) but never enter
    state, so a later twin of an overflow vector is NOT suppressed."""
    # all in cell 0, mutually distinct directions within the cell
    hot = [
        Row(vec_id=1, embedding=[1.0, 0.01, 0.0, 0.0]),
        Row(vec_id=2, embedding=[1.0, -0.9, 0.0, 0.0]),
        Row(vec_id=3, embedding=[1.0, 0.9, 0.0, 0.0]),
        Row(vec_id=4, embedding=[1.0, 0.0, 0.9, 0.0]),  # over cap
    ]
    late = [
        # twin of the UNRETAINED 4: must come out is_new
        Row(vec_id=5, embedding=[1.0, 0.0, 0.91, 0.0]),
        # twin of the retained 1: still suppressed by capped state
        Row(vec_id=6, embedding=[1.0, 0.011, 0.0, 0.0]),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(hot, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = {
        r[0]: (r[2], r[3], r[4])
        for r in _run_stream(
            spark,
            src,
            str(tmp_path / "ck"),
            str(tmp_path / "out"),
            max_cell=3,
        )
    }
    assert got[1] == (None, True, True)
    assert got[2] == (None, True, True)
    assert got[3] == (None, True, True)
    # 4 is unique but the cell is full: scored, emitted, NOT retained
    assert got[4] == (None, True, False)
    # 5 is near only the unretained 4 -> state can't suppress it
    assert got[5] == (None, True, False)
    # 6 is near retained 1 -> capped state still suppresses
    assert got[6] == (1, False, False)
    # bounded-state invariant: never more than max_cell retained
    assert sum(1 for v in got.values() if v[2]) == 3


def test_admitted_only_state_grows_with_unique_content(spark, tmp_path):
    """admitted_only: duplicates are not retained, so state grows
    with unique content — and dup_of chains point at the RETAINED
    chain-first (greedy leader clustering): a vector near only an
    unadmitted dup is admitted as new."""
    # angles 0deg, 24deg, 48deg in the (x, y) plane, all cell 0:
    # cos(0,24) ~= 0.913 >= 0.9, cos(24,48) ~= 0.913, cos(0,48) ~= 0.669
    import math as m

    def at(deg):
        r = m.radians(deg)
        return [m.cos(r), m.sin(r) * 0.2, 0.0, 0.0]

    # keep y small so all stay in cell 0 (centroid x-axis); angles
    # scaled: use exact cosines via full 2D rotation instead
    def at2(deg):
        r = m.radians(deg)
        return [m.cos(r), m.sin(r), 0.0, 0.0]

    rows = [
        Row(vec_id=1, embedding=at2(0)),
        Row(vec_id=2, embedding=at2(24)),   # dup of 1, NOT retained
        Row(vec_id=3, embedding=at2(48)),   # near 2 only -> admitted
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    got = {
        r[0]: (r[2], r[3], r[4])
        for r in _run_stream(
            spark,
            src,
            str(tmp_path / "ck"),
            str(tmp_path / "out"),
            admitted_only=True,
        )
    }
    assert got[1] == (None, True, True)
    assert got[2] == (1, False, False)   # dup: emitted, not retained
    assert got[3] == (None, True, True)  # near only the unadmitted 2
    # contrast: default mode marks 3 a dup of 2
    got_full = {
        r[0]: (r[2], r[3])
        for r in _run_stream(
            spark,
            src,
            str(tmp_path / "ck2"),
            str(tmp_path / "out2"),
        )
    }
    assert got_full[3] == (2, False)


def test_ttl_expires_idle_cell_state(spark, tmp_path):
    """ttl_ms: a cell idle past its lease drops state on the next
    micro-batch without data for it — a later twin is admitted
    fresh. Cells that keep receiving data keep their lease."""
    import time as t

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    # drop 1: cell 0 occupant
    spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.01, 0.0, 0.0])], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, ckpt, out, ttl_ms=500)
    t.sleep(2.0)
    # drop 2: cell-1-only data -> the trigger runs, cell 0 has no
    # rows and its lease is long expired -> state removed
    spark.createDataFrame(
        [Row(vec_id=10, embedding=[0.0, 0.0, 0.02, 1.0])], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    # drop 3: twin of 1 -> with cell 0's state gone it's new again
    spark.createDataFrame(
        [Row(vec_id=2, embedding=[1.0, 0.011, 0.0, 0.0])], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    got = {
        r[0]: (r[2], r[3])
        for r in _run_stream(spark, src, ckpt, out, ttl_ms=500)
    }
    assert got[10] == (None, True)
    assert got[2] == (None, True)  # state expired, not suppressed


def test_arrow_assignment_matches_catalyst(spark, tmp_path):
    """assign_arrow=True (the 4k+-cell deploy path, VERDICT r5 #2)
    produces byte-identical output to the Catalyst literal
    assignment on the same drops."""
    rows = _vecs()
    src = str(tmp_path / "src")
    for sl in (rows[0:3], rows[3:6], rows[6:]):
        spark.createDataFrame(sl, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    got_cat = _run_stream(
        spark, src, str(tmp_path / "ck_c"), str(tmp_path / "out_c")
    )
    got_arr = _run_stream(
        spark,
        src,
        str(tmp_path / "ck_a"),
        str(tmp_path / "out_a"),
        assign_arrow=True,
    )
    assert got_cat == got_arr == _oneshot_expected(spark, rows)


def test_arrow_assignment_past_catalyst_cell_ceiling(spark, tmp_path):
    """The Catalyst literal codebook caps at ~1k cells (plan
    construction cost); assign_arrow lifts it (VERDICT r5 #2). Run
    the stream against a 4,000-cell codebook — the 4M batch probe's
    scale — and check assignment + dup flags against a numpy oracle
    computed with the same argmax-first / min-earlier semantics."""
    import numpy as np

    rng = np.random.default_rng(7)
    k, n, dim = 4000, 240, 16
    cents = rng.normal(size=(k, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant twins so dup logic exercises: vector i+n/2 ~ vector i
    half = n // 2
    vecs[half:] = vecs[:half] + rng.normal(scale=1e-3, size=(half, dim))
    vecs[half:] /= np.linalg.norm(vecs[half:], axis=1, keepdims=True)
    ids = np.arange(1, n + 1)

    # numpy oracle
    cell = (vecs @ cents.T).argmax(axis=1)
    sims = np.round(vecs @ vecs.T, 4)
    want = {}
    for j in range(n):
        earlier = [
            int(ids[i])
            for i in range(j)
            if cell[i] == cell[j] and sims[i, j] >= 0.9
        ]
        want[int(ids[j])] = (
            int(cell[j]),
            min(earlier) if earlier else None,
            not earlier,
        )

    rows = [
        Row(vec_id=int(ids[i]), embedding=[float(x) for x in vecs[i]])
        for i in range(n)
    ]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "src")
    # two drops in id order: second half lands on first-half state
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = run_semantic_stream(
        spark,
        src,
        schema,
        [[float(x) for x in c] for c in cents],
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        threshold=0.9,
        assign_arrow=True,
    )
    q.awaitTermination(240)
    got = {
        r["vec_id"]: (r["cell"], r["dup_of"], r["is_new"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == want
    # the twins were caught cross-batch (second drop vs state)
    n_dups = sum(1 for v in got.values() if not v[2])
    assert n_dups >= half * 0.9
