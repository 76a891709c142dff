"""Streaming rolling z-score: in-order drops must EQUAL the batch
operator (the measured ordering contract), state must persist across
micro-batches via the checkpoint, and the buffer must stay trimmed
to the window."""

import datetime as dt
import os

from pyspark.sql import Row

from updater_spark.streaming.anomaly_stream import streaming_zscore


def _mk_rows(series, user=1, day=1):
    return [
        Row(
            event_id=i,
            ts=dt.datetime(2024, 1, day, 0, i),
            user_id=user,
            value=float(v),
        )
        for i, v in enumerate(series)
    ]


def _run(spark, src, ckpt, out_dir, **kw):
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(src)

    def sink(batch_df, epoch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        streaming_zscore(stream, **kw)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if not os.path.exists(out_dir):
        return {}
    return {
        r["event_id"]: r for r in spark.read.parquet(out_dir).collect()
    }


def test_in_order_drops_equal_batch_operator(spark, tmp_path):
    series = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 50.0, 10.1, 9.9, 10.4]
    rows = _mk_rows(series)
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")

    # two event-time-ordered drops, each its own micro-batch
    df = spark.createDataFrame(rows)
    df.filter(df.event_id < 6).coalesce(1).write.mode("append").parquet(src)
    got1 = _run(
        spark, src, ckpt, str(tmp_path / "o1"),
        window=5, min_periods=3, threshold=3.0,
    )
    df.filter(df.event_id >= 6).coalesce(1).write.mode("append").parquet(src)
    got2 = _run(
        spark, src, ckpt, str(tmp_path / "o2"),
        window=5, min_periods=3, threshold=3.0,
    )
    got = {**got1, **got2}
    assert len(got) == len(series)

    from updater_spark.operators.anomaly import rolling_zscore

    want = {
        r["event_id"]: r
        for r in rolling_zscore(
            df, "user_id", "ts", "value", order_cols=["event_id"],
            window=5, min_periods=3, threshold=3.0,
        ).collect()
    }
    for eid, w in want.items():
        g = got[eid]
        for c in ("roll_mean", "roll_std", "zscore"):
            if w[c] is None:
                assert g[c] is None, (eid, c)
            else:
                assert abs(g[c] - w[c]) < 1e-9, (eid, c, g[c], w[c])
        assert g["is_anomaly"] == w["is_anomaly"], eid
    # the planted spike was flagged live, in the SECOND batch,
    # against state carried from the first via the checkpoint
    assert got[6]["is_anomaly"] is True


def test_state_buffer_trimmed_to_window(spark, tmp_path):
    # 50 points, window 4: the baseline for point i uses ONLY the
    # previous 4 — if the buffer grew unbounded the mean would drift
    # toward the global mean of an increasing ramp
    series = [float(i) for i in range(50)]
    rows = _mk_rows(series)
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)
    got = _run(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "o"),
        window=4, min_periods=3, threshold=10.0,
    )
    r = got[49]
    # previous 4 values of the ramp: 45,46,47,48 -> mean 46.5
    assert abs(r["roll_mean"] - 46.5) < 1e-9
    assert r["is_anomaly"] is False


def _run_cusum(spark, src, ckpt, out_dir, mu, sd, **kw):
    from updater_spark.streaming.anomaly_stream import streaming_cusum

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(src)

    def sink(batch_df, epoch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        streaming_cusum(stream, mu, sd, **kw)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if not os.path.exists(out_dir):
        return {}
    return {
        r["event_id"]: r for r in spark.read.parquet(out_dir).collect()
    }


def test_streaming_cusum_matches_recurrence_across_batches(
    spark, tmp_path
):
    mu, sd, k, h = 10.0, 0.5, 0.5, 3.0
    series = [10.0, 10.2, 9.9, 10.1, 10.8, 10.9, 11.0, 10.9, 11.1, 11.0]
    rows = _mk_rows(series)
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(rows)
    df.filter(df.event_id < 5).coalesce(1).write.mode("append").parquet(src)
    got1 = _run_cusum(
        spark, src, ckpt, str(tmp_path / "o1"), mu, sd, slack_k=k, h=h
    )
    df.filter(df.event_id >= 5).coalesce(1).write.mode("append").parquet(src)
    got2 = _run_cusum(
        spark, src, ckpt, str(tmp_path / "o2"), mu, sd, slack_k=k, h=h
    )
    got = {**got1, **got2}
    sp = sn = 0.0
    for i, x in enumerate(series):
        z = (x - mu) / sd
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        g = got[i]
        assert abs(g["cusum_pos"] - sp) < 1e-9, i
        assert abs(g["cusum_neg"] - sn) < 1e-9, i
        assert g["cusum_alarm"] == (sp > h or sn > h), i
    # the sustained +2-sigma shift alarms, in the SECOND batch, off
    # state carried from the first
    alarmed = [i for i in range(len(series)) if got[i]["cusum_alarm"]]
    assert alarmed and min(alarmed) >= 5

    import pytest

    from updater_spark.streaming.anomaly_stream import streaming_cusum

    with pytest.raises(ValueError, match="target_std"):
        streaming_cusum(df, 10.0, 0.0)
