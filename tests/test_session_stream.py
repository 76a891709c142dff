"""Streaming session windows: stream == batch parity across drops
and restarts, the >= gap boundary convention, merge-across-batches,
and the closed-sessions-only append contract."""

import os
from datetime import datetime, timedelta

from pyspark.sql import Row

from updater_spark.streaming.session_stream import (
    run_session_stream,
    session_aggregate,
)

T0 = datetime(2024, 3, 1, 9, 0, 0)
GAP_MIN = 30


def _ev(eid, uid, minutes, value=1.0):
    return Row(
        event_id=eid, user_id=uid, ts=T0 + timedelta(minutes=minutes),
        value=value,
    )


EVENTS = [
    _ev(1, 7, 0), _ev(2, 7, 10), _ev(3, 7, 29),   # session A (merges)
    _ev(4, 7, 59),                                 # exactly +30 → MERGES
    _ev(5, 7, 95),                                 # +36 → NEW session
    _ev(6, 9, 5), _ev(7, 9, 200),                  # two singleton sessions
]
FLUSH = [_ev(99, -1, 10_000)]


def _batch(spark, rows):
    return {
        tuple(r)
        for r in session_aggregate(
            spark.createDataFrame(rows), GAP_MIN
        ).collect()
    }


def _drain(spark, tmp, slices, tag):
    schema = spark.createDataFrame(EVENTS).schema
    src = os.path.join(tmp, f"src{tag}")
    for rows in slices:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = run_session_stream(
        spark,
        src,
        schema,
        os.path.join(tmp, f"out{tag}"),
        os.path.join(tmp, f"ck{tag}"),
        GAP_MIN,
        watermark_delay="0 seconds",
    )
    q.awaitTermination()
    return {
        tuple(r)
        for r in spark.read.parquet(os.path.join(tmp, f"out{tag}"))
        .filter("user_id >= 0")
        .collect()
    }


def test_boundary_merges_at_exact_gap(spark):
    """diff == gap MERGES (split on strictly-greater) — the measured
    session_window convention, matching batch sessionize."""
    got = _batch(spark, EVENTS)
    by_user7 = sorted(t for t in got if t[0] == 7)
    assert len(by_user7) == 2
    assert by_user7[0][3] == 4  # events at 0,10,29,59(=29+30) merge
    assert by_user7[1][3] == 1  # the +36-min gap split


def test_stream_matches_batch_and_merges_across_drops(spark, tmp_path):
    want = _batch(spark, EVENTS)
    # slice MID-SESSION: events 1-2 in drop 1, event 3 (same session)
    # in drop 2 — the state store must merge provisional sessions
    got = _drain(
        spark, str(tmp_path), [EVENTS[:2], EVENTS[2:], FLUSH], tag="a"
    )
    assert got == want


def test_restart_emits_each_session_once(spark, tmp_path):
    tmp = str(tmp_path)
    # TIME-ordered drops (delay=0 ⇒ a later drop must not carry
    # older events, or the aggregation rightly drops them as late)
    early = [e for e in EVENTS if e.ts <= T0 + timedelta(minutes=59)]
    late = [e for e in EVENTS if e.ts > T0 + timedelta(minutes=59)]
    got1 = _drain(spark, tmp, [early], tag="b")
    # drop the rest + flush into the SAME source, reuse the checkpoint
    schema = spark.createDataFrame(EVENTS).schema
    for rows in (late, FLUSH):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(tmp, "srcb"))
    q = run_session_stream(
        spark,
        os.path.join(tmp, "srcb"),
        schema,
        os.path.join(tmp, "outb"),
        os.path.join(tmp, "ckb"),
        GAP_MIN,
        watermark_delay="0 seconds",
    )
    q.awaitTermination()
    got2 = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(tmp, "outb"))
        .filter("user_id >= 0")
        .collect()
    }
    assert got2 == _batch(spark, EVENTS)
    # only closed sessions were in the first drain's output
    assert got1 <= got2
