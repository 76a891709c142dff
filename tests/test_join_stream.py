"""Stream-stream interval join: stream == batch parity, restart
resume, re-slicing invariance, and the watermark late-drop contract."""

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.streaming.join_stream import (
    drain,
    read_pairs,
    run_stream_interval_join,
    stream_interval_join,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(eid, uid, minutes):
    return Row(event_id=eid, user_id=uid, ts=T0 + timedelta(minutes=minutes))


# requests (left) and responses (right); window = 30 min
REQS = [_ev(1, 7, 0), _ev(2, 7, 60), _ev(3, 9, 5), _ev(4, 5, 10)]
RSPS = [
    _ev(101, 7, 10),  # matches req 1 (Δ10m)
    _ev(102, 7, 75),  # matches req 2 (Δ15m)
    _ev(103, 9, 40),  # too late for req 3 (Δ35m) → no match
    _ev(104, 5, 10),  # matches req 4 (Δ0m, boundary)
    _ev(105, 8, 12),  # no request for user 8
]
WINDOW = 30 * 60


def _prep_left(df):
    return df.select(
        "user_id",
        F.col("event_id").alias("req_id"),
        F.col("ts").alias("req_ts"),
    )


def _prep_right(df):
    return df.select(
        "user_id",
        F.col("event_id").alias("rsp_id"),
        F.col("ts").alias("rsp_ts"),
    )


def _batch_expected(spark):
    out = stream_interval_join(
        _prep_left(spark.createDataFrame(REQS)),
        _prep_right(spark.createDataFrame(RSPS)),
        "user_id",
        "req_ts",
        "rsp_ts",
        WINDOW,
    )
    return {(r.user_id, r.req_id, r.rsp_id) for r in out.collect()}


def _run(spark, tmp, reqs_slices, rsps_slices, delay="30 days", tag="a"):
    schema = spark.createDataFrame(REQS).schema
    ldir, rdir = os.path.join(tmp, f"l{tag}"), os.path.join(tmp, f"r{tag}")
    for d, slices in ((ldir, reqs_slices), (rdir, rsps_slices)):
        for i, rows in enumerate(slices):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
    out = os.path.join(tmp, f"out{tag}")
    ck = os.path.join(tmp, f"ck{tag}")
    drain(
        run_stream_interval_join(
            spark,
            ldir,
            rdir,
            schema,
            _prep_left,
            _prep_right,
            "user_id",
            "req_ts",
            "rsp_ts",
            WINDOW,
            out,
            ck,
            watermark_delay=delay,
        )
    )
    return {
        (r.user_id, r.req_id, r.rsp_id)
        for r in read_pairs(spark, out).collect()
    }


def test_stream_matches_batch_and_reslicing_invariant(spark, tmp_path):
    want = _batch_expected(spark)
    assert want == {(7, 1, 101), (7, 2, 102), (5, 4, 104)}
    got1 = _run(
        spark, str(tmp_path), [REQS[:2], REQS[2:]], [RSPS[:3], RSPS[3:]]
    )
    got2 = _run(
        spark,
        str(tmp_path),
        [REQS],
        [RSPS[:1], RSPS[1:4], RSPS[4:]],
        tag="b",
    )
    assert got1 == want
    assert got2 == want


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    tmp = str(tmp_path)
    got = _run(spark, tmp, [REQS], [RSPS[:2]], tag="c")
    assert got == {(7, 1, 101), (7, 2, 102)}
    # second drain: drop the remaining responses into the SAME dirs,
    # reuse the checkpoint — offsets + join state resume mid-stream.
    schema = spark.createDataFrame(REQS).schema
    spark.createDataFrame(RSPS[2:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(tmp, "rc"))
    drain(
        run_stream_interval_join(
            spark,
            os.path.join(tmp, "lc"),
            os.path.join(tmp, "rc"),
            schema,
            _prep_left,
            _prep_right,
            "user_id",
            "req_ts",
            "rsp_ts",
            WINDOW,
            os.path.join(tmp, "outc"),
            os.path.join(tmp, "ckc"),
        )
    )
    got2 = {
        (r.user_id, r.req_id, r.rsp_id)
        for r in read_pairs(spark, os.path.join(tmp, "outc")).collect()
    }
    assert got2 == _batch_expected(spark)


def test_left_outer_emits_null_after_horizon(spark, tmp_path):
    """Left-outer contract: a null-match emits ONLY once the
    watermark proves no future response can match (passes
    req_ts + window + delay). Without a flush drop, open-horizon
    requests stay withheld; a far-future flush row on both sides
    closes every horizon and the drained output equals the batch
    left join exactly."""
    import json  # noqa: F401

    tmp = str(tmp_path)
    schema = spark.createDataFrame(REQS).schema
    ldir, rdir = os.path.join(tmp, "lo"), os.path.join(tmp, "ro")
    flush_l = [_ev(900, -1, 10_000)]  # non-matching keys, far future
    flush_r = [_ev(901, -2, 10_000)]
    for d, slices in ((ldir, [REQS, flush_l]), (rdir, [RSPS, flush_r])):
        for rows in slices:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
    drain(
        run_stream_interval_join(
            spark,
            ldir,
            rdir,
            schema,
            _prep_left,
            _prep_right,
            "user_id",
            "req_ts",
            "rsp_ts",
            WINDOW,
            os.path.join(tmp, "outo"),
            os.path.join(tmp, "cko"),
            watermark_delay="0 seconds",
            how="left_outer",
        )
    )
    got = {
        (r.user_id, r.req_id, r.rsp_id)
        for r in read_pairs(spark, os.path.join(tmp, "outo"))
        .filter(F.col("user_id") >= 0)  # flush rows are fixture noise
        .collect()
    }
    # batch oracle: same operator, batch frames, same flush filter
    want = {
        (r.user_id, r.req_id, r.rsp_id)
        for r in stream_interval_join(
            _prep_left(spark.createDataFrame(REQS)),
            _prep_right(spark.createDataFrame(RSPS)),
            "user_id",
            "req_ts",
            "rsp_ts",
            WINDOW,
            how="left_outer",
        ).collect()
    }
    assert (9, 3, None) in want  # req 3's only response was too late
    assert got == want


def test_watermark_evicts_state_deterministically(spark, tmp_path):
    """Inner-join lateness contract (module docstring): the watermark
    drives STATE EVICTION at micro-batch end, not input filtering.

    Drop 1 (all requests + responses) matches under watermark 1970.
    Drop 2 (one fresh response) runs under watermark T0+60m — at its
    END every request with req_ts + window < T0+60m is evicted, and
    join state shrinks below the input size (bounded-state claim).
    Drop 3 carries a response at T0+10m for the already-evicted req 4:
    batch would match it; the stream deterministically cannot."""
    import json

    tmp = str(tmp_path)
    schema = spark.createDataFrame(REQS).schema
    ldir, rdir = os.path.join(tmp, "ld"), os.path.join(tmp, "rd")
    spark.createDataFrame(REQS, schema).coalesce(1).write.parquet(ldir)
    bump = [_ev(107, 8, 80)]  # fresh high-ts row; advances no match
    late = [_ev(106, 5, 10)]  # would match req 4 in batch
    for rows in (RSPS, bump, late):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(rdir)
    q = run_stream_interval_join(
        spark,
        ldir,
        rdir,
        schema,
        _prep_left,
        _prep_right,
        "user_id",
        "req_ts",
        "rsp_ts",
        WINDOW,
        os.path.join(tmp, "outd"),
        os.path.join(tmp, "ckd"),
        watermark_delay="0 seconds",
    )
    drain(q)
    got = {
        (r.user_id, r.req_id, r.rsp_id)
        for r in read_pairs(spark, os.path.join(tmp, "outd")).collect()
    }
    assert (5, 4, 106) not in got  # evicted before the late arrival
    assert got == _batch_expected(spark)
    # bounded state: the final batch's state row count reflects
    # eviction (well under the 9 requests+responses that streamed in).
    last = json.loads(q.recentProgress[-1].json)
    n_state = last["stateOperators"][0]["numRowsTotal"]
    assert n_state <= 3
