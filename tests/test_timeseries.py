"""Gap-fill / forward-fill semantics pinned: epoch-aligned buckets,
per-key span grids, LOCF vs null vs zero fills, leading NULLs never
invented, last-in-bucket aggregation."""

import datetime as dt

import pytest
from pyspark.sql import Row

from updater_spark.operators.timeseries import forward_fill, gapfill


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_forward_fill(spark):
    rows = [
        Row(k="a", t=1, id=1, v=None),   # leading NULL stays NULL
        Row(k="a", t=2, id=2, v=5.0),
        Row(k="a", t=3, id=3, v=None),
        Row(k="a", t=4, id=4, v=None),
        Row(k="a", t=5, id=5, v=7.0),
        Row(k="b", t=1, id=6, v=None),   # other key: no leak from a
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["k"], r["t"]): r["v"]
        for r in forward_fill(
            df, "k", "t", ["v"], order_cols=["id"]
        ).collect()
    }
    assert got[("a", 1)] is None
    assert got[("a", 3)] == 5.0 and got[("a", 4)] == 5.0
    assert got[("a", 5)] == 7.0
    assert got[("b", 1)] is None
    with pytest.raises(ValueError, match="value_cols"):
        forward_fill(df, "k", "t", [])


def test_gapfill_ffill_and_flags(spark):
    rows = [
        Row(k=1, ts=_ts(1, 3), v=10.0),
        Row(k=1, ts=_ts(1, 9), v=20.0),   # same day: avg 15
        Row(k=1, ts=_ts(4, 1), v=40.0),   # days 2,3 silent
        Row(k=2, ts=_ts(2, 1), v=1.0),    # single-bucket key
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["k"], r["bucket"].day): (r["avg_v"], r["gap_filled"])
        for r in gapfill(df, "k", "ts", "v", "1 day").collect()
    }
    assert got[(1, 1)] == (15.0, False)
    assert got[(1, 2)] == (15.0, True)    # LOCF carries day 1 forward
    assert got[(1, 3)] == (15.0, True)
    assert got[(1, 4)] == (40.0, False)
    assert got[(2, 2)] == (1.0, False)
    assert len(got) == 5  # no grid beyond each key's span


def test_gapfill_null_zero_and_last(spark):
    rows = [
        Row(k=1, ts=_ts(1, 3), v=10.0),
        Row(k=1, ts=_ts(1, 9), v=20.0),
        Row(k=1, ts=_ts(3, 1), v=40.0),
    ]
    df = spark.createDataFrame(rows)
    nulls = {
        r["bucket"].day: r["avg_v"]
        for r in gapfill(df, "k", "ts", "v", "1 day", fill="null").collect()
    }
    assert nulls[2] is None
    zeros = {
        r["bucket"].day: r["avg_v"]
        for r in gapfill(df, "k", "ts", "v", "1 day", fill="zero").collect()
    }
    assert zeros[2] == 0.0
    # agg='last': value at the max timestamp within the bucket
    last = {
        r["bucket"].day: r["last_v"]
        for r in gapfill(df, "k", "ts", "v", "1 day", agg="last").collect()
    }
    assert last[1] == 20.0
    with pytest.raises(ValueError, match="fill"):
        gapfill(df, "k", "ts", "v", "1 day", fill="interp")
    with pytest.raises(ValueError, match="agg"):
        gapfill(df, "k", "ts", "v", "1 day", agg="median")


def test_gapfill_subday_buckets_epoch_aligned(spark):
    rows = [
        Row(k=1, ts=dt.datetime(2024, 1, 1, 0, 7), v=1.0),
        Row(k=1, ts=dt.datetime(2024, 1, 1, 0, 52), v=3.0),
    ]
    df = spark.createDataFrame(rows)
    got = sorted(
        (r["bucket"].minute, r["avg_v"], r["gap_filled"])
        for r in gapfill(df, "k", "ts", "v", "15 minutes").collect()
    )
    # buckets :00, :15, :30, :45 — epoch-aligned, gaps filled
    assert [m for m, _, _ in got] == [0, 15, 30, 45]
    assert got[0] == (0, 1.0, False)
    assert got[1] == (15, 1.0, True)
    assert got[3] == (45, 3.0, False)


def test_ewma_matches_recurrence(spark):
    from updater_spark.operators.timeseries import ewma

    series = [10.0, 20.0, 30.0, 25.0, 5.0]
    rows = [
        Row(k=1, ts=_ts(1, i), id=i, v=v) for i, v in enumerate(series)
    ]
    rows += [Row(k=2, ts=_ts(1, 0), id=99, v=100.0)]
    df = spark.createDataFrame(rows)
    got = {
        (r["k"], r["id"]): r["ewma"]
        for r in ewma(
            df, "k", "ts", "v", alpha=0.5, order_cols=["id"]
        ).collect()
    }
    y = series[0]
    want = [y]
    for x in series[1:]:
        y = 0.5 * x + 0.5 * y
        want.append(y)
    for i, w in enumerate(want):
        assert got[(1, i)] == pytest.approx(w, abs=1e-12), i
    # single-point key: ewma == the point; keys are isolated
    assert got[(2, 99)] == 100.0
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, "k", "ts", "v", alpha=0.0)


def test_gapfill_rejects_calendar_buckets(spark):
    df = spark.createDataFrame([Row(k=1, ts=_ts(1), v=1.0)])
    with pytest.raises(ValueError, match="calendar"):
        gapfill(df, "k", "ts", "v", "1 month")


def test_ohlc_bars_hand_values(spark):
    from datetime import datetime

    from updater_spark.operators.timeseries import ohlc_bars

    rows = [
        # one user, one hour: open=1 (earliest), close=4 (latest),
        # high=9, low=1; duplicate-ts rows tie-break by event_id
        (0, datetime(2024, 1, 1, 10, 0, 0), 7, "x", 1.0, ""),
        (1, datetime(2024, 1, 1, 10, 20, 0), 7, "x", 9.0, ""),
        (2, datetime(2024, 1, 1, 10, 40, 0), 7, "x", 2.0, ""),
        (3, datetime(2024, 1, 1, 10, 59, 0), 7, "x", 4.0, ""),
        # same user, next hour: single point -> open=close=high=low
        (4, datetime(2024, 1, 1, 11, 5, 0), 7, "x", 5.0, ""),
        # duplicate timestamps: event_id 6 wins "close" over 5
        (5, datetime(2024, 1, 1, 12, 0, 0), 8, "x", 10.0, ""),
        (6, datetime(2024, 1, 1, 12, 0, 0), 8, "x", 20.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r["user_id"], r["bucket"].hour): r
        for r in ohlc_bars(df).collect()
    }
    b10 = out[(7, 10)]
    assert (b10["open"], b10["high"], b10["low"], b10["close"], b10["n"]) == (
        1.0, 9.0, 1.0, 4.0, 4,
    )
    b11 = out[(7, 11)]
    assert (b11["open"], b11["close"], b11["n"]) == (5.0, 5.0, 1)
    b12 = out[(8, 12)]
    assert (b12["open"], b12["close"]) == (10.0, 20.0)


def test_ewma_repartition_single_exchange_and_identical(spark):
    """The scale-adaptive repartition ahead of the grouped-Python
    stage (r11: AQE sizes the key exchange by BYTES and coalesced the
    CPU-bound pandas stage to 2 tasks on 32 cores) must (a) leave the
    values bit-identical to the AQE-sized path and (b) satisfy
    applyInPandas' clustered-distribution requirement itself — one
    Exchange in the plan, not two."""
    from updater_spark.operators.timeseries import ewma

    rows = [
        Row(k=i % 7, ts=_ts(1 + i // 24 % 20, i % 24), id=i, v=float(i % 13))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    base = {
        (r["k"], r["id"]): r["ewma"]
        for r in ewma(
            df, "k", "ts", "v", alpha=0.3, order_cols=["id"],
            num_partitions=0,
        ).collect()
    }
    tuned = ewma(
        df, "k", "ts", "v", alpha=0.3, order_cols=["id"],
        num_partitions=8,
    )
    got = {(r["k"], r["id"]): r["ewma"] for r in tuned.collect()}
    assert got == base
    plan = tuned._jdf.queryExecution().executedPlan().toString()
    # the explicit repartition IS the applyInPandas distribution —
    # no second ENSURE_REQUIREMENTS exchange may appear (the plan
    # string holds AQE's initial+final copies, so count the origin
    # tags rather than the word Exchange)
    assert "REPARTITION_BY_NUM" in plan, plan
    assert "ENSURE_REQUIREMENTS" not in plan, plan
