"""Rolling z-score semantics pinned against a pandas evaluation of
the same recurrence: strictly-preceding frame (no self-contamination),
warm-up NULLs, flat-baseline handling, per-key isolation."""

import math

import pytest
from pyspark.sql import Row

from updater_spark.operators.anomaly import rolling_zscore


def _py_roll(series, window, min_periods, threshold):
    out = []
    for i, v in enumerate(series):
        prev = series[max(0, i - window):i]
        prev = [p for p in prev if p is not None]
        if len(prev) < min_periods:
            out.append((None, None, None, None))
            continue
        m = sum(prev) / len(prev)
        var = sum((p - m) ** 2 for p in prev) / (len(prev) - 1)
        s = math.sqrt(var)
        if s == 0:
            out.append((m, s, None, v != m))
        else:
            z = (v - m) / s
            out.append((m, s, z, abs(z) >= threshold))
    return out


def test_matches_pandas_style_reference(spark):
    series = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 50.0, 10.1, 9.9, 10.4]
    rows = [
        Row(k="a", t=i, id=i, v=v) for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows)
    got = (
        rolling_zscore(
            df, "k", "t", "v", order_cols=["id"],
            window=5, min_periods=3, threshold=3.0,
        )
        .orderBy("t")
        .collect()
    )
    want = _py_roll(series, 5, 3, 3.0)
    for g, (m, s, z, a) in zip(got, want):
        if m is None:
            assert g["roll_mean"] is None and g["is_anomaly"] is None
        else:
            assert g["roll_mean"] == pytest.approx(m)
            assert g["roll_std"] == pytest.approx(s)
            if z is None:
                assert g["zscore"] is None
            else:
                assert g["zscore"] == pytest.approx(z)
            assert g["is_anomaly"] == a
    # the planted spike is caught, its neighbors are not
    assert got[6]["is_anomaly"] is True
    assert got[5]["is_anomaly"] is False
    # the spike does NOT flag the points after it as anomalies of a
    # contaminated baseline... (it widens std, which is the expected
    # masking effect; just assert they are non-NULL verdicts)
    assert got[8]["is_anomaly"] is not None


def test_flat_baseline_and_warmup(spark):
    rows = [Row(k="a", t=i, id=i, v=5.0) for i in range(6)]
    rows.append(Row(k="a", t=6, id=6, v=7.0))
    df = spark.createDataFrame(rows)
    got = (
        rolling_zscore(df, "k", "t", "v", order_cols=["id"],
                       window=10, min_periods=3)
        .orderBy("t")
        .collect()
    )
    # warm-up: first min_periods rows carry NULL verdicts
    assert got[0]["is_anomaly"] is None and got[2]["is_anomaly"] is None
    # flat baseline: zscore NULL but departure still flagged
    last = got[-1]
    assert last["roll_std"] == 0.0
    assert last["zscore"] is None and last["is_anomaly"] is True
    # a flat point on a flat baseline is NOT an anomaly
    assert got[4]["is_anomaly"] is False


def test_keys_are_isolated(spark):
    rows = [Row(k="a", t=i, id=i, v=10.0 + (i % 2)) for i in range(8)]
    rows += [Row(k="b", t=i, id=i, v=100.0 + (i % 2)) for i in range(8)]
    df = spark.createDataFrame(rows)
    got = rolling_zscore(
        df, "k", "t", "v", order_cols=["id"], window=4, min_periods=3
    ).collect()
    # if key b's 100s leaked into key a's baseline, every a-row after
    # warmup would be a huge-|z| anomaly
    for r in got:
        if r["is_anomaly"] is not None:
            assert r["is_anomaly"] is False, r


def test_validation(spark):
    df = spark.createDataFrame([Row(k="a", t=1, v=1.0)])
    with pytest.raises(ValueError, match="window"):
        rolling_zscore(df, "k", "t", "v", window=0)
    with pytest.raises(ValueError, match="min_periods"):
        rolling_zscore(df, "k", "t", "v", min_periods=1)


def _py_cusum(series, k=0.5, h=5.0):
    m = sum(series) / len(series)
    var = sum((x - m) ** 2 for x in series) / (len(series) - 1)
    s = math.sqrt(var)
    sp = sn = 0.0
    out = []
    for x in series:
        z = (x - m) / s
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        out.append((sp, sn, sp > h or sn > h))
    return out


def test_cusum_matches_textbook_recurrence(spark):
    from updater_spark.operators.anomaly import cusum

    # a level shift of +1.2 sigma from index 12 on: no single point
    # is a 3-sigma outlier, but the drift accumulates
    base = [10.0, 10.4, 9.8, 10.1, 9.9, 10.2, 10.0, 9.7,
            10.3, 10.0, 9.9, 10.1]
    shifted = [v + 0.5 for v in
               [10.2, 10.4, 10.3, 10.5, 10.2, 10.6, 10.4, 10.3]]
    series = base + shifted
    rows = [Row(k="a", t=i, id=i, v=v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows)
    got = (
        cusum(df, "k", "t", "v", order_cols=["id"], slack_k=0.5, h=3.0)
        .orderBy("t")
        .collect()
    )
    want = _py_cusum(series, k=0.5, h=3.0)
    for g, (sp, sn, alarm) in zip(got, want):
        assert g["cusum_pos"] == pytest.approx(sp, abs=1e-9)
        assert g["cusum_neg"] == pytest.approx(sn, abs=1e-9)
        assert g["cusum_alarm"] == alarm
    # the sustained shift is alarmed, and never in the early
    # in-control run (the offline global mean straddles the shift, so
    # the negative side legitimately trips near the boundary — what
    # the python reference also says)
    assert any(r["cusum_alarm"] for r in got)
    first_alarm = min(r["t"] for r in got if r["cusum_alarm"])
    assert first_alarm >= 8


def test_cusum_flat_series_and_validation(spark):
    from updater_spark.operators.anomaly import cusum

    df = spark.createDataFrame(
        [Row(k="a", t=i, id=i, v=5.0) for i in range(4)]
    )
    got = cusum(df, "k", "t", "v", order_cols=["id"]).collect()
    for r in got:
        assert r["cusum_pos"] is None and r["cusum_alarm"] is None
    with pytest.raises(ValueError, match="h must"):
        cusum(df, "k", "t", "v", h=0.0)


def test_mad_outliers_hand_values(spark):
    from updater_spark.operators.anomaly import mad_outliers

    # key a: values 1..7 plus a spike 100 -> median 4.5 of
    # [1..7, 100]; MAD robust to the spike, only 100 flagged
    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 100])]
    df = spark.createDataFrame(rows, "event_id long, user_id string, value double")
    out = {r["event_id"]: r for r in mad_outliers(df, threshold=3.0).collect()}
    flagged = [i for i, r in out.items() if r["is_outlier"] == 1]
    assert flagged == [7]
    # the spike's robust z is enormous; inliers are small
    assert abs(out[7]["robust_z"]) > 10
    assert all(abs(out[i]["robust_z"]) < 2 for i in range(7))


def test_mad_outliers_flat_majority(spark):
    from updater_spark.operators.anomaly import mad_outliers

    # >50% identical values -> MAD = 0: robust_z NULL, any deviation flagged
    rows = [(i, "k", 5.0) for i in range(6)] + [(9, "k", 6.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, value double")
    out = {r["event_id"]: r for r in mad_outliers(df).collect()}
    assert all(r["robust_z"] is None for r in out.values())
    assert out[9]["is_outlier"] == 1
    assert all(out[i]["is_outlier"] == 0 for i in range(6))


def test_robust_scale_hand_values(spark):
    from updater_spark.operators.anomaly import robust_scale

    # values 1..5: med=3, q1=2, q3=4, IQR=2 -> scaled = (x-3)/2
    rows = [(i, "k", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "event_id long, user_id string, value double")
    out = {r["event_id"]: r["scaled"] for r in robust_scale(df).collect()}
    assert out == {0: -1.0, 1: -0.5, 2: 0.0, 3: 0.5, 4: 1.0}


def test_robust_scale_zero_iqr_is_null(spark):
    from updater_spark.operators.anomaly import robust_scale

    rows = [(i, "k", 7.0) for i in range(5)] + [(9, "k", 8.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, value double")
    out = robust_scale(df).collect()
    assert all(r["scaled"] is None for r in out)
