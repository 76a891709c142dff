"""As-of join vs a per-row Python oracle (and edge semantics)."""

import datetime as dt

from pyspark.sql import Row

from updater_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_backward_inclusive_and_outer(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lts=_ts(10), tag="a"),
            Row(k=1, lts=_ts(5), tag="b"),  # exact-tie with right @5
            Row(k=1, lts=_ts(1), tag="c"),  # before any right row
            Row(k=2, lts=_ts(30), tag="d"),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts(5), payload="r5"),
            Row(k=1, rts=_ts(9), payload="r9"),
            Row(k=1, rts=_ts(11), payload="r11"),
        ]
    )
    got = {
        r["tag"]: r["payload"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts", right_cols=["payload"]
        ).collect()
    }
    assert got == {"a": "r9", "b": "r5", "c": None, "d": None}


def test_tiebreak_deterministic(spark):
    left = spark.createDataFrame([Row(k=1, lts=_ts(10))])
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts(5), rid=7, payload="low"),
            Row(k=1, rts=_ts(5), rid=9, payload="high"),
        ]
    )
    row = asof_join(
        left,
        right,
        ["k"],
        "lts",
        "rts",
        right_cols=["payload"],
        tiebreak="rid",
    ).collect()[0]
    assert row["payload"] == "high"  # max tiebreak wins among ts-ties


def test_column_collision_suffix_and_row_preservation(spark):
    left = spark.createDataFrame(
        [Row(k=1, lts=_ts(10), value=100.0), Row(k=1, lts=_ts(20), value=200.0)]
    )
    right = spark.createDataFrame([Row(k=1, rts=_ts(6), value=1.5)])
    out = asof_join(left, right, ["k"], "lts", "rts")
    assert set(out.columns) == {"k", "lts", "value", "rts", "value_asof"}
    rows = {r["value"]: r for r in out.collect()}
    assert rows[100.0]["value_asof"] == 1.5
    assert rows[200.0]["value_asof"] == 1.5
    # left multiplicity preserved: exactly one output row per left row
    assert out.count() == 2


def test_against_python_oracle_events(spark, sf_dir):
    from updater_spark import demo

    ev = demo.load_events(spark, sf_dir)
    left = ev.filter(ev.event_type == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(ev.event_type == "click").select(
        ev.event_id.alias("click_id"), "user_id", ev.ts.alias("click_ts")
    )
    got = {
        r["event_id"]: r["click_id"]
        for r in asof_join(
            left,
            right,
            ["user_id"],
            "ts",
            "click_ts",
            tiebreak="click_id",
        ).collect()
    }
    clicks_by_user = {}
    for r in right.collect():
        clicks_by_user.setdefault(r["user_id"], []).append(
            (r["click_ts"], r["click_id"])
        )
    misses = 0
    for r in left.collect():
        cands = [
            (ts, cid)
            for ts, cid in clicks_by_user.get(r["user_id"], [])
            if ts <= r["ts"]
        ]
        want = max(cands)[1] if cands else None
        assert got[r["event_id"]] == want
        misses += want is None
    assert len(got) == left.count()
    assert 0 < misses < len(got)  # scenario exercises both branches


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-100, 100)),
        min_size=1,
        max_size=25,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-100, 100)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_fuzz_vs_python(spark, lefts, rights):
    """Random keys/timestamps with heavy ties (small ts domain forces
    equal-ts collisions) vs a brute-force python oracle: backward
    inclusive, max-tiebreak-wins among right ties."""
    from updater_spark.operators.asof import asof_join

    l = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lefts)],
        "lid long, k long, ts long",
    )
    r = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(rights)],
        "rid long, k long, rts long",
    )
    got = {
        row["lid"]: row["rid"]
        for row in asof_join(
            l, r, ["k"], "ts", "rts", tiebreak="rid"
        ).collect()
    }
    for i, (k, ts) in enumerate(lefts):
        cands = [
            (rts, j)
            for j, (rk, rts) in enumerate(rights)
            if rk == k and rts <= ts
        ]
        exp = max(cands)[1] if cands else None
        assert got[i] == exp, (i, k, ts, cands)
