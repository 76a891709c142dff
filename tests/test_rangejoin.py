"""interval_join vs the naive inequality join (small-scale oracle)."""

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.rangejoin import interval_join


@pytest.fixture(scope="module")
def data(spark):
    # points every 100 ticks; intervals of assorted lengths incl.
    # overlapping, zero-length, bin-straddling, and unmatched keys
    points = spark.createDataFrame(
        [(pid, pid % 3, pid * 100) for pid in range(200)],
        "pid long, k long, ts long",
    )
    intervals = spark.createDataFrame(
        [
            (1, 0, 0, 450),        # short, several points
            (2, 0, 400, 500),      # overlaps iv 1
            (3, 1, 3600, 7200),    # exactly one bin wide
            (4, 1, 3599, 3601),    # straddles a bin edge
            (5, 2, 9999, 9999),    # zero-length: matches nothing
            (6, 7, 0, 20000),      # key with no points
        ],
        "iid long, k long, s long, e long",
    )
    return points, intervals


def _oracle(points, intervals, how):
    j = points.join(
        intervals,
        (points["k"] == intervals["k"])
        & (points["ts"] >= intervals["s"])
        & (points["ts"] < intervals["e"]),
        how,
    )
    return sorted(
        (r["pid"], r["iid"]) for r in j.select(points["pid"], intervals["iid"]).collect()
    )


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("w", [100, 3600, 100000])
def test_interval_join_matches_naive(data, how, w):
    points, intervals = data
    got = interval_join(
        points, intervals, "ts", "s", "e", on=["k"], bin_width=w, how=how
    )
    assert sorted(
        (r["pid"], r["iid"]) for r in got.select("pid", "iid").collect()
    ) == _oracle(points, intervals, how)


def test_interval_join_is_an_equi_join(data):
    points, intervals = data
    plan = (
        interval_join(points, intervals, "ts", "s", "e", on=["k"], bin_width=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the bin trick must yield a hash-joinable plan, not a nested loop
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_timestamps(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 02:30:00")],
        "eid long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    iv = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "iid long, s_s string, e_s string",
    ).select(
        "iid", F.to_timestamp("s_s").alias("s"), F.to_timestamp("e_s").alias("e")
    )
    got = interval_join(ev, iv, "ts", "s", "e", bin_width=3600)
    assert [(r["eid"], r["iid"]) for r in got.select("eid", "iid").collect()] == [
        (1, 10)
    ]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-5000, 5000)),
        min_size=1,
        max_size=30,
    ),
    ivs=st.lists(
        st.tuples(
            st.integers(0, 2), st.integers(-5000, 5000), st.integers(0, 4000)
        ),
        min_size=1,
        max_size=10,
    ),
    w=st.sampled_from([7, 100, 3600]),
)
def test_interval_join_fuzz_vs_naive(spark, pts, ivs, w):
    """Random keys/timestamps INCLUDING negatives (floor-division bin
    arithmetic must stay correct below zero) vs the naive
    inequality-join oracle."""
    points = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(pts)],
        "pid long, k long, ts long",
    )
    intervals = spark.createDataFrame(
        [(i, k, s, s + ln) for i, (k, s, ln) in enumerate(ivs)],
        "iid long, k long, s long, e long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "ts", "s", "e", on=["k"], bin_width=w
        )
        .select("pid", "iid")
        .collect()
    )
    exp = sorted(
        (i, j)
        for i, (pk, ts) in enumerate(pts)
        for j, (ik, s, ln) in enumerate(ivs)
        if pk == ik and s <= ts < s + ln
    )
    assert got == exp
