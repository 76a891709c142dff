"""Approximate aggregates for the scale path: HLL distinct and
quantile sketches stay within their documented error bounds of the
exact answers (which the driver oracles separately)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from updater_spark import demo

    return demo.load_events(spark, sf_dir).cache()


def test_hll_distinct_within_rsd(spark, events):
    """approx_count_distinct(rsd=0.02): per-group estimates within
    ~3 standard deviations of exact. At 100 TB the exact distinct's
    (group, user) shuffle is the bottleneck; HLL state is a few KB
    per group and merges map-side."""
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(3, 0.06 * n), (t, n, approx[t])


def test_percentile_approx_within_rank_tolerance(spark, events):
    """percentile_approx guarantees RANK error (≤ 1/accuracy of the
    rows), not value error — in a sparse tail the nearest element can
    sit far in value-space. So assert the approximate p50/p99 lies
    between the exact quantiles half a percentile either side."""
    q = F.expr("percentile(value, array(0.495, 0.505, 0.985, 0.995))")
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            q[0].alias("p495"),
            q[1].alias("p505"),
            q[2].alias("p985"),
            q[3].alias("p995"),
        )
        .collect()
    }
    approx = {
        r["event_type"]: (r["a50"], r["a99"])
        for r in events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("a50"),
            F.percentile_approx("value", 0.99, 10000).alias("a99"),
        )
        .collect()
    }
    for t, e in exact.items():
        a50, a99 = approx[t]
        assert e["p495"] <= a50 <= e["p505"], (t, a50, e["p495"], e["p505"])
        assert e["p985"] <= a99 <= e["p995"], (t, a99, e["p985"], e["p995"])
