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


# -- first-class HLL register sketches (operators/sketches.py) --------

from pyspark.sql import Row  # noqa: E402

from updater_spark.operators.sketches import (  # noqa: E402
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_sketch,
)



def test_estimate_within_bound(spark):
    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    sk = hll_sketch(df, "k", b=12)
    est = hll_estimate(sk, b=12).collect()[0]["estimate"]
    # 3 sigma of the theoretical 1.04/sqrt(4096) ~ 1.6% bound
    assert abs(est - n) / n < 3 * hll_error_bound(12)


def test_duplicates_and_nulls_ignored(spark):
    rows = [Row(k="a"), Row(k="a"), Row(k="b"), Row(k=None)]
    df = spark.createDataFrame(rows)
    sk = hll_sketch(df, "k", b=8)
    # two distinct values -> at most two registers, and the linear-
    # counting branch lands very close to 2
    est = hll_estimate(sk, b=8).collect()[0]
    assert sk.count() <= 2
    assert est["estimate"] == pytest.approx(2.0, abs=0.1)
    # duplicate-heavy input gives the IDENTICAL register table
    df2 = spark.createDataFrame([Row(k="a"), Row(k="b")])
    t1 = sorted(map(tuple, hll_sketch(df, "k", b=8).collect()))
    t2 = sorted(map(tuple, hll_sketch(df2, "k", b=8).collect()))
    assert t1 == t2


def test_merge_equals_sketch_of_union(spark):
    a = spark.range(0, 5000).select(
        F.concat(F.lit("x"), F.col("id")).alias("k")
    )
    b_ = spark.range(3000, 9000).select(
        F.concat(F.lit("x"), F.col("id")).alias("k")
    )
    merged = hll_merge(
        hll_sketch(a, "k", b=10), hll_sketch(b_, "k", b=10)
    )
    direct = hll_sketch(a.unionByName(b_), "k", b=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = hll_estimate(merged, b=10).collect()[0]["estimate"]
    assert abs(est - 9000) / 9000 < 3 * hll_error_bound(10)


def test_validation(spark):
    df = spark.createDataFrame([Row(k="a")])
    with pytest.raises(ValueError, match="b must"):
        hll_sketch(df, "k", b=2)
    with pytest.raises(ValueError, match="b must"):
        hll_estimate(hll_sketch(df, "k"), b=99)
    with pytest.raises(ValueError, match="at least one"):
        hll_merge()


# -- Count-Min frequency sketches --------------------------------------

from updater_spark.operators.sketches import (  # noqa: E402
    cm_estimate,
    cm_merge,
    cm_sketch,
)


def test_cm_never_undercounts_and_is_tight_for_heavy_hitters(spark):
    # zipf-ish: key i appears ~2000/i times
    rows = []
    for i in range(1, 200):
        rows += [Row(k=f"key{i}")] * (2000 // i)
    df = spark.createDataFrame(rows)
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sk = cm_sketch(df, "k", depth=4, width=2048)
    keys = spark.createDataFrame([Row(k=k) for k in exact])
    est = {
        r["k"]: r["cm_count"]
        for r in cm_estimate(sk, keys, "k", depth=4, width=2048).collect()
    }
    n_total = sum(exact.values())
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)  # the one-sided guarantee
        assert est[k] - n <= 2 * n_total / 2048 * 4, (k, est[k], n)
    # the top hitter is estimated exactly or nearly so
    assert est["key1"] - exact["key1"] <= 10


def test_cm_merge_equals_sketch_of_union_and_unseen_reads_zero(spark):
    a = spark.createDataFrame([Row(k="x")] * 50 + [Row(k="y")] * 5)
    b_ = spark.createDataFrame([Row(k="x")] * 25 + [Row(k="z")] * 7)
    merged = cm_merge(
        cm_sketch(a, "k", depth=3, width=64),
        cm_sketch(b_, "k", depth=3, width=64),
    )
    direct = cm_sketch(a.unionByName(b_), "k", depth=3, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    keys = spark.createDataFrame(
        [Row(k="x"), Row(k="z"), Row(k="never-seen")]
    )
    est = {
        r["k"]: r["cm_count"]
        for r in cm_estimate(merged, keys, "k", depth=3, width=64).collect()
    }
    assert est["x"] >= 75 and est["z"] >= 7
    # an unseen key can only read collision noise, bounded by the
    # min over 3 independent rows of a 64-wide sketch
    assert est["never-seen"] <= 10


def test_cm_validation(spark):
    df = spark.createDataFrame([Row(k="a")])
    with pytest.raises(ValueError, match="depth"):
        cm_sketch(df, "k", depth=0)
    with pytest.raises(ValueError, match="at least one"):
        cm_merge()


def test_xxhash64_deploy_path_within_bounds(spark):
    """The JVM-native hasher variant: same register math, same error
    bounds — different registers (different hash), so sketch and
    estimate must agree on the hasher."""
    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    sk = hll_sketch(df, "k", b=12, hasher="xxhash64")
    est = hll_estimate(sk, b=12).collect()[0]["estimate"]
    assert abs(est - n) / n < 3 * hll_error_bound(12)

    rows = [Row(k=f"key{i}") for i in range(1, 100) for _ in range(500 // i)]
    dfc = spark.createDataFrame(rows)
    skc = cm_sketch(dfc, "k", depth=4, width=1024, hasher="xxhash64")
    keys = spark.createDataFrame([Row(k="key1"), Row(k="unseen")])
    est2 = {
        r["k"]: r["cm_count"]
        for r in cm_estimate(
            skc, keys, "k", depth=4, width=1024, hasher="xxhash64"
        ).collect()
    }
    assert est2["key1"] >= 500
    assert est2["unseen"] <= 20
    import pytest as _pt

    with _pt.raises(ValueError, match="hasher"):
        hll_sketch(df, "k", hasher="sha1")
    with _pt.raises(ValueError, match="hasher"):
        cm_sketch(dfc, "k", hasher="sha1")
