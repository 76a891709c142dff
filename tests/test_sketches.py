"""HLL sketch semantics: estimate accuracy within the theoretical
bound, merge == sketch-of-union (the mergeability law), register
determinism, duplicate/NULL handling."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.sketches import (
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
