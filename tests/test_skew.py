"""salted_join ≡ plain join, including on pathologically skewed keys."""

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows carry key 0; dim covers keys 0..24 plus unmatched 99
    big = (
        spark.range(0, 10_000)
        .withColumn(
            "k", F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 25)
        )
        .withColumn("payload", F.col("id") * 2)
    )
    small = spark.range(0, 25).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), "id").alias("attr")
    ).unionByName(
        spark.createDataFrame([(99, "orphan")], "k long, attr string")
    )
    return big, small


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "k", "payload", "attr").collect())


def test_salted_inner_matches_plain(skewed):
    big, small = skewed
    assert _rows(salted_join(big, small, "k", salt_factor=8)) == _rows(
        big.join(small, "k", "inner")
    )


def test_salted_left_matches_plain(skewed):
    big, small = skewed
    # left join keeps big rows whose key has no dim row (attr null)
    only_big = big.withColumn("k", F.col("k") + 1000).limit(7)
    b = big.unionByName(only_big)
    assert _rows(salted_join(b, small, "k", salt_factor=4, how="left")) == _rows(
        b.join(small, "k", "left")
    )


def test_salt_is_in_the_join_key(skewed):
    big, small = skewed
    plan = (
        salted_join(big, small, "k", salt_factor=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "__salt" in plan  # the shuffle/join key includes the salt


def test_salted_join_rejects_bad_args(skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", salt_factor=0)
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full_outer")
