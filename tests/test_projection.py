"""Random projection vs a plain-Python oracle + the JL distortion
sanity the operator exists for."""

import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.projection import rp_project, rp_signs


def test_matches_python_oracle(spark):
    rng = random.Random(3)
    rows = [
        Row(vec_id=i, v=[rng.uniform(-1, 1) for _ in range(12)])
        for i in range(20)
    ]
    signs = rp_signs(12, 4, seed=23)
    got = {
        r.vec_id: r.proj
        for r in rp_project(
            spark.createDataFrame(rows), "v", dim=12, k=4
        ).collect()
    }
    for r in rows:
        want = [
            sum(a * s for a, s in zip(r.v, row)) / math.sqrt(4)
            for row in signs
        ]
        assert all(
            abs(g - w) < 1e-12 for g, w in zip(got[r.vec_id], want)
        ), r.vec_id


def test_jl_distortion_bound_in_practice(spark):
    """Mean squared-norm ratio ≈ 1 (unbiased estimator) across a
    random batch — the property the operator is for."""
    rng = random.Random(9)
    rows = [
        Row(vec_id=i, v=[rng.gauss(0, 1) for _ in range(64)])
        for i in range(200)
    ]
    p = rp_project(spark.createDataFrame(rows), "v", dim=64, k=16)
    ratio = p.select(
        (
            F.aggregate(
                F.transform("proj", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.aggregate(
                F.transform("v", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("r")
    )
    mean = ratio.agg(F.avg("r")).collect()[0][0]
    assert 0.85 < mean < 1.15, mean


def test_wrong_dim_surfaces_as_nulls(spark):
    rows = [Row(vec_id=1, v=[1.0, 2.0])]
    out = rp_project(
        spark.createDataFrame(rows), "v", dim=5, k=2
    ).collect()[0]
    assert all(c is None for c in out.proj)


def test_signs_are_deterministic():
    assert rp_signs(8, 3, seed=23) == rp_signs(8, 3, seed=23)
    assert rp_signs(8, 3, seed=23) != rp_signs(8, 3, seed=24)
    assert {x for row in rp_signs(16, 4) for x in row} == {1, -1}
