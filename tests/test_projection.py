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


def test_pca_fit_matches_numpy_eigh(spark):
    """The power-iteration fit must agree with LAPACK on a spectrum
    with a clear eigengap: same subspace, same eigenvalues, and the
    canonical sign makes the vectors comparable directly."""
    import numpy as np
    from pyspark.sql import Row

    from updater_spark.operators.projection import pca_fit, pca_project

    rng = np.random.default_rng(7)
    d, n = 8, 400
    # anisotropic cloud: variance concentrated along two known axes
    base = rng.normal(size=(n, d))
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    mean_shift = np.arange(d, dtype=float)
    x = base + mean_shift
    df = spark.createDataFrame(
        [Row(id=i, vec=[float(v) for v in x[i]]) for i in range(n)]
    )
    model = pca_fit(df, "vec", k=2, dim=d, power_iterations=50)
    assert model["n"] == n
    assert np.allclose(model["mean"], x.mean(axis=0), atol=1e-9)

    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    for j in range(2):
        want_val = evals[order[j]]
        want_vec = evecs[:, order[j]]
        if want_vec[int(np.argmax(np.abs(want_vec)))] < 0:
            want_vec = -want_vec
        got_vec = np.array(model["components"][j])
        assert abs(model["eigenvalues"][j] - want_val) < 1e-6 * want_val
        assert np.allclose(got_vec, want_vec, atol=1e-5), j
        assert abs(np.linalg.norm(got_vec) - 1.0) < 1e-9

    # projection agrees with numpy centering + dot
    proj = {
        r["id"]: (r["pc1"], r["pc2"])
        for r in pca_project(df, "vec", model).collect()
    }
    centered = x - x.mean(axis=0)
    for i in range(0, n, 37):
        want1 = centered[i] @ np.array(model["components"][0])
        want2 = centered[i] @ np.array(model["components"][1])
        assert abs(proj[i][0] - want1) < 1e-8
        assert abs(proj[i][1] - want2) < 1e-8


def test_pca_validation_and_edge(spark):
    import pytest
    from pyspark.sql import Row

    from updater_spark.operators.projection import pca_fit

    df = spark.createDataFrame([Row(vec=[1.0, 2.0]), Row(vec=[3.0, 4.0])])
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, "vec", k=3, dim=2)
    with pytest.raises(ValueError, match="power_iterations"):
        pca_fit(df, "vec", k=1, dim=2, power_iterations=0)
    one = spark.createDataFrame([Row(vec=[1.0, 2.0])])
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(one, "vec", k=1, dim=2)
    # wrong dim surfaces loudly from the moment pass
    with pytest.raises(Exception, match="dim|shape|expected"):
        pca_fit(df, "vec", k=1, dim=3)


def test_pca_names_bad_vectors(spark):
    import pytest
    from pyspark.sql import Row

    from updater_spark.operators.projection import pca_fit

    df = spark.createDataFrame(
        [Row(vec=[1.0, 2.0]), Row(vec=None), Row(vec=[3.0])]
    )
    with pytest.raises(Exception, match="NULL or non-2-dim"):
        pca_fit(df, "vec", k=1, dim=2)
