"""Welch t-test pinned against scipy-free hand math: statistic, dof,
lift, control pairing, degenerate arms."""

import math

import pytest
from pyspark.sql import Row

from updater_spark.operators.abtest import welch_ttest


def _py_welch(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = vb / nb + va / na
    t = (mb - ma) / math.sqrt(se2)
    dof = se2**2 / ((vb / nb) ** 2 / (nb - 1) + (va / na) ** 2 / (na - 1))
    return t, dof


def test_welch_matches_hand_math(spark):
    ctrl = [10.0, 11.0, 9.5, 10.2, 10.8, 9.9, 10.4, 10.1]
    trt = [11.2, 12.1, 11.8, 10.9, 12.4, 11.5]
    rows = [Row(exp="e1", var="control", v=x) for x in ctrl]
    rows += [Row(exp="e1", var="blue", v=x) for x in trt]
    # a second experiment ensures pairing stays per-experiment
    rows += [Row(exp="e2", var="control", v=x) for x in [1.0, 1.1, 0.9]]
    rows += [Row(exp="e2", var="red", v=x) for x in [1.05, 0.95, 1.02]]
    df = spark.createDataFrame(rows)
    got = {
        (r["experiment"], r["variant"]): r
        for r in welch_ttest(df, "exp", "var", "v", "control").collect()
    }
    t, dof = _py_welch(ctrl, trt)
    r = got[("e1", "blue")]
    assert r["n_c"] == 8 and r["n_t"] == 6
    assert r["t_stat"] == pytest.approx(t, abs=1e-12)
    assert r["dof"] == pytest.approx(dof, abs=1e-9)
    assert r["lift"] == pytest.approx(
        (sum(trt) / 6 - sum(ctrl) / 8) / (sum(ctrl) / 8)
    )
    assert r["significant"] is True  # a ~1.1-unit shift on 0.5 noise
    assert got[("e2", "red")]["significant"] is False
    # control rows never appear as treatments
    assert ("e1", "control") not in got


def test_welch_degenerate_arms(spark):
    # both variances zero -> NULL t, NULL verdict; zero control mean
    # -> NULL lift
    rows = [Row(exp="e", var="control", v=0.0)] * 3
    rows += [Row(exp="e", var="t1", v=5.0)] * 3
    df = spark.createDataFrame(rows)
    r = welch_ttest(df, "exp", "var", "v", "control").collect()[0]
    assert r["t_stat"] is None and r["significant"] is None
    assert r["lift"] is None
