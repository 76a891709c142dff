"""Constraint-suite semantics pinned against hand-computed values:
metric math (completeness / uniqueness / distinctness / match_ratio /
orphan ratio), threshold gating including the NULL-value-fails rule,
declaration-order output, and the fused-scan contract (all row-level
metrics in one aggregate)."""

import pytest
from pyspark.sql import Row

from updater_spark.operators.quality import (
    Check,
    check_constraints,
    suite_passed,
)


def _n_scans(df):
    """Input scans in the EXECUTED plan — counting only the final
    plan segment (an adaptive plan string reprints the whole initial
    plan below it, which would double-count every node)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    return final.count("Scan ExistingRDD") + final.count("LocalTableScan")


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        Row(id=1, cust=10, amount=5.0, status="ok"),
        Row(id=2, cust=10, amount=15.0, status="ok"),
        Row(id=3, cust=20, amount=None, status="bad"),
        Row(id=4, cust=99, amount=25.0, status="ok"),  # orphan cust
        Row(id=5, cust=None, amount=10.0, status="ok"),
        Row(id=5, cust=30, amount=50.0, status="ok"),  # dup id
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def customers(spark):
    return spark.createDataFrame(
        [Row(cust_id=10), Row(cust_id=20), Row(cust_id=30)]
    )


def test_metric_values(spark, sales, customers):
    checks = [
        Check("n", "row_count", threshold=5.0),
        Check("amt_complete", "completeness", column="amount"),
        Check("amt_mean", "mean", column="amount"),
        Check("amt_max", "max", column="amount", op="<=", threshold=100.0),
        Check("ok_ratio", "match_ratio", predicate="status = 'ok'"),
        Check("id_unique", "uniqueness", column="id", op="==", threshold=1.0),
        Check("id_distinctness", "distinctness", column="id"),
        Check("cust_card", "count_distinct", column="cust"),
        Check("fk_cust", "referential", column="cust", op="==", threshold=0.0),
    ]
    res = check_constraints(
        sales, checks, parents={"fk_cust": (customers, "cust_id")}
    )
    rows = {r["check"]: r for r in res.collect()}
    assert rows["n"]["value"] == 6.0 and rows["n"]["passed"] is True
    assert rows["amt_complete"]["value"] == pytest.approx(5 / 6)
    assert rows["amt_mean"]["value"] == pytest.approx(105.0 / 5)
    assert rows["amt_max"]["value"] == 50.0
    assert rows["amt_max"]["passed"] is True
    assert rows["ok_ratio"]["value"] == pytest.approx(5 / 6)
    # ids: {1,2,3,4,5} distinct=5, singletons={1,2,3,4}=4
    assert rows["id_unique"]["value"] == pytest.approx(4 / 5)
    assert rows["id_unique"]["passed"] is False
    assert rows["id_distinctness"]["value"] == pytest.approx(5 / 6)
    assert rows["cust_card"]["value"] == 4.0
    # cust=99 is the single orphan among 5 non-NULL custs
    assert rows["fk_cust"]["value"] == pytest.approx(1 / 5)
    assert rows["fk_cust"]["passed"] is False
    # metric-only checks carry NULL passed
    assert rows["amt_complete"]["passed"] is None
    # declaration order preserved
    assert [r["check"] for r in res.collect()] == [c.name for c in checks]
    assert suite_passed(res) is False


def test_null_value_fails_thresholded_check(spark):
    empty = spark.createDataFrame([], "x double")
    res = check_constraints(
        empty, [Check("xmin", "min", column="x", op=">=", threshold=0.0)]
    )
    r = res.collect()[0]
    assert r["value"] is None and r["passed"] is False


def test_referential_clean_and_empty_child(spark, customers):
    clean = spark.createDataFrame([Row(cust=10), Row(cust=30)])
    res = check_constraints(
        clean,
        [Check("fk", "referential", column="cust", op="==", threshold=0.0)],
        parents={"fk": (customers, "cust_id")},
    )
    assert res.collect()[0]["passed"] is True
    empty = spark.createDataFrame([], "cust bigint")
    res2 = check_constraints(
        empty,
        [Check("fk", "referential", column="cust", op="==", threshold=0.0)],
        parents={"fk": (customers, "cust_id")},
    )
    r2 = res2.collect()[0]
    assert r2["value"] == 0.0 and r2["passed"] is True


def test_validation_errors(spark, sales):
    with pytest.raises(ValueError, match="non-empty"):
        check_constraints(sales, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(
            sales, [Check("a", "row_count"), Check("a", "row_count")]
        )
    with pytest.raises(ValueError, match="unknown metric"):
        check_constraints(sales, [Check("a", "entropy", column="id")])
    with pytest.raises(ValueError, match="needs predicate"):
        check_constraints(sales, [Check("a", "match_ratio")])
    with pytest.raises(ValueError, match="needs column"):
        check_constraints(sales, [Check("a", "min")])
    with pytest.raises(ValueError, match="parents"):
        check_constraints(
            sales, [Check("a", "referential", column="cust")]
        )
    with pytest.raises(ValueError, match="unknown op"):
        check_constraints(
            sales, [Check("a", "row_count", op="!=", threshold=1.0)]
        )


def test_row_metrics_fuse_into_one_scan(spark, sales):
    """All row-level metrics ride ONE aggregate: the physical plan
    contains exactly one scan of the input for a suite of five
    row-level checks (the unions reuse the same aggregate result)."""
    checks = [
        Check("n", "row_count"),
        Check("c1", "completeness", column="amount"),
        Check("m1", "min", column="amount"),
        Check("m2", "max", column="amount"),
        Check("r1", "match_ratio", predicate="status = 'ok'"),
    ]
    res = check_constraints(sales, checks)
    assert res.count() == 5
    # exactly ONE scan of the input in the physical plan: the five
    # metrics ride one aggregate row exploded into five check rows
    # (a k-way union of the same aggregate would show k scans)
    assert _n_scans(res) == 1


def test_profile_one_scan_all_columns(spark, sales):
    from updater_spark.operators.quality import profile

    res = profile(sales)
    rows = {(r["column"], r["metric"]): r["value"] for r in res.collect()}
    assert rows[("*", "row_count")] == 6.0
    assert rows[("amount", "completeness")] == pytest.approx(5 / 6)
    assert rows[("amount", "max")] == 50.0
    assert rows[("id", "mean")] == pytest.approx(20 / 6)
    # string column: completeness only, no numeric metrics
    assert ("status", "completeness") in rows
    assert ("status", "mean") not in rows
    # the whole profile is ONE scan (no distinct requested)
    assert _n_scans(res) == 1
    with pytest.raises(ValueError, match="unknown columns"):
        profile(sales, columns=["nope"])
    # distinct opt-in adds the metric
    rows2 = {
        (r["column"], r["metric"]): r["value"]
        for r in profile(sales, columns=["cust"], with_distinct=True)
        .collect()
    }
    assert rows2[("cust", "count_distinct")] == 4.0
