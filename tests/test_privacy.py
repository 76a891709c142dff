"""k-anonymity / l-diversity privacy screens (operators/privacy.py)."""

import pytest

from updater_spark.operators.privacy import (
    k_anonymize,
    k_anonymity_stats,
    l_diversity_violations,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # (id, region, band, diagnosis): region A x b1 has 3 members,
        # region A x b2 has 1 (unique!), region B x b1 has 2
        (0, "A", "b1", "flu"),
        (1, "A", "b1", "flu"),
        (2, "A", "b1", "cold"),
        (3, "A", "b2", "rare"),
        (4, "B", "b1", "flu"),
        (5, "B", "b1", "flu"),
        (6, None, "b1", "cold"),
        (7, None, "b1", "flu"),
    ]
    return spark.createDataFrame(
        rows, "id long, region string, band string, diag string"
    )


def test_k_anonymize_suppresses_small_groups(people):
    kept = sorted(
        r["id"] for r in k_anonymize(people, ["region", "band"], k=2).collect()
    )
    # the unique (A, b2) row is suppressed; NULL region forms its own
    # group of 2 and survives
    assert kept == [0, 1, 2, 4, 5, 6, 7]
    kept3 = sorted(
        r["id"] for r in k_anonymize(people, ["region", "band"], k=3).collect()
    )
    assert kept3 == [0, 1, 2]


def test_k_anonymity_stats(people):
    row = k_anonymity_stats(people, ["region", "band"]).collect()[0]
    assert row["effective_k"] == 1
    assert row["n_groups"] == 4
    assert row["rows_unique"] == 1
    assert row["rows_below_5"] == 8


def test_l_diversity_violations(people):
    bad = l_diversity_violations(
        people, ["region", "band"], "diag", l_threshold=2
    ).collect()
    got = {(r["region"], r["band"]): r["distinct_sensitive"] for r in bad}
    # (A,b2) has 1 value; (B,b1) is all-flu -> homogeneous
    assert got == {("A", "b2"): 1, ("B", "b1"): 1}


def test_privacy_guards(people):
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymize(people, [], k=2)
    with pytest.raises(ValueError, match="k must"):
        k_anonymize(people, ["region"], k=0)
    with pytest.raises(ValueError, match="l_threshold"):
        l_diversity_violations(people, ["region"], "diag", l_threshold=0)
