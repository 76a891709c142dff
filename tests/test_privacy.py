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


def test_generalize_numeric_picks_first_sufficient_width(spark):
    from updater_spark.operators.privacy import generalize_numeric

    # region A: ages cluster tightly; width 1 leaves singletons,
    # width 10 groups everyone
    rows = [(i, "A", float(20 + i)) for i in range(6)] + [
        (i + 10, "B", float(30 + i)) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "id long, region string, age double")
    out = generalize_numeric(
        df, "age", ["region"], k=3, ladder=(1.0, 10.0)
    )
    got = out.collect()
    assert all(r["width"] == 10.0 for r in got)
    assert len(got) == 12  # nothing suppressed
    # bands are floor(age/10)
    assert {r["band"] for r in got if r["region"] == "A"} == {2}


def test_generalize_numeric_fallback_suppresses(spark):
    from updater_spark.operators.privacy import generalize_numeric

    # one isolated outlier can never reach k even at the coarsest
    # width -> fallback suppresses exactly that row
    rows = [(i, "A", 5.0) for i in range(5)] + [(99, "A", 1e9)]
    df = spark.createDataFrame(rows, "id long, region string, v double")
    out = generalize_numeric(
        df, "v", ["region"], k=3, ladder=(1.0, 10.0)
    ).collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2, 3, 4]
    assert all(r["width"] == 10.0 for r in out)


def test_generalize_numeric_ladder_guards(spark):
    import pytest as _pytest

    from updater_spark.operators.privacy import generalize_numeric

    df = spark.createDataFrame([(1, "a", 1.0)], "id long, q string, v double")
    with _pytest.raises(ValueError, match="increasing"):
        generalize_numeric(df, "v", ["q"], ladder=(10.0, 5.0))
    with _pytest.raises(ValueError, match="non-empty"):
        generalize_numeric(df, "v", ["q"], ladder=())
