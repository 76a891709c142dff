"""Property-based invariants for the round-9 sampling rework:
budget_select must match the naive global walk for ANY positive
bucket granularity (bucketing is a decomposition, never a semantics
knob), and domain_quota's two strategies must agree on ANY data —
including NULL domains and the skew pre-prune."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.floats(
                min_value=-2.0,
                max_value=2.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=60,
    ),
    gran=st.sampled_from([0.5, 1.0, 10.0, 1000.0]),
    budget=st.integers(min_value=1, max_value=120),
)
def test_budget_select_any_granularity_matches_naive(
    spark, rows, gran, budget
):
    from pyspark.sql import Window as W

    from updater_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [(i, q, c) for i, (q, c) in enumerate(rows)],
        "doc_id long, q double, cost int",
    )
    got = budget_select(
        df, budget=budget, cost_col="cost", order_col="q",
        bucket_granularity=gran,
    )
    naive = df.withColumn(
        "cum_cost",
        F.sum(F.col("cost").cast("double")).over(
            W.orderBy(F.col("q").desc(), F.col("doc_id").asc()).rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    ).filter(F.col("cum_cost") <= budget)
    a = sorted((r["doc_id"], r["cum_cost"]) for r in got.collect())
    b = sorted((r["doc_id"], r["cum_cost"]) for r in naive.collect())
    assert a == b


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "hot", None]),
            st.floats(
                min_value=0.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    cap=st.integers(min_value=1, max_value=5),
    prune=st.sampled_from([0, 4]),
)
def test_domain_quota_strategies_agree_on_any_data(spark, rows, cap, prune):
    from updater_spark.operators.sampling import domain_quota

    df = spark.createDataFrame(
        [(i, d, s) for i, (d, s) in enumerate(rows)],
        "doc_id long, domain string, s double",
    )
    outs = [
        sorted(
            tuple(r)
            for r in domain_quota(
                df, cap=cap, domain_col="domain", order_col="s",
                strategy=strat, prune_buckets=prune,
            ).collect()
        )
        for strat in ("window", "two_phase")
    ]
    assert outs[0] == outs[1]
    # the cap actually binds per domain, NULL included
    counts = {}
    for _, d, _s in outs[0]:
        counts[d] = counts.get(d, 0) + 1
    assert all(v <= cap for v in counts.values())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.floats(
                min_value=0.0,
                max_value=1.0,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=2,
        max_size=50,
    )
)
def test_classifier_eval_auc_matches_pair_counting(spark, data):
    from updater_spark.operators.classifier import classifier_eval

    df = spark.createDataFrame(
        [(y, s) for y, s in data], "y int, s double"
    )
    got = classifier_eval(df, "y", "s", thresholds=[0.5]).collect()[0]["auc"]
    # brute-force Mann-Whitney with the SAME rounding the engine uses
    pos = [round(s, 6) for y, s in data if y == 1]
    neg = [round(s, 6) for y, s in data if y == 0]
    if not pos or not neg:
        assert got is None
        return
    u = sum(
        1.0 if p > n_ else (0.5 if p == n_ else 0.0)
        for p in pos
        for n_ in neg
    )
    assert got == round(u / (len(pos) * len(neg)), 6)
