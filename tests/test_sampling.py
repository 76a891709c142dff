"""Deterministic sampling operators vs Python/DuckDB oracles."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from updater_spark.operators.sampling import (
    hash_sample,
    mixture_resample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .cache()
    )


def _unit(doc_id: int, salt: str) -> float:
    hx = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8]
    return int(hx, 16) / 2**32


def test_hash_sample_python_oracle(spark, docs):
    got = {r["doc_id"] for r in hash_sample(docs, 0.25, salt="s1").collect()}
    want = {
        r["doc_id"] for r in docs.collect() if _unit(r["doc_id"], "s1") < 0.25
    }
    assert got == want
    n = docs.count()
    assert abs(len(got) / n - 0.25) < 0.08


def test_hash_sample_stable_under_growth(spark, docs):
    full = {r["doc_id"] for r in hash_sample(docs, 0.5).collect()}
    half = {
        r["doc_id"]
        for r in hash_sample(docs.filter(F.col("doc_id") % 2 == 0), 0.5).collect()
    }
    assert half == {k for k in full if k % 2 == 0}


def test_hash_sample_nested_fractions(spark, docs):
    # same salt => a 10% sample is a subset of the 30% sample
    small = {r["doc_id"] for r in hash_sample(docs, 0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    assert small <= big


def test_stratified_sample_duckdb_oracle(spark, sf_dir, docs):
    fractions = {"en": 0.5, "fr": 1.0, "zh": 0.25}
    got = {
        r["doc_id"]
        for r in stratified_sample(
            docs, fractions, "lang", salt="st1", default_fraction=0.0
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        row[0]
        for row in con.sql(
            """
            SELECT doc_id FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'st1'), 1, 8))::UBIGINT
                  / 4294967296.0
                < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 1.0
                            WHEN 'zh' THEN 0.25 ELSE 0.0 END
            """
        ).fetchall()
    }
    assert got == want
    langs = {
        r["lang"]
        for r in stratified_sample(docs, fractions, "lang", salt="st1").collect()
    }
    assert langs <= {"en", "fr", "zh"}


def test_mixture_resample_python_oracle(spark, docs):
    weights = {"en": 0.25, "fr": 2.5, "de": 1.0}
    out = mixture_resample(
        docs, weights, "lang", salt="m1", default_weight=0.0
    ).collect()
    base = docs.collect()
    want: dict[int, int] = {}
    for r in base:
        w = weights.get(r["lang"], 0.0)
        n = int(w) + (1 if _unit(r["doc_id"], "m1") < w - int(w) else 0)
        if n:
            want[r["doc_id"]] = n
    got: dict[int, list[int]] = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])
    assert {k: len(v) for k, v in got.items()} == want
    for doc_id, idxs in got.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_mixture_resample_expected_multiplicity(spark, docs):
    # weight 3.0 is exact: every row appears exactly 3 times
    out = mixture_resample(
        docs, {"en": 3.0}, "lang", default_weight=0.0
    )
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == 3 * n_en
    counts = out.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [3]


def test_sampling_rejects_bad_args(spark, docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -0.1}, "lang")
    with pytest.raises(ValueError):
        mixture_resample(docs, {"en": -1.0}, "lang")


def test_deterministic_shuffle_positions(spark, docs):
    """Positions are the contiguous 0..n-1 ranks of md5(id||salt),
    verified against a driver-side Python oracle, and stable under
    repartitioning."""
    import hashlib

    from updater_spark.operators.sampling import deterministic_shuffle

    rows = docs.collect()
    expected = {
        r["doc_id"]: i
        for i, r in enumerate(
            sorted(
                rows,
                key=lambda r: (
                    hashlib.md5(f"{r['doc_id']}shuffle-v1".encode()).hexdigest(),
                    r["doc_id"],
                ),
            )
        )
    }
    got = {
        r["doc_id"]: r["pos"]
        for r in deterministic_shuffle(docs, id_col="doc_id").collect()
    }
    assert got == expected

    skewed = deterministic_shuffle(docs.repartition(7), id_col="doc_id")
    assert {r["doc_id"]: r["pos"] for r in skewed.collect()} == expected


def test_weighted_sample_matches_reference_and_favors_weight(spark):
    """Exact selection match vs a Python evaluation of the same
    A-Res keys (same md5 uniform, same rounding); heavier rows are
    sampled more often across disjoint salts."""
    import hashlib
    import math

    from updater_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i % 10 == 0 else 1.0) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def py_key(i, salt):
        u = int(
            hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16
        ) / float(1 << 32)
        return round(math.log(u) / dict(rows)[i], 9)

    got = weighted_sample(df, 20, "w", salt="s1").collect()
    want = sorted(
        ((py_key(i, "s1"), i) for i, _ in rows),
        key=lambda kv: (-kv[0], kv[1]),
    )[:20]
    assert [(r["_key"], r["doc_id"]) for r in got] == want

    # inclusion tracks weight: heavy ids (10x weight, 10% of rows)
    # take well over half the sample on average across salts
    heavy = 0
    for s in range(8):
        picked = weighted_sample(df, 20, "w", salt=f"t{s}").collect()
        heavy += sum(1 for r in picked if r["doc_id"] % 10 == 0)
    assert heavy / (8 * 20) > 0.4

    # deterministic: same salt, same sample, any partitioning
    again = weighted_sample(df.repartition(7), 20, "w", salt="s1").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in got
    )

    # zero/negative weights are never selected
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 1.0)], "doc_id long, w double"
    )
    assert [
        r["doc_id"] for r in weighted_sample(df2, 3, "w").collect()
    ] == [3]


def test_domain_quota_exact_python_oracle(spark):
    from updater_spark.operators.sampling import domain_quota

    rows = [
        # domain a: 5 rows, cap 3 -> keep the 3 largest scores
        (0, "a", 10.0), (1, "a", 50.0), (2, "a", 30.0),
        (3, "a", 40.0), (4, "a", 20.0),
        # domain b: 2 rows, under cap -> pass through
        (5, "b", 1.0), (6, "b", 2.0),
        # domain c: exactly cap rows -> pass through (light path)
        (7, "c", 1.0), (8, "c", 1.0), (9, "c", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, s double")
    out = domain_quota(df, cap=3, domain_col="domain", order_col="s")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2, 3, 5, 6, 7, 8, 9]


def test_domain_quota_tie_break_by_id(spark):
    from updater_spark.operators.sampling import domain_quota

    df = spark.createDataFrame(
        [(i, "a", 7.0) for i in range(6)], "doc_id long, domain string, s double"
    )
    out = domain_quota(df, cap=2, domain_col="domain", order_col="s")
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1]


def test_domain_quota_prune_buckets_is_exact(spark):
    from updater_spark.operators.sampling import domain_quota

    rows = [(i, "hot" if i % 4 else "cold", float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, s double")
    plain = domain_quota(df, cap=7, domain_col="domain", order_col="s")
    pruned = domain_quota(
        df, cap=7, domain_col="domain", order_col="s", prune_buckets=8
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in pruned.collect())
    # both domains are over cap 7, so 7 survivors each
    assert a == b and len(a) == 14


def test_domain_quota_no_order_col_keeps_lowest_ids(spark):
    from updater_spark.operators.sampling import domain_quota

    df = spark.createDataFrame(
        [(i, "a") for i in range(10)], "doc_id long, domain string"
    )
    out = domain_quota(df, cap=4, domain_col="domain")
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 2, 3]


def test_domain_quota_rejects_bad_cap(spark):
    import pytest as _pytest

    from updater_spark.operators.sampling import domain_quota

    df = spark.createDataFrame([(1, "a")], "doc_id long, domain string")
    with _pytest.raises(ValueError, match="cap"):
        domain_quota(df, cap=0, domain_col="domain")


def test_domain_quota_strategies_agree(spark):
    from updater_spark.operators.sampling import domain_quota

    rows = [
        (i, f"d{i % 13}" if i % 3 else "hot", float((i * 29) % 97))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, s double")
    outs = [
        sorted(
            tuple(r)
            for r in domain_quota(
                df, cap=5, domain_col="domain", order_col="s", **kw
            ).collect()
        )
        for kw in (
            {},
            {"strategy": "two_phase"},
            {"strategy": "two_phase", "prune_buckets": 4},
            {"prune_buckets": 4},
        )
    ]
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_domain_quota_rejects_bad_strategy(spark):
    import pytest as _pytest

    from updater_spark.operators.sampling import domain_quota

    df = spark.createDataFrame([(1, "a")], "doc_id long, domain string")
    with _pytest.raises(ValueError, match="strategy"):
        domain_quota(df, cap=1, domain_col="domain", strategy="magic")


def test_stratified_exact_counts_and_determinism(spark, docs):
    from updater_spark.operators.sampling import stratified_exact

    out = stratified_exact(docs, 5, "lang")
    counts = dict(
        out.groupBy("lang").count().collect()
    )
    base = dict(docs.groupBy("lang").count().collect())
    for lang, n in base.items():
        assert counts.get(lang, 0) == min(5, n)
    # deterministic across partitionings
    again = stratified_exact(docs.repartition(7), 5, "lang")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # different salt, different members (with overwhelming probability)
    other = stratified_exact(docs, 5, "lang", salt="other")
    assert {r["doc_id"] for r in out.collect()} != {
        r["doc_id"] for r in other.collect()
    }


def test_stratified_exact_guard(spark, docs):
    import pytest as _pytest

    from updater_spark.operators.sampling import stratified_exact

    with _pytest.raises(ValueError, match="n_per_stratum"):
        stratified_exact(docs, 0, "lang")


def test_budget_select_matches_naive_global_walk(spark):
    from pyspark.sql import Window as W

    from updater_spark.operators.sampling import budget_select

    rows = [
        (i, float((i * 37) % 50), ((i * 13) % 7) + 1) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, q double, cost int")
    got = budget_select(df, budget=200, cost_col="cost", order_col="q")
    naive = (
        df.withColumn(
            "cum_cost",
            F.sum(F.col("cost").cast("double")).over(
                W.orderBy(F.col("q").desc(), F.col("doc_id").asc()).rowsBetween(
                    W.unboundedPreceding, 0
                )
            ),
        )
        .filter(F.col("cum_cost") <= 200)
    )
    a = sorted((r["doc_id"], r["cum_cost"]) for r in got.collect())
    b = sorted((r["doc_id"], r["cum_cost"]) for r in naive.collect())
    assert a == b and len(a) > 10


def test_budget_select_stops_before_crossing(spark):
    from updater_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [(0, 3.0, 4), (1, 2.0, 4), (2, 1.0, 4)],
        "doc_id long, q double, cost int",
    )
    out = budget_select(df, budget=9, cost_col="cost", order_col="q")
    # 4 + 4 = 8 fits; the third row would reach 12 > 9 and is dropped
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1]


def test_budget_select_guards_and_nulls(spark):
    import pytest as _pytest

    from updater_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [(0, 1.0, None), (1, None, 2), (2, 5.0, 2)],
        "doc_id long, q double, cost int",
    )
    out = budget_select(df, budget=100, cost_col="cost", order_col="q")
    assert [r["doc_id"] for r in out.collect()] == [2]
    with _pytest.raises(ValueError, match="budget"):
        budget_select(df, budget=0, cost_col="cost", order_col="q")


def test_domain_quota_two_phase_caps_null_domain(spark):
    from updater_spark.operators.sampling import domain_quota

    # NULL is an over-cap "domain": both strategies must cap it —
    # a plain equi anti-join would let every NULL row through
    rows = [(i, None if i < 20 else "a", float(i)) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, s double")
    outs = [
        sorted(
            tuple(r)
            for r in domain_quota(
                df, cap=3, domain_col="domain", order_col="s", strategy=st
            ).collect()
        )
        for st in ("window", "two_phase")
    ]
    assert outs[0] == outs[1]
    assert sum(1 for r in outs[1] if r[1] is None) == 3


def test_budget_select_granularity_on_unit_scores(spark):
    from pyspark.sql import Window as W

    from updater_spark.operators.sampling import budget_select

    # quality scores in [0, 1): default floor() collapses to ONE
    # bucket (the degenerate global window); granularity=1000 must
    # spread the rows over many buckets AND stay exact vs naive
    rows = [(i, ((i * 37) % 997) / 997.0, ((i * 13) % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, q double, cost int")
    got = budget_select(
        df, budget=300, cost_col="cost", order_col="q",
        bucket_granularity=1000.0,
    )
    naive = (
        df.withColumn(
            "cum_cost",
            F.sum(F.col("cost").cast("double")).over(
                W.orderBy(
                    F.col("q").desc(), F.col("doc_id").asc()
                ).rowsBetween(W.unboundedPreceding, 0)
            ),
        ).filter(F.col("cum_cost") <= 300)
    )
    a = sorted((r["doc_id"], r["cum_cost"]) for r in got.collect())
    b = sorted((r["doc_id"], r["cum_cost"]) for r in naive.collect())
    assert a == b and len(a) > 10
    # multi-bucket execution, not one global partition
    n_buckets = (
        df.selectExpr("floor(q * 1000.0) AS b").distinct().count()
    )
    assert n_buckets > 100


def test_budget_select_rejects_nonpositive_cost(spark):
    import pytest as _pytest

    from updater_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [(0, 2.0, 3), (1, 1.0, 0)], "doc_id long, q double, cost int"
    )
    with _pytest.raises(ValueError, match="> 0"):
        budget_select(df, budget=10, cost_col="cost", order_col="q")
    with _pytest.raises(ValueError, match="bucket_granularity"):
        budget_select(
            df.filter("cost > 0"), budget=10, cost_col="cost",
            order_col="q", bucket_granularity=0.0,
        )
