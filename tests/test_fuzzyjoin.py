"""Fuzzy join vs a brute-force Python edit-distance oracle:
completeness of the q-gram prefix blocking (incl. the zero-shared-gram
short-string case), the pool guard, and the no-cartesian plan on
short-free data."""

import random

import pytest
from pyspark.sql import Row

from updater_spark.operators.fuzzyjoin import fuzzy_join


def _ed(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _oracle(lrows, rrows, k):
    return {
        (l.id, r.id, _ed(l.s, r.s))
        for l in lrows
        for r in rrows
        if _ed(l.s, r.s) <= k
    }


def _spark_pairs(spark, lrows, rrows, k, **kw):
    out = fuzzy_join(
        spark.createDataFrame(lrows),
        spark.createDataFrame(rrows),
        "id",
        "s",
        "id",
        "s",
        max_dist=k,
        **kw,
    )
    return {(r[0], r[1], r[2]) for r in out.collect()}


WORDS = [
    "spark",
    "shark",
    "spork",
    "sparkle",
    "catalyst",
    "analyst",
    "catalist",
    "tungsten",
    "tungstan",
    "wolfram",
    "stream",
    "streams",
    "dream",
]


def test_matches_bruteforce_on_word_corpus(spark):
    lrows = [Row(id=i, s=w) for i, w in enumerate(WORDS)]
    rrows = [Row(id=100 + i, s=w) for i, w in enumerate(reversed(WORDS))]
    for k in (1, 2):
        assert _spark_pairs(spark, lrows, rrows, k) == _oracle(
            lrows, rrows, k
        ), k


def test_matches_bruteforce_randomized(spark):
    rng = random.Random(7)
    alpha = "abcd"  # tiny alphabet → dense near-matches

    def w():
        return "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))

    lrows = [Row(id=i, s=w()) for i in range(60)]
    rrows = [Row(id=1000 + i, s=w()) for i in range(60)]
    assert _spark_pairs(spark, lrows, rrows, 2) == _oracle(lrows, rrows, 2)


def test_matches_bruteforce_repetitive_strings(spark):
    """Repeated-gram torture ('ababab…' family): the value-level
    prefix must keep every occurrence of a selected gram, or the
    positional filter can evict the one compatible alignment."""
    rng = random.Random(11)

    def w():
        unit = rng.choice(["ab", "ba", "aab", "abb"])
        s = unit * rng.randint(2, 5)
        return s[: rng.randint(4, len(s))]

    lrows = [Row(id=i, s=w()) for i in range(40)]
    rrows = [Row(id=1000 + i, s=w()) for i in range(40)]
    assert _spark_pairs(spark, lrows, rrows, 2) == _oracle(lrows, rrows, 2)


def test_short_strings_with_zero_shared_grams(spark):
    """'ab' → 'ba' is distance 2 with NO common bigram — only the
    short-pool path can find it."""
    lrows = [Row(id=1, s="ab"), Row(id=2, s="xy")]
    rrows = [Row(id=10, s="ba"), Row(id=11, s="qq"), Row(id=12, s="")]
    got = _spark_pairs(spark, lrows, rrows, 2)
    assert got == _oracle(lrows, rrows, 2)
    assert (1, 10, 2) in got


def test_short_pool_guard_trips(spark):
    lrows = [Row(id=i, s="ab") for i in range(5)]
    rrows = [Row(id=10 + i, s="ba") for i in range(5)]
    with pytest.raises(ValueError, match="max_short_pool"):
        _spark_pairs(spark, lrows, rrows, 2, max_short_pool=3)


def test_no_cartesian_on_short_free_data(spark):
    lrows = [Row(id=i, s=w + "xx") for i, w in enumerate(WORDS)]
    rrows = [Row(id=50 + i, s=w + "yy") for i, w in enumerate(WORDS)]
    plan = (
        fuzzy_join(
            spark.createDataFrame(lrows),
            spark.createDataFrame(rrows),
            "id",
            "s",
            "id",
            "s",
            max_dist=2,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
