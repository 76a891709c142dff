"""Stupid Backoff trigram LM + percentile bucketing vs Python oracles."""

import math
from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.text import backoff_logprob, score_buckets

LM_DOCS = [
    # train slice (lang='en') — establishes the count tables
    Row(doc_id=1, lang="en", text="the cat sat on the mat"),
    Row(doc_id=2, lang="en", text="the cat sat on a hat"),
    Row(doc_id=3, lang="en", text="a dog ran in the park"),
    # seen-trigram doc: every trigram occurs in train
    Row(doc_id=10, lang="fr", text="the cat sat on the mat"),
    # backoff leg 2: "mat the cat" is an unseen trigram whose
    # (w2,w3)=(the,cat) bigram IS seen
    Row(doc_id=11, lang="fr", text="mat the cat sat"),
    # backoff leg 3: "zzz" is OOV — add-k unigram floor
    Row(doc_id=12, lang="fr", text="the cat zzz"),
    # short doc: no trigrams at all
    Row(doc_id=13, lang="fr", text="x y"),
]


def _oracle(docs, alpha=0.4, k=0.5):
    uni, bi, tri = Counter(), Counter(), Counter()
    for d in docs:
        if d.lang != "en":
            continue
        toks = d.text.split()
        uni.update(t for t in toks if t != "")
        bi.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    n, v = sum(uni.values()), len(uni)
    out = {}
    for d in docs:
        toks = d.text.split()
        lps = []
        for g in zip(toks, toks[1:], toks[2:]):
            if g in tri:
                s = tri[g] / bi[(g[0], g[1])]
            elif (g[1], g[2]) in bi:
                s = alpha * bi[(g[1], g[2])] / uni[g[1]]
            else:
                s = (
                    alpha
                    * alpha
                    * (uni.get(g[2], 0) + k)
                    / (n + k * v)
                )
            lps.append(math.log(s))
        out[d.doc_id] = (
            len(lps),
            round(sum(lps) / len(lps), 4) if lps else None,
        )
    return out


def test_backoff_logprob_oracle(spark):
    df = spark.createDataFrame(LM_DOCS)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logprob"])
        for r in backoff_logprob(
            df, train_filter=F.col("lang") == "en"
        ).collect()
    }
    want = _oracle(LM_DOCS)
    assert got == want


def test_backoff_legs_ordering(spark):
    """A fluent seen-trigram doc must outscore the bigram-backoff doc,
    which must outscore the OOV doc — the filter's entire point."""
    df = spark.createDataFrame(LM_DOCS)
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in backoff_logprob(
            df, train_filter=F.col("lang") == "en"
        ).collect()
    }
    assert got[10] > got[11] > got[12]
    assert got[13] is None


def test_backoff_short_doc_and_self_train(spark):
    df = spark.createDataFrame(LM_DOCS)
    # train_filter=None → self-perplexity over the whole corpus
    rows = {r["doc_id"]: r for r in backoff_logprob(df).collect()}
    assert rows[13]["n_trigrams"] == 0
    assert rows[13]["avg_logprob"] is None
    # doc 10 duplicates doc 1's text → identical self-perplexity
    assert rows[10]["avg_logprob"] == rows[1]["avg_logprob"]


def test_backoff_empty_train_raises(spark):
    df = spark.createDataFrame(LM_DOCS)
    with pytest.raises(ValueError, match="no tokens"):
        backoff_logprob(df, train_filter=F.col("lang") == "xx")


def test_score_buckets_terciles(spark):
    rows = [Row(doc_id=i, avg_logprob=float(i)) for i in range(1, 10)]
    rows.append(Row(doc_id=99, avg_logprob=None))
    df = spark.createDataFrame(rows, "doc_id long, avg_logprob double")
    got = {
        r["doc_id"]: r["bucket"] for r in score_buckets(df).collect()
    }
    # thresholds: percentile(1/3)=3.6667, percentile(2/3)=6.3333
    for i in (1, 2, 3):
        assert got[i] == "tail"
    for i in (4, 5, 6):
        assert got[i] == "middle"
    for i in (7, 8, 9):
        assert got[i] == "head"
    assert got[99] is None


def test_score_buckets_boundary_promotes(spark):
    # odd n → the median IS a data point; score == threshold → upper
    rows = [Row(doc_id=i, avg_logprob=float(i)) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows)
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets(
            df, probs=(0.5,), labels=("lo", "hi")
        ).collect()
    }
    assert got == {1: "lo", 2: "hi", 3: "hi"}


def test_score_buckets_validation(spark):
    df = spark.createDataFrame([Row(doc_id=1, avg_logprob=1.0)])
    with pytest.raises(ValueError, match="labels"):
        score_buckets(df, probs=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="ascending"):
        score_buckets(df, probs=(0.9, 0.1), labels=("a", "b", "c"))
    empty = df.filter(F.col("avg_logprob").isNull())
    with pytest.raises(ValueError, match="non-NULL"):
        score_buckets(empty)


def test_backoff_single_gram_pass_plan(spark):
    """The r11 single-pass rewrite must build ALL THREE gram-order
    count tables from ONE tokenize+explode of the train slice: the
    executed plan reads the persisted combined count table (one
    InMemoryTableScan per score-table reference) and the only
    Generate (explode) nodes are the ONE tagged train gram stream —
    inside the cached relation — plus the doc-side trigram stream.
    Before the rewrite the plan held a separate tokenize+explode
    subtree per order (3 over train + 1 over docs)."""
    df = spark.createDataFrame(LM_DOCS)
    res = backoff_logprob(df, train_filter=F.col("lang") == "en")
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the score-table references all read the ONE persisted combined
    # count table (toString re-prints the cached subtree under each
    # reference; at runtime it computes once). >= 3 rather than an
    # exact count (ADVICE r11): the invariant is "the cache is what
    # every order reads", not how many times a Spark version's plan
    # printer re-prints cache references.
    assert plan.count("InMemoryTableScan") >= 3
    # every train-side explode is the single TAGGED stream
    # (explode(concat(...)) — the cached build plan, printed per
    # reference); exactly one untagged explode remains: the doc-side
    # trigram stream. A per-order gram pass would show an untagged
    # explode per order, so the bound is <= 1 untagged (and >= 1:
    # the doc stream must exist).
    gens = [ln for ln in plan.splitlines() if "Generate explode(" in ln]
    untagged = [ln for ln in gens if "explode(concat(" not in ln]
    assert len(untagged) == 1, untagged
    # and the values still match the unrolled-Counter oracle path
    # (the sibling tests); spot-pin one leg here so a plan-only
    # regression can't slip through a green assertion
    got = {r["doc_id"]: r for r in res.collect()}
    assert got[13]["n_trigrams"] == 0 and got[13]["avg_logprob"] is None
