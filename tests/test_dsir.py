"""DSIR importance resampling (operators/dsir.py).

Semantics pinned here; the exact-value cross-engine check is the
driver oracle (``dsir_select`` in __spark_entry__).
"""

import math

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_select,
    dsir_weights,
    hashed_ngram_buckets,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog ran in the park", "en"),
        (2, "le chat est sur le tapis", "fr"),
        (3, "der hund lief im park", "de"),
        (4, "the the the the the", "en"),
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_feature_counts(corpus):
    # doc 0: 6 unigrams + 5 bigrams = 11 occurrences; doc 5: none
    feats = hashed_ngram_buckets(corpus, hash_bits=8)
    per_doc = dict(
        feats.groupBy("doc_id").count().collect()
    )
    assert per_doc[0] == 11
    assert per_doc[4] == 9  # 5 unigrams + 4 bigrams
    assert 5 not in per_doc  # empty text -> zero features


def test_buckets_in_range(corpus):
    feats = hashed_ngram_buckets(corpus, hash_bits=6)
    lo, hi = feats.agg(F.min("bucket"), F.max("bucket")).first()
    assert lo >= 0 and hi < 64


def test_log_ratios_cover_all_buckets(corpus):
    target = corpus.filter(F.col("lang") == "en")
    ratios = dsir_log_ratios(corpus, target, hash_bits=6)
    assert ratios.count() == 64
    assert ratios.filter(F.col("log_ratio").isNull()).count() == 0


def test_weights_favor_target_like_docs(corpus):
    target = corpus.filter(F.col("lang") == "en")
    w = {r["doc_id"]: r["log_weight"] for r in dsir_weights(corpus, target).collect()}
    # English docs share buckets with the target model; French/German
    # docs hit raw-only buckets, so their importance weight is lower.
    assert w[0] > w[2]
    assert w[1] > w[3]
    # featureless doc is neutral, not dropped
    assert w[5] == 0.0


def test_weights_hand_value(spark):
    # One doc, one token, B=4: target == raw == the same doc, so the
    # only populated bucket has t=r=1, T=R=1 and the ratio telescopes
    # to ln((1+1)/(1+4)) - ln((1+1)/(1+4)) = 0.
    one = spark.createDataFrame([(0, "tok")], "doc_id long, text string")
    w = dsir_weights(one, one, hash_bits=2).collect()[0]
    assert w["n_feats"] == 1
    assert math.isclose(w["log_weight"], 0.0, abs_tol=1e-9)


def test_select_is_deterministic_and_bounded(corpus):
    target = corpus.filter(F.col("lang") == "en")
    a = dsir_select(corpus, target, k=3).collect()
    b = dsir_select(corpus, target, k=3).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 3
    # keys are the ranking order
    keys = [r["_key"] for r in a]
    assert keys == sorted(keys, reverse=True)


def test_select_salt_changes_sample(corpus):
    target = corpus.filter(F.col("lang") == "en")
    a = {r["doc_id"] for r in dsir_select(corpus, target, k=2, salt="s1").collect()}
    b = {r["doc_id"] for r in dsir_select(corpus, target, k=2, salt="s2").collect()}
    # different Gumbel draws — not necessarily disjoint, but the
    # selection must depend on the salt somewhere across these corpora
    c = {r["doc_id"] for r in dsir_select(corpus, target, k=2, salt="s3").collect()}
    assert len(a | b | c) > 2 or (a == b == c) is False


def test_empty_target_raises(corpus):
    with pytest.raises(ValueError, match="empty feature stream"):
        dsir_weights(corpus, corpus.filter(F.lit(False)))


def test_bad_params(corpus):
    with pytest.raises(ValueError, match="alpha"):
        dsir_log_ratios(corpus, corpus, alpha=0.0)
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(corpus, corpus, k=0)


def test_corpus_divergence_properties(spark, corpus):
    from pyspark.sql import functions as F

    from updater_spark.operators.dsir import corpus_divergence

    en = corpus.filter(F.col("lang") == "en")
    other = corpus.filter(F.col("lang") != "en")

    # self-divergence is zero
    self_row = corpus_divergence(en, en, hash_bits=8).collect()[0]
    assert self_row["psi"] == 0.0
    assert self_row["kl_ab"] == 0.0 and self_row["kl_ba"] == 0.0

    # cross-language divergence is positive, PSI = KL(a||b) + KL(b||a)
    row = corpus_divergence(en, other, hash_bits=8).collect()[0]
    assert row["psi"] > 0
    assert abs(row["psi"] - (row["kl_ab"] + row["kl_ba"])) < 2e-6
    assert row["n_buckets"] == 256

    # symmetry of PSI; KL halves swap
    rev = corpus_divergence(other, en, hash_bits=8).collect()[0]
    assert abs(rev["psi"] - row["psi"]) < 2e-6
    assert abs(rev["kl_ab"] - row["kl_ba"]) < 2e-6


def test_corpus_divergence_empty_side_raises(spark, corpus):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from updater_spark.operators.dsir import corpus_divergence

    with _pytest.raises(ValueError, match="empty feature stream"):
        corpus_divergence(corpus, corpus.filter(F.lit(False)))


def test_hashed_text_embedding_shape_and_determinism(spark, corpus):
    import math

    from updater_spark.operators.dsir import hashed_text_embedding

    out = {r["doc_id"]: r["embedding"] for r in
           hashed_text_embedding(corpus, dim=8).collect()}
    assert all(len(v) == 8 for v in out.values())
    # empty doc -> exact zero vector
    assert out[5] == [0.0] * 8
    # deterministic across partitionings
    again = {r["doc_id"]: r["embedding"] for r in
             hashed_text_embedding(corpus.repartition(3), dim=8).collect()}
    assert out == again
    # norm scales with feature count: the repetitive doc 4 has mass
    assert math.sqrt(sum(x * x for x in out[4])) > 0


def test_hashed_text_embedding_similarity_signal(spark):
    import math

    from updater_spark.operators.dsir import hashed_text_embedding

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely unrelated words appear here instead now"),
        ],
        "doc_id long, text string",
    )
    v = {r["doc_id"]: r["embedding"] for r in
         hashed_text_embedding(docs, dim=32).collect()}

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    assert cos(v[0], v[1]) > cos(v[0], v[2])
    assert cos(v[0], v[1]) > 0.5


def test_hashed_text_embedding_dim_guard(spark, corpus):
    import pytest as _pytest

    from updater_spark.operators.dsir import hashed_text_embedding

    with _pytest.raises(ValueError, match="dim"):
        hashed_text_embedding(corpus, dim=33)
